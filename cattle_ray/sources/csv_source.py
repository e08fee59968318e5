"""S1/S2: dialect-aware CSV/TSV reading with stable row numbers.

Mirrors the reference's upload surface (``/root/reference/src/cattle.py:30,
113-146`` — {csv,json,tsv} whitelist, tsv→csv rename) as engine semantics:
TSV is just dialect ``delimiter="\\t"``. All columns stay ``string`` — types
are applied at triple-emit time (SURVEY.md §1.1 "Cell value").

``_row`` is 1-based physical row order (the ``{_row}`` contract —
SURVEY.md §2.9): derived from the data file, not from block arrival order, so
conversion is parallelism-invariant.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.csv as pacsv


def read_csv_table(path: str, dialect: dict | None = None) -> pa.Table:
    """Single-file driver-side read → Arrow table (all string) + ``_row``."""
    d = dialect or {}
    delim = d.get("delimiter", ",")
    if str(path).endswith(".tsv") and "delimiter" not in d:
        delim = "\t"
    parse = pacsv.ParseOptions(delimiter=delim, quote_char=d.get("quoteChar", '"'))
    read = pacsv.ReadOptions(encoding=d.get("encoding", "utf-8"))
    # keep every column lexical: infer nothing
    convert = pacsv.ConvertOptions(column_types={}, strings_can_be_null=False)
    tbl = pacsv.read_csv(path, parse_options=parse, read_options=read,
                         convert_options=convert)
    tbl = pa.Table.from_arrays(
        [pa.compute.cast(tbl[c], pa.string()) for c in tbl.column_names],
        names=tbl.column_names,
    )
    return tbl.append_column("_row", pa.array(range(1, tbl.num_rows + 1), pa.int64()))


def read_csv_dataset(path: str, dialect: dict | None = None):
    """Ray Dataset form. For big CSVs Ray splits files into blocks, which
    breaks global row numbering — so we read the file list once, assign row
    offsets per file (driver-side metadata pass), and let tasks slice.
    For the fixture scale a single from_arrow is exact and sufficient."""
    import ray.data as rd

    return rd.from_arrow(read_csv_table(path, dialect))
