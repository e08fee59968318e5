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
import pyarrow.compute as pc
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
        [pc.cast(tbl[c], pa.string()) for c in tbl.column_names],
        names=tbl.column_names,
    )
    return tbl.append_column("_row", pa.array(range(1, tbl.num_rows + 1), pa.int64()))


def read_csv_dataset(path: str, dialect: dict | None = None):
    """Ray Dataset form of a single CSV (exact ``_row``). For many files use
    :func:`read_csv_dataset_many`."""
    import ray.data as rd

    return rd.from_arrow(read_csv_table(path, dialect))


def read_csv_dataset_many(paths: list[str], dialect: dict | None = None):
    """Multi-file CSV corpus with EXACT global 1-based ``_row`` numbering:

    1. a parallel metadata pass counts data rows per file (Ray tasks);
    2. cumulative offsets are assigned in the given file order (the corpus's
       canonical order — determinism contract SURVEY.md §2.9);
    3. each file is parsed in its own task with its offset baked in.

    Blocks = one per file; at scale feed file groups instead of single small
    files. Row numbering never depends on block arrival order.
    """
    import ray
    import ray.data as rd

    @ray.remote
    def count_rows(p: str) -> int:
        d = dialect or {}
        delim = d.get("delimiter", ",")
        if str(p).endswith(".tsv") and "delimiter" not in d:
            delim = "\t"
        parse = pacsv.ParseOptions(delimiter=delim, quote_char=d.get("quoteChar", '"'))
        tbl = pacsv.read_csv(
            p, parse_options=parse,
            read_options=pacsv.ReadOptions(encoding=d.get("encoding", "utf-8")),
        )
        return tbl.num_rows

    counts = ray.get([count_rows.remote(p) for p in paths])
    offsets = []
    acc = 0
    for c in counts:
        offsets.append(acc)
        acc += c

    meta = rd.from_items(
        [{"path": p, "offset": o} for p, o in zip(paths, offsets)]
    ).repartition(len(paths))

    def parse_file(batch: pa.Table) -> pa.Table:
        tables = []
        for p, off in zip(batch["path"].to_pylist(), batch["offset"].to_pylist()):
            t = read_csv_table(p, dialect)
            rows = pa.array(range(off + 1, off + t.num_rows + 1), pa.int64())
            t = t.set_column(t.column_names.index("_row"), "_row", rows)
            tables.append(t)
        return pa.concat_tables(tables) if tables else pa.table({})

    return meta.map_batches(parse_file, batch_format="pyarrow", batch_size=1)
