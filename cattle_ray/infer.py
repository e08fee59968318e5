"""M5: schema inference — CSV → inferred CSVW metadata JSON ("build" mode).

The reference delegates this to ``COW(mode='build')``
(``/root/reference/src/cattle.py:205-210``); the output contract it relies on
is just "a metadata JSON in the ruminator dialect pointing at the CSV"
(``:208-210`` reads ``<csv>-metadata.json``). This implementation sniffs the
dialect from the file head and assigns per-column defaults:

- delimiter: the candidate (``, ; \\t |``) with the most consistent count
  across the first lines;
- all-integer column → ``xsd:integer``;
- integers with ``,`` thousands separators → ``xsd:decimal`` +
  ``csvw:format.groupChar`` (the imf fixture shape, ``data/imf.csv:2-9``);
- decimal-looking → ``xsd:decimal``; everything else → ``xsd:string``;
- one ``propertyUrl`` per column under the base namespace, default
  ``aboutUrl`` ``<base>/row/{_row}`` (COW's default row-subject shape).
"""

from __future__ import annotations

import re

_DELIMS = [",", ";", "\t", "|"]
_INT_RE = re.compile(r"^[+-]?[0-9]+$")
_GROUPED_RE = re.compile(r"^[+-]?[0-9]{1,3}(,[0-9]{3})+$")
_DEC_RE = re.compile(r"^[+-]?([0-9]+\.[0-9]*|\.[0-9]+)$")


def sniff_delimiter(lines: list[str]) -> str:
    best, best_score = ",", -1.0
    for d in _DELIMS:
        counts = [ln.count(d) for ln in lines if ln.strip()]
        if not counts or min(counts) == 0:
            continue
        # consistent and plentiful wins
        score = min(counts) - (max(counts) - min(counts))
        if score > best_score:
            best, best_score = d, score
    return best


def infer_column(values: list[str]) -> dict:
    vals = [v for v in values if v not in ("", None)]
    if vals and all(_INT_RE.match(v) for v in vals):
        return {"datatype": "xsd:integer"}
    if vals and all(_GROUPED_RE.match(v) or _INT_RE.match(v) for v in vals):
        return {"datatype": "xsd:decimal", "csvw:format": {"groupChar": ","}}
    if vals and all(_DEC_RE.match(v) or _INT_RE.match(v) for v in vals):
        return {"datatype": "xsd:decimal"}
    return {"datatype": "xsd:string"}


def infer_metadata(csv_path: str, base: str | None = None, sample_lines: int = 100) -> dict:
    import csv as _csv
    import os

    base = base or f"https://example.org/{os.path.basename(csv_path)}"
    with open(csv_path, encoding="utf-8") as f:
        head = [next(f, "") for _ in range(sample_lines)]
    head = [ln for ln in head if ln]
    delim = sniff_delimiter(head)
    rows = list(_csv.reader(head, delimiter=delim))
    header, data = rows[0], rows[1:]
    columns = []
    for i, name in enumerate(header):
        vals = [r[i] for r in data if i < len(r)]
        spec = {"name": name, "propertyUrl": f"{base}#{name}"}
        spec.update(infer_column(vals))
        columns.append(spec)
    return {
        "@id": base,
        "dialect": {"delimiter": delim, "quoteChar": '"', "encoding": "utf-8"},
        "aboutUrl": f"{base}/row/{{_row}}",
        "tableSchema": {"columns": columns},
    }
