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


def sniff_encoding(raw: bytes) -> str:
    """BOM + UTF-8-validity encoding heuristic (the reference's build path
    ships ``chardet``, ``/root/reference/src/requirements.txt:2``; this
    container has no chardet, and for the CSV shapes that matter the
    decision tree is deterministic): a BOM wins outright; else bytes that
    decode as strict UTF-8 are UTF-8 (ASCII is a subset); else latin-1 —
    the classic single-byte fallback that maps every byte, so ``build``
    never crashes on legacy-encoded files (the metadata records the choice
    and the convert-path reader honors it, ``csv_source.py``)."""
    if raw.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig"
    if raw.startswith(b"\xff\xfe"):
        return "utf-16"
    if raw.startswith(b"\xfe\xff"):
        return "utf-16"
    try:
        raw.decode("utf-8", errors="strict")
        return "utf-8"
    except UnicodeDecodeError:
        return "latin-1"


def infer_metadata(csv_path: str, base: str | None = None, sample_lines: int = 100) -> dict:
    import csv as _csv
    import os

    base = base or f"https://example.org/{os.path.basename(csv_path)}"
    with open(csv_path, "rb") as fb:
        raw = fb.read(1 << 20)  # 1 MB head is plenty for a dialect sniff
    encoding = sniff_encoding(raw)
    with open(csv_path, encoding=encoding) as f:
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
        "dialect": {"delimiter": delim, "quoteChar": '"', "encoding": encoding},
        "aboutUrl": f"{base}/row/{{_row}}",
        "tableSchema": {"columns": columns},
    }
