"""Triple/quad data model and N-Quads (de)serialization.

The engine's atom is the RDF quad, stored columnar (Arrow) per FIXTURES.md §5:

    subj:string, pred:string, obj:string, obj_is_iri:bool,
    obj_datatype:string?, obj_lang:string?, graph:string, src_url:string?

Design notes (vs reference semantics):
- The reference materializes whole graphs in memory via rdflib
  (``/root/reference/src/cattle.py:308-309``). Here a "graph" is just a
  Dataset of quad rows — set semantics are restored by the dedup stage
  (SURVEY.md D2), serialization is a per-block vectorized map (SURVEY.md S7).
- rdflib is not available in this environment (SURVEY.md §7.5), so the
  N-Quads emitter/parser below is our own, line-oriented and therefore
  embarrassingly parallel.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

#: Arrow schema of the primary triple sink (FIXTURES.md §5).
TRIPLE_SCHEMA = pa.schema(
    [
        pa.field("subj", pa.string()),
        pa.field("pred", pa.string()),
        pa.field("obj", pa.string()),
        pa.field("obj_is_iri", pa.bool_()),
        pa.field("obj_datatype", pa.string()),
        pa.field("obj_lang", pa.string()),
        pa.field("graph", pa.string()),
        pa.field("src_url", pa.string()),
    ]
)

#: Columns that define quad identity for P/R comparison (graph carries the
#: run timestamp and is excluded — FIXTURES.md §5).
QUAD_KEY = ["subj", "pred", "obj", "obj_is_iri", "obj_datatype", "obj_lang"]


def empty_triples() -> pa.Table:
    return TRIPLE_SCHEMA.empty_table()


def triples_table(
    subj: pa.Array,
    pred: pa.Array,
    obj: pa.Array,
    obj_is_iri: pa.Array,
    obj_datatype: pa.Array,
    obj_lang: pa.Array,
    graph: pa.Array,
    src_url: pa.Array,
) -> pa.Table:
    return pa.Table.from_arrays(
        [subj, pred, obj, obj_is_iri, obj_datatype, obj_lang, graph, src_url],
        schema=TRIPLE_SCHEMA,
    )


# ---------------------------------------------------------------------------
# N-Triples/N-Quads string escaping — vectorized over Arrow string arrays.
# Escape order matters: backslash first.
_ESCAPES = [("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"), ("\r", "\\r"), ("\t", "\\t")]
_UNESCAPES = [("\\t", "\t"), ("\\r", "\r"), ("\\n", "\n"), ('\\"', '"'), ("\\\\", "\\")]


def escape_literal_array(arr: pa.Array) -> pa.Array:
    for src, dst in _ESCAPES:
        arr = pc.replace_substring(arr, pattern=src, replacement=dst)
    return arr


def unescape_literal(s: str) -> str:
    # Single-pass to avoid double-unescaping "\\n" → newline.
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            nxt = s[i + 1]
            mapped = {"\\": "\\", '"': '"', "n": "\n", "r": "\r", "t": "\t"}.get(nxt)
            if mapped is not None:
                out.append(mapped)
                i += 2
                continue
        out.append(c)
        i += 1
    return "".join(out)


def format_nquads_batch(batch: pa.Table, include_graph: bool = True) -> pa.Table:
    """Vectorized quad-rows → one N-Quads line per row (column ``line``).

    Mirrors the reference's N-Quads output contract
    (``/root/reference/src/cattle.py:301,308-309`` — its ``.nq`` files must
    re-parse), but computed per block instead of via an in-memory graph.
    """
    n = len(batch)
    if n == 0:
        return pa.table({"line": pa.array([], pa.string())})
    subj = batch["subj"]
    pred = batch["pred"]
    obj = batch["obj"]
    is_iri = batch["obj_is_iri"]
    dt = batch["obj_datatype"]
    lang = batch["obj_lang"]

    # object term: <iri>  |  "lit"^^<dt>  |  "lit"@lang  |  "lit"
    esc = escape_literal_array(pc.cast(obj, pa.string()))
    quoted = pc.binary_join_element_wise('"', esc, '"', "")
    with_dt = pc.binary_join_element_wise(quoted, "^^<", pc.cast(dt, pa.string()), ">", "")
    with_lang = pc.binary_join_element_wise(quoted, "@", pc.cast(lang, pa.string()), "")
    lit = pc.if_else(pc.is_valid(dt), with_dt, pc.if_else(pc.is_valid(lang), with_lang, quoted))
    iri_obj = pc.binary_join_element_wise("<", pc.cast(obj, pa.string()), ">", "")
    obj_term = pc.if_else(is_iri, iri_obj, lit)

    # blank-node terms (`_:label`) are emitted raw, never <>-wrapped
    def _subj_or_bnode(arr):
        wrapped = pc.binary_join_element_wise("<", arr, ">", "")
        is_bnode = pc.starts_with(arr, "_:")
        return pc.if_else(is_bnode, arr, wrapped)

    obj_term = pc.if_else(
        pc.and_(is_iri, pc.fill_null(pc.starts_with(pc.cast(obj, pa.string()), "_:"), False)),
        pc.cast(obj, pa.string()),
        obj_term,
    )
    parts = [
        _subj_or_bnode(subj),
        pc.binary_join_element_wise("<", pred, ">", ""),
        obj_term,
    ]
    if include_graph and "graph" in batch.column_names:
        g = batch["graph"]
        gterm = pc.if_else(
            pc.is_valid(g), pc.binary_join_element_wise("<", g, ">", ""), pa.scalar(None, pa.string())
        )
        # join skips nulls only with null_handling; emit triple-form when graph null
        line4 = pc.binary_join_element_wise(parts[0], parts[1], parts[2], gterm, ".", " ")
        line3 = pc.binary_join_element_wise(parts[0], parts[1], parts[2], ".", " ")
        line = pc.if_else(pc.is_valid(g), line4, line3)
    else:
        line = pc.binary_join_element_wise(parts[0], parts[1], parts[2], ".", " ")
    return pa.table({"line": line})


_NQ_RE = re.compile(
    r"^\s*(?:<(?P<s>[^>]*)>|(?P<s_bn>_:[A-Za-z0-9_]+))\s+<(?P<p>[^>]*)>\s+"
    r"(?:<(?P<o_iri>[^>]*)>|(?P<o_bn>_:[A-Za-z0-9_]+)|\"(?P<o_lit>(?:[^\"\\]|\\.)*)\""
    r"(?:\^\^<(?P<dt>[^>]*)>|@(?P<lang>[A-Za-z0-9-]+))?)"
    r"(?:\s+<(?P<g>[^>]*)>)?\s*\.\s*$"
)


def parse_nquads_lines(lines: list[str], src_url: str | None = None) -> pa.Table:
    """Parse N-Quads lines → quad table (SURVEY.md S6 — generalizes the
    reference's rdflib re-parse at ``src/cattle.py:308-309`` per block)."""
    cols: dict[str, list] = {k: [] for k in TRIPLE_SCHEMA.names}
    for ln in lines:
        if not ln.strip() or ln.lstrip().startswith("#"):
            continue
        m = _NQ_RE.match(ln)
        if not m:
            raise ValueError(f"invalid N-Quads line: {ln!r}")
        d = m.groupdict()
        cols["subj"].append(d["s"] if d["s"] is not None else d["s_bn"])
        cols["pred"].append(d["p"])
        if d["o_iri"] is not None or d["o_bn"] is not None:
            cols["obj"].append(d["o_iri"] if d["o_iri"] is not None else d["o_bn"])
            cols["obj_is_iri"].append(True)
            cols["obj_datatype"].append(None)
            cols["obj_lang"].append(None)
        else:
            cols["obj"].append(unescape_literal(d["o_lit"]))
            cols["obj_is_iri"].append(False)
            cols["obj_datatype"].append(d["dt"])
            cols["obj_lang"].append(d["lang"])
        cols["graph"].append(d["g"])
        cols["src_url"].append(src_url)
    return pa.Table.from_pydict(cols, schema=TRIPLE_SCHEMA)
