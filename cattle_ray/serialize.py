"""S7/S9/S10: multi-format RDF serializer registry.

Format surface mirrors the reference (``/root/reference/src/cattle.py:45-53``
``EXTENSION_DICT``, ``:55-63`` ``MIME_TYPE_DICT``, gzip ``:313-319``):
n3, nquads, nt, rdfxml (xml), trig, trix, turtle (ttl), json-ld.

Execution split (SURVEY.md §7.4 "Global serializations"):
- LINE formats (ntriples, nquads) serialize per block — embarrassingly
  parallel, the distributed path for big graphs.
- DOCUMENT formats (turtle/trig need a shared prefix table; rdfxml/trix/
  json-ld need a document envelope) are driver-side collected exports, gated
  to small results — exactly what the reference does anyway
  (``src/cattle.py:308-321`` collects the whole graph per download).
"""

from __future__ import annotations

import gzip as _gzip
import json

import pyarrow as pa

from .model import format_nquads_batch

EXTENSION_DICT = {
    "n3": ".n3", "nquads": ".nq", "nt": ".nt", "rdfxml": ".rdf",
    "trig": ".trig", "trix": ".xml", "turtle": ".ttl", "xml": ".rdf",
    "json-ld": ".jsonld",
}
MIME_TYPE_DICT = {
    "n3": "text/n3", "nquads": "application/n-quads", "nt": "application/n-triples",
    "rdfxml": "application/rdf+xml", "trig": "application/trig",
    "trix": "application/xml", "turtle": "text/turtle", "xml": "application/rdf+xml",
    "json-ld": "application/ld+json",
}
LINE_FORMATS = {"nquads", "nt"}


def _xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;").replace('"', "&quot;")
    )


def _rows(table: pa.Table):
    return table.to_pylist()


import re as _re

_PN_LOCAL_RE = _re.compile(r"^[A-Za-z0-9_][A-Za-z0-9_.\-]*$")


def _build_prefix_table(table: pa.Table, max_prefixes: int = 16) -> dict[str, str]:
    """Frequency-ranked namespace → prefix-label table (driver-side global
    state — this is exactly why turtle is a collected, not per-block, format;
    SURVEY.md §7.4). A namespace qualifies when splitting at the last '#'/'/'
    leaves a turtle-safe local name."""
    from collections import Counter

    counts: Counter = Counter()

    def visit(iri: str | None):
        if not iri:
            return
        cut = max(iri.rfind("#"), iri.rfind("/")) + 1
        ns, local = iri[:cut], iri[cut:]
        if ns and local and _PN_LOCAL_RE.match(local):
            counts[ns] += 1

    for r in _rows(table):
        visit(r["subj"])
        visit(r["pred"])
        if r["obj_is_iri"]:
            visit(r["obj"])
        visit(r.get("obj_datatype"))
    ranked = [ns for ns, c in counts.most_common(max_prefixes) if c >= 2]
    return {ns: f"ns{i}" for i, ns in enumerate(sorted(ranked))}


def _term(iri: str, prefixes: dict[str, str]) -> str:
    if iri.startswith("_:"):
        return iri  # blank node label — emitted raw in turtle/n3/trig
    cut = max(iri.rfind("#"), iri.rfind("/")) + 1
    ns, local = iri[:cut], iri[cut:]
    label = prefixes.get(ns)
    if label is not None and local and _PN_LOCAL_RE.match(local):
        return f"{label}:{local}"
    return f"<{iri}>"


def _serialize_turtle(table: pa.Table, prefixes: dict | None = None,
                      header: bool = True) -> str:
    """Turtle with a driver-side @prefix table (frequent namespaces
    compressed; everything else stays a full IRI — always valid)."""
    if prefixes is None:
        prefixes = _build_prefix_table(table)
    out = []
    if header:
        out = [f"@prefix {label}: <{ns}> ."
               for ns, label in sorted(prefixes.items(), key=lambda kv: kv[1])]
        if out:
            out.append("")
    for r in _rows(table):
        s = f"{_term(r['subj'], prefixes)} {_term(r['pred'], prefixes)} "
        if r["obj_is_iri"]:
            s += _term(r["obj"], prefixes)
        else:
            lit = json.dumps(r["obj"])
            if r["obj_datatype"]:
                s += f"{lit}^^{_term(r['obj_datatype'], prefixes)}"
            elif r["obj_lang"]:
                s += f"{lit}@{r['obj_lang']}"
            else:
                s += lit
        out.append(s + " .")
    return "\n".join(out) + "\n"


def _serialize_trig(table: pa.Table) -> str:
    prefixes = _build_prefix_table(table)
    by_graph: dict[str, list] = {}
    for r in _rows(table):
        by_graph.setdefault(r.get("graph") or "", []).append(r)
    parts = []
    hdr = [f"@prefix {label}: <{ns}> ."
           for ns, label in sorted(prefixes.items(), key=lambda kv: kv[1])]
    if hdr:
        parts.append("\n".join(hdr) + "\n")
    for g, rows in sorted(by_graph.items()):
        body = _serialize_turtle(
            pa.Table.from_pylist(rows, schema=table.schema), prefixes, header=False
        )
        if g:
            parts.append(f"<{g}> {{\n{body}}}\n")
        else:
            parts.append(body)
    return "".join(parts)


def _serialize_rdfxml(table: pa.Table) -> str:
    lines = ['<?xml version="1.0" encoding="utf-8"?>',
             '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">']
    for r in _rows(table):
        subj = r["subj"]
        if subj.startswith("_:"):  # blank node → rdf:nodeID, never rdf:about
            lines.append(f'  <rdf:Description rdf:nodeID="{_xml_escape(subj[2:])}">')
        else:
            lines.append(f'  <rdf:Description rdf:about="{_xml_escape(subj)}">')
        pred = r["pred"]
        # split pred into namespace + local name at last # or /
        cut = max(pred.rfind("#"), pred.rfind("/")) + 1
        ns, local = pred[:cut], pred[cut:] or "p"
        if r["obj_is_iri"] and r["obj"].startswith("_:"):
            lines.append(f'    <{local} xmlns="{_xml_escape(ns)}" rdf:nodeID="{_xml_escape(r["obj"][2:])}"/>')
        elif r["obj_is_iri"]:
            lines.append(f'    <{local} xmlns="{_xml_escape(ns)}" rdf:resource="{_xml_escape(r["obj"])}"/>')
        else:
            attrs = f' xmlns="{_xml_escape(ns)}"'
            if r["obj_datatype"]:
                attrs += f' rdf:datatype="{_xml_escape(r["obj_datatype"])}"'
            elif r["obj_lang"]:
                attrs += f' xml:lang="{r["obj_lang"]}"'
            lines.append(f"    <{local}{attrs}>{_xml_escape(r['obj'])}</{local}>")
        lines.append("  </rdf:Description>")
    lines.append("</rdf:RDF>")
    return "\n".join(lines) + "\n"


def _serialize_trix(table: pa.Table) -> str:
    lines = ['<?xml version="1.0" encoding="utf-8"?>',
             '<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/">', "  <graph>"]
    def node(iri: str) -> str:  # trix: blank nodes go in <id>, not <uri>
        if iri.startswith("_:"):
            return f"<id>{_xml_escape(iri[2:])}</id>"
        return f"<uri>{_xml_escape(iri)}</uri>"

    for r in _rows(table):
        lines.append("    <triple>")
        lines.append(f"      {node(r['subj'])}")
        lines.append(f"      <uri>{_xml_escape(r['pred'])}</uri>")
        if r["obj_is_iri"]:
            lines.append(f"      {node(r['obj'])}")
        elif r["obj_datatype"]:
            lines.append(
                f'      <typedLiteral datatype="{_xml_escape(r["obj_datatype"])}">'
                f"{_xml_escape(r['obj'])}</typedLiteral>"
            )
        else:
            lang = f' xml:lang="{r["obj_lang"]}"' if r["obj_lang"] else ""
            lines.append(f"      <plainLiteral{lang}>{_xml_escape(r['obj'])}</plainLiteral>")
        lines.append("    </triple>")
    lines.extend(["  </graph>", "</TriX>"])
    return "\n".join(lines) + "\n"


def _serialize_jsonld(table: pa.Table) -> str:
    nodes: dict[str, dict] = {}
    for r in _rows(table):
        node = nodes.setdefault(r["subj"], {"@id": r["subj"]})
        if r["obj_is_iri"]:
            val = {"@id": r["obj"]}
        else:
            val = {"@value": r["obj"]}
            if r["obj_datatype"]:
                val["@type"] = r["obj_datatype"]
            elif r["obj_lang"]:
                val["@language"] = r["obj_lang"]
        node.setdefault(r["pred"], []).append(val)
    return json.dumps(list(nodes.values()), indent=1, sort_keys=True) + "\n"


_DOC_SERIALIZERS = {
    "turtle": _serialize_turtle,
    "n3": _serialize_turtle,        # our turtle subset is valid N3
    "trig": _serialize_trig,
    "rdfxml": _serialize_rdfxml,
    "xml": _serialize_rdfxml,
    "trix": _serialize_trix,
    "json-ld": _serialize_jsonld,
}

ACCEPTED_FORMATS = sorted(set(_DOC_SERIALIZERS) | LINE_FORMATS)


def serialize_collected(triples_ds_or_table, fmt: str, *, zip_output: bool = False,
                        limit: int | None = 5_000_000) -> bytes:
    """Driver-side export (document formats + small line exports).

    415-equivalent: raises ``ValueError`` on unknown format (mirrors
    ``src/cattle.py:328``). ``zip_output`` gzips the payload
    (``src/cattle.py:313-319``). ``limit`` guards accidental full-corpus
    collection — use the distributed N-Quads sink for big graphs.
    """
    if fmt not in ACCEPTED_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; accepted: {ACCEPTED_FORMATS}")
    if isinstance(triples_ds_or_table, pa.Table):
        table = triples_ds_or_table
    else:
        ds = triples_ds_or_table
        if limit is not None:
            ds = ds.limit(limit)
        table = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
    if fmt in LINE_FORMATS:
        lines = format_nquads_batch(table, include_graph=(fmt == "nquads"))
        payload = ("\n".join(lines["line"].to_pylist()) + "\n").encode("utf-8")
    else:
        payload = _DOC_SERIALIZERS[fmt](table).encode("utf-8")
    if zip_output:
        payload = _gzip.compress(payload, mtime=0)  # mtime=0: deterministic bytes
    return payload
