"""Turtle READER — the input half of the engine's turtle serializer
(``serialize.py``) and the natural way to load an ontology for
:func:`~..stages.reason.rdfs_materialize`.

Scope and scale contract: Turtle is NOT line-splittable (a statement
spans lines, prefixes scope the whole document), so this reader is
DRIVER-side and meant for vocabulary-sized documents — ontologies,
schema files, prefix catalogs. It refuses documents above a row guard
rather than quietly becoming a single-process bottleneck; corpus-scale
RDF belongs in line-based N-Quads/N-Triples (``sources/nquads.py``, one
task per file chunk) or the partitioned Parquet store.

Grammar (the serializer's output plus the common hand-written forms):
``@prefix`` / SPARQL-style ``PREFIX``, full IRIs and prefixed names,
``a`` ≡ rdf:type, ``;`` / ``,`` abbreviations, blank node LABELS
(``_:b`` — kept as-is, a document-scoped resource id), string literals
with ``^^datatype`` / ``@lang`` (escapes per the shared SPARQL
unescaper), numeric literals (lexical form kept; datatype inferred
xsd:integer/decimal/double), booleans. Rejected with the reason:
``@base``/relative IRIs, anonymous ``[]`` nodes, collections ``( )``
— none of which the serializer emits.

Reuses the SPARQL front-end's tokenizer/term machinery
(``stages/sparql.py``) — one grammar stack for the whole text surface.
"""

from __future__ import annotations

import pyarrow as pa

from ..stages.sparql import (RDF_TYPE, SparqlSyntaxError, _Parser,
                             _unescape)

_XSD = "http://www.w3.org/2001/XMLSchema#"

#: driver-side reader guard — see the module docstring
MAX_TURTLE_ROWS = 1_000_000


class TurtleError(ValueError):
    """Raised for documents outside the supported Turtle subset."""


class _TurtleParser(_Parser):
    def parse_document(self):
        rows = []
        while self.peek()[0] != "EOF":
            self._directive_or_triples(rows)
            if len(rows) > MAX_TURTLE_ROWS:
                raise TurtleError(
                    f"more than {MAX_TURTLE_ROWS} triples — this reader "
                    "is driver-side and vocabulary-sized by design; use "
                    "read_nquads or the Parquet store for corpus data")
        return rows

    def _directive_or_triples(self, rows):
        k, v = self.peek()
        if k == "LANG" and v.lower() == "@prefix":
            self.next()
            kk, vv = self.next()
            if kk != "PNAME" or not vv.endswith(":"):
                raise TurtleError(f"bad @prefix name {vv!r}")
            ik, iv = self.next()
            if ik != "IRI":
                raise TurtleError(f"bad @prefix iri {iv!r}")
            self.prefixes[vv[:-1]] = iv[1:-1]
            self.eat_op(".")
            return
        if k == "LANG" and v.lower() == "@base":
            raise TurtleError(
                "@base / relative IRIs are not supported — emit full "
                "IRIs (the engine's serializer always does)")
        if k == "NAME" and v.upper() == "PREFIX":
            self.next()
            kk, vv = self.next()
            if kk != "PNAME" or not vv.endswith(":"):
                raise TurtleError(f"bad PREFIX name {vv!r}")
            ik, iv = self.next()
            if ik != "IRI":
                raise TurtleError(f"bad PREFIX iri {iv!r}")
            self.prefixes[vv[:-1]] = iv[1:-1]
            return
        self._triples(rows)
        self.eat_op(".")

    def _resource(self) -> str:
        k, v = self.peek()
        if k == "BNODE":
            self.next()
            return v  # document-scoped label, kept verbatim
        if self.at_op("["):
            raise TurtleError(
                "anonymous [] nodes are not supported — label your "
                "blank nodes (_:b)")
        if self.at_op("("):
            raise TurtleError("RDF collections ( ) are not supported")
        return self.iri()

    def _object(self):
        """→ (lexical, is_iri, datatype, lang)."""
        k, v = self.peek()
        if k in ("IRI", "PNAME", "BNODE") or (k == "NAME" and v == "a"):
            return (self._resource(), True, None, None)
        if self.at_op("[", "("):
            return (self._resource(), True, None, None)  # raises
        if k == "STRING":
            self.next()
            lex = _unescape(v[1:-1])
            nk, nv = self.peek()
            if nk == "OP" and nv == "^^":
                self.next()
                return (lex, False, self.iri(), None)
            if nk == "LANG":
                self.next()
                return (lex, False, None, nv[1:])
            return (lex, False, None, None)
        if k == "NUM":
            self.next()
            if "e" in v.lower():
                dt = _XSD + "double"
            elif "." in v:
                dt = _XSD + "decimal"
            else:
                dt = _XSD + "integer"
            return (v, False, dt, None)
        if k == "NAME" and v.lower() in ("true", "false"):
            self.next()
            return (v.lower(), False, _XSD + "boolean", None)
        raise TurtleError(f"expected an object term, got {v!r}")

    def _triples(self, rows):
        s = self._resource()
        while True:
            k, v = self.peek()
            if k == "NAME" and v == "a":
                self.next()
                p = RDF_TYPE
            else:
                p = self.iri()
            while True:
                o, is_iri, dt, lang = self._object()
                rows.append((s, p, o, is_iri, dt, lang))
                if self.at_op(","):
                    self.next()
                    continue
                break
            if self.at_op(";"):
                self.next()
                if self.at_op(".") or self.peek()[0] == "EOF":
                    break
                continue
            break


def parse_turtle(text: str) -> pa.Table:
    """Turtle document → triple Table with the engine's annotation
    columns (``subj pred obj obj_is_iri obj_datatype obj_lang`` — the
    same shape the converters emit and the serializer consumes, so
    ``parse_turtle(serialize(t))`` round-trips)."""
    try:
        rows = _TurtleParser(text).parse_document()
    except SparqlSyntaxError as e:  # shared tokenizer/term errors
        raise TurtleError(str(e)) from e
    cols = list(zip(*rows)) if rows else [[], [], [], [], [], []]
    return pa.table({
        "subj": pa.array(cols[0], pa.string()),
        "pred": pa.array(cols[1], pa.string()),
        "obj": pa.array(cols[2], pa.string()),
        "obj_is_iri": pa.array(cols[3], pa.bool_()),
        "obj_datatype": pa.array(cols[4], pa.string()),
        "obj_lang": pa.array(cols[5], pa.string()),
    })


def read_turtle(path: str) -> pa.Table:
    """Read one Turtle file (driver-side, vocabulary-sized — see module
    docstring). Gzip transparently by extension."""
    if path.endswith(".gz"):
        import gzip

        with gzip.open(path, "rt", encoding="utf-8") as f:
            return parse_turtle(f.read())
    with open(path, encoding="utf-8") as f:
        return parse_turtle(f.read())
