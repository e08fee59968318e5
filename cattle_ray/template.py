"""CSVW mapping-template dialect: parse, validate, precompile, vectorized render.

Implements the "program" dialect evidenced in the reference's ruminator editor
(SURVEY.md §1.2; ``/root/reference/src/static/ruminator/js/ruminator.js:174,
200-261,288-292,317-363``, ``src/templates/ruminator.html:114-182``):

- dataset-level ``dialect`` / ``aboutUrl``;
- ``tableSchema.columns[]``: regular columns (name, datatype, lang,
  propertyUrl, valueUrl) and virtual columns (virtual=true, aboutUrl,
  propertyUrl, valueUrl | csvw:value);
- ``{column}`` / ``{_row}`` URI-template substitution with IRI
  percent-encoding (SURVEY.md M3/F6);
- datatype auto-prefixing ``xsd:`` (ruminator.js:337-340) and lang tags only
  for string datatypes (ruminator.js:200-208);
- per-column ``csvw:format.groupChar`` thousands-separator stripping before
  numeric cast (SURVEY.md F4 — exercised by ``data/imf.csv:2-9``), ``null``
  value lists, ``default``, ``separator`` for multi-valued cells.

Templates are compiled ONCE on the driver into literal/column segments and
rendered per batch with ``pyarrow.compute`` kernels — no per-row Python in the
hot path. IRI-encoding takes a fast path: a vectorized regex finds the (rare)
values containing reserved characters and only those round-trip through
``urllib.parse.quote``.
"""

from __future__ import annotations

import ast
import re
from dataclasses import dataclass, field
from urllib.parse import quote

import pyarrow as pa
import pyarrow.compute as pc

from .model import XSD

_PLACEHOLDER_RE = re.compile(r"\{([^{}]+)\}")
_EXPR_RE = re.compile(r"\{\{(.+?)\}\}", re.DOTALL)
# Characters safe inside an IRI path/query segment substitution (RFC 3986/3987
# unreserved + sub-delims commonly kept by csv2rdf implementations).
_IRI_SAFE = "-._~!$&'()*+,;=:@"
_NEEDS_ENC_RE = re.compile(r"[^A-Za-z0-9\-._~!$&'()*+,;=:@]")

_NUMERIC_XSD = {
    XSD + t
    for t in (
        "decimal integer int long short byte float double "
        "nonNegativeInteger positiveInteger negativeInteger nonPositiveInteger "
        "unsignedInt unsignedLong unsignedShort unsignedByte"
    ).split()
}
_STRING_XSD = {XSD + "string", None}


def resolve_datatype(dt: str | None) -> str | None:
    """``xsd:decimal`` → full XSD IRI; bare names auto-prefixed
    (ruminator.js:337-352 'accept all datatypes from json')."""
    if dt is None:
        return None
    if dt.startswith("xsd:"):
        return XSD + dt[4:]
    if dt.startswith("http://") or dt.startswith("https://"):
        return dt
    return XSD + dt


def iri_encode_array(arr: pa.Array) -> pa.Array:
    """Percent-encode IRI-unsafe characters in substituted values (F6).

    Vectorized fast path: only values matching the unsafe-char regex are
    encoded via Python; clean values pass through untouched.
    """
    arr = pc.cast(arr, pa.string())
    mask = pc.fill_null(pc.match_substring_regex(arr, _NEEDS_ENC_RE.pattern), False)
    if not pc.any(mask).as_py():
        return arr
    out = [
        (quote(v, safe=_IRI_SAFE) if m else v)
        for v, m in zip(arr.to_pylist(), mask.to_pylist())
    ]
    return pa.array(out, pa.string())


class SafeExpr:
    """A COW-style ``{{ }}`` template expression, compiled once on the
    driver and evaluated per row (expressions are the documented
    NON-vectorized slow path — the common ``{column}`` forms stay on the
    pyarrow kernels).

    The expression language is a whitelisted Python subset validated by AST
    walk before compilation: literals, column names (plus ``_row``),
    arithmetic/comparison/boolean operators, the conditional
    ``X if COND else Y``, ``in``/``not in``, subscripts/slices, calls to a
    small builtin set (``str int float len abs min max round``) and to
    non-underscore string methods (``lower/upper/strip/replace/zfill/…``).
    Anything else — attributes starting with ``_`` (dunder sandbox
    escapes), lambdas, comprehensions, assignments, imports — is rejected
    at compile time with the offending node named. An expression
    evaluating to ``None`` (e.g. ``x if cond else None``) renders the whole
    template NULL for that row → the triple is skipped (the COW
    conditional-skip idiom); runtime errors (bad int cast, index error)
    also yield NULL rather than poisoning the batch."""

    _BUILTINS = {"str": str, "int": int, "float": float, "len": len,
                 "abs": abs, "min": min, "max": max, "round": round}
    _METHODS = frozenset(
        "lower upper strip lstrip rstrip title capitalize swapcase replace "
        "zfill startswith endswith split rsplit join ljust rjust find rfind "
        "removeprefix removesuffix format count index isdigit isalpha "
        "isalnum isspace".split())
    _NODES = (
        ast.Expression, ast.BoolOp, ast.BinOp, ast.UnaryOp, ast.IfExp,
        ast.Compare, ast.Call, ast.Name, ast.Load, ast.Constant,
        ast.Subscript, ast.Slice, ast.Attribute, ast.Tuple, ast.List,
        ast.And, ast.Or, ast.Not, ast.USub, ast.UAdd,
        ast.Add, ast.Sub, ast.Mult, ast.Div, ast.FloorDiv, ast.Mod,
        ast.Eq, ast.NotEq, ast.Lt, ast.LtE, ast.Gt, ast.GtE,
        ast.In, ast.NotIn, ast.Is, ast.IsNot,
    )

    def __init__(self, source: str):
        self.source = source
        try:
            tree = ast.parse(source.strip(), mode="eval")
        except SyntaxError as e:
            raise ValueError(
                f"invalid {{{{ }}}} template expression {source!r}: {e}")
        names: set[str] = set()
        for node in ast.walk(tree):
            if not isinstance(node, self._NODES):
                raise ValueError(
                    f"{{{{ }}}} expression {source!r}: "
                    f"{type(node).__name__} is not allowed")
            if isinstance(node, ast.Attribute):
                if node.attr.startswith("_") or node.attr not in self._METHODS:
                    raise ValueError(
                        f"{{{{ }}}} expression {source!r}: method "
                        f".{node.attr} is not allowed")
            if isinstance(node, ast.Name):
                if node.id.startswith("_") and node.id != "_row":
                    raise ValueError(
                        f"{{{{ }}}} expression {source!r}: name "
                        f"{node.id!r} is not allowed")
                if node.id not in self._BUILTINS:
                    names.add(node.id)
        self.names = frozenset(names)
        self._code = compile(tree, f"<template {source!r}>", "eval")

    def __call__(self, row: dict):
        env = dict(self._BUILTINS)
        env.update(row)
        try:
            return eval(self._code, {"__builtins__": {}}, env)  # noqa: S307
        except Exception:
            return None  # bad cast / index on one row → null, not a crash

    # dataclass-frozen CompiledTemplate holds these in tuples
    def __hash__(self):
        return hash(self.source)

    def __eq__(self, other):
        return isinstance(other, SafeExpr) and other.source == self.source


@dataclass(frozen=True)
class CompiledTemplate:
    """A URI/value template precompiled into alternating literal and column
    segments. ``segments``: str = literal, ``("col", name)`` = column ref."""

    source: str
    segments: tuple = ()
    columns: tuple = ()

    @staticmethod
    def compile(tmpl: str) -> "CompiledTemplate":
        segs: list = []
        cols: list[str] = []

        def compile_plain(chunk: str):
            pos = 0
            for m in _PLACEHOLDER_RE.finditer(chunk):
                if m.start() > pos:
                    segs.append(chunk[pos : m.start()])
                name = m.group(1)
                segs.append(("col", name))
                cols.append(name)
                pos = m.end()
            if pos < len(chunk):
                segs.append(chunk[pos:])

        # {{ expr }} segments first (the inner braces would confuse the
        # single-brace placeholder scan), plain {column} scan between them
        pos = 0
        for m in _EXPR_RE.finditer(tmpl):
            if m.start() > pos:
                compile_plain(tmpl[pos : m.start()])
            expr = SafeExpr(m.group(1))
            segs.append(("expr", expr))
            cols.extend(n for n in expr.names if n != "_row")
            pos = m.end()
        if pos < len(tmpl):
            compile_plain(tmpl[pos:])
        return CompiledTemplate(tmpl, tuple(segs), tuple(cols))

    @property
    def is_constant(self) -> bool:
        return not self.columns and all(
            isinstance(s, str) for s in self.segments)

    def render(self, batch: pa.Table, *, encode: bool = True, n: int | None = None) -> pa.Array:
        """Vectorized render over a batch → string array of length len(batch).

        Column refs resolve against batch columns (cast to string; ``{_row}``
        is just a column named ``_row`` — SURVEY.md §2.9 row-determinism).
        """
        n = len(batch) if n is None else n
        if self.is_constant:
            return pa.array([self.source] * n, pa.string())
        parts = []
        for seg in self.segments:
            if isinstance(seg, str):
                parts.append(seg)
            elif seg[0] == "expr":
                expr: SafeExpr = seg[1]
                missing = [n for n in expr.names
                           if n not in batch.column_names]
                if missing:
                    raise KeyError(
                        f"template {self.source!r} references missing "
                        f"column(s) {missing!r}")
                series = {n: batch[n].to_pylist() for n in expr.names}
                vals = [expr({n: s[i] for n, s in series.items()})
                        for i in range(n)]
                col = pa.array(
                    [None if v is None else str(v) for v in vals],
                    pa.string())
                if encode:
                    col = iri_encode_array(col)
                # None result stays NULL: it propagates through the join
                # (emit_null) so the whole rendered value is null → the
                # conversion skips the triple (COW conditional-skip)
                parts.append(col)
            else:
                name = seg[1]
                if name not in batch.column_names:
                    raise KeyError(
                        f"template {self.source!r} references missing column {name!r}"
                    )
                col = pc.cast(batch[name], pa.string())
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                # data columns are IRI-encoded (F6); context columns injected
                # by the engine (underscore-prefixed: _url, _row, _tbl) are
                # already IRI-shaped and substitute raw
                if encode and not name.startswith("_"):
                    col = iri_encode_array(col)
                # null cell inside a URI template renders as empty string
                col = pc.fill_null(col, "")
                parts.append(col)
        parts.append("")  # separator arg
        return pc.binary_join_element_wise(*parts)


@dataclass(frozen=True)
class ColumnSpec:
    """One ``tableSchema.columns[]`` entry, precompiled."""

    name: str | None
    virtual: bool
    datatype: str | None          # resolved full IRI or None
    lang: str | None
    about_url: CompiledTemplate | None   # virtual columns may override subject
    property_url: CompiledTemplate
    value_url: CompiledTemplate | None   # object-as-IRI
    csvw_value: CompiledTemplate | None  # virtual-column literal object
    null_values: tuple = ()
    default: str | None = None
    separator: str | None = None
    group_char: str | None = None
    collection: bool = False  # csvw:collectionUrl → RDF list (rdf:first/rest)


@dataclass(frozen=True)
class MappingTemplate:
    """A full validated CSVW metadata document (the conversion program)."""

    about_url: CompiledTemplate
    columns: tuple
    dialect: dict = field(default_factory=dict)
    base: str = ""

    @staticmethod
    def from_dict(meta: dict) -> "MappingTemplate":
        base = meta.get("@id", "https://example.org/table")
        dialect = dict(meta.get("dialect") or {})
        about = CompiledTemplate.compile(meta.get("aboutUrl") or (base + "/row/{_row}"))
        cols = []
        for c in (meta.get("tableSchema") or {}).get("columns", []):
            virtual = bool(c.get("virtual"))
            dt = resolve_datatype(c.get("datatype"))
            lang = c.get("lang")
            # lang tags only make sense for string datatypes (ruminator.js:200-208)
            if dt not in _STRING_XSD:
                lang = None
            prop = c.get("propertyUrl")
            if prop is None:
                prop = f"{base}#{c.get('name', 'col')}"
            fmt = c.get("csvw:format") or c.get("format") or {}
            group_char = fmt.get("groupChar") if isinstance(fmt, dict) else None
            nulls = c.get("null", [])
            if isinstance(nulls, str):
                nulls = [nulls]
            cols.append(
                ColumnSpec(
                    name=c.get("name"),
                    virtual=virtual,
                    datatype=dt,
                    lang=lang,
                    about_url=(
                        CompiledTemplate.compile(c["aboutUrl"]) if c.get("aboutUrl") else None
                    ),
                    property_url=CompiledTemplate.compile(prop),
                    value_url=(
                        CompiledTemplate.compile(c["valueUrl"]) if c.get("valueUrl") else None
                    ),
                    csvw_value=(
                        CompiledTemplate.compile(c["csvw:value"])
                        if c.get("csvw:value") is not None
                        else None
                    ),
                    null_values=tuple(nulls),
                    default=c.get("default"),
                    separator=c.get("separator"),
                    group_char=group_char,
                    collection=bool(c.get("csvw:collectionUrl")),
                )
            )
        return MappingTemplate(about_url=about, columns=tuple(cols), dialect=dialect, base=base)


def format_literal_array(arr: pa.Array, spec: ColumnSpec) -> tuple[pa.Array, pa.Array]:
    """Lexical cell values → canonical literal lexical forms for the column's
    datatype (SURVEY.md M2/F4). Returns ``(formatted, valid_mask)``.

    - numeric datatypes: strip ``groupChar`` (``131,063`` → ``131063``) then
      validate via Arrow cast; cells that fail the cast keep their original
      lexical form (COW-style lexical preservation, SURVEY.md §7.4) and are
      still emitted — ``valid_mask`` tracks castability for diagnostics only.
    - other datatypes: lexical passthrough.
    """
    arr = pc.cast(arr, pa.string())
    if spec.group_char and spec.datatype in _NUMERIC_XSD:
        arr = pc.replace_substring(arr, pattern=spec.group_char, replacement="")
    if spec.datatype in _NUMERIC_XSD:
        # vectorized lexical validation (a cast would raise on first bad cell)
        if spec.datatype in {XSD + "integer", XSD + "int", XSD + "long"}:
            pat = r"^[+-]?[0-9]+$"
        else:
            pat = r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?$"
        ok = pc.fill_null(pc.match_substring_regex(arr, pat), False)
        return arr, ok
    return arr, pc.is_valid(arr)
