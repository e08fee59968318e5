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

import re
from dataclasses import dataclass, field
from urllib.parse import quote

import pyarrow as pa
import pyarrow.compute as pc

from .model import XSD

_PLACEHOLDER_RE = re.compile(r"\{([^{}]+)\}")
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
        pos = 0
        for m in _PLACEHOLDER_RE.finditer(tmpl):
            if m.start() > pos:
                segs.append(tmpl[pos : m.start()])
            name = m.group(1)
            segs.append(("col", name))
            cols.append(name)
            pos = m.end()
        if pos < len(tmpl):
            segs.append(tmpl[pos:])
        return CompiledTemplate(tmpl, tuple(segs), tuple(cols))

    @property
    def is_constant(self) -> bool:
        return not self.columns

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
