"""M6/M7: HTML → text + embedded-table extraction.

The reference contains no HTML extractor (SURVEY.md §0), so the executable
contract is the FIXTURES.md §1 invariant: extraction is a *pure function of
(html, url)* — byte-identical output per url at any parallelism, on every
rerun — and is the exact inverse of the fixture renderer:

- ``extract_text``: concatenate ``<p>…</p>`` contents in document order,
  HTML-entity-decoded, joined by ``"\\n"``, no trailing whitespace.
- ``extract_tables``: every ``<table>`` element → headers (``<th>``) +
  rows (``<td>``), cell strings entity-decoded.

Both run in ONE parse pass per document (SURVEY.md M7: "same map_batches pass
as M6") over ``batch_format="pyarrow"`` batches. Parsing uses module-level
precompiled regexes (compiled once per worker process at import, C-speed
scan per doc); documents are independent so the stage is stateless tasks,
not an actor pool.
"""

from __future__ import annotations

import html as _html
import re

import pyarrow as pa

_P_RE = re.compile(rb"<p>(.*?)</p>", re.S)
_A_RE = re.compile(rb'<a href="(.*?)"', re.S)
_TABLE_RE = re.compile(rb"<table>(.*?)</table>", re.S)
_TR_RE = re.compile(rb"<tr>(.*?)</tr>", re.S)
_CELL_RE = re.compile(rb"<t[hd]>(.*?)</t[hd]>", re.S)

#: Arrow type of the extracted-tables column: list of tables, each with
#: headers + rows (rows = list of list<string> cell values).
TABLES_TYPE = pa.list_(
    pa.struct(
        [
            pa.field("headers", pa.list_(pa.string())),
            pa.field("rows", pa.list_(pa.list_(pa.string()))),
        ]
    )
)


def extract_text_bytes(html: bytes) -> str:
    """Pure (html) → text; the FIXTURES.md §1 inverse-renderer spec."""
    parts = [_html.unescape(m.decode("utf-8")) for m in _P_RE.findall(html)]
    return "\n".join(parts).rstrip()


def extract_tables_bytes(html: bytes) -> list[dict]:
    out = []
    for tbl in _TABLE_RE.findall(html):
        headers: list[str] = []
        rows: list[list[str]] = []
        for tr in _TR_RE.findall(tbl):
            cells = [_html.unescape(c.decode("utf-8")) for c in _CELL_RE.findall(tr)]
            if not headers and b"<th>" in tr:
                headers = cells
            else:
                rows.append(cells)
        out.append({"headers": headers, "rows": rows})
    return out


def extract_batch(batch: pa.Table, *, tables: bool = True, drop_html: bool = True) -> pa.Table:
    """map_batches kernel: ``html:binary`` → ``text:string`` (+ ``tables``).

    Drops the wide ``html`` column immediately after extraction so downstream
    shuffles never carry raw page bytes (SURVEY.md §7.4).
    """
    html_col = batch["html"]
    if isinstance(html_col, pa.ChunkedArray):
        html_col = html_col.combine_chunks()
    htmls = html_col.to_pylist()
    texts = pa.array([extract_text_bytes(h) if h is not None else None for h in htmls], pa.string())
    cols = {name: batch[name] for name in batch.column_names}
    cols["text"] = texts
    if tables:
        cols["tables"] = pa.array(
            [extract_tables_bytes(h) if h is not None else [] for h in htmls], TABLES_TYPE
        )
    if drop_html:
        cols.pop("html", None)
    return pa.table(cols)


def extract_links_batch(batch: pa.Table, *, url_col: str = "url",
                        html_col: str = "html") -> pa.Table:
    """map_batches kernel: hyperlink extraction — the web-graph construction
    primitive. Each page row explodes into ``(src, dst)`` edge rows, one per
    ``<a href>`` anchor (entity-unescaped, document order; pages with no
    anchors contribute no rows). Like :func:`extract_batch`, parsing is a
    per-doc precompiled-regex scan (documents are independent → stateless
    tasks); the wide ``html`` payload never leaves the kernel — only the
    two url columns flow to the downstream degree/pagerank aggregations."""
    html_arr = batch[html_col]
    if isinstance(html_arr, pa.ChunkedArray):
        html_arr = html_arr.combine_chunks()
    srcs_in = batch[url_col].to_pylist()
    src_out: list[str] = []
    dst_out: list[str] = []
    for src, h in zip(srcs_in, html_arr.to_pylist()):
        if h is None:
            continue
        for m in _A_RE.findall(h):
            src_out.append(src)
            dst_out.append(_html.unescape(m.decode("utf-8")))
    return pa.table({"src": pa.array(src_out, pa.string()),
                     "dst": pa.array(dst_out, pa.string())})


def render_html(text: str, tables: list[dict] | None = None, title: str = "",
                links: list[str] | None = None) -> bytes:
    """The fixture renderer (FIXTURES.md §1): html is generated FROM text and
    tables; ``extract_*`` above are its exact inverse. ``links`` render as a
    trailing ``<nav>`` anchor block — outside every ``<p>``/``<table>``, so
    text/table extraction is unaffected byte-for-byte."""
    parts = [f"<html><head><title>{_html.escape(title)}</title></head><body>"]
    for line in text.split("\n"):
        parts.append(f"<p>{_html.escape(line)}</p>")
    for t in tables or []:
        parts.append("<table>")
        if t.get("headers"):
            parts.append(
                "<tr>" + "".join(f"<th>{_html.escape(h)}</th>" for h in t["headers"]) + "</tr>"
            )
        for row in t.get("rows", []):
            parts.append("<tr>" + "".join(f"<td>{_html.escape(c)}</td>" for c in row) + "</tr>")
        parts.append("</table>")
    if links:
        parts.append(
            "<nav>"
            + "".join(f'<a href="{_html.escape(u, quote=True)}">l</a>'
                      for u in links)
            + "</nav>"
        )
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")
