"""JSONL pages source/sink — Common-Crawl-style web-page corpora arrive as
JSON Lines at least as often as Parquet; this maps them onto the exact
``input_hint`` pages shape (url, warc_ts, html, text, lang).

Line-oriented → embarrassingly parallel both ways (same argument as the
N-Quads sink, :mod:`cattle_ray.sources.nquads`). JSON has no binary type,
so ``html`` travels base64 in a ``html_b64`` field and is decoded to a
``binary`` column inside the read tasks (vectorized via the C-level
``base64`` codec per value — the decode is the cheap part next to JSON
parsing, which Ray's Arrow JSON reader does natively in C++).
"""

from __future__ import annotations

import base64

import pyarrow as pa
import pyarrow.compute as pc

PAGES_JSONL_COLS = ["url", "warc_ts", "html", "text", "lang"]


def read_pages_jsonl(paths):
    """``.jsonl`` file(s) of pages → Dataset in the input_hint shape
    (``html`` binary from ``html_b64``, ``warc_ts`` µs timestamp from the
    integer epoch-µs field)."""
    import ray.data as rd

    ds = rd.read_json(paths)

    def decode(batch: pa.Table) -> pa.Table:
        html = pa.array(
            [base64.b64decode(v) if v is not None else None
             for v in batch["html_b64"].to_pylist()],
            pa.binary())
        return pa.table({
            "url": pc.cast(batch["url"], pa.string()),
            "warc_ts": pc.cast(batch["warc_ts"], pa.timestamp("us")),
            "html": html,
            "text": pc.cast(batch["text"], pa.string()),
            "lang": pc.cast(batch["lang"], pa.string()),
        })

    return ds.map_batches(decode, batch_format="pyarrow")


def write_pages_jsonl(pages_ds, out_dir: str):
    """Pages Dataset → directory of content-addressed ``.jsonl`` part files
    (idempotent under task retries, same discipline as the N-Quads sink).
    Returns the small per-part manifest as pandas.

    Caveat shared with every content-addressed sink here: two DISTINCT
    blocks with byte-identical payloads deduplicate to one part (set
    semantics). Fine for pages/triples keyed by url/content; a caller
    needing multiset semantics should make rows distinguishable (e.g. carry
    a row id)."""
    import hashlib
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        rows = []
        cols = {c: batch[c].to_pylist() for c in PAGES_JSONL_COLS
                if c in batch.column_names and c not in ("warc_ts",)}
        if "warc_ts" in batch.column_names:
            # epoch µs via Arrow cast: exact, timezone/locale-free roundtrip
            cols["warc_ts"] = pc.cast(batch["warc_ts"], pa.int64()).to_pylist()
        n = len(batch)
        for i in range(n):
            r = {}
            for c, vals in cols.items():
                v = vals[i]
                if c == "html":
                    r["html_b64"] = (base64.b64encode(v).decode("ascii")
                                     if v is not None else None)
                else:
                    r[c] = v
            rows.append(json.dumps(r, sort_keys=True, ensure_ascii=False))
        payload = ("\n".join(rows) + "\n").encode("utf-8")
        name = hashlib.md5(payload).hexdigest()
        tmp = os.path.join(out_dir, f".{name}.tmp")
        dst = os.path.join(out_dir, f"part-{name}.jsonl")
        if not os.path.exists(dst):
            with open(tmp, "wb") as f:
                f.write(payload)
            os.replace(tmp, dst)  # atomic commit
        return pa.table({"path": pa.array([dst]),
                         "n_rows": pa.array([n], pa.int64())})

    manifest = pages_ds.map_batches(write_block, batch_format="pyarrow")
    return manifest.to_pandas()
