"""Deterministic synthetic `pages` corpus (FIXTURES.md §1) + derivations.

Two generators, both pure functions of (seed, row index) so generation is
parallelism-invariant and re-runnable byte-identically (the `input_hint`
determinism contract, SURVEY.md §0):

- :func:`gen_pages_batch` / :func:`pages_dataset` — the FIXTURES.md §1 corpus
  (sentence-pool text with entity slots, embedded imf-shaped tables, skewed
  hub entity e0=Qatar, 10% non-"en" rows). Used by pytest goldens and bench.
- :func:`pages_from_documents_batch` — derives a pages table of the exact
  `input_hint` shape from the driver's ``documents.parquet`` so the DuckDB
  oracle can re-derive every value with SQL arithmetic (``__ray_entry__``
  correctness gate).

html is rendered FROM text+tables (:func:`cattle_ray.stages.extract.render_html`)
so the extractor invariant ``extract_text(html) == text`` holds by construction.
"""

from __future__ import annotations

import random

import pyarrow as pa

from .stages.extract import render_html

# 64 entities: the 8 imf fixture countries (/root/reference/data/imf.csv:2-9)
# + 56 synthetic (FIXTURES.md §4).
COUNTRIES = [
    "Qatar", "Luxembourg", "Macau", "Singapore",
    "Brunei Darussalam", "Kuwait", "Ireland", "Norway",
]
ENTITIES = COUNTRIES + [f"Entity{k:02d}" for k in range(8, 64)]

REGIONS = ["Asia", "Europe", "Oceania", "Africa"]

# 40-sentence template pool (FIXTURES.md §1). {A}/{B} are entity slots, {R} a
# region slot. The "mentions"-shaped templates dominate so the OpenIE channel
# has a skewed predicate (ex:mentions) by construction.
SENTENCE_TEMPLATES = (
    ["{A} mentions {B} in the latest report."] * 12
    + ["{A} is located in {R}."] * 6
    + ["{A} borders {B}."] * 5
    + ["{A} is a member of the council."] * 4
    + ["The capital of {A} is well known."] * 3
    + [
        "Trade between {A} and {B} grew last year.",
        "Analysts visited {A} twice.",
        "The weather in {A} was mild.",
        "Nothing notable happened today.",
        "A new survey covers {A} and {B}.",
        "{A} mentions {B} again.",
        "Researchers compared {A} with {B}.",
        "The data for {A} is incomplete.",
        "Officials from {A} met officials from {B}.",
        "This page has no entities at all.",
    ]
)
assert len(SENTENCE_TEMPLATES) == 40

SEED = 42


def _pick_entity(rng: random.Random) -> str:
    # hub-entity skew: e0 (Qatar) in ~30% of draws (FIXTURES.md §1 skew knob)
    if rng.random() < 0.30:
        return ENTITIES[0]
    return ENTITIES[rng.randrange(1, len(ENTITIES))]


def gen_row(i: int, seed: int = SEED) -> dict:
    """Pure function of (seed, i) → one page row (FIXTURES.md §1)."""
    rng = random.Random((seed << 32) ^ i)
    k = i % 5 + 1
    lines = []
    for _ in range(k):
        tmpl = SENTENCE_TEMPLATES[rng.randrange(40)]
        a, b = _pick_entity(rng), _pick_entity(rng)
        lines.append(tmpl.format(A=a, B=b, R=REGIONS[rng.randrange(4)]))
    text = "\n".join(lines)

    tables = []
    if i % 4 == 0:
        # imf-shaped table (headers from /root/reference/data/imf.csv:1)
        rows = []
        for r in range(1, 4):
            ent = ENTITIES[(i // 4 + r) % len(ENTITIES)]
            val = (i * 7919 + r * 104729) % 1_000_000
            rows.append([str(r), ent, f"{val:,}"])
        tables.append({"headers": ["Rank", "Country", "Int"], "rows": rows})
    if i % 20 == 0:
        tables.append(
            {
                "headers": ["key", "value"],
                "rows": [["k0", f"v{i}"], ["k1", f"v{i + 1}"]],
            }
        )

    url = f"https://site{i % 57}.example.org/page/{i:08d}"
    return {
        "url": url,
        "warc_ts": 1704067200_000000 + i * 37_000_000,  # 2024-01-01 + i*37s, µs
        "html": render_html(text, tables, title=f"T{i}"),
        "text": text,
        "lang": "en" if i % 10 != 9 else "de",
        "_row": i,
        "_n_tables": len(tables),
    }


PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
        pa.field("_row", pa.int64()),
        pa.field("_n_tables", pa.int8()),
    ]
)


def gen_pages_batch(ids, seed: int = SEED) -> pa.Table:
    rows = [gen_row(int(i), seed) for i in ids]
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def pages_table(n: int, seed: int = SEED) -> pa.Table:
    """Driver-side small fixture (tests)."""
    return gen_pages_batch(range(n), seed)


def pages_dataset(n: int, seed: int = SEED, *, override_num_blocks: int | None = None):
    """Scalable generation: ray.data.range → map_batches (no driver loop)."""
    import ray.data as rd

    ds = rd.range(n, override_num_blocks=override_num_blocks)
    return ds.map_batches(
        lambda b: gen_pages_batch(b["id"], seed), batch_format="numpy"
    )


# ---------------------------------------------------------------------------
# Oracle-checkable derivation from the driver testdata `documents` table.
# Every value below is SQL-reconstructible from doc_id (see __ray_entry__).

DOC_URL_PREFIX = "https://example.org/doc/"


def doc_url(doc_id: int) -> str:
    return f"{DOC_URL_PREFIX}{doc_id}"


def doc_link_dsts(doc_id: int, n_docs: int) -> list[int]:
    """Deterministic outlink targets for a page — the web-link-graph fixture.

    ``doc_id % 4`` outlinks; the j-th target is a Knuth-hash spread over the
    OTHER ``n_docs - 1`` ids (``+1 .. +n-1`` offsets from src, so self-links
    are impossible by construction). Pure int64 arithmetic, SQL-mirrorable:
    ``(src + 1 + ((src*2654435761 + j*40503) % (n-1))) % n``. Products stay
    well under 2^63 for any corpus below ~3.5e9 docs (the fixture scales)."""
    if n_docs < 2:
        return []
    return [
        (doc_id + 1 + ((doc_id * 2654435761 + j * 40503) % (n_docs - 1)))
        % n_docs
        for j in range(1, doc_id % 4 + 1)
    ]


def doc_table(doc_id: int) -> dict:
    rows = []
    for r in range(1, 4):
        rows.append(
            [str(r), f"Entity{(doc_id + r) % 50}", str((doc_id * 7 + r * 13) % 1000)]
        )
    return {"headers": ["rank", "name", "score"], "rows": rows}


def pages_from_documents_batch(batch: pa.Table, n_docs: int | None = None) -> pa.Table:
    """documents(doc_id, text, lang, …) → pages(url, warc_ts, html, text, lang).

    Pure per-row derivation: url/warc_ts are doc_id arithmetic; html is the
    fixture renderer over the document's own text plus (for doc_id%4==0) a
    deterministic embedded table, plus (when ``n_docs`` is given) the
    :func:`doc_link_dsts` anchor nav — invisible to the ``<p>``/``<table>``
    extractors, parsed only by ``extract_links_batch``.
    """
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist()

    def links(i):
        if n_docs is None:
            return None
        return [doc_url(d) for d in doc_link_dsts(i, n_docs)]

    out = {
        "url": [doc_url(i) for i in ids],
        "warc_ts": [1704067200_000000 + i * 1_000_000 for i in ids],
        "html": [
            render_html(t or "", [doc_table(i)] if i % 4 == 0 else [],
                        title=f"T{i}", links=links(i))
            for i, t in zip(ids, texts)
        ],
        "text": texts,
        "lang": langs,
        "doc_id": ids,
    }
    return pa.table(
        out,
        schema=pa.schema(
            [
                pa.field("url", pa.string()),
                pa.field("warc_ts", pa.timestamp("us")),
                pa.field("html", pa.binary()),
                pa.field("text", pa.string()),
                pa.field("lang", pa.string()),
                pa.field("doc_id", pa.int64()),
            ]
        ),
    )


def pages_from_documents(sf_dir: str, rows_per_block: int = 500):
    """Ray Dataset of input_hint-shaped pages derived from sf documents.
    Blocks are right-sized from parquet metadata so downstream stages get
    real parallelism even on small test files."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    path = f"{sf_dir}/documents.parquet"
    nrows = pq.ParquetFile(path).metadata.num_rows
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    blocks = max(2, min(nrows // rows_per_block + 1, 4 * cpus))
    ds = rd.read_parquet(path, columns=["doc_id", "text", "lang"],
                         override_num_blocks=blocks)
    return ds.map_batches(pages_from_documents_batch,
                          fn_kwargs={"n_docs": nrows},
                          batch_format="pyarrow")
