"""Web-graph pipeline: raw crawled pages → page→page link graph → PageRank
→ ranked page table (the crawl-prioritization / search-ranking loop over a
Common-Crawl-style corpus).

Execution discipline (the 100-TB shape):

- anchor extraction is a stateless per-doc regex scan; the wide ``html``
  payload never leaves the kernel — only (src, dst) url pairs flow on;
- node ids are vectorized 64-bit hashes (``uri_ids64``) so every rank-round
  join moves 16-byte rows, never url strings; ranks join back to urls once
  at the end, so the output is hash-scheme-independent;
- PageRank itself is the size-adaptive engine op (single numpy task under
  the crossover, fused join+partial-reduce rounds above it).
"""

from __future__ import annotations

import pyarrow as pa


def extract_link_graph(pages_ds):
    """pages(url, html, …) → materialized (src, dst) url edge Dataset.
    Materialized because rank_pages consumes it twice (edges + id map)."""
    from ..stages.extract import extract_links_batch

    return pages_ds.map_batches(extract_links_batch,
                                batch_format="pyarrow").materialize()


def rank_pages(pages_ds, *, iters: int = 10, damping: float = 0.85):
    """pages → Dataset (url, rank) over the extracted link graph."""
    from ..stages.aggregates import distinct
    from ..stages.graph import pagerank, uri_ids64
    from ..stages.joins import hash_join

    links = extract_link_graph(pages_ds)
    if links.count() == 0:  # anchor-free corpus: typed empty, not a crash
        import ray.data as rd

        return rd.from_arrow(pa.table({"url": pa.array([], pa.string()),
                                       "rank": pa.array([], pa.float64())}))
    edges = links.map_batches(
        lambda b: pa.table({"src": uri_ids64(b["src"]),
                            "dst": uri_ids64(b["dst"])}),
        batch_format="pyarrow")

    def to_map(b: pa.Table) -> pa.Table:
        uris = pa.concat_arrays([b["src"].combine_chunks(),
                                 b["dst"].combine_chunks()])
        ids = pa.concat_arrays([uri_ids64(b["src"]), uri_ids64(b["dst"])])
        return pa.table({"nid": ids, "uri": uris})

    ranks = pagerank(edges, iters=iters, damping=damping)
    id_map = distinct(links.map_batches(to_map, batch_format="pyarrow"),
                      ["nid", "uri"], num_buckets=8)
    joined = hash_join(ranks, id_map, "node", "nid", num_buckets=8)
    return joined.map_batches(
        lambda b: pa.table({"url": b["uri"], "rank": b["rank"]}),
        batch_format="pyarrow")
