"""Iterative graph algorithms over the materialized triple/edge tables.

:func:`pagerank` — entity-importance power iteration expressed with the same
co-partitioned-join + bucketed-aggregate primitives as the rest of the
engine. Fully distributed at every step:

- out-degrees are joined into the edge table ONCE before the loop (static),
  so no degree broadcast limits the node count;
- each round: one ``hash_join`` (edges ⋈ ranks on src), a bucketed in-flow
  sum, and a left join back onto the node universe;
- the dangling mass needs no node-level scan: Σ_edges rank(src)/deg(src)
  summed per edge equals the total rank held by nodes WITH out-edges, so
  dangling = 1 − that sum (one distributed column sum).

Rank state lives in the object store between rounds (two columns); nothing
node- or edge-sized ever lands on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def pagerank(edges_ds, *, damping: float = 0.85, iters: int = 10,
             num_buckets: int = 32):
    """edges Dataset (src:int64, dst:int64) → Dataset (node, rank).

    Ranks sum to ~1.0 (dangling mass redistributed uniformly). Deterministic
    at any parallelism: every reduction is a sum of fixed values.
    """
    from .aggregates import add_key_bucket, coalesce_small
    from .dedup import dedup_exact
    from .joins import hash_join

    edges = edges_ds.map_batches(
        lambda t: pa.table(
            {"src": t["src"].combine_chunks().cast(pa.int64()),
             "dst": t["dst"].combine_chunks().cast(pa.int64())}
        ),
        batch_format="pyarrow",
    ).materialize()

    nodes_tbl = edges.map_batches(
        lambda t: pa.table({"node": pc.unique(pa.concat_arrays(
            [t["src"].combine_chunks(), t["dst"].combine_chunks()]))}),
        batch_format="pyarrow",
    )
    nodes = dedup_exact(nodes_tbl, ["node"]).map_batches(
        lambda t: pa.table({"node": t["node"].combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow",
    ).materialize()
    n_nodes = nodes.count()

    # static: fold out-degree into the edge table (co-partitioned join, once)
    def local_deg(t: pa.Table) -> pa.Table:
        out = t.group_by(["src"]).aggregate([([], "count_all")])
        out = out.rename_columns(["dnode", "deg_p"])
        return add_key_bucket(out, ["dnode"], num_buckets)

    def sum_deg(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("dnode", sort=False)["deg_p"].sum().reset_index(name="deg")
        out["deg"] = out["deg"].astype("int64")
        return out

    deg = (
        coalesce_small(edges.map_batches(local_deg, batch_format="pyarrow"), 8)
        .groupby("_bucket")
        .map_groups(sum_deg, batch_format="pandas")
    )
    edges_deg = hash_join(edges, deg, "src", "dnode", num_buckets=num_buckets)
    edges_deg = edges_deg.map_batches(
        lambda t: pa.table({"src": t["src"], "dst": t["dst"],
                            "deg": t["deg"].combine_chunks().cast(pa.float64())}),
        batch_format="pyarrow",
    ).materialize()

    ranks = nodes.map_batches(
        lambda t: pa.table(
            {"node": t["node"], "rank": pa.array(np.full(len(t), 1.0 / n_nodes))}
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        joined = hash_join(edges_deg, ranks, "src", "node",
                           num_buckets=num_buckets).materialize()

        def contrib(b: pa.Table) -> pa.Table:
            c = pc.divide(b["rank"], b["deg"])
            out = pa.table({"node": b["dst"], "in_sum": c})
            return add_key_bucket(out, ["node"], num_buckets)

        contribs = joined.map_batches(contrib, batch_format="pyarrow").materialize()
        # non-dangling mass = Σ_edges rank(src)/deg(src); dangling = 1 − it
        non_dangling = contribs.sum("in_sum") or 0.0
        base = (1 - damping) / n_nodes + damping * (1.0 - non_dangling) / n_nodes

        def reduce_rank(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby("node", sort=False)["in_sum"].sum().reset_index()

        sums = (
            coalesce_small(contribs, 8)
            .groupby("_bucket")
            .map_groups(reduce_rank, batch_format="pandas")
        )
        merged = hash_join(nodes, sums, "node", "node", how="left",
                           num_buckets=num_buckets)

        def finish(b: pa.Table, base=base) -> pa.Table:
            s = pc.fill_null(b["in_sum"], 0.0)
            rank = pc.add(pa.scalar(base), pc.multiply(pa.scalar(damping), s))
            return pa.table({"node": b["node"], "rank": rank})

        ranks = merged.map_batches(finish, batch_format="pyarrow").materialize()
    return ranks
