"""Iterative graph algorithms over the materialized triple/edge tables.

:func:`pagerank` — entity-importance power iteration expressed with the same
co-partitioned-join + bucketed-aggregate primitives as the rest of the
engine: each round is one ``hash_join`` (edge source ⋈ rank), one bucketed
contribution sum, and one left join back onto the node universe. The rank
state lives in the object store between rounds (two int64/float64 columns);
nothing rank-sized ever lands on the driver. Out-degrees are broadcast once
(fine to ~10^8 non-dangling nodes; beyond that, swap the broadcast for a
co-partitioned degree join — same key as the contribution join).
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
    import ray

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

    deg_df = (
        edges.map_batches(
            lambda t: t.group_by(["src"]).aggregate([([], "count_all")])
            .rename_columns(["src", "deg_p"]),
            batch_format="pyarrow",
        )
        .to_pandas()
        .groupby("src")["deg_p"].sum()
    )
    deg_ref = ray.put(deg_df.to_dict())

    ranks = nodes.map_batches(
        lambda t: pa.table(
            {"node": t["node"], "rank": pa.array(np.full(len(t), 1.0 / n_nodes))}
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        # dangling rank mass (nodes without out-edges), summed distributed
        def dangling_mass(b: pa.Table) -> pa.Table:
            deg = ray.get(deg_ref)
            m = np.fromiter((n not in deg for n in b["node"].to_pylist()),
                            dtype=bool, count=len(b))
            kept = b.filter(pa.array(m))
            return pa.table({"d": pa.array([float(pc.sum(kept["rank"]).as_py() or 0.0)])})

        dangling = sum(
            r["d"] for r in ranks.map_batches(dangling_mass, batch_format="pyarrow")
            .to_pandas().to_dict("records")
        )
        base = (1 - damping) / n_nodes + damping * dangling / n_nodes

        joined = hash_join(edges, ranks, "src", "node", num_buckets=num_buckets)

        def contrib(b: pa.Table) -> pa.Table:
            deg = ray.get(deg_ref)
            srcs = b["src"].to_pylist()
            d = np.fromiter((deg[s] for s in srcs), dtype=np.float64, count=len(srcs))
            c = b["rank"].to_numpy(zero_copy_only=False) / d
            out = pa.table({"node": b["dst"], "in_sum": pa.array(c)})
            return add_key_bucket(out, ["node"], num_buckets)

        def reduce_rank(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby("node", sort=False)["in_sum"].sum().reset_index()

        sums = (
            coalesce_small(joined.map_batches(contrib, batch_format="pyarrow"), 8)
            .groupby("_bucket")
            .map_groups(reduce_rank, batch_format="pandas")
        )
        # node universe ⋉ sums (left join): zero in-flow → base rank
        merged = hash_join(nodes, sums, "node", "node", how="left",
                           num_buckets=num_buckets)

        def finish(b: pa.Table) -> pa.Table:
            s = pc.fill_null(b["in_sum"], 0.0)
            rank = pc.add(pa.scalar(base), pc.multiply(pa.scalar(damping), s))
            return pa.table({"node": b["node"], "rank": rank})

        ranks = merged.map_batches(finish, batch_format="pyarrow").materialize()
    return ranks
