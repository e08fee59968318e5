"""Scale-stress evidence for the second-continuation operators
(BASELINE.md "Stress" rows): k-core peeling on a 2M-edge zipf graph,
recrawl upsert over 2M captures with 64 KB payloads, heavy hitters over
a 20M-token stream, cohort retention over 5M events, PCA over 200k
512-dim vectors. Fresh Ray session; prints one JSON line.

Run: python scripts/stress_round2c.py  (from the repo root)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    out = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        r = fn()
        out[name] = {"sec": round(time.perf_counter() - t0, 2), **r}
        print(f"[{name}] {out[name]}", file=sys.stderr)

    # --- k-core: 2M-edge zipf-skewed undirected graph (hub degrees in the
    # thousands), k=5 — multi-round peeling at graph-op scale
    def kcore_2m():
        from cattle_ray.stages.graph import kcore

        rng = np.random.RandomState(0)
        a = (rng.zipf(1.3, 1_000_000) % 200_000).astype(np.int64)
        b = rng.randint(0, 200_000, 1_000_000).astype(np.int64)
        m = a != b
        a, b = a[m], b[m]
        und = pa.table({"s": np.concatenate([a, b]),
                        "o": np.concatenate([b, a])})
        ds = rd.from_arrow(und).repartition(32)
        res = kcore(ds, 5)
        return {"nodes_in_core": res.count()}

    # --- recrawl upsert: 2M captures of 500k urls (4x recrawl) with 4 KB
    # payloads — winners decided over projected meta columns; the payload
    # must never enter a shuffle (the first whole-row cut took 380 s here)
    def latest_2m():
        from cattle_ray.stages.dedup import latest_by_key

        payload = "x" * 4096

        def gen(b):
            ids = b["id"].to_numpy()
            return pa.table({
                "url": pa.array([f"https://d{i % 500_000}.org" for i in ids]),
                "warc_ts": pa.array((ids // 500_000).astype(np.int64)),
                "body": pa.array([payload] * len(ids)),
            })

        ds = rd.range(2_000_000, override_num_blocks=64).map_batches(
            gen, batch_format="pyarrow")
        res = latest_by_key(ds, "url", "warc_ts")
        return {"kept": res.count()}

    # --- heavy hitters: 20M zipf tokens, exact top-50
    def hh_20m():
        from cattle_ray.stages.sketches import heavy_hitters_exact

        def gen(b):
            ids = b["id"].to_numpy()
            rng = np.random.RandomState(int(ids[0]) % 2**31)
            return pa.table({
                "w": pa.array([f"t{z}" for z in rng.zipf(1.2, len(ids) * 10)])})

        ds = rd.range(2_000_000, override_num_blocks=64).map_batches(
            gen, batch_format="pyarrow")
        res = heavy_hitters_exact(ds, "w", 50)
        return {"topk": res.count()}

    # --- cohort retention: 5M events, 500k users, 60 days
    def cohort_5m():
        from cattle_ray.stages.aggregates import (distinct, grouped_minmax,
                                                  partial_count)
        from cattle_ray.stages.joins import hash_join

        def gen(b):
            ids = b["id"].to_numpy()
            rng = np.random.RandomState(int(ids[0]) % 2**31)
            return pa.table({
                "user_id": rng.randint(0, 500_000, len(ids)).astype(np.int64),
                "day": rng.randint(0, 60, len(ids)).astype(np.int64),
            })

        ds = rd.range(5_000_000, override_num_blocks=64).map_batches(
            gen, batch_format="pyarrow")
        days = distinct(ds, ["user_id", "day"]).materialize()
        cohort = grouped_minmax(days, ["user_id"], "day", "min").map_batches(
            lambda b: b.rename_columns(["user_id", "cohort_day"]),
            batch_format="pyarrow")
        j = hash_join(days, cohort, "user_id", "user_id")
        res = partial_count(j, ["cohort_day", "day"])
        return {"cells": res.count()}

    # --- PCA: 200k × 512-dim float32 (the embedding-corpus shape) — one
    # streaming moment pass + driver eigh + broadcast projection
    def pca_200k():
        from cattle_ray.stages.similarity import pca_fit, pca_transform

        def gen(b):
            ids = b["id"].to_numpy()
            rng = np.random.RandomState(int(ids[0]) % 2**31)
            return pa.table({
                "vec_id": pa.array(ids.astype(np.int64)),
                "embedding": pa.array(
                    list(rng.randn(len(ids), 512).astype(np.float32))),
            })

        ds = rd.range(200_000, override_num_blocks=64).map_batches(
            gen, batch_format="pyarrow").materialize()
        mean, comps, _ = pca_fit(ds, 16)
        proj = pca_transform(ds, mean, comps)
        return {"proj_rows": proj.count()}

    timed("kcore_2m_edges", kcore_2m)
    timed("latest_by_key_2m_recrawls", latest_2m)
    timed("heavy_hitters_20m_tokens", hh_20m)
    timed("cohort_5m_events", cohort_5m)
    timed("pca_200k_x512", pca_200k)

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
