"""Scale-stress evidence for the third-continuation operators
(BASELINE.md "Stress" rows): HITS through the DISTRIBUTED half-round path
on a 3M-edge zipf graph (above the small-graph crossover), edit-distance
near-dup over 100k short docs, and ordered per-key sequence assembly over
5M events / 100k users. Fresh Ray session; prints one JSON line.

Run: python scripts/stress_round3.py  (from the repo root)
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

    # --- HITS distributed path: 3M-edge zipf graph (hubs in the thousands)
    # — crossover is 2M, so this exercises the per-direction bucketed
    # half-rounds, not the single-worker solve
    def hits_3m():
        from cattle_ray.stages.graph import hits

        rng = np.random.RandomState(0)
        src = (rng.zipf(1.3, 3_000_000) % 300_000).astype(np.int64)
        dst = rng.randint(0, 300_000, 3_000_000).astype(np.int64)
        ds = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(32)
        res = hits(ds, iters=3)
        return {"nodes": res.count()}

    # --- edit-distance near-dup: 100k short docs, 10% planted 2-edit twins;
    # composite (length-band, first-token) blocking must keep the largest
    # block small enough that the pair DP stays sub-quadratic corpus-wide
    def editdist_100k():
        from cattle_ray.stages.dedup import editdist_neardup_pairs

        rng = np.random.RandomState(1)
        vocab = np.array([f"w{i:04d}" for i in range(3000)])
        base = [" ".join(vocab[rng.randint(0, 3000, 10)]) for _ in range(90_000)]
        twins = [t[:-2] + "xy" for t in base[:10_000]]
        texts = base + twins
        ids = np.arange(len(texts), dtype=np.int64)
        ds = rd.from_arrow(pa.table({"doc_id": ids, "text": texts})
                           ).repartition(32)
        res = editdist_neardup_pairs(ds, max_dist=5)
        return {"pairs": res.count()}

    # --- ordered sequence assembly: 5M events over 100k users — the
    # bucketed sort+join must be linear in bucket rows, no per-key UDFs
    def user_paths_5m():
        from cattle_ray.stages.windows import ordered_paths

        rng = np.random.RandomState(2)
        n = 5_000_000
        t = pa.table({
            "user_id": rng.randint(0, 100_000, n).astype(np.int64),
            "ts": rng.randint(0, 10**9, n).astype(np.int64),
            "event_id": np.arange(n, dtype=np.int64),
            "event_type": np.array(["view", "click", "buy", "share"])[
                rng.randint(0, 4, n)],
        })
        res = ordered_paths(rd.from_arrow(t).repartition(64),
                            key="user_id", ts="ts", val="event_type",
                            order_tiebreak="event_id")
        return {"users": res.count()}

    timed("hits_3m_distributed", hits_3m)
    timed("editdist_100k", editdist_100k)
    timed("user_paths_5m", user_paths_5m)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
