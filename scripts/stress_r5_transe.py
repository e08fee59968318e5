"""Round-5 TransE stress (BASELINE.md "Stress" rows): the training
epoch's scale shape at 2M edges / 1.2M entities — four co-partitioned
vector gathers per (positive, corruption) pair, int64 fixed-point
gradient sums through one raw-task exchange, a LEFT-join update.

Protocol: zipf-skewed synthetic KG (hub entities stress the gradient
scatter exactly like hub pages stress any KG shuffle), dim 32, k=1.
Reports per-epoch wall time across 3 CHAINED epochs (epoch 2+ consumes
epoch 1's materialized table — the steady-state cost), pairs/s, and
the loss curve (sanity: the margin loss must move).

Prints one JSON line. Run: python scripts/stress_r5_transe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("STRESS_TRANSE_EDGES", 2_000_000))


def _edges(n: int) -> pa.Table:
    rng = np.random.default_rng(7)
    src = (rng.zipf(1.2, n) % 1_000_000).astype(np.int64)
    dst = (rng.zipf(1.2, n) % 200_000).astype(np.int64)
    rel = rng.integers(0, 50, n)
    return pa.table({
        "src": pa.array(np.char.add("urn:s", src.astype("U8"))),
        "rel": pa.array(np.char.add("urn:r", rel.astype("U3"))),
        "dst": pa.array(np.char.add("urn:d", dst.astype("U8"))),
    })


def main() -> None:
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=int(os.environ.get(
        "RAY_GRAFT_CPUS", 32)), include_dashboard=False,
        logging_level="ERROR")
    from cattle_ray.stages.kgembed import transe_epoch

    ds = rd.from_arrow(_edges(N)).materialize()
    ents = rels = None
    times, losses = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        out = transe_epoch(ds, ents, rels, dim=32, k=1, num_buckets=32)
        ents = out["entities"].materialize()
        rels = out["relations"]
        times.append(round(time.perf_counter() - t0, 2))
        losses.append(round(out["loss"], 1))
    print(json.dumps({
        "n_edges": N, "dim": 32,
        "epoch_secs": times,
        "pairs_per_sec": int(out["pairs"] / times[-1]),
        "loss_curve": losses,
        "active_last": out["active_pairs"],
        "cpus": int(os.environ.get("RAY_GRAFT_CPUS", 32))}))
    ray.shutdown()


if __name__ == "__main__":
    main()
