"""Round-5 sharded-sampler stress (BASELINE.md "Stress" rows): the
scale story of VERDICT r4 order #1 at a vocabulary the broadcast path
was guarded against — 20M distinct entities, 5M edges, k=2
corruptions, mode="sharded" (pools hash-shard across the raw-task
exchange; NOTHING entity-sized on the driver at any point).

Checks while timing:
* output size ≈ |edges| positives + ~2·|edges| negatives (filtered
  drops only);
* layout invariance at two input partitionings (row-count equality —
  the full set-equality proof lives in the unit tests at small scale);
* negatives-never-equal-own-positive spot check on a 100k sample.

Prints one JSON line. Run: python scripts/stress_r5_sampler.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_EDGES = int(os.environ.get("STRESS_SAMPLER_EDGES", 5_000_000))
N_ENT = int(os.environ.get("STRESS_SAMPLER_ENTITIES", 20_000_000))
CHUNK = 1_000_000


def _edges(n: int, start: int) -> pa.Table:
    rng = np.random.default_rng(start)
    src = rng.integers(0, N_ENT, n, dtype=np.int64)
    dst = rng.integers(0, N_ENT, n, dtype=np.int64)
    rel = rng.integers(0, 100, n)
    return pa.table({
        "src": pa.array(np.char.add("urn:e", src.astype("U9"))),
        "rel": pa.array(np.char.add("urn:r", rel.astype("U4"))),
        "dst": pa.array(np.char.add("urn:e", dst.astype("U9"))),
    })


def main() -> None:
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=int(os.environ.get(
        "RAY_GRAFT_CPUS", 32)), include_dashboard=False,
        logging_level="ERROR")
    from cattle_ray.stages.reason import negative_sample_edges

    parts = [_edges(CHUNK, i) for i in range(N_EDGES // CHUNK)]
    ds = rd.from_arrow(parts).materialize()
    del parts
    t0 = time.perf_counter()
    out = negative_sample_edges(ds, k=2, mode="sharded",
                                num_shards=64).materialize()
    t_sharded = round(time.perf_counter() - t0, 2)
    n_out = out.count()
    n_pos = out.filter(expr="label == 1").count()
    n_neg = n_out - n_pos

    # spot check: no negative reproduces its own positive (sample)
    bad = out.filter(expr="label == 0").limit(100_000).map_batches(
        lambda b: pa.table({"n": [int(pc.sum(pc.cast(pc.equal(
            b["src"], b["dst"]), pa.int64())).as_py() or 0)]}),
        batch_format="pyarrow").to_pandas()["n"].sum()

    # layout invariance: repartitioned input, same counts
    t1 = time.perf_counter()
    n2 = negative_sample_edges(ds.repartition(13), k=2, mode="sharded",
                               num_shards=64).count()
    t_repart = round(time.perf_counter() - t1, 2)

    print(json.dumps({
        "n_edges": N_EDGES, "n_entity_universe": N_ENT,
        "sharded_sec": t_sharded, "repartitioned_sec": t_repart,
        "rows_out": n_out, "positives": n_pos, "negatives": n_neg,
        "neg_drop_fraction": round(1 - n_neg / (2 * N_EDGES), 5),
        "layout_invariant_counts": bool(n2 == n_out),
        "self_negatives_in_sample": int(bad),
        "pairs_per_sec": int(n_out / t_sharded),
        "cpus": int(os.environ.get("RAY_GRAFT_CPUS", 32))}))
    ray.shutdown()


if __name__ == "__main__":
    main()
