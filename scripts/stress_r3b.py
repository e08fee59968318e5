"""Round-3 continuation scale-stress (BASELINE.md "Stress" rows):

1. Generation-aware store lifecycle at ~6M triples: tracked 4M-row base
   merge, tracked 2M-row delta merge, pattern delete of a predicate
   slice, then read_store_asof(1) — per-phase wall time; replay is
   partition-local so the asof read costs ~the deltas crossed.
2. compact_store of the resulting ~4M-row store re-keyed to obj (the
   secondary-index rebuild as one streaming re-layout).
3. BGP join-order planner effect on a 9M-triple store: a selective
   constant pattern written LAST joins first under the planner —
   reorder=True vs reorder=False over the identical pattern list.
4. deterministic_sample threshold pass over 2M rows (the layout-
   invariant k-means seeding path).

Fixture synthesis is untimed. Fresh Ray session; prints one JSON line.

Run: python scripts/stress_r3b.py  (from the repo root)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _triples(n: int, n_subj: int, pred_cycle, start: int = 0) -> pa.Table:
    i = np.arange(start, start + n)
    subj = np.char.add("https://ex.org/s/",
                       (i % n_subj).astype("U12"))
    preds = np.array(pred_cycle, dtype=object)
    pred = preds[(i % len(preds))]
    obj = np.char.add("v", i.astype("U12"))
    return pa.table({
        "subj": pa.array(subj), "pred": pa.array(pred.tolist()),
        "obj": pa.array(obj),
        "obj_is_iri": pa.array(np.zeros(n, bool)),
        "obj_datatype": pa.nulls(n, pa.string()),
        "obj_lang": pa.nulls(n, pa.string()),
    })


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
        extra = fn()
        out[name] = round(time.perf_counter() - t0, 2)
        if extra:
            out.update(extra)

    from cattle_ray.sources.triple_sink import (
        compact_store, delete_triples, merge_triples_hash_partitioned,
        read_store_asof, store_key)

    tmp = tempfile.mkdtemp(prefix="stress_r3b_")
    store = os.path.join(tmp, "store")
    P1 = ["https://ex.org/p/name", "https://ex.org/p/score"]
    P2 = ["https://ex.org/p/rank"]
    base = _triples(4_000_000, 400_000, P1)           # untimed synthesis
    delta = _triples(2_000_000, 400_000, P2, start=4_000_000)

    def merge_of(tbl):
        def f():
            merge_triples_hash_partitioned(
                rd.from_arrow(tbl).repartition(32), store, num_partitions=32,
                track_generations=True)
        return f

    timed("gen_store_base_merge_4M", merge_of(base))
    timed("gen_store_delta_merge_2M", merge_of(delta))

    def do_delete():
        m = delete_triples(store, pred="https://ex.org/p/score")
        return {"gen_store_deleted_rows": int(m["n_removed"].sum())}

    timed("gen_store_delete_pred_2M", do_delete)

    def do_asof():
        n = read_store_asof(store, 1).count()
        assert n == 4_000_000, n  # base snapshot exactly restored
        return {"gen_store_asof1_rows": n}

    timed("gen_store_asof1_read", do_asof)

    def do_compact():
        compact_store(store, key="obj", drop_history=True)
        assert store_key(store) == "obj"

    timed("compact_rekey_obj_4M", do_compact)
    shutil.rmtree(tmp, ignore_errors=True)

    # --- BGP planner: selective pattern written LAST ---------------------
    from cattle_ray.stages.bgp import evaluate_bgp

    n = 9_000_000
    i = np.arange(n)
    sid = i // 3            # 3M subjects, each with one a / b / rare row
    big = pa.table({
        "subj": pa.array(np.char.add("s", sid.astype("U12"))),
        "pred": pa.array(
            np.array(["a", "b", "rare"], dtype=object)[i % 3].tolist()),
        # rare rows: 1000 distinct objects → the constant matches 3k of
        # 3M subjects; a/b rows: unique payloads
        "obj": pa.array(np.where(i % 3 == 2,
                                 np.char.add("o", (sid % 1000).astype("U12")),
                                 np.char.add("v", i.astype("U12")))),
    })
    ds = rd.from_arrow(big).repartition(32)
    pats = [("?s", "a", "?x"), ("?s", "b", "?y"), ("?s", "rare", "o7")]

    def run_bgp(reorder):
        def f():
            cnt = evaluate_bgp(ds, pats, reorder=reorder,
                               num_buckets=32).count()
            return {"bgp_bindings": cnt}
        return f

    timed("bgp_9M_planner_on", run_bgp(True))
    timed("bgp_9M_planner_off_left_to_right", run_bgp(False))

    # --- deterministic_sample threshold pass over 2M rows ----------------
    from cattle_ray.stages.similarity import deterministic_sample

    vecs = pa.table({
        "vec_id": pa.array(np.arange(2_000_000, dtype=np.int64)),
        "embedding": pa.array(
            np.random.default_rng(7).random((2_000_000, 8)).tolist(),
            pa.list_(pa.float64())),
    })
    vds = rd.from_arrow(vecs).repartition(32)

    def do_sample():
        df = deterministic_sample(vds, 2048, "vec_id")
        assert len(df) == 2048

    timed("deterministic_sample_2M", do_sample)

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
