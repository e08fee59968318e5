"""Round-4 sink-shuffle stress (BASELINE.md "Stress" rows): the store
write/merge exchange re-routed through hash_exchange (VERDICT r3 order
#1 — the last full-row ``groupby(low-card part_id).map_groups`` on a hot
path, the exact shape profiling showed funneling the whole table through
ONE SortMap task on the dedup path).

A/B at flagship scale (~7M triples, the 2M-page corpus's output size):

1. ``sink_write_exchange`` — write_triples_hash_partitioned as shipped
   (hash_exchange: one split per block, one sorted-write reduce per
   partition).
2. ``sink_write_sort_groupby`` — the SAME write finish fn driven by Ray
   Data's sort-based ``groupby("part_id").map_groups`` (the pre-r4
   shape), for the win measurement.
3. ``sink_merge_exchange`` — a 2M-row delta merged into the 7M store on
   the new path.

Fixture synthesis is untimed. Fresh Ray session; prints one JSON line.

Run: python scripts/stress_r4_sink.py  (from the repo root)
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
    subj = np.char.add("https://ex.org/s/", (i % n_subj).astype("U12"))
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

    from cattle_ray.sources.triple_sink import (
        merge_triples_hash_partitioned, write_triples_hash_partitioned)

    P = 16
    PREDS = [f"https://ex.org/p/{k}" for k in range(12)]
    root = tempfile.mkdtemp(prefix="stress_sink_")
    res = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        res[name] = round(time.perf_counter() - t0, 2)
        return out

    def base_ds():
        return rd.range(7_000_000, override_num_blocks=64).map_batches(
            lambda b: _triples(len(b["id"]), 1_400_000, PREDS,
                               start=int(b["id"][0])),
            batch_format="numpy")

    # untimed warmup: absorb worker-process import/startup cost so the
    # FIRST timed path isn't charged for the session's cold start (the
    # initial A/B charged it to the exchange side — 50 s vs a true ~17 s)
    w = os.path.join(root, "warmup")
    write_triples_hash_partitioned(
        rd.range(50_000, override_num_blocks=8).map_batches(
            lambda b: _triples(len(b["id"]), 10_000, PREDS,
                               start=int(b["id"][0])),
            batch_format="numpy"), w, num_partitions=P)
    shutil.rmtree(w, ignore_errors=True)

    # --- 1. write on the shipped hash_exchange path ----------------------
    d_new = os.path.join(root, "store_exchange")
    m = timed("sink_write_exchange",
              lambda: write_triples_hash_partitioned(base_ds(), d_new,
                                                     num_partitions=P))
    n_new = int(m["n_triples"].sum())

    # --- 2. the pre-r4 sort-based groupby shape, same finish fn ----------
    def write_sort_groupby():
        from cattle_ray.sources.triple_sink import add_subj_partition

        d_old = os.path.join(root, "store_groupby")
        os.makedirs(d_old, exist_ok=True)
        with_part = base_ds().map_batches(
            lambda b: add_subj_partition(b, P), batch_format="pyarrow")

        def write_group(g: pa.Table) -> pa.Table:
            import pyarrow.parquet as pq

            pid = int(g["part_id"][0].as_py())
            g = g.drop_columns(["part_id"]).sort_by(
                [("subj", "ascending"), ("pred", "ascending"),
                 ("obj", "ascending")])
            pdir = os.path.join(d_old, f"part_id={pid}")
            os.makedirs(pdir, exist_ok=True)
            pq.write_table(g, os.path.join(pdir, "data.parquet"))
            return pa.table({"part_id": pa.array([pid]),
                             "n_triples": pa.array([g.num_rows])})

        return with_part.groupby("part_id").map_groups(
            write_group, batch_format="pyarrow").to_pandas()

    m_old = timed("sink_write_sort_groupby", write_sort_groupby)
    assert int(m_old["n_triples"].sum()) == n_new, "A/B paths disagree"

    # --- 3. 2M-row delta merge into the 7M store (new path) --------------
    delta = rd.range(2_000_000, override_num_blocks=32).map_batches(
        lambda b: _triples(len(b["id"]), 1_400_000, PREDS,
                           start=9_000_000 + int(b["id"][0])),
        batch_format="numpy")
    timed("sink_merge_exchange",
          lambda: merge_triples_hash_partitioned(delta, d_new,
                                                 num_partitions=P))

    res["n_triples"] = n_new
    res["speedup_write"] = round(
        res["sink_write_sort_groupby"] / res["sink_write_exchange"], 2)
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main()
