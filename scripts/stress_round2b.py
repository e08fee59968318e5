"""Scale-stress evidence for the round-2-continuation operators
(BASELINE.md "Stress" rows). Fresh Ray session, synthetic inputs sized
10-100× the sf0.1 suite; prints one JSON line.

Run: python scripts/stress_round2b.py  (from the repo root)
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

    # --- chunk-level exact dedup: 200k docs × ~50 words → ~1M chunks
    def mk_docs(n=200_000):
        vocab = np.array([f"w{i:03d}" for i in range(500)])

        def gen(b):
            ids = b["id"]
            rng = np.random.RandomState(ids[0] % 2**31)
            texts = [" ".join(vocab[rng.randint(0, 500, 50)]) for _ in ids]
            # plant exact duplicate chunks: every 10th doc repeats doc-0's
            # opening window
            texts = [("w000 w001 w002 w003 w004 w005 w006 w007 w008 w009 " + t)
                     if i % 10 == 0 else t for i, t in zip(ids, texts)]
            return pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array(texts, pa.string())})

        return rd.range(n, override_num_blocks=64).map_batches(
            gen, batch_format="numpy")

    def chunk_stress():
        from cattle_ray.stages.dedup import chunk_exact_dedup

        n = chunk_exact_dedup(mk_docs(), chunk_words=10).count()
        return {"kept_chunks": n}

    timed("chunk_dedup_200k_docs", chunk_stress)

    # --- incremental dedup: 2M-fp store, 500k incoming (10% dups)
    def store_stress():
        import tempfile

        from cattle_ray.stages.dedup import (
            dedup_against_store, write_fingerprint_store)

        def fps(lo, hi, tag):
            def gen(b):
                ids = b["id"]
                return pa.table({"fp": pa.array(
                    [f"{tag}{int(i):012d}" for i in ids], pa.string())})
            return rd.range(hi - lo, override_num_blocks=32).map_batches(
                lambda b: gen({"id": b["id"] + lo}), batch_format="numpy")

        path = tempfile.mkdtemp(prefix="stress_fp_", dir="/tmp")
        write_fingerprint_store(fps(0, 2_000_000, "s"), path)
        inc = fps(0, 50_000, "s").union(fps(0, 450_000, "n"))
        kept = dedup_against_store(inc, path, fp_rate=0.001).count()
        return {"kept": kept, "expect": 450_000}

    timed("store_dedup_2m_store_500k_incoming", store_stress)

    # --- 1M-event funnel + running sum
    def mk_events(n=1_000_000):
        def gen(b):
            ids = b["id"].astype(np.int64)
            rng = np.random.RandomState(int(ids[0]) % 2**31)
            kinds = np.array(["view", "click", "error", "other"])
            return pa.table({
                "event_id": pa.array(ids),
                "user_id": pa.array(ids % 50_000),
                "ts": pa.array(1704067200_000_000 + ids * 1000
                               + rng.randint(0, 500, len(ids))
                               ).cast(pa.timestamp("us")),
                "event_type": pa.array(kinds[rng.randint(0, 4, len(ids))]),
                "cents": pa.array(rng.randint(1, 10_000, len(ids)),
                                  type=pa.int64()),
            })

        return rd.range(n, override_num_blocks=64).map_batches(
            gen, batch_format="numpy")

    def funnel_stress():
        from cattle_ray.stages.windows import funnel

        n = funnel(mk_events(), ["view", "click", "error"]).count()
        return {"converted_users": n}

    timed("funnel_1m_events", funnel_stress)

    def runsum_stress():
        from cattle_ray.stages.windows import grouped_running_sum

        n = grouped_running_sum(mk_events(), key="user_id", ts="ts",
                                val="cents", out="run",
                                order_tiebreak="event_id").count()
        return {"rows": n}

    timed("running_sum_1m_events", runsum_stress)

    # --- sorted range export of 5M rows + pruned read-back
    def sorted_stress():
        import tempfile

        from cattle_ray.sources.sorted_sink import (
            read_sorted_range, write_sorted_range_partitioned)

        def gen(b):
            ids = b["id"].astype(np.int64)
            rng = np.random.RandomState(int(ids[0]) % 2**31)
            return pa.table({"value": pa.array(rng.permutation(ids)),
                             "payload": pa.array(ids % 97)})

        ds = rd.range(5_000_000, override_num_blocks=64).map_batches(
            gen, batch_format="numpy")
        path = tempfile.mkdtemp(prefix="stress_sorted_", dir="/tmp")
        man = write_sorted_range_partitioned(ds, "value", path)
        pruned = read_sorted_range(path, "value", 1_000_000, 1_001_000)
        return {"parts": len(man),
                "files_read": len(pruned.input_files()),   # 1 of 64 → pruned
                "rows_in_read_parts": pruned.count()}

    timed("sorted_export_5m_rows", sorted_stress)

    # --- adjacency materialization over 2M triples
    def adjacency_stress():
        from cattle_ray.stages.graph import adjacency_lists

        def gen(b):
            ids = b["id"].astype(np.int64)
            rng = np.random.RandomState(int(ids[0]) % 2**31)
            return pa.table({
                "subj": pa.array([f"s{v}" for v in rng.zipf(1.3, len(ids))
                                  % 200_000]),
                "pred": pa.array([f"p{v}" for v in rng.randint(0, 20,
                                                               len(ids))]),
                "obj": pa.array([f"o{v}" for v in rng.randint(0, 100_000,
                                                              len(ids))]),
            })

        ds = rd.range(2_000_000, override_num_blocks=64).map_batches(
            gen, batch_format="numpy")
        n = adjacency_lists(ds).count()
        return {"subjects": n}

    timed("adjacency_2m_triples_zipf_skew", adjacency_stress)

    print(json.dumps(out))
    ray.shutdown()


def extra_graph_stress():
    """Triangle count + entity resolution at 10-20× the sf0.1 graph
    (run separately: python -c 'from scripts.stress_round2b import *; ...'
    or via __main__ --graph)."""
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    out = {}

    def gen_edges(b):
        ids = b["id"].astype(np.int64)
        rng = np.random.RandomState(int(ids[0]) % 2**31)
        # power-law-ish graph on 100k nodes: triangles exist, hubs exist
        u = rng.zipf(1.5, len(ids)) % 100_000
        v = rng.randint(0, 100_000, len(ids))
        return pa.table({"u": pa.array([f"n{x}" for x in u]),
                         "v": pa.array([f"n{x}" for x in v])})

    edges = rd.range(2_000_000, override_num_blocks=64).map_batches(
        gen_edges, batch_format="numpy").materialize()

    from cattle_ray.stages.graph import triangles

    t0 = time.perf_counter()
    n = triangles(edges, count_only=True)
    out["triangles_2m_edges_zipf"] = {
        "sec": round(time.perf_counter() - t0, 2), "n_triangles": n}
    print(out["triangles_2m_edges_zipf"], file=sys.stderr)

    from cattle_ray.stages.link import entity_resolution

    def gen_ents(b):
        ids = b["id"].astype(np.int64)
        return pa.table({
            "uri": pa.array([f"http://e/{int(i):07d}" for i in ids]),
            "name": pa.array([f"blk{int(i) % 100_000}" for i in ids]),
        })

    ents = rd.range(1_000_000, override_num_blocks=64).map_batches(
        gen_ents, batch_format="numpy")
    t0 = time.perf_counter()
    resolved = entity_resolution(ents, "uri", "name").count()
    out["entity_resolution_1m_rows_100k_blocks"] = {
        "sec": round(time.perf_counter() - t0, 2), "rows": resolved}
    print(out["entity_resolution_1m_rows_100k_blocks"], file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    if "--graph" in sys.argv:
        extra_graph_stress()
    else:
        main()
