"""Scale-stress evidence for the fourth-continuation operators
(BASELINE.md "Stress" rows): the end-to-end training-export funnel over
600k docs, the time-RANGE window over 5M events / 100k users (exact-tie
heavy), frequent-sequence mining over 5M events, a 3-way cogroup over
5M+2M fact rows against 500k dimension keys, and BM25 over 600k docs.
Fresh Ray session; prints one JSON line.

Run: python scripts/stress_round4.py  (from the repo root)
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

    def timed(name, setup):
        # setup() builds the fixture UNTIMED (driver-side synthesis of a
        # 600k-doc text corpus costs tens of seconds of pure-Python string
        # work — input generation, not engine time) and returns the run fn.
        run = setup()
        t0 = time.perf_counter()
        r = run()
        out[name] = {"sec": round(time.perf_counter() - t0, 2), **r}
        print(f"[{name}] {out[name]}", file=sys.stderr)

    # --- training-export funnel: 600k docs (20% exact dups after
    # normalization, mixed langs) through normalize → dedup → quality →
    # pack; text must cross exactly the one dedup shuffle
    def training_export_600k():
        from cattle_ray.stages.dedup import dedup_exact
        from cattle_ray.stages.sampling import pack_sequences
        from cattle_ray.stages.textstats import (normalize_text_batch,
                                                 repetition_batch)
        import pyarrow.compute as pc

        rng = np.random.RandomState(3)
        vocab = np.array([f"w{i:04d}" for i in range(5000)])
        n = 500_000
        base = [" ".join(vocab[rng.randint(0, 5000, 60)]) for _ in range(n)]
        dups = [base[i].upper() for i in range(100_000)]  # normalize-equal
        texts = base + dups
        ids = np.arange(len(texts), dtype=np.int64)
        langs = np.where(np.arange(len(texts)) % 10 == 9, "fr", "en")
        tbl = pa.table({"doc_id": ids, "text": texts, "lang": langs})

        def run():
            ds = rd.from_arrow(tbl).repartition(64)
            ds = ds.filter(expr="lang == 'en'")
            normed = ds.map_batches(normalize_text_batch,
                                    batch_format="pyarrow")
            kept = dedup_exact(normed, ["norm"], keep_col="doc_id")

            def qual(b: pa.Table) -> pa.Table:
                r = repetition_batch(b)
                nt = r["rep_n_tokens"].to_numpy(zero_copy_only=False)
                dup = r["dup_token_frac"].to_numpy(zero_copy_only=False)
                return b.select(["doc_id", "text"]).filter(
                    pa.array((nt >= 45) & (dup <= 0.9)))

            filt = kept.map_batches(qual, batch_format="pyarrow")
            res = pack_sequences(filt, "doc_id", "text", 512)
            return {"packed_docs": res.count()}

        return run

    # --- time-RANGE window: 5M events / 100k users over a 5000-unit time
    # domain (heavy exact-ts ties — the peer-collapse pre-aggregation is
    # what keeps the shuffle row count at distinct (key, ts), not events)
    def time_window_5m():
        from cattle_ray.stages.windows import grouped_time_window

        rng = np.random.RandomState(4)
        n = 5_000_000
        t = pa.table({
            "user_id": rng.randint(0, 100_000, n).astype(np.int64),
            "ts": rng.randint(0, 5000, n).astype(np.int64),
            "v": rng.randint(0, 1000, n).astype(np.int64),
        })
        def run():
            res = grouped_time_window(rd.from_arrow(t).repartition(64),
                                      key="user_id", ts="ts", val="v",
                                      window_us=100)
            return {"key_ts_rows": res.count()}

        return run

    # --- frequent sequences: 5M events / 100k users, top-20 trigram paths
    def frequent_paths_5m():
        from cattle_ray.stages.aggregates import top_k_counts
        from cattle_ray.stages.windows import sequence_ngrams

        rng = np.random.RandomState(5)
        n = 5_000_000
        t = pa.table({
            "user_id": rng.randint(0, 100_000, n).astype(np.int64),
            "ts": rng.randint(0, 10**9, n).astype(np.int64),
            "event_id": np.arange(n, dtype=np.int64),
            "event_type": np.array(["view", "click", "buy", "share",
                                    "search", "exit"])[rng.randint(0, 6, n)],
        })
        def run():
            seqs = sequence_ngrams(rd.from_arrow(t).repartition(64),
                                   key="user_id", ts="ts", val="event_type",
                                   n=3, order_tiebreak="event_id")
            return {"top": top_k_counts(seqs, ["seq"], k=20).count()}

        return run

    # --- 3-way cogroup: 500k dimension keys ⋈ 5M fact rows ⋈ 2M fact rows
    # in ONE shuffle, both fact sides pre-aggregated map-side
    def cogroup_7m():
        from cattle_ray.stages.joins import cogroup_left

        rng = np.random.RandomState(6)
        dim_t = pa.table({
            "k": np.arange(500_000, dtype=np.int64),
            "seg": np.array(["a", "b", "c"])[
                rng.randint(0, 3, 500_000)]})

        f1 = pa.table({
            "k1": rng.randint(0, 500_000, 5_000_000).astype(np.int64),
            "x": rng.randint(0, 100, 5_000_000).astype(np.int64)})
        f2 = pa.table({
            "k2": rng.randint(0, 500_000, 2_000_000).astype(np.int64)})

        def run():
            return _cogroup_run(dim_t, f1, f2, cogroup_left)

        return run

    def _cogroup_run(dim_t, f1, f2, cogroup_left):
        dim = rd.from_arrow(dim_t).repartition(16)

        def p1(b: pa.Table) -> pa.Table:
            o = b.group_by(["k1"]).aggregate([("x", "sum"),
                                              ([], "count_all")])
            return o.rename_columns(["k1", "px", "pn"])

        def p2(b: pa.Table) -> pa.Table:
            o = b.group_by(["k2"]).aggregate([([], "count_all")])
            return o.rename_columns(["k2", "pm"])

        s1 = rd.from_arrow(f1).repartition(64).map_batches(
            p1, batch_format="pyarrow")
        s2 = rd.from_arrow(f2).repartition(32).map_batches(
            p2, batch_format="pyarrow")

        def fin1(df):
            o = df.groupby("k1", sort=False)[["px", "pn"]].sum().reset_index()
            return o.rename(columns={"px": "sum_x", "pn": "n1"})

        def fin2(df):
            o = df.groupby("k2", sort=False)[["pm"]].sum().reset_index()
            return o.rename(columns={"pm": "n2"})

        def fill(df):
            for c in ["sum_x", "n1", "n2"]:
                df[c] = df[c].fillna(0).astype("int64")
            return df

        res = cogroup_left([(dim, "k", None), (s1, "k1", fin1),
                            (s2, "k2", fin2)], post_fn=fill)
        return {"rows": res.count()}

    # --- BM25: 600k docs, 3-term query, top-20
    def bm25_600k():
        from cattle_ray.stages.textstats import bm25_rank

        rng = np.random.RandomState(7)
        vocab = np.array([f"w{i:04d}" for i in range(5000)])
        n = 600_000
        texts = [" ".join(vocab[rng.randint(0, 5000, 80)]) for _ in range(n)]
        tbl = pa.table({"doc_id": np.arange(n, dtype=np.int64),
                        "text": texts})

        def run():
            ds = rd.from_arrow(tbl).repartition(64)
            res = bm25_rank(ds, ["w0001", "w0042", "w4999"], k=20)
            return {"rows": res.count()}

        return run

    timed("training_export_600k", training_export_600k)
    timed("time_window_5m", time_window_5m)
    timed("frequent_paths_5m", frequent_paths_5m)
    timed("cogroup_7m", cogroup_7m)
    timed("bm25_600k", bm25_600k)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
