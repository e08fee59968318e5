"""Round-3 scale-stress evidence (BASELINE.md "Stress" rows):

1. kmeans_distributed over 2M × 32-d vectors with the corpus NEVER
   materialized (spilled projection, lazily re-read per pass) — the
   VERDICT r2 "What's wrong #3" fix at 10× the sf0.1 embedding table.
2. lm_score over a 100k-doc / 50k-word-vocab corpus: raw bigram census
   vs the top_v-capped broadcast (VERDICT #4 — bounded broadcast bytes
   at 10× corpus), scores still exact for surviving pairs.
3. within_batch_dedup 1M-row microbench: numpy-over-_chash vs the old
   full-batch pandas detour (VERDICT "What's wrong #5").

Fixture synthesis is untimed. Fresh Ray session; prints one JSON line.

Run: python scripts/stress_r3.py  (from the repo root)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    out = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        r = fn()
        out[name] = {"sec": round(time.perf_counter() - t0, 2), **r}
        print(f"[{name}] {out[name]}", file=sys.stderr)

    # --- 1. kmeans over 2M x 32-d vectors, corpus never materialized ----
    def gen_vecs(b: pa.Table) -> pa.Table:
        ids = b["id"].to_numpy()
        rng = np.random.RandomState(int(ids[0]) & 0x7FFFFFFF)
        # 8 planted centers so the clustering is non-degenerate
        centers = np.eye(32)[(ids % 8) * 4]
        vecs = centers + rng.randn(len(ids), 32) * 0.05
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([r.tolist() for r in vecs],
                                  pa.list_(pa.float64())),
        })

    vec_ds = rd.range(2_000_000, override_num_blocks=64).map_batches(
        lambda b: gen_vecs(pa.table({"id": b["id"]})), batch_format="pyarrow")

    def run_kmeans():
        from cattle_ray.stages.similarity import kmeans_distributed

        spill = tempfile.mkdtemp(prefix="stress_km_")
        cent, assigns = kmeans_distributed(
            vec_ds, n_clusters=8, iters=3, sample_size=4096,
            spill_dir=spill)
        n = assigns.count()
        return {"vectors": n, "clusters": int(cent.shape[0])}

    timed("kmeans_2M_no_materialize", run_kmeans)

    # --- 2. LM broadcast cap at a 10x corpus ---------------------------
    def gen_docs(b: pa.Table) -> pa.Table:
        ids = b["id"].to_numpy()
        rng = np.random.RandomState(int(ids[0]) & 0x7FFFFFFF)
        words = rng.randint(0, 50_000, size=(len(ids), 30))
        texts = [" ".join(f"w{w}" for w in row) for row in words]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts, pa.string())})

    docs = rd.range(100_000, override_num_blocks=32).map_batches(
        lambda b: gen_docs(pa.table({"id": b["id"]})),
        batch_format="pyarrow").materialize()  # fixture, untimed

    def bigram_census():
        from cattle_ray.stages.textstats import lm_score  # noqa: F401
        from cattle_ray.stages.aggregates import partial_count

        def pairs(b: pa.Table) -> pa.Table:
            import pandas as pd

            s = b["text"].to_pandas().str.split()
            e = s.explode()
            nxt = e.groupby(level=0).shift(-1)
            m = nxt.notna()
            return pa.table({"w1": pa.array(e[m], pa.string()),
                             "w2": pa.array(nxt[m], pa.string())})

        n = partial_count(
            docs.map_batches(pairs, batch_format="pyarrow"),
            ["w1", "w2"]).count()
        return {"distinct_bigrams": int(n)}

    timed("lm_bigram_census_100k_docs", bigram_census)

    CAP = 500_000

    def lm_capped():
        from cattle_ray.stages.textstats import lm_score

        scored = lm_score(docs, top_v=CAP)
        n = scored.count()
        # broadcast bound: CAP rows x ~24 B of (w1, w2, n) strings+int
        return {"docs": int(n), "broadcast_rows_cap": CAP,
                "approx_broadcast_mb": round(CAP * 24 / 1e6, 1)}

    timed("lm_score_100k_docs_top_v_cap", lm_capped)

    # --- 3. within_batch_dedup microbench ------------------------------
    def dedup_micro():
        from cattle_ray.stages.dedup import add_content_hash, within_batch_dedup

        n = 1_000_000
        rng = np.random.RandomState(0)
        k = rng.randint(0, 400_000, n)
        t = pa.table({
            "subj": [f"https://example.org/doc/{i}" for i in k],
            "pred": [f"https://example.org/def/p{i % 7}" for i in k],
            "obj": [f"value {i * 3}" for i in k],
            "id": np.arange(n, dtype=np.int64),
        })
        b = add_content_hash(t, ["subj", "pred", "obj"])
        t0 = time.perf_counter()
        new = within_batch_dedup(b, keep_col="id")
        dt_new = time.perf_counter() - t0

        def old(batch):
            import pandas as pd  # the replaced implementation, for the ratio

            df = batch.to_pandas().sort_values("id", kind="mergesort")
            return pa.Table.from_pandas(
                df.drop_duplicates(subset=["_chash"]),
                preserve_index=False).cast(batch.schema)

        t0 = time.perf_counter()
        prev = old(b)
        dt_old = time.perf_counter() - t0
        assert new.num_rows == prev.num_rows
        return {"rows": n, "survivors": new.num_rows,
                "numpy_sec": round(dt_new, 3),
                "pandas_sec": round(dt_old, 3),
                "speedup": round(dt_old / dt_new, 1)}

    timed("within_batch_dedup_1M", dedup_micro)

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
