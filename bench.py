"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) at $RAY_GRAFT_CPUS cpus (default 32).

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "triples_per_sec": ...}

``--scaling`` runs the headline pipeline in two fresh subprocesses
(num_cpus=8 and 32) on the same input and reports throughput at both plus
scaling efficiency (BASELINE.md scaling-evidence protocol: the sandbox
substitute for the N vs 4N-node cluster criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_benchmarks(sf_dir: str, num_cpus: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import __ray_entry__ as em

    # warm the OS page cache so we measure compute+shuffle, not first read
    for name in ["documents", "embeddings", "events", "lineitem"]:
        with open(f"{sf_dir}/{name}.parquet", "rb") as f:
            f.read()

    results: dict[str, float] = {}
    counts: dict[str, int] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        ds = fn(sf_dir)
        n = ds.count() if hasattr(ds, "count") else len(ds)
        results[name] = round(time.perf_counter() - t0, 3)
        counts[name] = int(n)

    qs = em.queries()
    bench_queries = [
        "kg_pipeline",        # headline: full KG construction
        "kg_extract_text",
        "kg_csvw_triples",
        "kg_openie",
        "kg_mentions",
        "doc_minhash_pairs",
        "doc_token_count",
        "embed_knn",
        "events_hourly",
        "lineitem_agg",
    ]
    for name in bench_queries:
        timed(name, qs[name])

    headline = results["kg_pipeline"]
    triples_per_sec = counts["kg_pipeline"] / headline if headline > 0 else 0.0
    out = {
        "metric": "kg_pipeline_sec",
        "value": headline,
        "unit": "sec",
        "queries": results,
        "counts": counts,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "triples_per_sec": round(triples_per_sec, 1),
    }
    ray.shutdown()
    return out


def run_subprocess(ncpu: int) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env, capture_output=True, text=True, check=True,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def main():
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--scaling" in sys.argv:
        lo, hi = 8, 32
        r_lo, r_hi = run_subprocess(lo), run_subprocess(hi)
        t_lo, t_hi = r_lo["value"], r_hi["value"]
        eff = (t_lo / t_hi) / (hi / lo)
        print(json.dumps({
            "metric": "scaling_efficiency",
            "value": round(eff, 3),
            "unit": "speedup_fraction",
            "sec_8": t_lo,
            "sec_32": t_hi,
            "triples_per_sec_8": r_lo["triples_per_sec"],
            "triples_per_sec_32": r_hi["triples_per_sec"],
            "sf": sf_dir,
        }))
        return
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    print(json.dumps(run_benchmarks(sf_dir, ncpu)))


if __name__ == "__main__":
    main()
