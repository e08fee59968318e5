"""Round-5 window-shuffle A/B (VERDICT r4 order #4, BASELINE.md
"Stress" rows): sessionize and ordered_paths move FULL event rows
through a ``groupby(low-card _bucket).map_groups`` — the shape that
once funneled the dedup path through ONE SortMap task (230 s CPU).
The r4 sink A/B showed the funnel is NOT automatic (0.53–0.92× at 7M
rows); this decides whether the window ops need the raw-task
``hash_exchange`` at 100× the oracle scale.

A/B at 50M events (zipf-ish keys, the bot-key skew real event streams
have), identical kernels, fresh timings in ONE Ray session with
materialized input (synthesis untimed):

1. ``sessionize_sort``     — shipped groupby(_bucket).map_groups
2. ``sessionize_exchange`` — exchange=True
3. ``paths_sort``          — ordered_paths shipped
4. ``paths_exchange``      — ordered_paths exchange=True

Prints one JSON line. Run: python scripts/stress_r5_windows.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("STRESS_EVENTS", 50_000_000))
CHUNK = 2_000_000


def _events(n: int, start: int) -> pa.Table:
    rng = np.random.default_rng(start)
    # zipf-ish key skew: ~1.6M distinct users, hottest ~1% of rows
    u = (rng.zipf(1.3, n) % 1_600_000).astype(np.int64)
    ts = np.int64(1_700_000_000_000_000) + rng.integers(
        0, 30 * 86_400_000_000, n, dtype=np.int64)
    et = np.array(["view", "click", "cart", "buy"], dtype=object)[
        rng.integers(0, 4, n)]
    return pa.table({
        "user_id": pa.array(np.char.add("u", u.astype("U9"))),
        "ts": pa.array(ts).cast(pa.timestamp("us")),
        "event_type": pa.array(et.tolist(), pa.string()),
    })


def main() -> None:
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=int(os.environ.get(
        "RAY_GRAFT_CPUS", 32)), include_dashboard=False,
        logging_level="ERROR")
    from cattle_ray.stages.windows import ordered_paths, sessionize

    parts = [_events(CHUNK, i) for i in range(N // CHUNK)]
    ds = rd.from_arrow(parts).materialize()
    del parts
    out: dict = {"n_events": N, "cpus": int(os.environ.get(
        "RAY_GRAFT_CPUS", 32))}

    def run(tag, fn):
        t0 = time.perf_counter()
        n = fn().count()
        out[tag] = round(time.perf_counter() - t0, 2)
        out[tag + "_rows"] = n

    run("sessionize_sort", lambda: sessionize(ds, gap="1h"))
    run("sessionize_exchange",
        lambda: sessionize(ds, gap="1h", exchange=True))
    run("paths_sort", lambda: ordered_paths(ds))
    run("paths_exchange", lambda: ordered_paths(ds, exchange=True))
    assert out["sessionize_sort_rows"] == out["sessionize_exchange_rows"]
    assert out["paths_sort_rows"] == out["paths_exchange_rows"]
    out["sessionize_ratio_exchange_over_sort"] = round(
        out["sessionize_exchange"] / out["sessionize_sort"], 3)
    out["paths_ratio_exchange_over_sort"] = round(
        out["paths_exchange"] / out["paths_sort"], 3)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
