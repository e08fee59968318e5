"""Round-4 streaming-trigger stress (BASELINE.md "Stress" rows): VERDICT
r3 order #2 demanded the trigger's cost be bounded by NEW data, not
stream history — `emit_closed_windows` used to `read_accepted()` the
ENTIRE sink (every batch since stream birth) to aggregate only the newly
closed windows, so each trigger cost O(history).

This drives the fixed shape: 100 appended micro-batches (50k rows each,
one event-hour per batch, 5M rows total by the end), firing the trigger
after every append. With metadata pruning the trigger reads only the
1-3 batches that intersect the closed-but-unfired window range, so
trigger time must stay FLAT from batch 10 to batch 100 while the
history grows 10x. Reports first-decile vs last-decile mean trigger
time and the flatness ratio.

Fixture synthesis untimed. Fresh Ray session; prints one JSON line.

Run: python scripts/stress_r4_stream.py  (from the repo root)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np
import pandas as pd
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS_PER_BATCH = 50_000
N_BATCHES = 100
HOUR_US = 3600 * 10**6
BASE_US = int(pd.Timestamp("2024-01-01").value // 1000)


def _hour_batch(i: int) -> pa.Table:
    # ROWS_PER_BATCH events spread across hour i, deterministic
    off = (np.arange(ROWS_PER_BATCH, dtype=np.int64) * 104729) % HOUR_US
    ts = BASE_US + i * HOUR_US + np.sort(off)
    return pa.table({
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array((np.arange(ROWS_PER_BATCH) * 31 + i) % 997),
        "value": pa.array(np.arange(ROWS_PER_BATCH, dtype=np.float64)),
    })


def main() -> None:
    import ray
    import ray.data as rd

    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from cattle_ray.sources.stream_sink import (emit_closed_windows,
                                                read_emissions,
                                                watermarked_append)

    out = tempfile.mkdtemp(prefix="stress_stream_", dir="/tmp")
    trigger_s: list[float] = []
    append_s: list[float] = []
    fired_total = 0
    try:
        for i in range(N_BATCHES):
            tbl = _hour_batch(i)  # synthesis untimed
            t0 = time.perf_counter()
            watermarked_append(rd.from_arrow(tbl), out, batch_id=f"b{i}",
                               ts_col="ts", allowed_lateness="30min")
            append_s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            fired = emit_closed_windows(out, ts_col="ts", width="1h")
            trigger_s.append(time.perf_counter() - t0)
            fired_total += int(fired["n"].sum()) if len(fired) else 0
        n_emitted = int(read_emissions(out)["n"].sum())
    finally:
        shutil.rmtree(out, ignore_errors=True)
        ray.shutdown()

    first = float(np.mean(trigger_s[5:15]))   # skip warmup triggers
    last = float(np.mean(trigger_s[-10:]))
    print(json.dumps({
        "metric": "stream_trigger_flatness",
        "n_batches": N_BATCHES,
        "rows_total": ROWS_PER_BATCH * N_BATCHES,
        "windows_fired": fired_total,
        "rows_emitted": n_emitted,
        "trigger_mean_batches_5_15_sec": round(first, 4),
        "trigger_mean_last10_sec": round(last, 4),
        "flatness_ratio_last_over_first": round(last / first, 3),
        "trigger_max_sec": round(max(trigger_s), 4),
        "append_mean_sec": round(float(np.mean(append_s)), 4),
    }))


if __name__ == "__main__":
    main()
