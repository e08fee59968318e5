"""Round-5 session-trigger stress (BASELINE.md "Stress" rows): the
gap-based session trigger's cost must track NEW data, not stream
history — the r4 fixed-window trigger-flatness protocol applied to
emit_closed_sessions' int64 boundary.

Protocol: 60 micro-batches of 100k events each (6M total), event time
advancing batch over batch (sessions close steadily), trigger after
every append. Reported: mean trigger time in the first vs last decile
(flatness ≈ 1 ⇒ the boundary prunes the grown history), total fired
sessions, and the journal's integrity (fired set size == journal
replay size).

Prints one JSON line. Run: python scripts/stress_r5_sessions.py
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

BATCHES = 60
ROWS = 100_000
US = 1_000_000


def _batch(i: int) -> pa.Table:
    rng = np.random.default_rng(i)
    # each batch covers a 10-minute span starting at i*10min; users
    # cycle so most sessions close within a few batches
    base = np.int64(i) * 600 * US
    ts = base + rng.integers(0, 600 * US, ROWS, dtype=np.int64)
    u = rng.integers(0, 30_000, ROWS)
    return pa.table({
        "user_id": pa.array(np.char.add("u", u.astype("U6"))),
        "ts": pa.array(ts, pa.int64()),
    })


def main() -> None:
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=int(os.environ.get(
        "RAY_GRAFT_CPUS", 32)), include_dashboard=False,
        logging_level="ERROR")
    from cattle_ray.sources.stream_sink import (emit_closed_sessions,
                                                read_session_emissions,
                                                watermarked_append)

    out = tempfile.mkdtemp(prefix="sess_stress_", dir="/tmp")
    trig = []
    fired_total = 0
    for i in range(BATCHES):
        watermarked_append(rd.from_arrow(_batch(i)), out,
                           batch_id=str(i), allowed_lateness="1min")
        t0 = time.perf_counter()
        f = emit_closed_sessions(out, gap="3min", num_buckets=16)
        trig.append(round(time.perf_counter() - t0, 3))
        fired_total += len(f)
    first = float(np.mean(trig[:6]))
    last = float(np.mean(trig[-6:]))
    journal = len(read_session_emissions(out))
    print(json.dumps({
        "batches": BATCHES, "rows_per_batch": ROWS,
        "trigger_first_decile_mean_s": round(first, 3),
        "trigger_last_decile_mean_s": round(last, 3),
        "flatness_last_over_first": round(last / first, 3),
        "fired_sessions": fired_total,
        "journal_rows": journal,
        "journal_matches": bool(journal == fired_total),
        "cpus": int(os.environ.get("RAY_GRAFT_CPUS", 32))}))
    ray.shutdown()


if __name__ == "__main__":
    main()
