"""Watermark-disciplined micro-batch ingestion."""

import os

import pandas as pd
import pyarrow as pa
import pytest


def _batch(ts_list, start_id=0):
    import ray.data as rd

    base = pd.Timestamp("2024-01-01")
    n = len(ts_list)
    return rd.from_arrow(pa.table({
        "event_id": pa.array(range(start_id, start_id + n), pa.int64()),
        "ts": pa.array([base + pd.Timedelta(minutes=m) for m in ts_list],
                       pa.timestamp("us")),
    }))


def test_watermark_lifecycle(ray_session, tmp_path):
    """Late rows divert against the PRE-batch watermark; the watermark
    never regresses; replaying a batch_id is idempotent; accepted reads
    exclude the late channel; null event times are always late."""
    from cattle_ray.sources.stream_sink import (read_accepted,
                                                sink_watermark,
                                                watermarked_append)

    out = str(tmp_path / "sink")
    r1 = watermarked_append(_batch([0, 60, 120]), out, batch_id="b1",
                            ts_col="ts", allowed_lateness="30min")
    assert (r1["accepted"], r1["late"]) == (3, 0)  # empty wm accepts all
    wm1 = sink_watermark(out)

    # batch 2: 50 < 120-30 → late; 100 and 200 accepted; wm advances
    r2 = watermarked_append(_batch([50, 100, 200], 10), out, batch_id="b2",
                            ts_col="ts", allowed_lateness="30min")
    assert (r2["accepted"], r2["late"]) == (2, 1)
    assert sink_watermark(out) > wm1

    # batch of only-late rows must NOT regress the watermark
    wm2 = sink_watermark(out)
    r3 = watermarked_append(_batch([10], 20), out, batch_id="b3",
                            ts_col="ts", allowed_lateness="30min")
    assert (r3["accepted"], r3["late"]) == (0, 1)
    assert sink_watermark(out) == wm2

    # idempotent replay: same batch_id replaces, not duplicates
    watermarked_append(_batch([50, 100, 200], 10), out, batch_id="b2",
                       ts_col="ts", allowed_lateness="30min")
    acc = read_accepted(out).to_pandas()
    assert len(acc) == 5  # 3 (b1) + 2 (b2), no duplicates
    assert set(acc["event_id"]) == {0, 1, 2, 11, 12}
    # late channel holds the diverted rows
    import glob

    import pyarrow.parquet as pq

    late = sum(pq.read_table(p).num_rows
               for p in glob.glob(f"{out}/late/batch=*/*.parquet"))
    assert late == 2

    # null event time → always late
    import ray.data as rd

    nulls = rd.from_arrow(pa.table({
        "event_id": pa.array([99], pa.int64()),
        "ts": pa.array([None], pa.timestamp("us"))}))
    r4 = watermarked_append(nulls, out, batch_id="b4", ts_col="ts")
    assert (r4["accepted"], r4["late"]) == (0, 1)


def test_window_trigger_fires_exactly_once(ray_session, tmp_path):
    """emit_closed_windows fires each tumbling window exactly once: only
    watermark-passed windows emit, a repeat call emits nothing new, and
    a later batch that advances the watermark fires the next windows."""
    from cattle_ray.sources.stream_sink import (emit_closed_windows,
                                                watermarked_append)

    out = str(tmp_path / "sink")
    # minutes 0,10 (hour 0), 70 (hour 1), 130 (hour 2): wm=130min
    watermarked_append(_batch([0, 10, 70, 130]), out, batch_id="b1",
                       ts_col="ts", allowed_lateness="3h")
    fired = emit_closed_windows(out, ts_col="ts", width="1h")
    # hours 0 and 1 are closed (end <= 130min), hour 2 still open
    assert fired["n"].tolist() == [2, 1]
    again = emit_closed_windows(out, ts_col="ts", width="1h")
    assert len(again) == 0  # exactly-once

    # next batch: minute 190 (hour 3) advances wm past hour 2's end;
    # minute 65 is within lateness → lands in ALREADY-FIRED hour 1 but
    # that window never re-fires (append-only emission stream)
    watermarked_append(_batch([65, 190], 10), out, batch_id="b2",
                       ts_col="ts", allowed_lateness="3h")
    fired2 = emit_closed_windows(out, ts_col="ts", width="1h")
    assert fired2["n"].tolist() == [1]  # hour 2 (the 130-min row) only
