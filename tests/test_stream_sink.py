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
    """emit_closed_windows fires a window only when NO future batch can
    accept a row into it (end + max_lateness <= watermark), each window
    exactly once; within-lateness stragglers land in NOT-yet-fired
    windows (nothing vanishes from the emission stream); the journal
    replays everything fired."""
    from cattle_ray.sources.stream_sink import (emit_closed_windows,
                                                read_emissions,
                                                watermarked_append)

    out = str(tmp_path / "sink")
    # minutes 0,10 (hour 0), 70 (hour 1), 130 (hour 2): wm=130min
    watermarked_append(_batch([0, 10, 70, 130]), out, batch_id="b1",
                       ts_col="ts", allowed_lateness="30min")
    fired = emit_closed_windows(out, ts_col="ts", width="1h")
    # hour 0 fires (60+30 <= 130); hour 1 cannot (120+30 > 130): a
    # straggler within the 30-min lateness could still join it
    assert fired["n"].tolist() == [2]
    assert len(emit_closed_windows(out, ts_col="ts", width="1h")) == 0

    # straggler at 105min is ACCEPTED (105 >= 130-30) into UNFIRED hour
    # 1; 190min advances wm so hours 1 and 2 become unreachable and fire
    watermarked_append(_batch([105, 190], 10), out, batch_id="b2",
                       ts_col="ts", allowed_lateness="30min")
    fired2 = emit_closed_windows(out, ts_col="ts", width="1h")
    # hour 1 = {70, 105}: the straggler was NOT lost. Hour 2 stays open
    # (180+30 > 190 — a 160-180min straggler could still join it)
    assert fired2["n"].tolist() == [2]

    # a third batch pushes the watermark past hour 2's reach
    watermarked_append(_batch([240], 20), out, batch_id="b3",
                       ts_col="ts", allowed_lateness="30min")
    fired3 = emit_closed_windows(out, ts_col="ts", width="1h")
    assert fired3["n"].tolist() == [1]  # hour 2 = {130}

    # the journal holds every fired window durably
    j = read_emissions(out)
    assert sorted(j["n"].tolist()) == [1, 2, 2]


def test_fired_window_rejects_looser_lateness(ray_session, tmp_path):
    """Once a window has fired, an append with a LARGER allowed_lateness
    cannot smuggle a row into it: the row diverts to late/ instead of
    vanishing from the emission stream (it would be counted in no
    emission otherwise). Replay of such a batch stays idempotent."""
    from cattle_ray.sources.stream_sink import (emit_closed_windows,
                                                read_accepted,
                                                read_emissions,
                                                watermarked_append)

    out = str(tmp_path / "sink")
    watermarked_append(_batch([0, 10, 130]), out, batch_id="b1",
                       ts_col="ts", allowed_lateness="30min")
    fired = emit_closed_windows(out, ts_col="ts", width="1h")
    assert fired["n"].tolist() == [2]  # hour 0 fired

    # minute 30 lies in FIRED hour 0; a 3h lateness would accept it
    # under the watermark rule alone (30 >= 130-180) — the fired
    # boundary must divert it
    r = watermarked_append(_batch([30, 140], 10), out, batch_id="b2",
                           ts_col="ts", allowed_lateness="3h")
    assert (r["accepted"], r["late"]) == (1, 1)
    acc = read_accepted(out).to_pandas()
    assert 10 not in set(acc["event_id"])  # the smuggler is not accepted

    # replaying b2 re-judges against the RECORDED boundary → idempotent
    r2 = watermarked_append(_batch([30, 140], 10), out, batch_id="b2",
                            ts_col="ts", allowed_lateness="3h")
    assert (r2["accepted"], r2["late"]) == (1, 1)
    assert len(read_accepted(out).to_pandas()) == 4

    # the journal still totals exactly the accepted rows of fired
    # windows — b2's 3h lateness became the sink max, so hour 2 (end
    # 180min) needs wm ≥ 360min to close
    watermarked_append(_batch([600], 20), out, batch_id="b3",
                       ts_col="ts", allowed_lateness="30min")
    emit_closed_windows(out, ts_col="ts", width="1h")
    j = read_emissions(out)
    assert int(j["n"].sum()) == 4  # hour0={0,10}, hour2={130,140}; no loss


def test_trigger_prunes_history_batches(ray_session, tmp_path):
    """The trigger's read set is bounded by NEW data: batches whose
    recorded [min_ts, max_ts] lies entirely inside fired windows are
    pruned by metadata alone, and the fired state is one high-water
    mark, not a growing set. A conflicting width raises."""
    import pytest as _pytest

    from cattle_ray.sources.stream_sink import (_load_meta,
                                                _trigger_batch_paths,
                                                emit_closed_windows,
                                                watermarked_append)

    out = str(tmp_path / "sink")
    # 20 history batches, one hour each, then a far-future batch that
    # closes them all
    for i in range(20):
        watermarked_append(_batch([i * 60, i * 60 + 5], i * 10), out,
                           batch_id=f"h{i}", ts_col="ts",
                           allowed_lateness="30min")
    watermarked_append(_batch([2000], 990), out, batch_id="far",
                       ts_col="ts", allowed_lateness="30min")
    fired = emit_closed_windows(out, ts_col="ts", width="1h")
    assert fired["n"].tolist() == [2] * 20

    meta = _load_meta(out)
    assert "fired_windows" not in meta  # boundary, not a growing set
    fb = int(meta["fired_boundary_us"])
    # wm=2000min, width=1h, lateness=30min → everything through hour 31
    # is closed (fired or permanently empty): boundary = base + 32h
    base_us = int(pd.Timestamp("2024-01-01").value // 1000)
    assert fb == base_us + 32 * 3600 * 10**6

    # new batch closes one more hour; the pruner must select ONLY the
    # batches intersecting the unfired range — none of the 20 history
    # batches qualify
    watermarked_append(_batch([2100], 991), out, batch_id="far2",
                       ts_col="ts", allowed_lateness="30min")
    meta = _load_meta(out)
    wm = int(meta["watermark_us"])
    width_us = 3600 * 10**6
    t_ws = wm - width_us - int(meta["max_lateness_us"])
    hi = (t_ws // width_us) * width_us + width_us - 1
    paths = _trigger_batch_paths(out, meta, fb, hi)
    assert all("batch=h" not in p for p in paths)
    assert any("batch=far" in p for p in paths)

    fired2 = emit_closed_windows(out, ts_col="ts", width="1h")
    assert fired2["n"].tolist() == [1]  # the 2000-min row's hour

    with _pytest.raises(ValueError, match="width"):
        emit_closed_windows(out, ts_col="ts", width="30min")


def test_hopping_windows_fire_exactly_once(ray_session, tmp_path):
    """width=1h, hop=30min: every row is counted in width/hop = 2
    windows; window starts close in start order, exactly once, behind
    the same one-int64 boundary; an empty window emits nothing."""
    from cattle_ray.sources.stream_sink import (emit_closed_windows,
                                                read_emissions,
                                                watermarked_append)

    out = str(tmp_path / "sink")
    # minutes 0, 10, 40, 70, 130 → wm = 130min
    watermarked_append(_batch([0, 10, 40, 70, 130]), out, batch_id="b1",
                       ts_col="ts", allowed_lateness="30min")
    fired = emit_closed_windows(out, ts_col="ts", width="1h", hop="30min")
    # closed: ws + 60 + 30 <= 130 → ws ∈ {-30, 0, 30} (min offsets)
    # [-30,30): {0,10}; [0,60): {0,10,40}; [30,90): {40,70}
    base_us = int(pd.Timestamp("2024-01-01").value // 1000)
    m = 60 * 10**6
    assert fired[["window_start_us", "n"]].values.tolist() == [
        [base_us - 30 * m, 2], [base_us, 3], [base_us + 30 * m, 2]]
    assert len(emit_closed_windows(out, ts_col="ts", width="1h",
                                   hop="30min")) == 0

    # advance the watermark far enough to close everything through 150
    watermarked_append(_batch([250], 10), out, batch_id="b2",
                       ts_col="ts", allowed_lateness="30min")
    fired2 = emit_closed_windows(out, ts_col="ts", width="1h", hop="30min")
    # [60,120): {70}; [90,150): {130}; [120,180): {130}; [150,210): {} —
    # the empty start emits no row
    assert fired2[["window_start_us", "n"]].values.tolist() == [
        [base_us + 60 * m, 1], [base_us + 90 * m, 1],
        [base_us + 120 * m, 1]]

    # every accepted row of a fully-fired range is journaled exactly
    # width/hop = 2 times: rows {0,10,40,70,130} → total n = 10
    j = read_emissions(out)
    assert int(j["n"].sum()) == 10


def test_hopping_fired_overlap_rejects_smuggler(ray_session, tmp_path):
    """After a hopping fire, a row whose ts falls inside ANY fired
    window's [start, start+width) range diverts to late/, even with a
    looser allowed_lateness — the append guard extends the boundary by
    the (width − hop) overlap."""
    from cattle_ray.sources.stream_sink import (emit_closed_windows,
                                                read_accepted,
                                                watermarked_append)

    out = str(tmp_path / "sink")
    watermarked_append(_batch([0, 10, 40, 70, 130]), out, batch_id="b1",
                       ts_col="ts", allowed_lateness="30min")
    emit_closed_windows(out, ts_col="ts", width="1h", hop="30min")
    # boundary = 60min (smallest unfired start); the largest FIRED
    # window [30, 90) still covers ts=80 — it must divert; ts=95 falls
    # only into unfired windows ([60,120), [90,150)) — it must append
    r = watermarked_append(_batch([80, 95], 10), out, batch_id="b2",
                           ts_col="ts", allowed_lateness="6h")
    assert (r["accepted"], r["late"]) == (1, 1)
    acc = read_accepted(out).to_pandas()
    assert 10 not in set(acc["event_id"]) and 11 in set(acc["event_id"])


def test_hopping_shape_validation(ray_session, tmp_path):
    """width must be a positive multiple of hop; a sink remembers its
    window shape — conflicting hop raises like conflicting width."""
    from cattle_ray.sources.stream_sink import (emit_closed_windows,
                                                watermarked_append)

    out = str(tmp_path / "sink")
    watermarked_append(_batch([0, 200]), out, batch_id="b1", ts_col="ts",
                       allowed_lateness="30min")
    with pytest.raises(ValueError, match="multiple of hop"):
        emit_closed_windows(out, ts_col="ts", width="1h", hop="25min")
    with pytest.raises(ValueError, match="multiple of hop"):
        emit_closed_windows(out, ts_col="ts", width="1h", hop="2h")
    emit_closed_windows(out, ts_col="ts", width="1h", hop="30min")
    with pytest.raises(ValueError, match="hop"):
        emit_closed_windows(out, ts_col="ts", width="1h", hop="15min")
    with pytest.raises(ValueError, match="width"):
        emit_closed_windows(out, ts_col="ts", width="2h", hop="30min")


def _sev(rows):
    import ray.data as rd

    US = 1_000_000
    return rd.from_arrow(pa.table({
        "user_id": [r[0] for r in rows],
        "ts": pa.array([r[1] * US for r in rows], pa.int64())}))


def test_session_trigger_lifecycle(ray_session, tmp_path):
    """Gap-based session windows on the streaming sink: a session fires
    once its end + gap + max_lateness clears the watermark; re-triggers
    are exactly-once (per-session journal); a later row below the
    session boundary diverts to the late channel even with a looser
    lateness; gap and window/session mixing are guarded."""
    from cattle_ray.sources.stream_sink import (emit_closed_sessions,
                                                emit_closed_windows,
                                                read_session_emissions,
                                                watermarked_append)

    US = 1_000_000
    d = str(tmp_path / "sink")
    watermarked_append(_sev([("u1", 0), ("u1", 60), ("u2", 1000)]), d,
                       batch_id="b0", allowed_lateness="0s")
    f1 = emit_closed_sessions(d, gap="5min")
    assert f1.values.tolist() == [["u1", 0, 60 * US, 2]]
    assert len(emit_closed_sessions(d, gap="5min")) == 0  # exactly-once
    watermarked_append(_sev([("u2", 1200), ("u3", 2000)]), d,
                       batch_id="b1", allowed_lateness="0s")
    f2 = emit_closed_sessions(d, gap="5min")
    assert f2.values.tolist() == [["u2", 1000 * US, 1200 * US, 2]]
    # boundary guard: a sub-boundary row is late despite loose lateness
    r = watermarked_append(_sev([("u1", 10)]), d, batch_id="b2",
                           allowed_lateness="10h")
    assert r["accepted"] == 0 and r["late"] == 1
    assert len(read_session_emissions(d)) == 2
    with pytest.raises(ValueError, match="gap"):
        emit_closed_sessions(d, gap="1min")
    with pytest.raises(ValueError, match="SESSION"):
        emit_closed_windows(d, width="1h")


def test_session_trigger_open_session_stays(ray_session, tmp_path):
    """A perpetually-active key pins its session open (and the
    boundary); it fires only once the gap finally clears — with its
    FULL history intact."""
    from cattle_ray.sources.stream_sink import (emit_closed_sessions,
                                                watermarked_append)

    US = 1_000_000
    d = str(tmp_path / "sink")
    # heartbeats every 60s across two batches (gap 5min keeps it open)
    watermarked_append(_sev([("bot", t) for t in range(0, 600, 60)]), d,
                       batch_id="b0", allowed_lateness="0s")
    assert len(emit_closed_sessions(d, gap="5min")) == 0
    watermarked_append(_sev([("bot", t) for t in range(600, 1200, 60)]
                            + [("x", 5000)]), d,
                       batch_id="b1", allowed_lateness="0s")
    f = emit_closed_sessions(d, gap="5min")
    # bot's whole 20-event run fires as ONE session
    assert f.values.tolist() == [["bot", 0, 1140 * US, 20]]


def test_session_trigger_no_fragment_reemission(ray_session, tmp_path):
    """Regression (round-5 review): a fired session whose span crosses
    the boundary — pinned lower by ANOTHER key's still-open session —
    must not re-fire as a truncated fragment on the next trigger. The
    fired-identity set keys on (session END, key), which a fragment
    shares with its original."""
    from cattle_ray.sources.stream_sink import (emit_closed_sessions,
                                                read_session_emissions,
                                                watermarked_append)

    US = 1_000_000
    d = str(tmp_path / "sink")
    # key A: chained events 60..76 — still open at wm=80 (76+5 > 80),
    # pins the boundary at its start 60;
    # key B: chained session [50, 70] — fires at wm=80 (70+5 <= 80)
    # and SPANS the boundary (50 < 60 <= 70)
    watermarked_append(
        _sev([("A", t) for t in (60, 64, 68, 72, 76)]
             + [("B", t) for t in (50, 54, 58, 62, 66, 70)]
             + [("w", 80)]), d, batch_id="b0", allowed_lateness="0s")
    f1 = emit_closed_sessions(d, gap="5s")
    assert sorted(map(tuple, f1.values.tolist())) == [
        ("B", 50 * US, 70 * US, 6)]
    # nudge the watermark to 81: A's full session [60,76] now fires
    # (81 <= 81) — but B's boundary-surviving fragment [62,70] must
    # NOT re-emit (same end, truncated start)
    watermarked_append(_sev([("c", 81)]), d, batch_id="b1",
                       allowed_lateness="0s")
    f2 = emit_closed_sessions(d, gap="5s")
    assert sorted(map(tuple, f2.values.tolist())) == [
        ("A", 60 * US, 76 * US, 5)]
    assert len(read_session_emissions(d)) == 2
