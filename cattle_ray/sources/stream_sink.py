"""Watermark-disciplined micro-batch ingestion — the streaming-window
operator family's missing sink half: batch appends whose EVENT-TIME
watermark decides which rows are too late to join windows that already
closed.

Semantics (the standard streaming contract, deterministic and
SQL-mirrorable):

- the sink's ``_meta.json`` carries the high-water mark = max event time
  over all rows ACCEPTED so far (stored as int64 epoch micros);
- a new batch is judged against the PRE-batch watermark: rows with
  ``ts < watermark − allowed_lateness`` are LATE — they divert to
  ``out_dir/late/`` (never silently dropped, never mixed into closed
  windows); everything else appends;
- once any window has FIRED (see :func:`emit_closed_windows`), rows
  whose window lies below the fired boundary are late regardless of the
  batch's ``allowed_lateness`` — a later append with a looser lateness
  can therefore never smuggle a row into a window that already emitted
  (it would be counted in NO emission otherwise);
- the watermark then advances to ``max(old, max accepted ts)`` — a
  batch's own rows never make each other late, and late rows never move
  the watermark backwards;
- ``batch_id`` names the batch's directory, so replaying a crashed batch
  overwrites its own output instead of duplicating it (idempotent
  micro-batch replay — the same at-least-once discipline as the
  checkpoint manifest).

Scale shape: each batch records its accepted rows' min/max event time in
``_meta.json``, and the trigger prunes batches whose whole time range
lies inside already-fired windows (or entirely in still-open ones) — so
a trigger's cost is bounded by the NEW data since the last firing, not
by the stream's full history. The fired state is one int64 high-water
mark, not a growing set.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


# one atomic-meta discipline across the sinks (fsync/tmp-name fixes land
# once): the stream sink's meta is missing before the first batch
from .triple_sink import _save_meta
from .triple_sink import _load_meta as _load_meta_strict


def _load_meta(out_dir: str) -> dict:
    meta = _load_meta_strict(out_dir, missing_ok=True)
    # migrate a pre-boundary meta (fired_windows list) to the high-water
    # mark: every listed window fired, so the boundary sits one window
    # above the largest
    if "fired_boundary_us" not in meta and meta.get("fired_windows") \
            and meta.get("width_us"):
        meta["fired_boundary_us"] = \
            int(max(meta["fired_windows"])) + int(meta["width_us"])
    return meta


def _ts_micros(col) -> "pa.Array":
    """Event-time column as int64 epoch micros (timestamp[us/ns/s] cast;
    int64 passes through)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_timestamp(col.type):
        return pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())
    return pc.cast(col, pa.int64())


def sink_watermark(out_dir: str):
    """The sink's current watermark as int64 epoch micros (None before
    the first accepted batch)."""
    wm = _load_meta(out_dir).get("watermark_us")
    return None if wm is None else int(wm)


def watermarked_append(ds, out_dir: str, *, batch_id: str,
                       ts_col: str = "ts",
                       allowed_lateness: "pd.Timedelta | str" = "1h"):
    """Append one micro-batch under the watermark discipline (see module
    docstring). The batch is MATERIALIZED once (micro-batch sized by
    definition — the split, the two writes and the min/max-ts pass must
    not re-execute an upstream pipeline). Returns ``{"accepted": n,
    "late": n, "watermark_us": wm}``. Accepted rows land in
    ``out_dir/batch=<batch_id>/``, late rows in
    ``out_dir/late/batch=<batch_id>/``; replaying the same batch_id
    replaces both (idempotent)."""
    import os
    import shutil

    import ray.data as rd

    late_us = int(pd.Timedelta(allowed_lateness).value // 1000)
    meta = _load_meta(out_dir)
    wm = meta.get("watermark_us")
    # replayed batch_ids are judged against their ORIGINAL pre-batch
    # watermark AND fired boundary (recorded at first append) — both have
    # advanced since, and re-judging against the new values would
    # reclassify rows the first run accepted as late (replay must be
    # idempotent)
    rec = meta.get("batches", {}).get(str(batch_id))
    wm_judge = rec["wm_before_us"] if rec else wm
    fb_judge = rec.get("fired_boundary_before_us") if rec \
        else meta.get("fired_boundary_us")
    sb_judge = rec.get("session_boundary_before_us") if rec \
        else meta.get("session_boundary_us")
    os.makedirs(out_dir, exist_ok=True)

    ds = ds.materialize()

    def split(b: pa.Table, keep_late: bool) -> pa.Table:
        ts = _ts_micros(b[ts_col])
        valid = pc.is_valid(ts)  # null event time is ALWAYS late — even
        # against an empty watermark, where a null would otherwise ride
        # the accept-all mask into the store (and NaN-poison the max-ts
        # pass and every window bucketization downstream)
        if wm_judge is None:
            m = valid
        else:
            m = pc.and_(valid, pc.fill_null(pc.greater_equal(
                ts, pa.scalar(int(wm_judge) - late_us, pa.int64())), False))
        if fb_judge is not None:
            # boundary = smallest unfired window START. Tumbling: "my
            # window fired" ⇔ ts < boundary. Hopping: the largest FIRED
            # window (boundary − hop) covers rows up to boundary − hop +
            # width, so any ts below that overlap edge falls into at
            # least one fired window — a looser allowed_lateness can
            # never re-open a fired window on either shape
            overlap = 0
            if meta.get("width_us") is not None:
                overlap = int(meta["width_us"]) - int(
                    meta.get("hop_us", meta["width_us"]))
            m = pc.and_(m, pc.fill_null(pc.greater_equal(
                ts, pa.scalar(int(fb_judge) + overlap, pa.int64())),
                False))
        if sb_judge is not None:
            # session boundary: every event below it belongs to a FIRED
            # session (emit_closed_sessions' invariant) — divert, so a
            # looser lateness can never smuggle into a fired session
            m = pc.and_(m, pc.fill_null(pc.greater_equal(
                ts, pa.scalar(int(sb_judge), pa.int64())), False))
        return b.filter(pc.invert(m) if keep_late else m)

    accepted = ds.map_batches(lambda b: split(b, False),
                              batch_format="pyarrow").materialize()
    late = ds.map_batches(lambda b: split(b, True), batch_format="pyarrow")

    bdir = os.path.join(out_dir, f"batch={batch_id}")
    ldir = os.path.join(out_dir, "late", f"batch={batch_id}")
    for d in (bdir, ldir):
        if os.path.isdir(d):
            shutil.rmtree(d)  # idempotent replay of a crashed batch

    n_acc = accepted.count()
    n_late = late.count()
    mn = mx = None
    if n_acc:
        accepted.write_parquet(bdir)
        rng = accepted.map_batches(
            lambda b: pa.table({
                "mn": [pc.min(_ts_micros(b[ts_col])).as_py()],
                "mx": [pc.max(_ts_micros(b[ts_col])).as_py()]}),
            batch_format="pyarrow").to_pandas()
        mn, mx = int(rng["mn"].min()), int(rng["mx"].max())
        wm = mx if wm is None else max(int(wm), mx)
    if n_late:
        late.write_parquet(ldir)

    meta["watermark_us"] = wm
    # the trigger must know the loosest lateness ever used: a window may
    # only fire once NO future batch can accept a row into it, i.e. when
    # window_end + max_lateness <= watermark
    meta["max_lateness_us"] = max(int(meta.get("max_lateness_us", 0)),
                                  late_us)
    batches = meta.setdefault("batches", {})
    batches[str(batch_id)] = {
        "accepted": int(n_acc), "late": int(n_late),
        "wm_before_us": None if wm_judge is None else int(wm_judge),
        "fired_boundary_before_us":
            None if fb_judge is None else int(fb_judge),
        "session_boundary_before_us":
            None if sb_judge is None else int(sb_judge),
        # per-batch event-time range: the trigger prunes whole batches by
        # these, bounding its cost by new data instead of stream history
        "min_ts_us": mn, "max_ts_us": mx}
    _save_meta(out_dir, meta)
    return {"accepted": int(n_acc), "late": int(n_late),
            "watermark_us": wm}


def read_accepted(out_dir: str):
    """All accepted rows across batches as a streaming Dataset (late
    rows live under ``late/`` and are excluded)."""
    import glob

    import ray.data as rd

    parts = sorted(glob.glob(f"{out_dir}/batch=*/*.parquet"))
    if not parts:
        raise FileNotFoundError(f"no accepted batches in {out_dir!r}")
    return rd.read_parquet(parts)


def _trigger_batch_paths(out_dir: str, meta: dict, lo_us, hi_us) -> list:
    """Parquet paths of the accepted batches whose recorded event-time
    range [min_ts, max_ts] intersects [lo_us, hi_us] — the only batches
    that can hold rows of a closed-but-unfired window. Batches written
    before min/max recording existed are included conservatively."""
    import glob

    paths = []
    for bid, rec in meta.get("batches", {}).items():
        if not rec.get("accepted"):
            continue
        mn, mx = rec.get("min_ts_us"), rec.get("max_ts_us")
        if mn is not None and mx is not None:
            if (lo_us is not None and mx < lo_us) or \
                    (hi_us is not None and mn > hi_us):
                continue
        paths.extend(sorted(glob.glob(
            f"{out_dir}/batch={bid}/*.parquet")))
    return paths


def emit_closed_windows(out_dir: str, *, ts_col: str = "ts",
                        key: str | None = None,
                        width: "pd.Timedelta | str" = "1h",
                        hop: "pd.Timedelta | str | None" = None):
    """Fire the streaming TRIGGER: aggregate every window that can NEVER
    gain another accepted row — ``window_end + max_lateness ≤ watermark``
    (a future batch accepts only ``ts ≥ watermark − max_lateness``, which
    lies strictly beyond such a window; and once fired,
    :func:`watermarked_append` diverts any row that falls into a fired
    window to the late channel, so no accepted row is ever lost from the
    emission stream) — and that has not fired before.

    ``hop=None`` (default) means TUMBLING windows of ``width``;
    ``hop=<duration>`` means HOPPING (sliding) windows: window starts at
    every hop multiple, each covering ``[start, start+width)``, so every
    row is counted in ``width/hop`` windows. ``width`` must be a multiple
    of ``hop`` (the standard aligned-hopping contract — it keeps "row r
    is in fired window w" a single integer comparison on both the append
    and trigger paths). Window starts still close in start order, so the
    exactly-once state stays ONE int64 boundary, not a growing set.

    Each window emits EXACTLY ONCE across calls: the per-window
    aggregate is JOURNALED to ``out_dir/emissions/win=<start>/`` FIRST
    (deterministic per-window paths — a crash between journal and meta
    re-fires into the same files, idempotent) and only then recorded in
    ``_meta.json`` as the fired-boundary high-water mark;
    ``read_emissions`` replays the journal, so a consumer that crashed
    holding the returned frame loses nothing. Counts come from the
    engine's map-side-combined
    :func:`~..stages.aggregates.partial_count` over (window[, key]);
    returns a pandas frame ``(window_start_us[, key], n)`` of the NEWLY
    fired windows only.

    Cost is bounded by NEW data: only batches whose recorded min/max
    event time intersects the closed-but-unfired window range are read
    (batches fully inside fired windows — the stream's history — are
    pruned by metadata alone). The hopping expansion (×width/hop rows)
    happens AFTER that pruning and carries only (window, key) columns,
    never payloads."""
    import os

    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from ..stages.aggregates import partial_count

    width_us = int(pd.Timedelta(width).value // 1000)
    hop_us = width_us if hop is None else int(pd.Timedelta(hop).value
                                              // 1000)
    if hop_us <= 0 or width_us <= 0:
        raise ValueError("width and hop must be positive durations")
    if hop_us > width_us or width_us % hop_us:
        raise ValueError(
            f"width ({width_us}us) must be a positive multiple of hop "
            f"({hop_us}us): hop > width would silently DROP rows between "
            "windows, and a non-multiple makes 'row is in fired window' "
            "range-dependent — both break the one-int64 exactly-once "
            "boundary")
    meta = _load_meta(out_dir)
    if meta.get("session_gap_us") is not None:
        raise ValueError(
            "this sink already fires SESSION windows (session_gap_us "
            "recorded) — session and window boundaries don't compose; "
            "use a separate sink for fixed windows")
    if meta.get("width_us") is not None and \
            int(meta["width_us"]) != width_us:
        raise ValueError(
            f"trigger width {width!r} ({width_us}us) conflicts with this "
            f"sink's recorded width ({meta['width_us']}us) — the fired "
            "boundary is only meaningful for ONE window shape per sink")
    if meta.get("width_us") is not None and \
            int(meta.get("hop_us", meta["width_us"])) != hop_us:
        raise ValueError(
            f"trigger hop ({hop_us}us) conflicts with this sink's "
            f"recorded hop ({int(meta.get('hop_us', meta['width_us']))}us)"
            " — the fired boundary is only meaningful for ONE window "
            "shape per sink")
    wm = meta.get("watermark_us")
    late_us = int(meta.get("max_lateness_us", 0))
    fired_boundary = meta.get("fired_boundary_us")  # smallest UNFIRED ws
    empty_cols = {"window_start_us": pd.Series([], dtype="int64"),
                  **({key: pd.Series([], dtype="object")} if key else {}),
                  "n": pd.Series([], dtype="int64")}
    if wm is None:
        return pd.DataFrame(empty_cols)

    # max closed window start (a hop multiple): ws + width + late <= wm
    t_ws = ((int(wm) - width_us - late_us) // hop_us) * hop_us
    lo = None if fired_boundary is None else int(fired_boundary)
    if t_ws < (lo if lo is not None else t_ws):
        # lateness grew faster than the watermark: nothing newly closed
        return pd.DataFrame(empty_cols)
    # rows of closed-unfired windows lie in [lo, last closed window end)
    hi = t_ws + width_us - 1
    paths = _trigger_batch_paths(out_dir, meta, lo, hi)
    if not paths:
        return pd.DataFrame(empty_cols)

    k = width_us // hop_us  # windows per row (1 = tumbling)

    def bucketize(b: pa.Table) -> pa.Table:
        ts = _ts_micros(b[ts_col]).to_numpy(zero_copy_only=False)
        base = (ts // hop_us) * hop_us  # the row's LARGEST window start
        if k == 1:
            cols = {"window_start_us": pa.array(base.astype("int64"))}
            if key:
                cols[key] = b[key]
            return pa.table(cols)
        starts = (np.repeat(base, k)
                  - np.tile(np.arange(k, dtype="int64") * hop_us, len(ts)))
        cols = {"window_start_us": pa.array(starts.astype("int64"))}
        if key:
            idx = pa.array(np.repeat(np.arange(len(ts), dtype="int64"), k))
            col = b[key]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[key] = col.take(idx)
        return pa.table(cols)

    ds = rd.read_parquet(paths).map_batches(bucketize,
                                            batch_format="pyarrow")

    def closed_unfired(b: pa.Table) -> pa.Table:
        ws = b["window_start_us"].to_numpy(zero_copy_only=False)
        m = ws <= t_ws
        if fired_boundary is not None:
            m &= ws >= int(fired_boundary)
        return b.filter(pa.array(m))

    ds = ds.map_batches(closed_unfired, batch_format="pyarrow")
    keys = ["window_start_us"] + ([key] if key else [])
    out = partial_count(ds, keys).to_pandas()
    if len(out) == 0:
        return pd.DataFrame(empty_cols)
    out = out.sort_values(keys, kind="mergesort").reset_index(drop=True)
    # journal FIRST, meta second: the fired boundary only ever covers
    # windows whose aggregates are already durable
    for ws, grp in out.groupby("window_start_us", sort=True):
        wdir = os.path.join(out_dir, "emissions", f"win={int(ws)}")
        os.makedirs(wdir, exist_ok=True)
        tmp = os.path.join(wdir, ".data.parquet.tmp")
        pq.write_table(pa.Table.from_pandas(grp.reset_index(drop=True),
                                            preserve_index=False), tmp)
        os.replace(tmp, os.path.join(wdir, "data.parquet"))
    # every start at or below t_ws is now fired-or-permanently-empty: the
    # boundary is the next window start, a single int64 (no growing set)
    new_boundary = t_ws + hop_us
    if fired_boundary is not None:
        new_boundary = max(new_boundary, int(fired_boundary))
    meta["fired_boundary_us"] = int(new_boundary)
    meta["width_us"] = width_us
    meta["hop_us"] = hop_us
    meta.pop("fired_windows", None)  # replaced by the boundary
    _save_meta(out_dir, meta)
    return out


def emit_closed_sessions(out_dir: str, *, ts_col: str = "ts",
                         key: str = "user_id",
                         gap: "pd.Timedelta | str" = "30min",
                         num_buckets: int = 16):
    """Fire GAP-BASED SESSION windows (ROADMAP r5 item 3): a session of
    ``key`` closes when no accepted row can ever extend it —
    ``session_end + gap + max_lateness ≤ watermark`` (any future
    accepted row has ``ts ≥ wm − lateness ≥ end + gap``, which starts a
    NEW session; and no accepted row can merge BEFORE a closed session
    either, same bound). Unlike fixed windows, sessions aren't aligned,
    so exactly-once rides two mechanisms:

    * a single int64 ``session_boundary_us`` = every event BELOW it
      belongs to a fired session (new boundary = min(unfired session
      starts, wm − lateness), never decreasing) — the trigger prunes
      whole batches below it by metadata, and
      :func:`watermarked_append` diverts later sub-boundary rows to the
      late channel (a looser lateness can't smuggle into a fired
      session, the same discipline as the fixed-window boundary);
    * ONE journal file per effective trigger,
      ``sessions/fire=<content-hash>/`` holding the NEWLY fired
      sessions — a crash replay recomputes the same newly-fired set
      (same meta state) and overwrites the same file (idempotent; the
      window trigger's journal-first discipline). "Newly" is decided
      against a SMALL meta set of already-fired session identities at
      or above the boundary (only those can ever recompute — sessions
      below the boundary are pruned away), so the set shrinks as the
      boundary advances; it never grows with stream history.

    HONEST cost bound: a trigger reads every batch at or above the
    boundary. A perpetually-active key (bot heartbeats within the gap)
    keeps its session open and PINS the boundary, so trigger cost
    grows with that session's span — that is inherent to unbounded
    sessions (cap them upstream if it bites); for streams whose
    sessions actually close, the boundary tracks the watermark and
    cost stays proportional to new data. A sink fires EITHER fixed
    windows or sessions, never both (the two boundaries would not
    compose). ``gap`` is fixed per sink (conflict guard). Returns
    ``(key, session_start_us, session_end_us, n)`` of newly fired
    sessions."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from ..stages.dedup import hash_strings64
    from ..stages.windows import sessionize

    gap_us = int(pd.Timedelta(gap).value // 1000)
    if gap_us <= 0:
        raise ValueError("gap must be a positive duration")
    meta = _load_meta(out_dir)
    if meta.get("width_us") is not None:
        raise ValueError(
            "this sink already fires FIXED windows (width_us recorded) "
            "— session and window boundaries don't compose; use a "
            "separate sink for sessions")
    if meta.get("session_gap_us") is not None and \
            int(meta["session_gap_us"]) != gap_us:
        raise ValueError(
            f"session gap {gap!r} ({gap_us}us) conflicts with this "
            f"sink's recorded gap ({meta['session_gap_us']}us) — the "
            "boundary is only meaningful for ONE gap per sink")
    wm = meta.get("watermark_us")
    late_us = int(meta.get("max_lateness_us", 0))
    boundary = meta.get("session_boundary_us")
    empty = pd.DataFrame({
        key: pd.Series([], dtype="object"),
        "session_start_us": pd.Series([], dtype="int64"),
        "session_end_us": pd.Series([], dtype="int64"),
        "n": pd.Series([], dtype="int64")})
    if wm is None:
        return empty
    paths = _trigger_batch_paths(out_dir, meta,
                                 None if boundary is None else
                                 int(boundary), int(wm))
    if not paths:
        return empty

    def project(b: pa.Table) -> pa.Table:
        ts = _ts_micros(b[ts_col])
        t = pa.table({key: b[key], "_ts": ts.cast(pa.timestamp("us"))})
        if boundary is not None:
            t = t.filter(pc.greater_equal(
                ts, pa.scalar(int(boundary), pa.int64())))
        return t

    ev = rd.read_parquet(paths).map_batches(project,
                                            batch_format="pyarrow")
    ses = sessionize(ev, key=key, ts="_ts",
                     gap=pd.Timedelta(microseconds=gap_us),
                     num_buckets=num_buckets).to_pandas()
    if len(ses) == 0:
        return empty
    start_us = ses["session_start"].astype("int64") // 1000 \
        if str(ses["session_start"].dtype).endswith("[ns]") else \
        ses["session_start"].astype("int64")
    end_us = ses["session_end"].astype("int64") // 1000 \
        if str(ses["session_end"].dtype).endswith("[ns]") else \
        ses["session_end"].astype("int64")
    out = pd.DataFrame({key: ses[key],
                        "session_start_us": start_us.to_numpy(),
                        "session_end_us": end_us.to_numpy(),
                        "n": ses["n"].astype("int64")})
    fired_mask = out["session_end_us"] + gap_us + late_us <= int(wm)
    fired = out[fired_mask].sort_values(
        [key, "session_start_us"], kind="mergesort").reset_index(drop=True)
    unfired = out[~fired_mask]
    new_boundary = int(wm) - late_us
    if len(unfired):
        new_boundary = min(new_boundary,
                           int(unfired["session_start_us"].min()))
    if boundary is not None:
        new_boundary = max(new_boundary, int(boundary))

    # fired identity = (session END, key hash) — NOT the start: when
    # another key's still-open session pins the boundary BELOW a fired
    # session's span, the next trigger recomputes that session from its
    # boundary-surviving events as a TRUNCATED fragment (later start,
    # SAME end — one key's sessions have distinct ends), and a
    # start-keyed set would re-emit it (found by review, regression-
    # pinned in test_session_trigger_no_fragment_reemission)
    prev = {(int(s), h) for s, h in
            meta.get("sessions_fired_above_boundary", [])}
    newly = fired
    ids: list = []
    if len(fired):
        kh = hash_strings64(pa.array(
            fired[key].astype(str).tolist(), pa.string()))
        ids = [(int(e), f"{int(h):016x}") for e, h in
               zip(fired["session_end_us"], kh)]
        mask = [i not in prev for i in ids]
        newly = fired[mask].reset_index(drop=True)
    if len(newly):
        import hashlib

        # journal FIRST, meta second (window-trigger discipline): the
        # file name is a content hash of the newly-fired set, so a
        # crash replay (same meta → same recompute) rewrites the same
        # file instead of duplicating emissions
        canon = newly.to_csv(index=False).encode()
        wdir = os.path.join(out_dir, "sessions",
                            f"fire={hashlib.md5(canon).hexdigest()}")
        os.makedirs(wdir, exist_ok=True)
        tmp = os.path.join(wdir, ".data.parquet.tmp")
        pq.write_table(pa.Table.from_pandas(newly, preserve_index=False),
                       tmp)
        os.replace(tmp, os.path.join(wdir, "data.parquet"))
    # remember fired identities that could still recompute (END ≥ new
    # boundary — a session whose end lies below it has every event
    # filtered forever, fragments included); bounded state
    live = sorted({i for i in (prev | set(ids))
                   if i[0] >= int(new_boundary)})
    meta["sessions_fired_above_boundary"] = [list(i) for i in live]
    meta["session_boundary_us"] = int(new_boundary)
    meta["session_gap_us"] = gap_us
    _save_meta(out_dir, meta)
    if not len(newly):
        return empty
    return newly


def read_session_emissions(out_dir: str):
    """The durable per-session emission journal as one frame (replays
    everything ever fired, crashed consumers included)."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(
        os.path.join(out_dir, "sessions", "fire=*", "data.parquet")))
    if not files:
        return pd.DataFrame()
    return pd.concat([pq.read_table(f).to_pandas() for f in files],
                     ignore_index=True).reset_index(drop=True)


def read_emissions(out_dir: str):
    """The durable emission journal (every fired window's aggregate) as
    one pandas frame — the recovery path for a consumer that crashed
    between receiving :func:`emit_closed_windows`'s return value and
    persisting it."""
    import glob

    import pyarrow.parquet as pq

    parts = sorted(glob.glob(f"{out_dir}/emissions/win=*/data.parquet"))
    if not parts:
        return pd.DataFrame()
    return pd.concat([pq.read_table(p).to_pandas() for p in parts],
                     ignore_index=True)
