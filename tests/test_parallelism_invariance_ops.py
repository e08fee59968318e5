"""Parallelism invariance for the round-2-continuation operators: the
result of a distributed op must not depend on the block layout (a reshaped
cluster, a different block size, or a retry-induced re-split must produce
identical output). Each op runs at 1, 3, and 8 partitions over the same
input and must return identical row sets."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _docs(n=120):
    rng = np.random.RandomState(9)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(vocab[j] for j in rng.randint(0, 40, 25))
             for _ in range(n)]
    # plant duplicate windows
    for i in range(0, n, 7):
        texts[i] = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 " + texts[i]
    return pa.table({"doc_id": list(range(n)), "text": texts})


def _sorted_rows(df):
    return sorted(map(tuple, df.astype(str).itertuples(index=False)))


def _invariant(make_ds_fn, op, parts=(1, 3, 8)):
    outs = []
    for p in parts:
        outs.append(_sorted_rows(op(make_ds_fn(p)).to_pandas()))
    assert outs[0] == outs[1] == outs[2]
    return outs[0]


def test_chunk_dedup_invariant(ray_session):
    import ray.data as rd

    from cattle_ray.stages.dedup import chunk_exact_dedup

    t = _docs()
    rows = _invariant(
        lambda p: rd.from_arrow(t).repartition(p),
        lambda ds: chunk_exact_dedup(ds, chunk_words=5))
    assert rows  # non-degenerate


def test_adjacency_invariant(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(2)
    t = pa.table({
        "subj": [f"s{i}" for i in rng.randint(0, 30, 1000)],
        "pred": [f"p{i}" for i in rng.randint(0, 4, 1000)],
        "obj": [f"o{i}" for i in rng.randint(0, 20, 1000)],
    })
    from cattle_ray.stages.graph import adjacency_lists

    _invariant(lambda p: rd.from_arrow(t).repartition(p), adjacency_lists)


def test_entity_resolution_invariant(ray_session):
    import ray.data as rd

    rows = [{"uri": f"http://e/{i:03d}", "name": f"n{i % 9}"}
            for i in range(90)]
    t = pa.Table.from_pylist(rows)
    from cattle_ray.stages.link import entity_resolution

    _invariant(lambda p: rd.from_arrow(t).repartition(p),
               lambda ds: entity_resolution(ds, "uri", "name"))


def test_funnel_and_running_sum_invariant(ray_session):
    import ray.data as rd

    from cattle_ray.stages.windows import funnel, grouped_running_sum

    rng = np.random.RandomState(3)
    n = 2000
    base = pd.Timestamp("2024-01-01")
    t = pa.table({
        "event_id": list(range(n)),
        "user_id": rng.randint(0, 50, n).tolist(),
        "ts": [base + pd.Timedelta(seconds=int(s))
               for s in rng.randint(0, 100_000, n)],
        "event_type": [["view", "click", "error", "x"][k]
                       for k in rng.randint(0, 4, n)],
        "cents": rng.randint(1, 500, n).astype("int64").tolist(),
    })
    _invariant(lambda p: rd.from_arrow(t).repartition(p),
               lambda ds: funnel(ds, ["view", "click", "error"]))
    _invariant(lambda p: rd.from_arrow(t).repartition(p),
               lambda ds: grouped_running_sum(
                   ds, key="user_id", ts="ts", val="cents", out="run",
                   order_tiebreak="event_id"))


def test_collocation_invariant(ray_session):
    import ray.data as rd

    from cattle_ray.stages.textstats import collocation_lift

    t = _docs(80)
    _invariant(lambda p: rd.from_arrow(t).repartition(p),
               lambda ds: collocation_lift(ds, min_count=2, k=30))


def test_triangles_invariant(ray_session):
    import ray.data as rd

    from cattle_ray.stages.graph import triangles

    rng = np.random.RandomState(6)
    pairs = {(f"n{min(a, b)}", f"n{max(a, b)}")
             for a, b in rng.randint(0, 50, (500, 2)) if a != b}
    t = pa.table({"u": [p[0] for p in pairs], "v": [p[1] for p in pairs]})
    _invariant(lambda p: rd.from_arrow(t).repartition(p), triangles)


def test_editdist_pairs_invariant(ray_session):
    import ray.data as rd

    from cattle_ray.stages.dedup import editdist_neardup_pairs

    t = _docs()
    rows = _invariant(
        lambda p: rd.from_arrow(t).repartition(p),
        lambda ds: editdist_neardup_pairs(ds, max_dist=8, band_tokens=8))
    assert rows  # planted w0..w9 prefixes share band+tok0 → pairs exist


def test_moving_avg_invariant(ray_session):
    import ray.data as rd

    from cattle_ray.stages.windows import grouped_moving_avg

    rng = np.random.RandomState(4)
    n = 2000
    t = pa.table({
        "user_id": rng.randint(0, 37, n).astype(np.int64),
        "ts": rng.randint(0, 10**6, n).astype(np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "cents": rng.randint(-500, 500, n).astype(np.int64),
    })
    _invariant(
        lambda p: rd.from_arrow(t).repartition(p),
        lambda ds: grouped_moving_avg(ds, key="user_id", ts="ts",
                                      val="cents", window=4,
                                      order_tiebreak="event_id"))


def test_time_window_and_ngrams_invariant(ray_session):
    import ray.data as rd

    from cattle_ray.stages.windows import grouped_time_window, sequence_ngrams

    rng = np.random.RandomState(11)
    n = 3000
    base = pd.Timestamp("2024-01-01")
    t = pa.table({
        "event_id": list(range(n)),
        "user_id": rng.randint(0, 40, n).tolist(),
        "ts": [base + pd.Timedelta(seconds=int(s))
               for s in rng.randint(0, 5000, n)],  # dense -> many exact ties
        "v": rng.randint(-50, 500, n).astype("int64").tolist(),
        "et": [f"e{i}" for i in rng.randint(0, 6, n)],
    })
    _invariant(lambda p: rd.from_arrow(t).repartition(p),
               lambda ds: grouped_time_window(
                   ds, key="user_id", ts="ts", val="v",
                   window_us=60_000_000))
    _invariant(lambda p: rd.from_arrow(t).repartition(p),
               lambda ds: sequence_ngrams(
                   ds, key="user_id", ts="ts", val="et", n=3,
                   order_tiebreak="event_id"))
