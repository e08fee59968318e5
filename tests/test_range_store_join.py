"""range_join_banded boundary semantics + join_stores_copartitioned."""

import pandas as pd
import pyarrow as pa
import pytest


def test_range_join_banded_boundaries(ray_session):
    """Pairs at every boundary of (lo, hi]: delta=0 excluded, delta=hi
    included, delta=hi+1 excluded, and a pair straddling a band edge (the
    case the second band exists for) found."""
    import ray.data as rd

    from cattle_ray.stages.joins import range_join_banded

    W = 100
    # user 1: a=50 with b at 50 (delta 0), 150 (=W, keep), 151 (>W, drop)
    # user 2: a=95, b=105 — same true window but different ⌊ts/W⌋ bands
    # user 3 noise: delta within range but other user
    left = pd.DataFrame({"u": [1, 2], "ts": [50, 95], "tag": ["a1", "a2"]})
    right = pd.DataFrame({"u": [1, 1, 1, 2, 3],
                          "ts": [50, 150, 151, 105, 96],
                          "rtag": ["b0", "b1", "b2", "b3", "b4"]})
    out = range_join_banded(
        rd.from_pandas(left).repartition(2),
        rd.from_pandas(right).repartition(3),
        left_key="u", right_key="u", left_ts="ts", right_ts="ts",
        lo=0, hi=W).to_pandas()
    got = sorted(zip(out["tag"], out["rtag"]))
    assert got == [("a1", "b1"), ("a2", "b3")]


def test_range_join_banded_matches_naive(ray_session):
    """Parity with the quadratic per-key reference on a random corpus, at
    two partitionings (each true pair must appear EXACTLY once — the
    one-band-per-right-row argument)."""
    import numpy as np
    import ray.data as rd

    from cattle_ray.stages.joins import range_join_banded

    rng = np.random.RandomState(3)
    n = 300
    df = pd.DataFrame({"u": rng.randint(0, 8, n),
                       "ts": rng.randint(0, 5000, n).astype("int64"),
                       "i": np.arange(n)})
    lo, hi = 0, 250
    ref = set()
    m = df.merge(df, on="u", suffixes=("_a", "_b"))
    d = m["ts_b"] - m["ts_a"]
    for r in m[(d > lo) & (d <= hi)].itertuples():
        ref.add((r.i_a, r.i_b))

    for parts in (2, 7):
        ds = rd.from_pandas(df).repartition(parts)
        left = ds.map_batches(
            lambda b: pa.table({"u": b["u"], "ts": b["ts"], "i_a": b["i"]}),
            batch_format="pyarrow")
        right = ds.map_batches(
            lambda b: pa.table({"u": b["u"], "ts": b["ts"], "i_b": b["i"]}),
            batch_format="pyarrow")
        out = range_join_banded(left, right, left_key="u", right_key="u",
                                left_ts="ts", right_ts="ts",
                                lo=lo, hi=hi).to_pandas()
        got = list(zip(out["i_a"], out["i_b"]))
        assert len(got) == len(set(got)) == len(ref)
        assert set(got) == ref


def test_range_join_banded_rejects_bad_bounds(ray_session):
    import ray.data as rd

    from cattle_ray.stages.joins import range_join_banded

    ds = rd.from_pandas(pd.DataFrame({"u": [1], "ts": [1]}))
    with pytest.raises(ValueError):
        range_join_banded(ds, ds, left_key="u", right_key="u",
                          left_ts="ts", right_ts="ts", lo=5, hi=5)


def _quads(subjs, pred, objs):
    n = len(subjs)
    return pa.table({
        "subj": pa.array(subjs), "pred": pa.array([pred] * n),
        "obj": pa.array(objs),
        "obj_is_iri": pa.array([False] * n),
        "obj_datatype": pa.array([None] * n, pa.string()),
        "obj_lang": pa.array([None] * n, pa.string()),
    })


def test_join_stores_copartitioned_roundtrip(ray_session, tmp_path):
    """Write two stores, join partition-locally, compare against a plain
    in-memory join; column pruning honored; unmatched subjects drop."""
    import ray.data as rd

    from cattle_ray.sources.triple_sink import (
        join_stores_copartitioned, write_triples_hash_partitioned)

    subjs = [f"s{i}" for i in range(40)]
    a = _quads(subjs, "p:ent", [f"E{i % 7}" for i in range(40)])
    b = _quads(subjs[::2], "p:score", [str(i) for i in range(0, 40, 2)])
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    write_triples_hash_partitioned(rd.from_arrow(a).repartition(3), da,
                                   num_partitions=8)
    write_triples_hash_partitioned(rd.from_arrow(b).repartition(2), db,
                                   num_partitions=8)

    out = join_stores_copartitioned(
        da, db, key="subj", columns_a=["subj", "obj"],
        columns_b=["subj", "obj"]).to_pandas()
    assert set(out.columns) == {"subj", "obj", "obj_b"}
    ref = a.to_pandas().merge(b.to_pandas(), on="subj",
                              suffixes=("", "_b"))
    assert len(out) == len(ref) == 20
    assert (dict(zip(out["subj"], out["obj_b"]))
            == dict(zip(ref["subj"], ref["obj_b"])))


def test_join_stores_copartitioned_rejects_mismatch(ray_session, tmp_path):
    """Different write-time partition counts would silently drop matches —
    must raise instead."""
    import ray.data as rd

    from cattle_ray.sources.triple_sink import (
        join_stores_copartitioned, write_triples_hash_partitioned)

    t = _quads(["x", "y"], "p", ["1", "2"])
    da, db = str(tmp_path / "a8"), str(tmp_path / "b4")
    write_triples_hash_partitioned(rd.from_arrow(t), da, num_partitions=8)
    write_triples_hash_partitioned(rd.from_arrow(t), db, num_partitions=4)
    with pytest.raises(ValueError, match="partition counts"):
        join_stores_copartitioned(da, db)


def test_range_join_banded_negative_timestamps(ray_session):
    """Pre-epoch (negative) timestamps must band by FLOOR division — a
    truncating divide puts ts=-50 (band -1) in band 0 and misses the
    cross-epoch pair."""
    import ray.data as rd

    from cattle_ray.stages.joins import range_join_banded

    left = pd.DataFrame({"u": [1], "ts": [-50], "tag": ["a"]})
    right = pd.DataFrame({"u": [1], "ts": [40], "rtag": ["b"]})
    out = range_join_banded(
        rd.from_pandas(left), rd.from_pandas(right),
        left_key="u", right_key="u", left_ts="ts", right_ts="ts",
        lo=0, hi=100).to_pandas()
    assert list(zip(out["tag"], out["rtag"])) == [("a", "b")]


def test_range_join_banded_straddling_window(ray_session):
    """lo < 0 ('within w either way'): 3-band emit finds pairs on BOTH
    sides of the left row, exactly once each, vs the quadratic reference."""
    import numpy as np
    import ray.data as rd

    from cattle_ray.stages.joins import range_join_banded

    rng = np.random.RandomState(11)
    n = 200
    df = pd.DataFrame({"u": rng.randint(0, 6, n),
                       "ts": rng.randint(-1000, 1000, n).astype("int64"),
                       "i": np.arange(n)})
    lo, hi = -150, 150
    m = df.merge(df, on="u", suffixes=("_a", "_b"))
    d = m["ts_b"] - m["ts_a"]
    ref = set(zip(m.loc[(d > lo) & (d <= hi), "i_a"],
                  m.loc[(d > lo) & (d <= hi), "i_b"]))

    ds = rd.from_pandas(df).repartition(4)
    left = ds.map_batches(
        lambda b: pa.table({"u": b["u"], "ts": b["ts"], "i_a": b["i"]}),
        batch_format="pyarrow")
    right = ds.map_batches(
        lambda b: pa.table({"u": b["u"], "ts": b["ts"], "i_b": b["i"]}),
        batch_format="pyarrow")
    out = range_join_banded(left, right, left_key="u", right_key="u",
                            left_ts="ts", right_ts="ts",
                            lo=lo, hi=hi).to_pandas()
    got = list(zip(out["i_a"], out["i_b"]))
    assert len(got) == len(set(got)) == len(ref)
    assert set(got) == ref


def test_obj_routed_store_point_read(ray_session, tmp_path):
    """Object-routed secondary index: the obj-bound pattern takes a
    one-partition point read; subj-bound against the same store raises
    (wrong routing column would miss rows); copart join validates keys."""
    import ray.data as rd

    from cattle_ray.sources.triple_sink import (
        join_stores_copartitioned, match_triples, read_triples_for_key,
        store_key, write_triples_hash_partitioned)

    t = _quads([f"s{i}" for i in range(30)], "p:x",
               [f"o{i % 5}" for i in range(30)])
    d = str(tmp_path / "objidx")
    write_triples_hash_partitioned(rd.from_arrow(t), d, num_partitions=8,
                                   key="obj")
    assert store_key(d) == "obj"
    got = match_triples(d, obj="o3")
    assert isinstance(got, pa.Table)
    assert sorted(got["subj"].to_pylist()) == sorted(
        f"s{i}" for i in range(30) if i % 5 == 3)
    # wrong routing column raises instead of silently missing rows
    with pytest.raises(ValueError, match="routed by"):
        read_triples_for_key(d, "s1", key="subj")
    # copart join on subj against an obj-routed store refuses
    ds2 = str(tmp_path / "subjstore")
    write_triples_hash_partitioned(rd.from_arrow(t), ds2, num_partitions=8)
    with pytest.raises(ValueError, match="routing"):
        join_stores_copartitioned(ds2, d, key="subj")
