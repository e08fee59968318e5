"""Co-partitioned joins (hash/as-of) and sessionization vs pandas oracles."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def frames():
    rng = np.random.RandomState(3)
    left = pd.DataFrame(
        {
            "event_id": np.arange(200),
            "k": rng.randint(0, 20, 200),
            "ts": pd.Timestamp("2024-01-01") + pd.to_timedelta(rng.randint(0, 10000, 200), "m"),
        }
    )
    right = pd.DataFrame(
        {
            "k2": rng.randint(0, 25, 60),
            "rts": pd.Timestamp("2024-01-01") + pd.to_timedelta(rng.randint(0, 10000, 60), "m"),
            "val": rng.randn(60),
        }
    )
    return left, right


def test_hash_join_matches_pandas(ray_session, frames):
    import ray.data as rd

    from cattle_ray.stages.joins import hash_join

    left, right = frames
    out = hash_join(rd.from_pandas(left), rd.from_pandas(right), "k", "k2").to_pandas()
    want = left.merge(right, left_on="k", right_on="k2", suffixes=("", "_r"))
    key = ["event_id", "k2", "rts"]
    assert (
        out.sort_values(key + ["val"]).reset_index(drop=True)[key].equals(
            want.sort_values(key + ["val"]).reset_index(drop=True)[key]
        )
    )
    assert len(out) == len(want)


def test_asof_join_matches_pandas(ray_session, frames):
    import ray.data as rd

    from cattle_ray.stages.joins import asof_join

    left, right = frames
    out = asof_join(
        rd.from_pandas(left), rd.from_pandas(right),
        left_on="ts", right_on="rts", left_by="k", right_by="k2",
    ).to_pandas()
    want = pd.merge_asof(
        left.sort_values("ts", kind="mergesort"),
        right.sort_values("rts", kind="mergesort"),
        left_on="ts", right_on="rts", left_by="k", right_by="k2",
        direction="backward", suffixes=("", "_r"),
    )
    o = out.sort_values("event_id").reset_index(drop=True)
    w = want.sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_series_equal(o["rts"], w["rts"])
    assert len(o) == len(left)


def test_sessionize_gap_rule(ray_session):
    import ray.data as rd

    from cattle_ray.stages.windows import sessionize

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 1, 2, 2],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00", "2024-01-01 00:30", "2024-01-01 02:00",
                 "2024-01-01 02:30", "2024-01-01 00:00", "2024-01-02 00:00"]
            ),
        }
    )
    out = sessionize(rd.from_pandas(df), gap="1h").to_pandas()
    u1 = out[out["user_id"] == 1].sort_values("session_id")
    assert u1["n"].tolist() == [2, 2]
    u2 = out[out["user_id"] == 2].sort_values("session_id")
    assert u2["n"].tolist() == [1, 1]
    assert u1["session_id"].tolist() == [1, 2]


def test_hash_join_string_keys(ray_session):
    """Key-type-aware bucketing: a join on a string key (e.g. url) must work
    (regression: astype(int64) raised ValueError)."""
    import pandas as pd
    import ray.data as rd

    from cattle_ray.stages.joins import hash_join

    left = rd.from_pandas(pd.DataFrame(
        {"url": [f"u{i % 7}" for i in range(30)], "x": range(30)}))
    right = rd.from_pandas(pd.DataFrame(
        {"u2": [f"u{i}" for i in range(7)], "y": range(7)}))
    out = hash_join(left, right, "url", "u2", num_buckets=4).to_pandas()
    assert len(out) == 30
    assert (out["y"] == out["url"].str[1:].astype(int)).all()


def test_sessionize_string_keys(ray_session):
    import pandas as pd
    import ray.data as rd

    from cattle_ray.stages.windows import sessionize

    df = pd.DataFrame({
        "user": ["alice", "alice", "bob"],
        "ts": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 03:00",
                              "2024-01-01 00:30"]),
    })
    out = sessionize(rd.from_pandas(df), key="user", ts="ts", gap="1h").to_pandas()
    assert len(out) == 3  # alice's 3h gap splits her into 2 sessions


def test_hash_join_full_range_64bit_keys(ray_session):
    """Keys above 2^53 (e.g. 64-bit hash ids) must join EXACTLY (regression:
    the union's padding nulls coerced int64 keys to float64 in pandas,
    collapsing distinct ids that differ only in low bits)."""
    import pandas as pd
    import ray.data as rd

    from cattle_ray.stages.joins import hash_join

    base = 2**62
    keys = [base + i for i in range(8)]  # adjacent ids: float64 merges them
    left = rd.from_pandas(pd.DataFrame({"k": keys, "x": range(8)}))
    right = rd.from_pandas(pd.DataFrame({"k2": keys, "y": [i * 10 for i in range(8)]}))
    out = hash_join(left, right, "k", "k2", num_buckets=4).to_pandas()
    assert len(out) == 8
    assert (out.sort_values("x")["y"].to_numpy() ==
            out.sort_values("x")["x"].to_numpy() * 10).all()


def test_skew_aware_join_matches_hash_join(ray_session):
    """Hot-key path parity: a 50%-skewed key joined via skew_aware_join must
    produce exactly hash_join's rows (hot rows never cross the shuffle)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cattle_ray.stages.joins import hash_join, skew_aware_join

    rng = np.random.RandomState(0)
    keys = np.where(rng.rand(2000) < 0.5, 7, rng.randint(0, 100, 2000))
    left = rd.from_pandas(pd.DataFrame({"k": keys, "x": np.arange(2000)}))
    right = rd.from_pandas(pd.DataFrame({"k2": np.arange(100),
                                         "y": np.arange(100) * 3}))
    plain = hash_join(left, right, "k", "k2").to_pandas()
    skew = skew_aware_join(left, right, "k", "k2",
                           hot_key_threshold=0.05).to_pandas()
    key = lambda df: sorted(zip(df["k"], df["x"], df["y"]))
    assert key(plain) == key(skew)
    assert len(skew) == 2000


def test_skew_aware_join_no_hot_keys_degrades(ray_session):
    import pandas as pd
    import ray.data as rd

    from cattle_ray.stages.joins import skew_aware_join

    left = rd.from_pandas(pd.DataFrame({"k": list(range(50)), "x": range(50)}))
    right = rd.from_pandas(pd.DataFrame({"k2": list(range(50)), "y": range(50)}))
    out = skew_aware_join(left, right, "k", "k2").to_pandas()
    assert len(out) == 50


def test_asof_join_forward_and_nearest(ray_session):
    """direction= pass-through parity with pandas.merge_asof."""
    import pandas as pd
    import ray.data as rd

    from cattle_ray.stages.joins import asof_join

    left = pd.DataFrame({"u": [1, 1, 2], "t": [10, 25, 14]})
    right = pd.DataFrame({"u2": [1, 1, 2], "t2": [12, 20, 30]})
    for direction in ("forward", "nearest"):
        out = asof_join(
            rd.from_pandas(left), rd.from_pandas(right),
            left_on="t", right_on="t2", left_by="u", right_by="u2",
            direction=direction,
        ).to_pandas().sort_values(["u", "t"]).reset_index(drop=True)
        want = pd.merge_asof(
            left.sort_values("t"), right.sort_values("t2"),
            left_on="t", right_on="t2", left_by="u", right_by="u2",
            direction=direction,
        ).sort_values(["u", "t"]).reset_index(drop=True)
        assert out["t2"].fillna(-1).tolist() == want["t2"].fillna(-1).tolist(), direction


def test_grouped_running_sum(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from cattle_ray.stages.windows import grouped_running_sum

    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2, 1],
        "ts": [base + pd.Timedelta(seconds=s) for s in [0, 10, 10, 5, 1, 20]],
        "eid": [0, 1, 2, 3, 4, 5],
        "v": [10, 20, 30, 7, 5, 40],
    })
    out = grouped_running_sum(
        rd.from_pandas(df).repartition(3), key="user_id", ts="ts", val="v",
        out="run", order_tiebreak="eid").to_pandas()
    got = dict(zip(out["eid"], out["run"]))
    # user 1 in (ts, eid) order: eid0=10, eid1=30, eid2=60, eid5=100
    # user 2: eid4=5 (t=1) then eid3=12 (t=5)
    assert got == {0: 10, 1: 30, 2: 60, 5: 100, 4: 5, 3: 12}


def test_grouped_lag_delta(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from cattle_ray.stages.windows import grouped_lag_delta

    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "user_id": [1, 1, 2, 1, 2],
        "ts": [base + pd.Timedelta(seconds=s) for s in [0, 5, 3, 12, 3]],
        "eid": [0, 1, 2, 3, 4],
    })
    out = grouped_lag_delta(
        rd.from_pandas(df).repartition(2), key="user_id", ts="ts",
        out="d", order_tiebreak="eid").to_pandas()
    got = dict(zip(out["eid"], out["d"]))
    assert np.isnan(got[0]) and np.isnan(got[2])  # first events
    assert got[1] == 5_000_000 and got[3] == 7_000_000
    assert got[4] == 0  # tie on ts broken by eid: eid4 follows eid2


def test_interval_join_inner_and_left(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from cattle_ray.stages.joins import interval_join

    iv = pd.DataFrame({"lo": [0.0, 10.0], "hi": [10.0, 20.0],
                       "tier": ["a", "b"]})
    ds = rd.from_arrow(pa.table({"id": [1, 2, 3, 4, 5],
                                 "v": [0.0, 9.99, 10.0, 25.0, -1.0]}))
    inner = {r["id"]: r["tier"]
             for r in interval_join(ds, iv, "v").take_all()}
    # [lo, hi): lo inclusive, hi exclusive; out-of-range rows drop
    assert inner == {1: "a", 2: "a", 3: "b"}
    left = {r["id"]: r["tier"]
            for r in interval_join(ds, iv, "v", how="left").take_all()}
    assert left == {1: "a", 2: "a", 3: "b", 4: None, 5: None}


def test_interval_join_rejects_overlap(ray_session):
    import pandas as pd
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from cattle_ray.stages.joins import interval_join

    ds = rd.from_arrow(pa.table({"v": [1.0]}))
    bad = pd.DataFrame({"lo": [0.0, 5.0], "hi": [6.0, 9.0], "t": ["x", "y"]})
    with pytest.raises(ValueError):
        interval_join(ds, bad, "v")
    empty_width = pd.DataFrame({"lo": [3.0], "hi": [3.0], "t": ["x"]})
    with pytest.raises(ValueError):
        interval_join(ds, empty_width, "v")


def test_full_outer_join_matches_pandas(ray_session):
    """Full outer vs pandas outer merge on overlapping + disjoint keys;
    typed nulls on the unmatched side; layout-invariant."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from cattle_ray.stages.joins import full_outer_join

    l = pd.DataFrame({"k": [1, 2, 3, 4], "a": [10, 20, 30, 40]})
    r = pd.DataFrame({"k": [3, 4, 5, 6], "b": [300, 400, 500, 600]})
    out = full_outer_join(
        rd.from_pandas(l).repartition(3), rd.from_pandas(r).repartition(2),
        "k", "k", num_buckets=4).to_pandas().sort_values("k").reset_index(drop=True)
    exp = l.merge(r, on="k", how="outer").sort_values("k").reset_index(drop=True)
    assert list(out["k"]) == list(exp["k"])
    assert out["a"].tolist()[:4] == [10, 20, 30, 40]
    assert out["a"].isna().tolist() == [False] * 4 + [True] * 2
    assert out["b"].isna().tolist() == [True] * 2 + [False] * 4


def test_full_outer_join_preserves_large_int64(ray_session):
    """The reason this op exists: int64 ids above 2^53 survive exactly even
    when the other side is unmatched (pandas outer merge would corrupt them
    via float64 null-padding)."""
    import pyarrow as pa
    import ray.data as rd

    from cattle_ray.stages.joins import full_outer_join

    big = 2**62 + 12345678901
    l = rd.from_arrow(pa.table({"k": pa.array([big, big + 1], pa.int64()),
                                "payload": pa.array([big + 7, big + 8], pa.int64())}))
    r = rd.from_arrow(pa.table({"k": pa.array([big + 1, big + 2], pa.int64()),
                                "w": pa.array([1, 2], pa.int64())}))
    out = full_outer_join(l, r, "k", "k", num_buckets=2).to_pandas()
    assert set(out["k"]) == {big, big + 1, big + 2}  # exact, not float-rounded
    assert str(out["k"].dtype) == "int64"
    row = out[out["k"] == big].iloc[0]
    assert row["payload"] == big + 7 and pd.isna(row["w"])


def test_hash_join_composite_key(ray_session):
    """Multi-column equi join (value-tuple bucketing): matches pandas on a
    2-col key with differently-named right-side columns; full outer on a
    composite key keeps unmatched rows from both sides."""
    import pandas as pd
    import ray.data as rd

    from cattle_ray.stages.joins import full_outer_join, hash_join

    l = pd.DataFrame({"u": [1, 1, 2, 2], "d": ["a", "b", "a", "b"],
                      "x": [10, 11, 12, 13]})
    r = pd.DataFrame({"uu": [1, 2, 2, 3], "dd": ["a", "a", "z", "a"],
                      "y": [100, 101, 102, 103]})
    out = hash_join(rd.from_pandas(l).repartition(3),
                    rd.from_pandas(r).repartition(2),
                    ["u", "d"], ["uu", "dd"], num_buckets=4).to_pandas()
    exp = l.merge(r, left_on=["u", "d"], right_on=["uu", "dd"])
    assert sorted(zip(out["u"], out["d"], out["y"])) == \
        sorted(zip(exp["u"], exp["d"], exp["y"]))

    fo = full_outer_join(
        rd.from_pandas(l[["u", "d", "x"]]).repartition(2),
        rd.from_pandas(l[["u", "d", "x"]].assign(x=lambda t: t.x * 2)
                       .iloc[2:]).repartition(2),
        ["u", "d"], ["u", "d"], num_buckets=4).to_pandas()
    assert len(fo) == 4  # rows 0,1 unmatched-left; 2,3 matched
    assert fo["x_r"].notna().sum() == 2


def test_hash_join_null_keys_sql_semantics(ray_session):
    """NULL join keys never match, on EVERY execution path: the Arrow
    inner fast path (all-equal or all-distinct key names), the pandas
    fallback (mixed-name composite keys), and how='left' (regression:
    the pandas path used to match NaN↔NaN, so the same inner join
    returned different rows depending only on column naming)."""
    import pyarrow as pa
    import ray.data as rd

    from cattle_ray.stages.joins import hash_join

    l = pa.table({"k": pa.array([1, None, 2, None], pa.int64()),
                  "d": ["a", "a", "b", "b"],
                  "x": [10, 11, 12, 13]})
    r = pa.table({"k": pa.array([1, None, 3], pa.int64()),
                  "d": ["a", "a", "b"],
                  "y": [100, 101, 102]})

    # Arrow fast path: same-named single key
    out = hash_join(rd.from_arrow(l).repartition(2),
                    rd.from_arrow(r).repartition(2), "k", "k",
                    num_buckets=4).to_pandas()
    assert list(zip(out["x"], out["y"])) == [(10, 100)]

    # pandas fallback: composite key mixing an equal and a differing name
    r2 = r.rename_columns(["k", "dd", "y"])
    out2 = hash_join(rd.from_arrow(l).repartition(2),
                     rd.from_arrow(r2).repartition(2),
                     ["k", "d"], ["k", "dd"], num_buckets=4).to_pandas()
    assert list(zip(out2["x"], out2["y"])) == [(10, 100)]

    # left join: null-keyed left rows survive UNMATCHED (SQL), never
    # paired with the right side's null-keyed row
    out3 = hash_join(rd.from_arrow(l).repartition(2),
                     rd.from_arrow(r2).repartition(2),
                     "k", "k", how="left", num_buckets=4).to_pandas()
    assert len(out3) == 4
    matched = out3[out3["y"].notna()]
    assert list(zip(matched["x"], matched["y"].astype(int))) == [(10, 100)]
    assert out3[out3["k"].isna()]["y"].isna().all()


def test_grouped_time_window_range_semantics(ray_session):
    import pandas as pd
    import ray.data as rd

    from cattle_ray.stages.windows import grouped_time_window

    base = pd.Timestamp("2024-01-01")
    # user 1: t=0 (two peer rows), t=10 (exactly at the closed lower bound
    # of t=20's 10s window), t=20, t=31 (t=20 falls outside: 31-10=21>20)
    # user 2: one event
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 1, 2],
        "ts": [base + pd.Timedelta(seconds=s) for s in [0, 0, 10, 20, 31, 5]],
        "v": [3, 4, 10, 100, 1000, 7],
    })
    out = grouped_time_window(
        rd.from_pandas(df).repartition(3), key="user_id", ts="ts", val="v",
        window_us=10_000_000).to_pandas()
    got = {(u, t.second): (ws, wr, wt) for u, t, ws, wr, wt in zip(
        out["user_id"], out["ts"], out["win_sum"], out["win_rows"],
        out["win_ts"])}
    assert got[(1, 0)] == (7, 2, 1)       # peers collapse, both inside
    assert got[(1, 10)] == (17, 3, 2)     # closed bound: t=0 included
    assert got[(1, 20)] == (110, 2, 2)    # t=10 at exact bound included
    assert got[(1, 31)] == (1000, 1, 1)   # t=20 is 11s back -> excluded
    assert got[(2, 5)] == (7, 1, 1)
    assert len(out) == 5  # one row per (user, ts)


def test_sequence_ngrams_trigrams(ray_session):
    import pandas as pd
    import ray.data as rd

    from cattle_ray.stages.windows import sequence_ngrams

    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "user_id": ["a", "a", "a", "a", "b", "b", "c", "c", "c"],
        "ts": [base + pd.Timedelta(seconds=s)
               for s in [0, 1, 2, 3, 0, 1, 0, 0, 1]],
        "eid": [0, 1, 2, 3, 4, 5, 6, 7, 8],
        "et": ["x", "y", "z", "w", "x", "y", "q", "p", "r"],
    })
    out = sequence_ngrams(
        rd.from_pandas(df).repartition(4), key="user_id", ts="ts", val="et",
        n=3, order_tiebreak="eid").to_pandas()
    # user a: x>y>z, y>z>w; user b too short; user c ts-tie broken by eid
    assert sorted(out["seq"]) == ["q>p>r", "x>y>z", "y>z>w"]


def test_cogroup_left_three_way(ray_session):
    import pandas as pd
    import ray.data as rd

    from cattle_ray.stages.joins import cogroup_left

    dim = pd.DataFrame({"k": [1, 2, 3, 4], "name": list("abcd")})
    # side 1 arrives as PARTIALS (two rows for k=1) that the finish sums
    s1 = pd.DataFrame({"kk": [1, 1, 2], "pn": [5, 7, 3]})
    s2 = pd.DataFrame({"u": [2, 3], "m": [30, 40]})

    def fin1(df):
        return df.groupby("kk", sort=False)[["pn"]].sum().reset_index() \
            .rename(columns={"pn": "total"})

    def fill(df):
        for c in ["total", "m"]:
            df[c] = df[c].fillna(0).astype("int64")
        return df

    out = cogroup_left(
        [(rd.from_pandas(dim).repartition(3), "k", None),
         (rd.from_pandas(s1).repartition(2), "kk", fin1),
         (rd.from_pandas(s2).repartition(2), "u", None)],
        num_buckets=4, post_fn=fill).to_pandas()
    got = {r.k: (r.name, r.total, r.m) for r in out.itertuples()}
    assert got == {1: ("a", 12, 0), 2: ("b", 3, 30),
                   3: ("c", 0, 40), 4: ("d", 0, 0)}
    assert set(out.columns) == {"k", "name", "total", "m"}


def test_bool_key_bucketing(ray_session):
    """Boolean key columns bucket without crashing (fill_null(0) on a
    bool Arrow array raises ArrowInvalid — the cast must come first) and
    joins/distinct on bool keys return SQL-correct rows."""
    import pyarrow as pa
    import ray.data as rd

    from cattle_ray.stages.aggregates import distinct
    from cattle_ray.stages.joins import hash_join

    l = pa.table({"k": pa.array([True, False, None], pa.bool_()),
                  "x": [1, 2, 3]})
    r = pa.table({"kk": pa.array([True, True, False]), "y": [10, 11, 12]})
    out = hash_join(rd.from_arrow(l).repartition(2),
                    rd.from_arrow(r).repartition(2), "k", "kk",
                    num_buckets=4).to_pandas()
    assert sorted(zip(out["x"], out["y"])) == [(1, 10), (1, 11), (2, 12)]

    d = distinct(rd.from_arrow(l).repartition(2), ["k"]).to_pandas()
    assert len(d) == 3  # True, False, null each once
