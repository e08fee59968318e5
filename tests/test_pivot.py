"""grouped_pivot — the long→wide property-table materialization."""

import pandas as pd
import pyarrow as pa
import pytest


def _pivot(ds, cats):
    from cattle_ray.stages.aggregates import grouped_pivot

    return grouped_pivot(ds, "k", "p", "v", cats).to_pandas()


@pytest.mark.parametrize("partitions", [1, 3, 8])
def test_grouped_pivot_matches_pandas(ray_session, partitions):
    """Parity with pandas pivot_table(max) at several partitionings —
    including keys that miss a category (typed null out) and a category
    absent from the data entirely."""
    import numpy as np
    import ray.data as rd

    rng = np.random.RandomState(7)
    n = 400
    df = pd.DataFrame({
        "k": rng.randint(0, 60, n),
        "p": rng.choice(["a", "b", "c"], n),
        "v": [f"val{val}" for val in rng.randint(0, 100, n)],
    })
    cats = {"col_a": "a", "col_b": "b", "col_c": "c", "col_missing": "zzz"}
    out = _pivot(rd.from_pandas(df).repartition(partitions), cats)

    ref = df.pivot_table(index="k", columns="p", values="v",
                         aggfunc="max").reindex(columns=["a", "b", "c"])
    assert len(out) == ref.shape[0]
    got = out.set_index("k").sort_index()
    for name, cat in [("col_a", "a"), ("col_b", "b"), ("col_c", "c")]:
        lhs = got[name].fillna("∅").to_dict()
        rhs = ref[cat].fillna("∅").to_dict()
        assert lhs == rhs, name
    # a category with no rows anywhere is all-null, and the column exists
    assert got["col_missing"].isna().all()


def test_grouped_pivot_duplicate_pred_takes_max(ray_session):
    """When (key, pred) repeats, the deterministic SQL-mirrorable
    tie-break is max — identical at any partitioning."""
    import ray.data as rd

    df = pd.DataFrame({"k": [1, 1, 1], "p": ["a", "a", "b"],
                       "v": ["x", "z", "m"]})
    for parts in (1, 3):
        out = _pivot(rd.from_pandas(df).repartition(parts),
                     {"a_v": "a", "b_v": "b"})
        assert out.iloc[0]["a_v"] == "z" and out.iloc[0]["b_v"] == "m"


def test_grouped_pivot_schema_is_typed(ray_session):
    """Output blocks keep the value column's type (string), nulls typed."""
    import ray.data as rd

    t = pa.table({"k": [1, 2], "p": ["a", "b"], "v": ["x", "y"]})
    out = _pivot(rd.from_arrow(t), {"a_v": "a", "b_v": "b"})
    assert set(out.columns) == {"k", "a_v", "b_v"}
    # key 1 has no "b" pred → null, not "nan" string
    row = out.set_index("k").loc[1]
    assert row["a_v"] == "x" and pd.isna(row["b_v"])


def test_unpivot_roundtrip_and_nulls(ray_session):
    """unpivot(pivot(x)) == x on non-null cells; null cells emit nothing."""
    import ray.data as rd

    from cattle_ray.stages.aggregates import grouped_pivot, unpivot_batch

    df = pd.DataFrame({"k": [1, 1, 2], "p": ["a", "b", "a"],
                       "v": ["x", "y", "z"]})
    cats = {"a_v": "a", "b_v": "b"}
    wide = grouped_pivot(rd.from_pandas(df).repartition(2), "k", "p", "v",
                         cats)
    long = wide.map_batches(
        lambda b: unpivot_batch(b, "k", cats, pred_col="p", val_col="v"),
        batch_format="pyarrow").to_pandas()
    got = set(map(tuple, long[["k", "p", "v"]].itertuples(index=False)))
    assert got == {(1, "a", "x"), (1, "b", "y"), (2, "a", "z")}


def test_bucket_hash_stable_under_null_dtype_promotion(ray_session):
    """Equal keys MUST co-bucket regardless of which batch they rode in:
    hashing the to_pandas key frame let a batch-local NULL promote an
    int64 key column to float64, so the same (k, s) tuple hashed to
    different buckets in different blocks — distinct emitted duplicate
    rows and partial_count split a group's count. Block 1 carries a null
    alongside (5, 'x'); block 2 carries (5, 'x') null-free."""
    import pyarrow as pa
    import ray.data as rd

    from cattle_ray.stages.aggregates import distinct, partial_count

    t1 = pa.table({"k": pa.array([5, None], pa.int64()), "s": ["x", "y"]})
    t2 = pa.table({"k": pa.array([5, 7], pa.int64()), "s": ["x", "z"]})
    ds = rd.from_arrow([t1, t2])

    out = distinct(ds, ["k", "s"]).to_pandas()
    assert len(out) == 3  # (5,x) collapses across blocks; (None,y); (7,z)

    cnt = partial_count(ds, ["k", "s"]).to_pandas()
    got = {(None if pd.isna(k) else int(k), s): int(n)
           for k, s, n in zip(cnt["k"], cnt["s"], cnt["n"])}
    assert got == {(5, "x"): 2, (None, "y"): 1, (7, "z"): 1}
