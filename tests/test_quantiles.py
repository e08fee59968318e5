"""Exact distributed quantiles vs numpy order statistics."""

import math

import numpy as np
import pandas as pd
import pytest

from cattle_ray.stages.quantiles import quantile_disc


def _oracle(vals, q):
    s = np.sort(vals)
    return s[min(max(math.ceil(q * len(s)) - 1, 0), len(s) - 1)]


def test_matches_order_statistics(ray_session):
    import ray.data as rd

    vals = np.random.RandomState(5).lognormal(0, 2, 5000)
    ds = rd.from_pandas(pd.DataFrame({"x": vals})).repartition(8)
    qs = [0.01, 0.25, 0.5, 0.75, 0.9, 0.99]
    out = quantile_disc(ds, "x", qs, num_bins=512)
    for q in qs:
        assert out[q] == _oracle(vals, q), q


def test_constant_and_empty(ray_session):
    import ray.data as rd

    ds = rd.from_pandas(pd.DataFrame({"x": [3.0] * 10}))
    assert quantile_disc(ds, "x", [0.5]) == {0.5: 3.0}


def test_skew_refinement_recurses(ray_session):
    """Extreme skew: a dense cluster + one far outlier packs most values
    into a single bin — the recursive refinement still answers exactly."""
    import ray.data as rd

    rng = np.random.RandomState(9)
    dense = rng.rand(2000)                      # all in [0, 1)
    vals = np.concatenate([dense, np.array([1e9])])
    ds = rd.from_pandas(pd.DataFrame({"x": vals})).repartition(4)
    out = quantile_disc(ds, "x", [0.25, 0.5, 0.99], num_bins=8,
                        max_bin_collect=300)
    for q in (0.25, 0.5, 0.99):
        assert out[q] == _oracle(vals, q), q


def test_duplicate_run_skew_terminates(ray_session):
    """A bin of identical values terminates instantly via the lo==hi path."""
    import ray.data as rd

    vals = np.concatenate([np.full(5000, 7.5), np.array([0.0, 1e6])])
    ds = rd.from_pandas(pd.DataFrame({"x": vals}))
    out = quantile_disc(ds, "x", [0.5], num_bins=4, max_bin_collect=10)
    assert out[0.5] == 7.5


def test_bin_overflow_raises_when_refinement_exhausted(ray_session):
    import ray.data as rd

    # continuous uniform mass: every refinement level still overflows
    vals = np.random.RandomState(1).rand(4000)
    ds = rd.from_pandas(pd.DataFrame({"x": vals}))
    with pytest.raises(ValueError, match="overflow"):
        quantile_disc(ds, "x", [0.5], num_bins=2, max_bin_collect=10,
                      max_refine=1)


def test_hll_approx_distinct_within_tolerance(ray_session):
    """HLL estimate within 3% of exact at 100k distinct (rse ~0.8% at p=14),
    and invariant to block layout (mergeable sketch)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cattle_ray.stages.sketches import approx_distinct

    rng = np.random.RandomState(0)
    vals = rng.randint(0, 10**12, 100_000)
    n_exact = len(np.unique(vals))
    ds = rd.from_pandas(pd.DataFrame({"v": np.concatenate([vals, vals])}))
    est = approx_distinct(ds.repartition(8), "v")
    assert abs(est - n_exact) / n_exact < 0.03
    est2 = approx_distinct(ds.repartition(3), "v")
    assert est == est2  # layout-invariant: registers merge by max


def test_hll_string_column(ray_session):
    import pandas as pd
    import ray.data as rd

    from cattle_ray.stages.sketches import approx_distinct

    ds = rd.from_pandas(pd.DataFrame({"u": [f"https://d{i}.org" for i in range(5000)]}))
    est = approx_distinct(ds, "u")
    assert abs(est - 5000) / 5000 < 0.05


def test_grouped_quantile_matches_numpy(ray_session):
    """Per-key quantile_disc rank semantics vs a direct computation."""
    import math

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cattle_ray.stages.quantiles import grouped_quantile_disc

    rng = np.random.RandomState(7)
    df = pd.DataFrame({"k": rng.randint(0, 20, 2000),
                       "v": rng.randn(2000)})
    out = grouped_quantile_disc(rd.from_pandas(df), "k", "v", [0.25, 0.5]).to_pandas()
    for (k, q), grp in out.groupby(["k", "q"]):
        vals = np.sort(df.loc[df["k"] == k, "v"].to_numpy())
        rank = min(max(math.ceil(q * len(vals)) - 1, 0), len(vals) - 1)
        assert grp["value"].iloc[0] == vals[rank], (k, q)
    assert len(out) == 20 * 2


def test_cms_overestimates_only_and_mergeable(ray_session):
    """CMS point estimates are >= true counts (never under), within the
    2N/width bound for the heavy keys, and block-layout invariant."""
    import pandas as pd
    import ray.data as rd

    from cattle_ray.stages.sketches import cms_estimate, cms_merge

    rng = np.random.RandomState(7)
    # zipf-skewed keys: a few heavy, long tail
    keys = rng.zipf(1.5, 20_000) % 5000
    ds = rd.from_pandas(pd.DataFrame({"k": keys}))
    true = pd.Series(keys).value_counts()
    sk = cms_merge(ds.repartition(6), "k", width=4096, depth=4)
    probe = true.index[:50].to_numpy()
    est = cms_estimate(sk, probe)
    assert (est >= true.loc[probe].to_numpy()).all()  # overestimate only
    # error bound: eps = 2N/width with high probability
    assert (est - true.loc[probe].to_numpy() <= 2 * len(keys) / 4096 + 1).all()
    sk2 = cms_merge(ds.repartition(2), "k", width=4096, depth=4)
    assert (sk == sk2).all()  # mergeable: elementwise-sum invariant


def test_heavy_hitters_exact_counts(ray_session):
    """heavy_hitters_exact returns the EXACT top-k (values and counts match
    a pandas groupby), regardless of sketch noise, at any partitioning."""
    import pandas as pd
    import ray.data as rd

    from cattle_ray.stages.sketches import heavy_hitters_exact

    rng = np.random.RandomState(3)
    words = [f"w{z}" for z in rng.zipf(1.3, 30_000) % 800]
    ds = rd.from_pandas(pd.DataFrame({"w": words})).repartition(7)
    out = heavy_hitters_exact(ds, "w", 15).to_pandas()
    vc = pd.Series(words).value_counts()
    exp = (pd.DataFrame({"w": vc.index, "n": vc.to_numpy()})
           .sort_values(["n", "w"], ascending=[False, True]).head(15)
           .reset_index(drop=True))
    assert list(out["w"]) == list(exp["w"])
    assert list(out["n"]) == list(exp["n"])


def test_grouped_hll_within_tolerance_and_layout_invariant(ray_session):
    """Per-key HLL estimates within 5% of exact per-key distincts at p=12
    (rse ~1.6%), identical across block layouts (max-merge is order-free)."""
    import pandas as pd
    import ray.data as rd

    from cattle_ray.stages.sketches import approx_distinct_by_key

    rng = np.random.RandomState(9)
    n = 60_000
    df = pd.DataFrame({
        "g": np.array(["a", "b", "c"])[rng.randint(0, 3, n)],
        "u": rng.randint(0, 20_000, n),
    })
    # skew: group c sees only a narrow user range
    df.loc[df["g"] == "c", "u"] %= 500
    exact = df.groupby("g")["u"].nunique()
    ds = rd.from_pandas(df)
    got = {r["g"]: r["approx_n"]
           for r in approx_distinct_by_key(ds.repartition(8), "g", "u").take_all()}
    for g, e in exact.items():
        assert abs(got[g] - e) / e < 0.05, (g, got[g], e)
    got2 = {r["g"]: r["approx_n"]
            for r in approx_distinct_by_key(ds.repartition(3), "g", "u").take_all()}
    assert got == got2


def test_dd_quantiles_relative_error_and_merge_invariance(ray_session):
    """DDSketch-style quantiles within the alpha relative-error guarantee
    on a lognormal (heavy-tailed) sample including negatives; identical
    across block layouts (pure-function bucketing + sum-merge)."""
    import pandas as pd
    import ray.data as rd

    from cattle_ray.stages.sketches import dd_quantiles

    rng = np.random.RandomState(2)
    vals = np.concatenate([np.exp(rng.randn(40_000) * 2),
                           -np.exp(rng.randn(10_000))])
    ds = rd.from_pandas(pd.DataFrame({"v": vals}))
    qs = [0.01, 0.25, 0.5, 0.9, 0.99]
    got = dd_quantiles(ds.repartition(8), "v", qs, alpha=0.01)
    exact = np.quantile(vals, qs)
    for q, e in zip(qs, exact):
        rel = abs(got[q] - e) / abs(e)
        assert rel < 0.011, (q, got[q], e, rel)
    got2 = dd_quantiles(ds.repartition(3), "v", qs, alpha=0.01)
    assert got == got2


def test_dd_quantiles_subunit_and_zero_zones(ray_session):
    """Regression: positive values just below 1 (log bucket ≤ 0) must NOT
    collide with the near-zero zone — a corpus concentrated at 0.97 has
    median ~0.97, not 0.0 — and mixed zero/sub-unit data orders correctly."""
    import pandas as pd
    import ray.data as rd

    from cattle_ray.stages.sketches import dd_quantiles

    ds = rd.from_pandas(pd.DataFrame({"v": [0.97] * 1000}))
    got = dd_quantiles(ds, "v", [0.5], alpha=0.01)
    assert abs(got[0.5] - 0.97) / 0.97 < 0.011

    mixed = np.concatenate([np.zeros(100), np.full(100, 0.5),
                            np.full(100, -0.25), np.full(100, 2.0)])
    ds2 = rd.from_pandas(pd.DataFrame({"v": mixed}))
    g = dd_quantiles(ds2.repartition(4), "v", [0.2, 0.45, 0.7, 0.95], alpha=0.01)
    assert abs(g[0.2] + 0.25) < 0.01      # -0.25 zone
    assert g[0.45] == 0.0                 # zeros
    assert abs(g[0.7] - 0.5) < 0.01       # sub-unit positives AFTER zero
    assert abs(g[0.95] - 2.0) < 0.03


def test_dd_quantiles_by_key_tolerance(ray_session):
    """Per-key DDSketch quantiles within alpha relative error of exact
    per-key numpy quantiles; layout-invariant."""
    import pandas as pd
    import ray.data as rd

    from cattle_ray.stages.sketches import dd_quantiles_by_key

    rng = np.random.RandomState(6)
    n = 30_000
    df = pd.DataFrame({"g": rng.randint(0, 4, n)})
    df["v"] = np.exp(rng.randn(n) * (1 + df["g"] * 0.5))
    ds = rd.from_pandas(df)
    out = dd_quantiles_by_key(ds.repartition(6), "g", "v",
                              [0.5, 0.9], alpha=0.01).to_pandas()
    for g in range(4):
        sub = df[df["g"] == g]["v"].to_numpy()
        for q in (0.5, 0.9):
            got = out[(out["g"] == g) & (out["q"] == q)]["est"].iloc[0]
            exact = np.quantile(sub, q)
            assert abs(got - exact) / exact < 0.011, (g, q, got, exact)
    out2 = dd_quantiles_by_key(ds.repartition(2), "g", "v",
                               [0.5, 0.9], alpha=0.01).to_pandas()
    m = out.sort_values(["g", "q"]).reset_index(drop=True)
    m2 = out2.sort_values(["g", "q"]).reset_index(drop=True)
    assert (m["est"] == m2["est"]).all()
