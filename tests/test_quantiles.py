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


def test_bin_overflow_raises(ray_session):
    import ray.data as rd

    vals = np.concatenate([np.zeros(1000), np.array([1e9])])  # extreme skew
    ds = rd.from_pandas(pd.DataFrame({"x": vals}))
    with pytest.raises(ValueError, match="overflow"):
        quantile_disc(ds, "x", [0.5], num_bins=4, max_bin_collect=100)
