"""Distributed EXACT discrete quantiles without a global sort.

Two streaming passes, both map-side-combined — no all-to-all shuffle and no
driver-side collection of the column:

1. min/max + a fixed-width histogram per batch (vectorized ``np.bincount``),
   merged into one small array on the driver → locate, for each requested
   quantile rank ``k = ceil(q·n) − 1`` (DuckDB ``quantile_disc`` semantics,
   verified empirically), the bin containing the k-th order statistic.
2. collect ONLY the values inside the needed bins (a ~n/num_bins sliver of
   the data) and select exactly on the driver.

At 10^12 rows with 65k bins, pass 2 moves ~n/65k values per needed bin —
still driver-safe; degenerate skew (one bin holding far more than
``max_bin_collect``) raises rather than OOMing the driver, and the caller
re-runs with more bins over the narrowed [lo, hi] range (recursive refine).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def quantile_disc(ds, col: str, qs, num_bins: int = 8192,
                  max_bin_collect: int = 5_000_000) -> dict[float, float]:
    """Exact discrete quantiles of ``ds[col]`` → {q: value}."""
    qs = list(qs)

    # pass 0+1 fused: per-batch (count, min, max, histogram) — histogram needs
    # global min/max, so first a tiny stats pass, then the histogram pass.
    def stats(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return pa.table({"n": pa.array([0]), "lo": pa.array([np.inf]),
                             "hi": pa.array([-np.inf])})
        return pa.table({"n": pa.array([int(v.size)]), "lo": pa.array([float(v.min())]),
                         "hi": pa.array([float(v.max())])})

    st = ds.map_batches(stats, batch_format="pyarrow").to_pandas()
    n, lo, hi = int(st["n"].sum()), float(st["lo"].min()), float(st["hi"].max())
    if n == 0:
        return {q: float("nan") for q in qs}
    if lo == hi:
        return {q: lo for q in qs}

    width = (hi - lo) / num_bins

    def hist(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        idx = np.minimum(((v - lo) / width).astype(np.int64), num_bins - 1)
        counts = np.bincount(idx, minlength=num_bins)
        return pa.table({"bin": pa.array(np.arange(num_bins, dtype=np.int64)),
                         "cnt": pa.array(counts)})

    hdf = ds.map_batches(hist, batch_format="pyarrow").to_pandas()
    counts = np.zeros(num_bins, dtype=np.int64)
    np.add.at(counts, hdf["bin"].to_numpy(), hdf["cnt"].to_numpy())
    cum = np.cumsum(counts)

    # DuckDB quantile_disc rank (0-based): ceil(q*n) - 1, clamped
    ranks = {q: min(max(math.ceil(q * n) - 1, 0), n - 1) for q in qs}
    need_bins = sorted({int(np.searchsorted(cum, r + 1)) for r in ranks.values()})
    if any(counts[b] > max_bin_collect for b in need_bins):
        raise ValueError(
            f"quantile bin overflow (> {max_bin_collect} values); re-run with "
            f"more bins or refine on the narrowed range"
        )
    need_set = set(need_bins)

    def sliver(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        idx = np.minimum(((v - lo) / width).astype(np.int64), num_bins - 1)
        m = np.isin(idx, list(need_set))
        return pa.table({"bin": pa.array(idx[m]), "val": pa.array(v[m])})

    sl = ds.map_batches(sliver, batch_format="pyarrow").to_pandas()
    out: dict[float, float] = {}
    for q, r in ranks.items():
        b = int(np.searchsorted(cum, r + 1))
        before = int(cum[b - 1]) if b > 0 else 0
        within = np.sort(sl[sl["bin"] == b]["val"].to_numpy())
        out[q] = float(within[r - before])
    return out
