"""Mergeable sketches for corpus-scale approximate analytics.

:func:`approx_distinct` — HyperLogLog distinct-count over a column: exact
distinct of e.g. ``url`` at 10^12 rows is a full all-to-all shuffle, while
HLL is one streaming pass producing a fixed 2^p-byte register array per
block that merges by elementwise max. Driver memory = one register array;
no shuffle at all. Standard error ≈ 1.04/√(2^p) (~0.8% at p=14).

All per-batch work is vectorized numpy (hash → register index / rank →
``np.maximum.at``); no Python loop over rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _bit_length64(x: np.ndarray) -> np.ndarray:
    """Vectorized integer bit_length for uint64 (6 binary-search steps —
    exact, unlike float log2 which is off-by-ulp at powers of two)."""
    x = x.astype(np.uint64)
    n = np.zeros(x.shape, dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        m = x >= (np.uint64(1) << np.uint64(shift))
        n[m] += shift
        x = np.where(m, x >> np.uint64(shift), x)
    return n + (x > 0)


def hll_partial(batch: pa.Table, col: str, p: int = 14) -> pa.Table:
    """One batch → one row holding this batch's 2^p HLL registers."""
    m = 1 << p
    col_a = batch[col]
    if isinstance(col_a, pa.ChunkedArray):
        col_a = col_a.combine_chunks()
    h = pd.util.hash_pandas_object(col_a.to_pandas(), index=False).to_numpy()
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    suffix = h & np.uint64((1 << (64 - p)) - 1)
    rank = ((64 - p) - _bit_length64(suffix) + 1).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})


def _hll_estimate(regs: np.ndarray, p: int) -> float:
    m = 1 << p
    est = (0.7213 / (1 + 1.079 / m)) * m * m / np.sum(2.0 ** -regs.astype(np.float64))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)  # linear counting for the small range
    return float(est)


def approx_distinct(ds, col: str, p: int = 14) -> int:
    """HLL distinct estimate. Per-block registers stream to the driver
    (2^p bytes each) and merge by elementwise max — constant driver memory,
    zero shuffle. Deterministic: the hash is seed-fixed."""
    m = 1 << p
    partials = ds.map_batches(lambda b: hll_partial(b, col, p),
                              batch_format="pyarrow")
    merged = np.zeros(m, dtype=np.uint8)
    for chunk in partials.iter_batches(batch_format="pyarrow", batch_size=64):
        for buf in chunk["regs"].to_pylist():
            np.maximum(merged, np.frombuffer(buf, dtype=np.uint8), out=merged)
    return int(round(_hll_estimate(merged, p)))
