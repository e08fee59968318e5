"""Property tests for the sixth-continuation kernels: pivot/unpivot
inverses, banded range-join parity vs the quadratic reference, URL
canonicalization idempotence, and linear-scorer invariances — all pure
kernels (no Ray session), so hypothesis can hammer them cheaply."""

import string

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st


# --- pivot/unpivot on raw Arrow batches (the kernels, not the shuffle) ---

@st.composite
def long_table(draw):
    n = draw(st.integers(0, 40))
    keys = draw(st.lists(st.integers(0, 8), min_size=n, max_size=n))
    preds = draw(st.lists(st.sampled_from(["a", "b", "c"]),
                          min_size=n, max_size=n))
    vals = draw(st.lists(st.text(string.ascii_lowercase, min_size=1,
                                 max_size=6), min_size=n, max_size=n))
    return pd.DataFrame({"k": keys, "p": preds, "v": vals})


@given(long_table())
@settings(max_examples=60, deadline=None)
def test_unpivot_of_pivot_is_per_key_max(df):
    """pivot(max) → unpivot == per-(key,pred) MAX of the input rows —
    exactly SQL's max(CASE) semantics, for ANY duplicate structure."""
    from cattle_ray.stages.aggregates import unpivot_batch

    cats = {"a_v": "a", "b_v": "b", "c_v": "c"}
    # kernel-level pivot (single batch): masked max per key
    wide_cols = {"k": sorted(set(df["k"]))}
    ref = df.groupby(["k", "p"])["v"].max()
    rows = {}
    for name, cat in cats.items():
        rows[name] = [ref.get((k, cat)) for k in wide_cols["k"]]
    wide = pa.table({"k": pa.array(wide_cols["k"], pa.int64()),
                     **{n: pa.array(rows[n], pa.string()) for n in cats}})
    long = unpivot_batch(wide, "k", cats, pred_col="p", val_col="v")
    got = set(zip(long["k"].to_pylist(), long["p"].to_pylist(),
                  long["v"].to_pylist()))
    want = {(k, p, v) for (k, p), v in ref.items()}
    assert got == want


# --- URL canonicalization ---

url_chars = string.ascii_letters + string.digits + "-._~"
seg = st.text(url_chars, min_size=1, max_size=8)


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "HTTP", "https", "HTTPS"]))
    host = draw(st.sampled_from(["Example.ORG", "a.b", "X.Y.Z"]))
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    path = "/" + "/".join(draw(st.lists(seg, max_size=3)))
    trail = draw(st.sampled_from(["", "/", "//"]))
    q = draw(st.sampled_from(
        ["", "?b=2&a=1", "?utm_source=x", "?utm_a=1&z=9&utm_b=2"]))
    frag = draw(st.sampled_from(["", "#f", "#a/b?c"]))
    return f"{scheme}://{host}{port}{path}{trail}{q}{frag}"


@given(st.lists(urls(), max_size=20))
@settings(max_examples=60, deadline=None)
def test_url_normalize_idempotent_and_clean(batch):
    from cattle_ray.stages.urls import normalize_url_series

    s = pd.Series(batch, dtype="object")
    once = normalize_url_series(s)
    twice = normalize_url_series(once)
    assert list(once) == list(twice)          # canonical forms are fixpoints
    for u in once:
        assert "#" not in u                    # fragments stripped
        head = u.split("/", 3)[2] if "://" in u else ""
        # only the SCHEME'S default port strips — http://x:443 keeps it
        if u.startswith("http://"):
            assert not head.endswith(":80")
        if u.startswith("https://"):
            assert not head.endswith(":443")
        assert "utm_" not in u.split("?")[-1] if "?" in u else True
        if "?" in u:                           # surviving params sorted
            parts = u.split("?", 1)[1].split("&")
            assert parts == sorted(parts)


# --- banded range join band math (kernel-level, no Ray) ---

@given(st.lists(st.tuples(st.integers(0, 5),
                          st.integers(-1000, 1000)), max_size=60),
       st.integers(1, 50))
@settings(max_examples=60, deadline=None)
def test_band_math_covers_exactly_window_pairs(rows, hi):
    """For every (l, r) same-key pair with r-l in (0, hi], floor-band(r)
    is floor-band(l) or floor-band(l)+1 — the invariant the 2-band emit
    relies on — and never both emit-bands at once."""
    for _, tl in rows:
        for _, tr in rows:
            d = tr - tl
            if 0 < d <= hi:
                bl, br = tl // hi, tr // hi   # python floor div
                assert br in (bl, bl + 1)
                assert not (br == bl and br == bl + 1)


# --- linear scorer invariances ---

@given(st.lists(st.text(string.ascii_lowercase + " ", max_size=40),
                min_size=1, max_size=10))
@settings(max_examples=40, deadline=None)
def test_linear_scorer_zero_model_gives_bias(texts):
    """With all-zero weights every doc scores exactly the bias, whatever
    the text; scoring is order-independent across the batch."""
    from cattle_ray.stages.classify import LinearScorer

    sc = LinearScorer(model=(np.zeros(64), 0.25), text_col="t")
    out = sc(pa.table({"t": pa.array(texts, pa.string())}))
    assert out["score"].to_pylist() == [0.25] * len(texts)

    sc2 = LinearScorer(model=(np.zeros(64), 0.25), text_col="t")
    rev = sc2(pa.table({"t": pa.array(texts[::-1], pa.string())}))
    assert rev["score"].to_pylist() == [0.25] * len(texts)
