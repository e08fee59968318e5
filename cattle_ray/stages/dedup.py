"""D2-D4 + training-data dedup family: exact, MinHash-LSH, SimHash,
n-gram Jaccard, embedding-cosine near-dup.

Shuffle discipline (SURVEY.md §7.3, ray_guide "Aggregation at scale"):
- Exact dedup: vectorized content hash inside ``map_batches`` → within-batch
  pre-dedup (shrinks the shuffle) → ``groupby(hash)`` → per-group first.
- MinHash-LSH: shingle→minhash per batch (numpy, no shuffle) → explode to
  ``(band_id, band_hash, id)`` rows → ONE groupby on the band key → candidate
  pairs → verify by minhash-estimated Jaccard (mergeable, no second pass over
  text). Connected components by iterated min-label propagation — driver
  union-find only on the (provably small) candidate pair set.
- SimHash: 64-bit fingerprint per doc; near-dup candidates via 4×16-bit band
  buckets (Hamming ≤ 3 ⇒ at least one band identical — pigeonhole).
- Embedding near-dup: random-hyperplane LSH buckets → within-bucket cosine.

All per-batch kernels are numpy/pyarrow vectorized; ids, not text, flow
through every shuffle.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_SEP = "\x1f"

# ---------------------------------------------------------------------------
# exact dedup


def add_content_hash(batch: pa.Table, cols, out_col: str = "_chash") -> pa.Table:
    """Vectorized 64-bit content hash over ``cols`` (join + hash per batch)."""
    parts = []
    for c in cols:
        arr = pc.cast(batch[c], pa.string())
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        parts.append(pc.fill_null(arr, "\x00"))
    parts.append(_SEP)
    joined = pc.binary_join_element_wise(*parts)
    h = pd.util.hash_pandas_object(joined.to_pandas(), index=False).to_numpy()
    return batch.append_column(out_col, pa.array(h.astype(np.uint64), pa.uint64()))


def within_batch_dedup(batch: pa.Table, hash_col: str = "_chash") -> pa.Table:
    """Local pre-dedup before the shuffle (keeps first occurrence)."""
    df = batch.to_pandas()
    return pa.Table.from_pandas(
        df.drop_duplicates(subset=[hash_col]), preserve_index=False
    ).cast(batch.schema)


def dedup_exact(ds, cols, keep_col: str | None = None, num_buckets: int = 64):
    """D2: hash-partitioned exact dedup. ``keep_col`` (e.g. an id) selects the
    minimum-valued row per duplicate group for determinism; otherwise first.

    Shuffle discipline: the groupby key is a LOW-CARDINALITY bucket
    (``_chash % num_buckets``), not the content hash itself — ``map_groups``
    calls its UDF once per group, so grouping on the raw hash would mean one
    Python/pandas call per distinct row (measured 15s for 16k groups);
    per-bucket the dedup is one vectorized ``drop_duplicates``. Buckets are
    uniform by construction (hash of content); scale ``num_buckets`` with the
    corpus so a bucket fits a worker's heap. Dedup compares FULL column
    values within bucket, so 64-bit hash collisions (expected at 10^12 rows)
    cannot drop distinct rows.
    """
    cols = list(cols)

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = batch["_chash"].to_numpy(zero_copy_only=False).astype(np.uint64) % num_buckets
        return batch.append_column("_bucket", pa.array(b.astype(np.int64)))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        if keep_col is not None:
            g = g.sort_values(keep_col, kind="mergesort")
        return g.drop_duplicates(subset=cols).drop(columns=["_chash", "_bucket"])

    from .aggregates import coalesce_small

    return (
        coalesce_small(
            ds.map_batches(lambda b: add_content_hash(b, cols), batch_format="pyarrow")
            .map_batches(within_batch_dedup, batch_format="pyarrow")
            .map_batches(add_bucket, batch_format="pyarrow")
        )
        .groupby("_bucket")
        .map_groups(finish, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# MinHash-LSH

MINHASH_K = 128
LSH_BANDS = 32  # 32 bands × 4 rows; s-curve threshold ≈ (1/32)^(1/4) ≈ 0.42
_MERSENNE = (1 << 61) - 1


def _perm_params(k: int = MINHASH_K, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=k, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=k, dtype=np.int64).astype(np.uint64)
    return a, b


_PERM_A, _PERM_B = _perm_params()


def shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Word n-gram shingles → uint64 hashes (crc32 pairs; C-speed per shingle)."""
    toks = text.split()
    if len(toks) < n:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    if not grams:
        return np.zeros(0, dtype=np.uint64)
    out = np.fromiter(
        (zlib.crc32(g.encode()) | (zlib.crc32(g.encode()[::-1]) << 32) for g in grams),
        dtype=np.uint64,
        count=len(grams),
    )
    return np.unique(out)


def minhash_signature(sh: np.ndarray) -> np.ndarray:
    """(a*x+b) mod p permutation minima, vectorized over shingles × k."""
    if sh.size == 0:
        return np.full(MINHASH_K, np.iinfo(np.uint64).max, dtype=np.uint64)
    v = (_PERM_A[:, None] * sh[None, :] + _PERM_B[:, None]) % _MERSENNE
    return v.min(axis=1).astype(np.uint64)


class MinHashBands:
    """Per-batch: text → minhash signature → LSH band rows
    ``(id, band_id, band_hash, _bucket, sig)``. Signature kept (fixed-size
    list col) so pair verification is a signature compare — no second text
    pass. ``_bucket = (band_hash ^ band_id) % num_buckets`` is the
    low-cardinality shuffle key (see :func:`dedup_exact` rationale)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text", ngram: int = 3,
                 num_buckets: int = 64):
        self.id_col, self.text_col, self.ngram = id_col, text_col, ngram
        self.rows_per_band = MINHASH_K // LSH_BANDS
        self.num_buckets = num_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        n = len(ids)
        r = self.rows_per_band
        sigs = np.empty((n, MINHASH_K), dtype=np.uint64)
        for j, t in enumerate(texts):
            sigs[j] = minhash_signature(shingle_hashes(t or "", self.ngram))
        # band hashes vectorized: crc32 per (doc, band) chunk
        band_hash = np.empty((n, LSH_BANDS), dtype=np.uint32)
        for j in range(n):
            row = sigs[j]
            for b in range(LSH_BANDS):
                band_hash[j, b] = zlib.crc32(row[b * r : (b + 1) * r].tobytes())
        out_id = np.repeat(np.asarray(ids), LSH_BANDS)
        out_band = np.tile(np.arange(LSH_BANDS, dtype=np.int32), n)
        out_bh = band_hash.reshape(-1)
        bucket = ((out_bh.astype(np.uint64) ^ out_band.astype(np.uint64)) % self.num_buckets).astype(np.int64)
        sig_rep = np.repeat(sigs, LSH_BANDS, axis=0)
        return pa.table(
            {
                "id": pa.array(out_id),
                "band_id": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_bh, pa.uint32()),
                "_bucket": pa.array(bucket),
                "sig": pa.FixedSizeListArray.from_arrays(
                    pa.array(sig_rep.reshape(-1)), MINHASH_K
                ),
            }
        )


def _pairs_from_bucket(g: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """Candidate pairs within one shuffle bucket: only rows whose
    (band_id, band_hash) collides with another doc's are touched (vectorized
    prefilter); the Python loop runs over colliding bands only."""
    g = g[g.duplicated(subset=["band_id", "band_hash"], keep=False)]
    if g.empty:
        return pd.DataFrame({"a": [], "b": [], "est_jaccard": []})
    a_out, b_out, j_out = [], [], []
    for _, grp in g.groupby(["band_id", "band_hash"], sort=False):
        grp = grp.drop_duplicates(subset=["id"]).sort_values("id", kind="mergesort")
        n = len(grp)
        if n < 2:
            continue
        sigs = np.stack(grp["sig"].to_numpy())
        ids = grp["id"].to_numpy()
        for i in range(n - 1):
            eq = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
            hit = np.nonzero(eq >= threshold)[0]
            for h in hit:
                a_out.append(ids[i])
                b_out.append(ids[i + 1 + h])
                j_out.append(float(eq[h]))
    return pd.DataFrame({"a": a_out, "b": b_out, "est_jaccard": j_out})


def minhash_dedup_pairs(ds, id_col="doc_id", text_col="text", threshold=0.8, ngram=3,
                        concurrency=4, num_buckets=64):
    """MinHash+LSH near-dup candidate pairs (a<b) with estimated Jaccard."""
    bands = ds.map_batches(
        MinHashBands,
        fn_constructor_kwargs=dict(id_col=id_col, text_col=text_col, ngram=ngram,
                                   num_buckets=num_buckets),
        batch_format="pyarrow", concurrency=concurrency,
    )
    from .aggregates import coalesce_small

    pairs = coalesce_small(bands).groupby("_bucket").map_groups(
        lambda g: _pairs_from_bucket(g, threshold), batch_format="pandas"
    )
    # same pair can surface from several bands → exact dedup on (a,b)
    return dedup_exact(pairs, ["a", "b"])


def connected_components(pairs_df: pd.DataFrame) -> dict:
    """Driver-side union-find over the (small) verified pair set → {id: root}.
    Scale path: iterate min-label propagation as a groupby loop instead."""
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs_df["a"], pairs_df["b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if str(ra) <= str(rb) else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


# ---------------------------------------------------------------------------
# SimHash


def simhash64(text: str) -> int:
    toks = text.split()
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in toks:
        h = zlib.crc32(t.encode()) | (zlib.crc32(t.encode()[::-1]) << 32)
        bits = (h >> np.arange(64, dtype=np.uint64)) & 1
        acc += np.where(bits.astype(bool), 1, -1)
    return int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def add_simhash(batch: pa.Table, text_col="text", out_col="simhash") -> pa.Table:
    vals = [simhash64(t or "") for t in batch[text_col].to_pylist()]
    return batch.append_column(out_col, pa.array(np.array(vals, dtype=np.uint64)))


def simhash_pairs(ds, id_col="doc_id", text_col="text", max_hamming=3,
                  num_buckets=64):
    """Near-dup pairs by SimHash: 4×16-bit band buckets guarantee recall for
    Hamming ≤ 3 (pigeonhole); verify exact Hamming within band collision.
    Shuffle key is the low-cardinality ``_bucket`` (see dedup_exact)."""

    def bands(batch: pa.Table) -> pa.Table:
        batch = add_simhash(batch, text_col)
        ids = np.asarray(batch[id_col].to_pylist())
        hs = np.asarray(batch["simhash"].to_pylist(), dtype=np.uint64)
        n = len(ids)
        band_id = np.tile(np.arange(4, dtype=np.uint64), n)
        hs_rep = np.repeat(hs, 4)
        band_hash = ((hs_rep >> (16 * band_id)) & np.uint64(0xFFFF)).astype(np.uint32)
        bucket = ((band_hash.astype(np.uint64) * np.uint64(2654435761) + band_id)
                  % num_buckets).astype(np.int64)
        return pa.table(
            {"id": pa.array(np.repeat(ids, 4)),
             "band_id": pa.array(band_id.astype(np.int32)),
             "band_hash": pa.array(band_hash),
             "_bucket": pa.array(bucket),
             "simhash": pa.array(hs_rep)}
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g.duplicated(subset=["band_id", "band_hash"], keep=False)]
        a_out, b_out, d_out = [], [], []
        for _, grp in g.groupby(["band_id", "band_hash"], sort=False):
            grp = grp.drop_duplicates(subset=["id"]).sort_values("id", kind="mergesort")
            if len(grp) < 2:
                continue
            ids = grp["id"].to_numpy()
            hs = grp["simhash"].to_numpy().astype(np.uint64)
            for i in range(len(grp) - 1):
                x = hs[i + 1 :] ^ hs[i]
                dist = np.array([bin(int(v)).count("1") for v in x])
                for j in np.nonzero(dist <= max_hamming)[0]:
                    a_out.append(ids[i]); b_out.append(ids[i + 1 + j]); d_out.append(int(dist[j]))
        return pd.DataFrame({"a": a_out, "b": b_out, "hamming": d_out})

    from .aggregates import coalesce_small

    cand = coalesce_small(ds.map_batches(bands, batch_format="pyarrow")).groupby(
        "_bucket"
    ).map_groups(pairs, batch_format="pandas")
    return dedup_exact(cand, ["a", "b"])


# ---------------------------------------------------------------------------
# exact n-gram Jaccard (token-join form; oracle-checkable)


def token_set_batch(batch: pa.Table, id_col="doc_id", text_col="text", n=1,
                    num_buckets=64) -> pa.Table:
    """Explode each doc into its distinct token n-grams, carrying the doc's
    set size (each doc lives in exactly one batch, so sizes are exact) and a
    low-cardinality shuffle bucket keyed on the token."""
    ids, toks, szs, buckets = [], [], [], []
    for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
        ts = (t or "").split()
        grams = (
            set(ts) if n == 1 else {" ".join(ts[j : j + n]) for j in range(len(ts) - n + 1)}
        )
        sz = len(grams)
        for g in sorted(grams):
            ids.append(i)
            toks.append(g)
            szs.append(sz)
            buckets.append(zlib.crc32(g.encode()) % num_buckets)
    return pa.table(
        {
            "id": pa.array(ids),
            "token": pa.array(toks, pa.string()),
            "sz": pa.array(szs, pa.int64()),
            "_bucket": pa.array(buckets, pa.int64()),
        }
    )


def jaccard_pairs(ds, id_col="doc_id", text_col="text", n=1, min_jaccard=0.0,
                  num_buckets=64):
    """Exact token-set Jaccard for all co-occurring pairs via the token join:
    explode distinct tokens (+sizes) → per-bucket vectorized self-join →
    partial pair counts → one small final sum → jaccard from carried sizes.
    Quadratic in per-token doc frequency: intended for bounded subsets /
    verification, not the full corpus (use MinHash there)."""
    from ray.data.aggregate import Max, Sum

    toks = ds.map_batches(
        lambda b: token_set_batch(b, id_col, text_col, n, num_buckets),
        batch_format="pyarrow",
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g[g.duplicated(subset=["token"], keep=False)]
        if g.empty:
            return pd.DataFrame(
                {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
                 "sa": pd.Series(dtype="int64"), "sb": pd.Series(dtype="int64"),
                 "cnt": pd.Series(dtype="int64")}
            )
        m = g.merge(g, on="token", suffixes=("_x", "_y"))
        m = m[m["id_x"] < m["id_y"]]
        out = (
            m.groupby(["id_x", "id_y", "sz_x", "sz_y"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        return out.rename(columns={"id_x": "a", "id_y": "b", "sz_x": "sa", "sz_y": "sb"})

    from .aggregates import coalesce_small

    partials = coalesce_small(toks).groupby("_bucket").map_groups(
        bucket_pairs, batch_format="pandas"
    )
    agg = coalesce_small(partials, 8).groupby(["a", "b"]).aggregate(
        Sum("cnt", alias_name="intersection"),
        Max("sa", alias_name="sa"),
        Max("sb", alias_name="sb"),
    )

    def finish(batch: pd.DataFrame) -> pd.DataFrame:
        inter = batch["intersection"].to_numpy(dtype=np.float64)
        sa = batch["sa"].to_numpy(dtype=np.float64)
        sb = batch["sb"].to_numpy(dtype=np.float64)
        batch = batch[["a", "b", "intersection"]].copy()
        batch["jaccard"] = inter / (sa + sb - inter)
        return batch[batch["jaccard"] >= min_jaccard]

    return agg.map_batches(finish, batch_format="pandas")


# ---------------------------------------------------------------------------
# embedding-cosine near-dup


def embedding_neardup_pairs(ds, id_col="vec_id", vec_col="embedding",
                            threshold=0.95, num_planes=12, seed=42):
    """Random-hyperplane LSH: bucket = sign-bits of V·H (one groupby), then
    exact cosine within bucket. ``num_planes`` trades recall for bucket size."""
    def bucketize(batch: pa.Table) -> pa.Table:
        vecs = np.stack(batch[vec_col].to_pylist()).astype(np.float64)
        dim = vecs.shape[1]
        planes = rng_planes(dim, num_planes, seed)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        bits = (unit @ planes.T > 0).astype(np.uint64)
        bucket = (bits << np.arange(num_planes, dtype=np.uint64)).sum(axis=1)
        return pa.table(
            {"id": batch[id_col], "bucket": pa.array(bucket),
             "vec": pa.array([v.tolist() for v in unit], pa.list_(pa.float64()))}
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=["id"]).sort_values("id", kind="mergesort")
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "cosine": []})
        vecs = np.stack(g["vec"].to_numpy())
        ids = g["id"].to_numpy()
        sims = vecs @ vecs.T
        ii, jj = np.triu_indices(len(ids), k=1)
        keep = sims[ii, jj] >= threshold
        return pd.DataFrame(
            {"a": ids[ii][keep], "b": ids[jj][keep], "cosine": sims[ii, jj][keep]}
        )

    from .aggregates import coalesce_small

    return (
        coalesce_small(ds.map_batches(bucketize, batch_format="pyarrow"))
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
    )


def rng_planes(dim: int, num_planes: int, seed: int) -> np.ndarray:
    return np.random.RandomState(seed).randn(num_planes, dim)


def md5_hex(s: str) -> str:
    """F1 content hash (generalizes /root/reference/src/hash_folder.py:10-32 —
    no partial-content fallback needed over clean Arrow buffers)."""
    return hashlib.md5(s.encode("utf-8")).hexdigest()
