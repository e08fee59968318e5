"""Text-analysis stages for training-data pipelines: language-ID, quality
scoring, token counting, document fingerprinting.

All vectorized per batch; language-ID holds per-language stopword/char-gram
tables built once per actor (T2-style stateful stage).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

import pyarrow as pa
import pyarrow.compute as pc

#: tiny per-language stopword profiles for the n-gram/stopword heuristic
LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "de", "que", "por"},
}

_STOPWORDS_EN = LANG_PROFILES["en"]
# BPE-ish token pattern: word pieces, numbers, punctuation runs (public
# GPT-2-style pre-tokenizer shape, simplified)
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+")


def compression_ratio_batch(batch: pa.Table, id_col="doc_id",
                            text_col="text", level: int = 6) -> pa.Table:
    """Per-doc zlib compression ratio — the classic cheap redundancy signal
    (CCNet/Gopher family): boilerplate and degenerate repetition compress
    far below ~0.4× while natural prose sits near 0.5-0.7×. Deterministic
    (zlib output is a pure function of bytes and level, identical at any
    partitioning or retry) but not SQL-expressible → rows-only query with
    pytest planted-truth coverage. The per-doc loop is irreducible (zlib is
    per-document), but each call is C; emits ``comp_ratio`` (float64,
    compressed/raw, 0 for empty docs) and ``raw_bytes``."""
    import zlib

    t = pc.cast(batch[text_col], pa.string())
    texts = pc.fill_null(t, "").to_pylist()
    raw = np.empty(len(texts), np.int64)
    comp = np.empty(len(texts), np.int64)
    for i, s in enumerate(texts):
        b = s.encode("utf-8")
        raw[i] = len(b)
        comp[i] = len(zlib.compress(b, level))
    ratio = np.where(raw > 0, comp / np.maximum(raw, 1), 0.0)
    return pa.table({
        id_col: batch[id_col],
        "raw_bytes": pa.array(raw),
        "comp_ratio": pa.array(ratio, pa.float64()),
    })


def token_count_batch(batch: pa.Table, text_col="text") -> pa.Table:
    """Whitespace token count — fully vectorized (split + list length)."""
    t = pc.cast(batch[text_col], pa.string())
    trimmed = pc.utf8_trim_whitespace(pc.fill_null(t, ""))
    ws = pc.list_value_length(pc.split_pattern_regex(trimmed, r"\s+"))
    # empty string splits to [''] → count 1; fix to 0 for empty/null
    empty = pc.equal(trimmed, "")
    n = pc.if_else(empty, pa.scalar(0, pa.int32()), ws)
    return batch.append_column("n_tokens", pc.cast(n, pa.int64()))


def bpe_token_count_batch(batch: pa.Table, text_col="text") -> pa.Table:
    """BPE-ish regex token count (vectorized via Arrow count-matches
    fallback to per-doc findall — regex is C)."""
    texts = batch[text_col].to_pylist()
    counts = [len(_BPE_RE.findall(t)) if t else 0 for t in texts]
    return batch.append_column("n_bpe_tokens", pa.array(counts, pa.int64()))


def _bpe_regex_count(text: str) -> int:
    """Default tokenizer backend: the BPE-ish regex (C-level findall)."""
    return len(_BPE_RE.findall(text))


class TokenCounter:
    """Pluggable-tokenizer actor stage (same actor-pool shape as LangId):
    ``backend_factory`` is a zero-arg picklable factory returning a
    ``Callable[[str], int]`` — a REAL tokenizer (tiktoken / HF) loads its
    vocab/merges exactly once per actor here in ``__init__``, then counts
    per batch in ``__call__``. Default backend is the BPE-ish regex.

    Usage::

        ds.map_batches(TokenCounter, fn_constructor_kwargs=dict(
            backend_factory=my_tokenizer_factory), batch_format="pyarrow",
            concurrency=8)
    """

    def __init__(self, backend_factory=None, text_col: str = "text",
                 out_col: str = "n_bpe_tokens"):
        self.count = (backend_factory or (lambda: _bpe_regex_count))()
        self.text_col, self.out_col = text_col, out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts = [self.count(t) if t else 0
                  for t in batch[self.text_col].to_pylist()]
        return batch.append_column(self.out_col, pa.array(counts, pa.int64()))


def _explode_isin_counts(s: "pd.Series", toks: "pd.Series", vocab) -> np.ndarray:
    """Per-row count of tokens ∈ vocab, fully vectorized: explode the token
    lists once, one C-level ``isin`` + index-grouped sum (no per-doc lambda)."""
    ex = toks.explode().dropna()
    if ex.empty:
        return np.zeros(len(s), dtype=np.int64)
    hits = ex.str.lower().isin(vocab).groupby(level=0).sum()
    return hits.reindex(s.index, fill_value=0).to_numpy(dtype=np.int64)


def quality_batch(batch: pa.Table, text_col="text") -> pa.Table:
    """Quality signals: length, punctuation ratio, stopword ratio, mean word
    length + a composite score in [0,1]. pandas str ops (C-vectorized)."""
    import pandas as pd

    s = batch[text_col].to_pandas().fillna("")
    n_chars = s.str.len().to_numpy(dtype=np.int64)
    toks = s.str.split()
    n_tok = toks.map(len).to_numpy(dtype=np.int64)
    n_stop = _explode_isin_counts(s, toks, _STOPWORDS_EN)
    n_punct = s.str.count(r"[^\w\s]").to_numpy(dtype=np.int64)
    safe_tok = np.maximum(n_tok, 1)
    safe_chars = np.maximum(n_chars, 1)
    stop_ratio = n_stop / safe_tok
    punct_ratio = n_punct / safe_chars
    mean_word_len = (n_chars - np.maximum(n_tok - 1, 0)) / safe_tok
    score = np.clip(
        0.4 * np.clip(n_tok / 50.0, 0, 1)
        + 0.3 * np.clip(stop_ratio * 5, 0, 1)
        + 0.3 * (1 - np.clip(punct_ratio * 5, 0, 1)),
        0,
        1,
    )
    out = batch
    for name, arr in [
        ("q_n_chars", pa.array(n_chars)),
        ("q_n_tokens", pa.array(n_tok)),
        ("stop_ratio", pa.array(stop_ratio)),
        ("punct_ratio", pa.array(punct_ratio)),
        ("mean_word_len", pa.array(mean_word_len)),
        ("quality", pa.array(score)),
    ]:
        out = out.append_column(name, arr)
    return out


class LangId:
    """Stopword-profile language guesser (deterministic heuristic). Profiles
    built once per actor; per batch ONE explode + one vectorized ``isin``
    per language (no per-doc Python). Ties break by profile order (first
    language reaching the max count); zero hits → 'und'."""

    def __init__(self, profiles=None):
        self.profiles = {k: frozenset(v) for k, v in (profiles or LANG_PROFILES).items()}
        self.langs = list(self.profiles)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        s = batch["text"].to_pandas().fillna("")
        ex = s.str.lower().str.split().explode().dropna()
        counts = np.zeros((len(s), len(self.langs)), dtype=np.int64)
        if not ex.empty:
            for j, lang in enumerate(self.langs):
                hits = ex.isin(self.profiles[lang]).groupby(level=0).sum()
                counts[:, j] = hits.reindex(s.index, fill_value=0).to_numpy()
        best = counts.argmax(axis=1)  # argmax = FIRST max → profile-order ties
        pred = np.where(counts.max(axis=1) == 0, "und",
                        np.asarray(self.langs, dtype=object)[best])
        return batch.append_column("lang_pred", pa.array(pred.tolist(), pa.string()))


def _doc_token_codes(batch: pa.Table, text_col: str):
    """Shared all-C++ tokenization core: whitespace-split every doc and
    dictionary-encode the flat token stream ONCE. Returns
    ``(n, parent, codes, dictionary)`` — per-doc token counts (int64),
    the doc index of every token, its int code, and the code→string
    dictionary. Replaces the pandas ``str.split().explode().groupby``
    chain, which loops Python per row and hashes object strings
    (measured 8-10× slower on a 14M-token batch stream)."""
    t = pc.cast(batch[text_col], pa.string())
    trimmed = pc.utf8_trim_whitespace(pc.fill_null(t, ""))
    toks = pc.utf8_split_whitespace(trimmed)
    n = pc.list_value_length(toks).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    # a fully-empty doc splits to [''] — mask that one phantom token
    empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
    n[empty] = 0
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    if len(flat) == 0:
        return n, parent, np.empty(0, np.int64), pa.array([], pa.string())
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    enc = flat.dictionary_encode()
    idx = enc.indices
    if isinstance(idx, pa.ChunkedArray):
        idx = idx.combine_chunks()
    codes = idx.to_numpy(zero_copy_only=False).astype(np.int64)
    dictionary = enc.dictionary
    if not keep.all():
        codes, parent = codes[keep], parent[keep]
    return n, parent, codes, dictionary


def repetition_batch(batch: pa.Table, id_col="doc_id", text_col="text") -> pa.Table:
    """Gopher-style repetition signals (quality filter for training corpora):
    duplicate-token fraction (1 − distinct/total) and top-token fraction
    (most frequent token's share). All-C++/numpy: one Arrow split +
    dictionary-encode, then per-(doc, token) counts from one integer
    ``np.unique`` — no per-doc Python, no object-string hashing.
    A doc with high dup_token_frac / top_token_frac is boilerplate or
    degenerate repetition and gets filtered before training."""
    n, parent, codes, dictionary = _doc_token_codes(batch, text_col)
    nb = len(batch)
    if len(codes) == 0:
        n_dist = np.zeros(nb, dtype=np.int64)
        top = np.zeros(nb, dtype=np.int64)
    else:
        combined = parent * np.int64(len(dictionary)) + codes
        uniq, counts = np.unique(combined, return_counts=True)
        up = uniq // np.int64(len(dictionary))
        n_dist = np.bincount(up, minlength=nb).astype(np.int64)
        starts = np.flatnonzero(np.r_[True, up[1:] != up[:-1]])
        top = np.zeros(nb, dtype=np.int64)
        top[up[starts]] = np.maximum.reduceat(counts, starts)
    safe = np.maximum(n, 1).astype(np.float64)
    dup_frac = np.where(n > 0, 1.0 - n_dist / safe, 0.0)
    top_frac = np.where(n > 0, top / safe, 0.0)
    out = batch.select([id_col])
    out = out.append_column("rep_n_tokens", pa.array(n))
    out = out.append_column("rep_n_distinct", pa.array(n_dist))
    out = out.append_column("dup_token_frac", pa.array(dup_frac))
    out = out.append_column("top_token_frac", pa.array(top_frac))
    return out


def term_counts_batch(batch: pa.Table, id_col="doc_id", text_col="text") -> pa.Table:
    """Explode docs into (doc_id, term, tf) rows — per-doc term
    frequencies from the shared :func:`_doc_token_codes` core: one Arrow
    split + dictionary-encode, per-(doc, token) counts via one integer
    ``np.unique``, term strings gathered back from the dictionary."""
    n, parent, codes, dictionary = _doc_token_codes(batch, text_col)
    ids_col = batch[id_col]
    if isinstance(ids_col, pa.ChunkedArray):
        ids_col = ids_col.combine_chunks()
    if len(codes) == 0:
        return pa.table({id_col: pa.array([], ids_col.type),
                         "term": pa.array([], pa.string()),
                         "tf": pa.array([], pa.int64())})
    combined = parent * np.int64(len(dictionary)) + codes
    uniq, counts = np.unique(combined, return_counts=True)
    up = uniq // np.int64(len(dictionary))
    uc = uniq % np.int64(len(dictionary))
    return pa.table({
        id_col: ids_col.take(pa.array(up)),
        "term": pc.cast(dictionary.take(pa.array(uc)), pa.string()),
        "tf": pa.array(counts.astype(np.int64)),
    })


def bm25_tf_batch(batch: pa.Table, terms, id_col="doc_id",
                  text_col="text") -> pa.Table:
    """Per-doc BM25 ingredients for a FIXED query-term list: doc length
    ``dl`` (whitespace tokens) plus ``tf1..tfK`` — the shared
    :func:`_doc_token_codes` core (one Arrow split + dictionary-encode),
    then one boolean mask + bincount per query term. Zero shuffle."""
    n, parent, codes, dictionary = _doc_token_codes(batch, text_col)
    nb = len(batch)
    cols = {id_col: batch[id_col], "dl": pa.array(n)}
    tcodes = pc.index_in(pa.array(list(terms), pa.string()),
                         value_set=pc.cast(dictionary, pa.string()))
    for j, _t in enumerate(terms):
        tc = tcodes[j].as_py()
        arr = np.zeros(nb, dtype=np.int64)
        if tc is not None and len(codes):
            m = codes == tc
            if m.any():
                arr = np.bincount(parent[m],
                                  minlength=nb).astype(np.int64)
        cols[f"tf{j + 1}"] = pa.array(arr)
    return pa.table(cols)


def bm25_rank(ds, terms, id_col="doc_id", text_col="text",
              k1: float = 1.2, b: float = 0.75, k: int = 20):
    """BM25 ranked search over the corpus for a fixed term list — the
    ranking layer on top of :func:`inverted_index`'s boolean retrieval.

    Execution: ONE streaming pass builds the per-doc (dl, tf…) table
    (text is dropped immediately — the materialized stats table is
    ~(2+K)·8 B/doc); corpus constants (N, total tokens, per-term df)
    come from one tiny partial row per batch summed on the driver; the
    score map is pure vectorized float64; top-k via the distributed
    (score DESC, id) sort. No shuffle anywhere before the final k-row
    sort — BM25 is embarrassingly parallel given the broadcast constants.

    Determinism: every input to the score is an exact int64; the score is
    ONE float64 expression evaluated in fixed term order with fixed
    association, so it mirrors op-for-op in SQL (the oracle writes the
    same literals as ``e0`` doubles to dodge DECIMAL arithmetic).
    """
    tfm = ds.map_batches(
        lambda bt: bm25_tf_batch(bt, terms, id_col, text_col),
        batch_format="pyarrow").materialize()
    n_docs = tfm.count()
    tf_names = [f"tf{j + 1}" for j in range(len(terms))]

    def partial(bt: pa.Table) -> pa.Table:
        out = {"n_tok": pa.array(
            [int(pc.sum(bt["dl"]).as_py() or 0)], pa.int64())}
        for name in tf_names:
            out["d" + name] = pa.array(
                [int(pc.sum(pc.cast(pc.greater(bt[name], 0),
                                    pa.int64())).as_py() or 0)], pa.int64())
        return pa.table(out)

    sums = tfm.map_batches(partial, batch_format="pyarrow").to_pandas().sum()
    n_tok = int(sums["n_tok"])
    dfs = [int(sums["d" + name]) for name in tf_names]
    avgdl = n_tok / n_docs
    idfs = [(n_docs - dfj + 0.5) / (dfj + 0.5) for dfj in dfs]

    def score(bt: pa.Table) -> pa.Table:
        dl = bt["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        den = k1 * ((1.0 - b) + b * (dl / avgdl))
        sc = np.zeros(len(bt), dtype=np.float64)
        for j, name in enumerate(tf_names):
            tf = bt[name].to_numpy(zero_copy_only=False)
            sc = sc + idfs[j] * ((tf * (k1 + 1.0)) / (tf + den))
        keep = sc > 0.0
        out = pa.table({id_col: bt[id_col], "score": pa.array(sc)})
        return out.filter(pa.array(keep))

    scored = tfm.map_batches(score, batch_format="pyarrow")
    return scored.sort(["score", id_col],
                       descending=[True, False]).limit(k)


def doc_term_stats(ds, id_col="doc_id", text_col="text", num_buckets: int = 32):
    """TF/DF corpus statistics — the exact-integer building block of TF-IDF
    keyword extraction (score = tf·ln(N/df) is a trivial client-side formula;
    keeping logs out keeps the op bit-exact and oracle-checkable).

    Plan: explode per batch → (doc, term, tf) rows; document frequency per
    term from a map-side-combined count over the SAME rows (each (doc,term)
    appears exactly once — docs never straddle batches); then ONE
    co-partitioned string-key join tf ⋈ df on term. At corpus scale df is
    the skew risk (stopwords are in every doc) — the join co-locates by term
    hash, and df rows are one per term, so hot terms amplify nothing."""
    from .aggregates import partial_count
    from .joins import hash_join

    tf = ds.map_batches(
        lambda b: term_counts_batch(b, id_col, text_col), batch_format="pyarrow"
    ).materialize()  # consumed twice (tf rows + df aggregate)
    df = partial_count(tf, ["term"]).map_batches(
        lambda b: b.rename_columns(["term_r", "df"]), batch_format="pyarrow"
    )
    out = hash_join(tf, df, "term", "term_r", num_buckets=num_buckets)
    return out.map_batches(
        lambda b: b.select([id_col, "term", "tf", "df"]), batch_format="pyarrow"
    )


def inverted_index(ds, id_col="doc_id", text_col="text", num_buckets: int = 32):
    """Search-index construction: term → (df, postings) with postings the
    ascending comma-joined doc ids.

    Plan: explode docs to distinct (doc, term) rows (docs never straddle
    batches, so :func:`term_counts_batch` rows are already distinct), ONE
    bucketed term shuffle, then per bucket an all-C++ build: Arrow sort by
    (term, id) → ``group_by(use_threads=False)`` list-aggregate (preserves
    the sorted encounter order) → ``pc.binary_join``. No per-term Python.
    Skew note: a stopword's postings list is O(corpus) by definition —
    at 100 TB cap df upstream (filter hot terms before the shuffle) or
    shard hot postings; both compose with this op unchanged."""
    from .aggregates import coalesce_small
    from .joins import _key_buckets

    def explode(b: pa.Table) -> pa.Table:
        out = term_counts_batch(b, id_col, text_col).select([id_col, "term"])
        return out.append_column(
            "_bucket", pa.array(_key_buckets(out["term"], num_buckets)))

    def build(g: pa.Table) -> pa.Table:
        g = g.select([id_col, "term"]).sort_by(
            [("term", "ascending"), (id_col, "ascending")])
        agg = g.group_by("term", use_threads=False).aggregate(
            [(id_col, "list"), (id_col, "count")])
        postings = pc.binary_join(
            pc.cast(agg[f"{id_col}_list"], pa.list_(pa.string())), ",")
        return pa.table({
            "term": agg["term"],
            "df": pc.cast(agg[f"{id_col}_count"], pa.int64()),
            "postings": postings,
        })

    dt = coalesce_small(ds.map_batches(explode, batch_format="pyarrow"))
    return dt.groupby("_bucket").map_groups(build, batch_format="pyarrow")


def search_all_terms(ds, terms, id_col="doc_id", text_col="text"):
    """Conjunctive term search (docs containing ALL query terms): filter the
    distinct (doc, term) explode to the query terms — O(|terms|) rows per
    doc survive — then a map-side-combined count per doc and an
    ``n == len(terms)`` filter. Zero joins; the only shuffle is the tiny
    partial-count finish."""
    from .aggregates import partial_count

    terms = sorted(set(terms))
    tset = pa.array(terms)

    def explode_filter(b: pa.Table) -> pa.Table:
        out = term_counts_batch(b, id_col, text_col).select([id_col, "term"])
        return out.filter(pc.is_in(out["term"], value_set=tset))

    hits = ds.map_batches(explode_filter, batch_format="pyarrow")
    counts = partial_count(hits, [id_col])
    return counts.map_batches(
        lambda b: b.filter(pc.equal(b["n"], len(terms))).select([id_col]),
        batch_format="pyarrow",
    )


class Decontaminator:
    """Benchmark decontamination: flag corpus docs containing any benchmark
    phrase as a substring. Phrases are broadcast once (``ray.put``) and the
    scan is one vectorized ``pc.match_substring`` per phrase OR-folded —
    right for up to a few thousand phrases; for 10^5+ switch the backend to
    :class:`cattle_ray.stages.automaton.AhoCorasick` (same contract)."""

    def __init__(self, phrases, text_col: str = "text"):
        import ray

        if isinstance(phrases, ray.ObjectRef):
            phrases = ray.get(phrases)
        self.phrases = [p for p in phrases if p]
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch[self.text_col]
        mask = pa.array(np.zeros(len(batch), dtype=bool))
        for p in self.phrases:
            mask = pc.or_(mask, pc.fill_null(pc.match_substring(text, p), False))
        return batch.append_column("contaminated", mask)


def fingerprint_batch(batch: pa.Table, text_col="text") -> pa.Table:
    """Document fingerprints: md5 hex (exact identity — generalizes
    /root/reference/src/hash_folder.py:10-32) + 64-bit rolling (Rabin-Karp
    style polynomial) hash of the token stream,
    ``h = Σ v(tok_i)·B^(n-1-i) (mod 2^64)``.

    Fully vectorized: token values from ``hash_pandas_object`` over the
    exploded token column (process-stable, no per-token Python), B-powers by
    one wraparound ``cumprod``, the per-doc polynomial sum by one
    ``np.add.reduceat`` over the doc-contiguous term array — uint64
    wraparound IS the mod. md5 stays the C-level hashlib call."""
    import pandas as pd

    texts = batch[text_col].to_pylist()
    md5s = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]

    s = pd.Series(texts, dtype="object").fillna("").str.strip()
    toks = s.str.split()
    lens = toks.map(len).to_numpy(dtype=np.int64)
    rolls = np.zeros(len(s), dtype=np.uint64)
    flat = toks.explode().dropna()
    if len(flat):
        vals = pd.util.hash_pandas_object(flat, index=False).to_numpy()  # uint64
        max_len = int(lens.max())
        B = np.uint64(1000003)
        bpow = np.empty(max_len, dtype=np.uint64)
        bpow[0] = 1
        if max_len > 1:
            with np.errstate(over="ignore"):
                np.cumprod(np.full(max_len - 1, B, dtype=np.uint64),
                           out=bpow[1:])
        # exponent of token j within its doc = len-1-pos (pos via offsets)
        nz = lens > 0
        starts = np.concatenate(([0], np.cumsum(lens[nz])))[:-1]
        pos = np.arange(len(vals), dtype=np.int64) - np.repeat(starts, lens[nz])
        exp = np.repeat(lens[nz] - 1, lens[nz]) - pos
        with np.errstate(over="ignore"):
            terms = vals * bpow[exp]
        sums = np.add.reduceat(terms, starts)
        rolls[nz] = sums
    return batch.append_column("md5", pa.array(md5s, pa.string())).append_column(
        "rolling_hash", pa.array(rolls)
    )


def bigrams_batch(batch: pa.Table, text_col="text") -> pa.Table:
    """Adjacent word pairs per doc (whitespace tokens, matching
    :func:`token_count_batch`). Vectorized: one explode + per-doc shift —
    no per-doc Python."""
    import pandas as pd

    s = batch[text_col].to_pandas().fillna("").str.strip()
    toks = s.str.split()
    e = toks.explode().dropna()
    if e.empty:
        return pa.table({"w1": pa.array([], pa.string()),
                         "w2": pa.array([], pa.string())})
    nxt = e.groupby(level=0).shift(-1)
    m = nxt.notna()
    return pa.table({"w1": pa.array(e[m], pa.string()),
                     "w2": pa.array(nxt[m], pa.string())})


def doc_bigram_tf_batch(batch: pa.Table, id_col="doc_id",
                        text_col="text") -> pa.Table:
    """Per-doc bigram term frequencies (doc, bigram, tf) — the sparse
    feature rows behind the similarity join. Vectorized: explode + per-doc
    shift + one two-level group-size; no per-doc Python."""
    import pandas as pd

    s = batch[text_col].to_pandas().fillna("").str.strip()
    ids = batch[id_col].to_pandas()
    e = s.str.split().explode().dropna()
    if e.empty:
        return pa.table({id_col: pa.array([], batch[id_col].type),
                         "bg": pa.array([], pa.string()),
                         "tf": pa.array([], pa.int64())})
    nxt = e.groupby(level=0).shift(-1)
    m = nxt.notna()
    bg = e[m].str.cat(nxt[m], sep=" ")
    cnt = bg.groupby([bg.index, bg]).size()
    pos = cnt.index.get_level_values(0)
    return pa.table({
        id_col: pa.array(ids.iloc[pos].to_numpy()),
        "bg": pa.array(cnt.index.get_level_values(1).to_numpy(), pa.string()),
        "tf": pa.array(cnt.to_numpy(), pa.int64()),
    })


def related_doc_pairs(ds, id_col="doc_id", text_col="text", max_df: int = 10,
                      k: int = 100, num_buckets: int = 32):
    """Sparse similarity join: top-k related document pairs scored by
    Σ tf_a·tf_b over SHARED RARE bigrams (df ≤ ``max_df``) — the
    inverted-index formulation of "find related docs": candidate pairs are
    generated ONLY inside a rare term's postings, so the quadratic term is
    bounded by max_df² per term instead of n² over the corpus (the same
    bound TF-IDF sharding systems rely on; common terms carry no signal
    and are exactly the ones pruned).

    Plan: per-doc bigram tf rows (text never crosses a shuffle) →
    map-side-combined df → adaptive semi-join keeps rare-term rows → one
    bucketed term shuffle with an in-bucket vectorized merge generating
    pair partials PRE-SUMMED per pair (map-side combine for the second,
    pair-keyed shuffle) → grouped sum → deterministic
    (score DESC, a, b) top-k. Exact int64 scores throughout."""
    import pandas as pd

    from .aggregates import grouped_sums, partial_count
    from .joins import _key_buckets, semi_join

    tf = ds.map_batches(
        lambda b: doc_bigram_tf_batch(b, id_col, text_col),
        batch_format="pyarrow",
    ).materialize()  # consumed twice: df count + the rare-row filter
    rare = partial_count(tf, ["bg"]).map_batches(
        lambda b: b.filter(pc.less_equal(b["n"], max_df)).select(["bg"]),
        batch_format="pyarrow",
    )
    rtf = semi_join(tf, rare, "bg", "bg", num_buckets=num_buckets)

    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_bucket", pa.array(_key_buckets(b["bg"], num_buckets)))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_bucket"])
        m = g.merge(g, on="bg", suffixes=("_a", "_b"))
        m = m[m[f"{id_col}_a"] < m[f"{id_col}_b"]]
        m["prod"] = m["tf_a"] * m["tf_b"]
        out = (m.groupby([f"{id_col}_a", f"{id_col}_b"], sort=False)["prod"]
                .sum().reset_index())
        out.columns = ["doc_a", "doc_b", "prod"]
        out["prod"] = out["prod"].astype("int64")
        return out

    from .aggregates import coalesce_small

    partial_pairs = (
        coalesce_small(rtf.map_batches(add_bucket, batch_format="pyarrow"))
        .groupby("_bucket")
        .map_groups(pairs, batch_format="pandas")
    )
    scored = grouped_sums(partial_pairs, ["doc_a", "doc_b"], ["prod"])
    out = scored.map_batches(
        lambda b: pa.table({"doc_a": b["doc_a"], "doc_b": b["doc_b"],
                            "score": b["sum_prod"]}),
        batch_format="pyarrow",
    )
    return out.sort(["score", "doc_a", "doc_b"],
                    descending=[True, False, False]).limit(k)


def collocation_lift(ds, text_col="text", min_count: int = 3, k: int = 100,
                     num_buckets: int = 32):
    """Corpus collocation mining: top-k bigrams by LIFT
    ``(c12/NB) / ((c1/NT)·(c2/NT))`` — the log-free PMI core
    (``pmi = log2(lift)`` is a trivial client-side formula; keeping the log
    out keeps the score a single IEEE division of EXACT int64 products, so
    the op is bit-deterministic and oracle-checkable — the
    ``shipping_priority`` float-ulp lesson applied preemptively).

    Plan: bigram/unigram counts via map-side-combined :func:`partial_count`
    (the token explosion never crosses a shuffle un-aggregated); NT/NB are
    distributed column sums; two co-partitioned string-key joins attach c1
    and c2 to the (already ``min_count``-pruned) bigram table; one small
    sort+limit. int64 product bound: safe while c12·NT² < 2^63 (NT ≈ 10^9
    tokens with c12 ≈ 1 — far beyond the driver corpus; shard the corpus
    before exceeding it)."""
    from .aggregates import partial_count
    from .joins import hash_join

    uni = partial_count(
        ds.map_batches(
            lambda b: _tokens_batch(b, text_col), batch_format="pyarrow"),
        ["w"],
    ).materialize()  # consumed 3×: NT sum + both joins
    big = partial_count(
        ds.map_batches(lambda b: bigrams_batch(b, text_col),
                       batch_format="pyarrow"),
        ["w1", "w2"],
    ).materialize()  # consumed 2×: NB sum + the join chain
    nt = int(uni.sum("n"))
    nb = int(big.sum("n") or 0)
    # size-adaptive join width: the count tables are vocab-sized, usually
    # tiny next to the corpus — don't pay 32-task fixed cost per join
    num_buckets = int(min(num_buckets, max(4, big.count() // 50_000)))
    pruned = big.map_batches(
        lambda b: b.filter(pc.greater_equal(b["n"], min_count))
                   .rename_columns(["w1", "w2", "c12"]),
        batch_format="pyarrow")
    u1 = uni.map_batches(lambda b: b.rename_columns(["u1", "c1"]),
                         batch_format="pyarrow")
    u2 = uni.map_batches(lambda b: b.rename_columns(["u2", "c2"]),
                         batch_format="pyarrow")
    j = hash_join(pruned, u1, "w1", "u1", num_buckets=num_buckets)
    j = hash_join(j, u2, "w2", "u2", num_buckets=num_buckets)

    def score(b: pa.Table) -> pa.Table:
        c12 = b["c12"].to_numpy(zero_copy_only=False).astype(np.int64)
        c1 = b["c1"].to_numpy(zero_copy_only=False).astype(np.int64)
        c2 = b["c2"].to_numpy(zero_copy_only=False).astype(np.int64)
        num = (c12 * nt * nt).astype(np.float64)
        den = (np.int64(nb) * c1 * c2).astype(np.float64)
        lift = np.round(num / den, 6)
        return pa.table({"w1": b["w1"], "w2": b["w2"],
                         "c12": pa.array(c12), "lift": pa.array(lift)})

    return (j.map_batches(score, batch_format="pyarrow")
             .sort(["lift", "w1", "w2"], descending=[True, False, False])
             .limit(k))


def _tokens_batch(batch: pa.Table, text_col="text") -> pa.Table:
    """All whitespace tokens as one ``w`` column — pandas ``str.split``,
    the SAME (Unicode-whitespace) tokenizer as :func:`bigrams_batch`:
    unigram and bigram counts must come from one token stream or the lift
    denominator silently disagrees with the numerator (e.g. on ``\\xa0``,
    which Arrow's RE2 ``\\s+`` does not split but Python does)."""
    import pandas as pd

    s = batch[text_col].to_pandas().fillna("").str.strip()
    e = s.str.split().explode().dropna()
    return pa.table({"w": pa.array(e, pa.string())})


def json_int_field_batch(batch: pa.Table, col: str, field: str,
                         out: str | None = None) -> pa.Table:
    """Vectorized flat-JSON integer field extraction (the F7 JSON-parse
    kernel for ``props``-style columns ``{"k": 69, ...}``): ONE RE2 pass
    (``pc.extract_regex``) over the whole column, null where the field is
    absent — no per-row ``json.loads``. The value must be a bare integer
    terminated by ``,`` or ``}`` (floats and quoted values fall through to
    null rather than truncating); nested objects or exotic JSON need a real
    parser — drop a per-row ``json.loads`` into the same column contract."""
    import re as _re

    out = out or field
    pat = '"' + _re.escape(field) + r'":\s*(?P<v>-?\d+)\s*[,}]'
    ex = pc.extract_regex(pc.cast(batch[col], pa.string()), pattern=pat)
    v = pc.cast(pc.struct_field(ex, "v"), pa.int64())
    return batch.append_column(out, v)


def normalize_text_batch(batch: pa.Table, text_col: str = "text",
                         out_col: str = "norm") -> pa.Table:
    """Canonical text normalization before dedup/fingerprinting: Unicode
    NFC, lowercase, whitespace runs collapsed to one space, trimmed. The
    kernel chain mirrors verbatim in SQL (nfc_normalize/lower/
    regexp_replace/trim), so normalized-identity queries oracle-check.

    NFC: pyarrow's ``utf8_normalize`` does NOT compose decomposed
    sequences (verified on 16.1: ``e+U+0301`` stays decomposed, while
    DuckDB/CPython compose to ``é``), so composition uses CPython's
    ``unicodedata`` — behind a vectorized pure-ASCII prefilter (the T4
    canonicalizer pattern): ASCII rows, the overwhelming share of a web
    corpus, never leave Arrow; only non-ASCII rows pay the Python call."""
    t = batch[text_col]
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    t = pc.cast(t, pa.string())
    # pure-ASCII ⇔ byte length == codepoint count; null rows need no work
    ascii_mask = pc.fill_null(
        pc.equal(pc.binary_length(t), pc.utf8_length(t)), True)
    na_idx = np.flatnonzero(
        np.invert(ascii_mask.to_numpy(zero_copy_only=False)))
    if na_idx.size:
        import unicodedata

        vals = t.to_pandas().to_numpy(dtype=object)
        for i in na_idx:
            vals[i] = unicodedata.normalize("NFC", vals[i])
        t = pa.array(vals, pa.string())
    t = pc.utf8_lower(t)
    t = pc.replace_substring_regex(t, r"\s+", " ")
    t = pc.utf8_trim(t, " ")  # ASCII-space trim == SQL trim() exactly
    return batch.append_column(out_col, t)


def doc_kgram_batch(batch: pa.Table, k: int, id_col: str = "doc_id",
                    text_col: str = "text") -> pa.Table:
    """Every SLIDING k-word window per doc as (doc_id, gram) rows — the
    substrate of exact-substring dedup metrics (Lee et al. 2022 style).
    Vectorized: one explode, k−1 C-level per-doc shifts, one masked
    string join; no per-doc Python. Docs shorter than k emit nothing."""
    import pandas as pd

    s = batch[text_col].to_pandas().fillna("").str.strip()
    ids = batch[id_col].to_pandas()
    e = s.str.split().explode().dropna()
    if e.empty:
        return pa.table({id_col: pa.array([], batch[id_col].type),
                         "gram": pa.array([], pa.string())})
    cols = [e]
    g = e.groupby(level=0)
    for j in range(1, k):
        cols.append(g.shift(-j))
    m = cols[-1].notna()  # window fits ⇔ the furthest shift exists
    joined = cols[0][m].str.cat([c[m] for c in cols[1:]], sep=" ")
    return pa.table({
        id_col: pa.array(ids.loc[joined.index], batch[id_col].type),
        "gram": pa.array(joined, pa.string()),
    })


#: default ceiling on the broadcast bigram table (rows). ~40 B/row of
#: Arrow strings+int64 → ≈200 MB in every scorer actor at the cap; above
#: it lm_score falls back to co-partitioned joins (no broadcast at all).
LM_BROADCAST_MAX = 5_000_000


def lm_score(ds, id_col: str = "doc_id", text_col: str = "text",
             scale: int = 1_000_000, broadcast_max: int = LM_BROADCAST_MAX,
             min_count: int = 1, top_v: int | None = None,
             num_buckets: int = 32):
    """Corpus-trained bigram fluency score (the CCNet-style LM quality
    signal with EXACT arithmetic): per doc, the sum of scaled conditional
    bigram probabilities ⌊c(w1,w2)·scale / c(w1,·)⌋ over its adjacent word
    pairs — integer floor-division of corpus-wide counts, so the score is
    bit-exact at any partitioning and mirrors verbatim in SQL (no float
    log-prob summation-order flake).

    Scale shape: ONE corpus-sized map-side-combined bigram count (context
    counts c(w1,·) fold from the pair table — no second corpus pass, and
    the bigram stream itself is never materialized); the count tables are
    vocab-bounded and broadcast once
    (``ray.put``) — the guide's small-side lookup pattern — and every doc
    scores in one vectorized ``index_in`` + gather per batch. Output:
    (id, n_bigrams, score) with score = Σ p_q (int64).

    The bigram table grows with the corpus (~4M distinct pairs at 100k web
    docs, unbounded beyond); two knobs bound the broadcast bytes at scale:
    ``min_count`` drops pairs seen fewer times (a pruned pair scores 0 —
    its true conditional probability is ≤ min_count/c(w1) ≈ the noise
    floor), and ``top_v`` keeps only the most frequent pairs (ties broken
    by (w1, w2) — deterministic). Context counts c(w1,·) stay EXACT so
    surviving pairs score identically. Pruning applies on BOTH execution
    paths, so broadcast and join mode agree at any setting; SQL mirrors it
    as ``HAVING count(*) >= min_count`` / a top-V CTE. Above
    ``broadcast_max`` SURVIVING pairs, scoring switches to co-partitioned
    joins (nothing broadcast at all).
    """
    import ray

    from .aggregates import partial_count

    def doc_bigrams(b: pa.Table) -> pa.Table:
        import pandas as pd

        s = b[text_col].to_pandas().fillna("").str.strip()
        ids = b[id_col].to_pandas()
        e = s.str.split().explode().dropna()
        if e.empty:
            return pa.table({id_col: pa.array([], b[id_col].type),
                             "w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string())})
        nxt = e.groupby(level=0).shift(-1)
        m = nxt.notna()
        return pa.table({
            id_col: pa.array(ids.loc[e[m].index], b[id_col].type),
            "w1": pa.array(e[m], pa.string()),
            "w2": pa.array(nxt[m], pa.string()),
        })

    # the bigram stream is CORPUS-sized — never materialized (that would
    # pin it in the object store); it's recomputed for the scoring pass
    big = ds.map_batches(doc_bigrams, batch_format="pyarrow")
    c2 = partial_count(
        big.map_batches(lambda b: b.select(["w1", "w2"]),
                        batch_format="pyarrow"),
        ["w1", "w2"], num_buckets=num_buckets)
    c2 = c2.materialize()
    # context counts derive from the (much smaller) pair table: c(w1,·) =
    # Σ_w2 c(w1,w2) — saves a second corpus-sized census pass. Derived
    # BEFORE any pruning so surviving pairs keep their exact denominator.
    from .aggregates import grouped_sums as _gs

    c1 = _gs(c2, ["w1"], ["n"], num_buckets=num_buckets).map_batches(
        lambda b: pa.table({"w1": b["w1"],
                            "n": pc.cast(b["sum_n"], pa.int64())}),
        batch_format="pyarrow").materialize()
    n_pairs = c2.count()
    if n_pairs == 0:
        # corpus with no bigrams at all (every doc < 2 tokens): empty
        # count streams lose their schema, so return a typed empty result
        # instead of crashing in concat (same class as dup_span_stats'
        # empty-census guard)
        import ray.data as rd

        from .joins import _to_arrow_type

        sch = ds.schema()
        id_t = _to_arrow_type(dict(zip(sch.names, sch.types))[id_col])
        return rd.from_arrow(pa.table({
            id_col: pa.array([], id_t),
            "n_bigrams": pa.array([], pa.int64()),
            "score": pa.array([], pa.int64())}))
    # ---- broadcast-bounding prunes (docstring: pruned pairs score 0) ----
    if min_count > 1:
        c2 = c2.map_batches(
            lambda b: b.filter(pc.greater_equal(
                pc.cast(b["n"], pa.int64()),
                pa.scalar(min_count, pa.int64()))),
            batch_format="pyarrow").materialize()
    if top_v is not None and c2.count() > top_v:
        c2 = (c2.sort(["n", "w1", "w2"], descending=[True, False, False])
              .limit(top_v).materialize())

    if c2.count() > broadcast_max:
        # bigram table too big to broadcast even after pruning: score
        # through TWO composite co-partitioned joins instead (the counts
        # join the pair stream; nothing driver-sized anywhere). Same
        # arithmetic — pruned pairs left-join to a 0 count.
        return _lm_score_joined(big, c2, c1, id_col, scale, num_buckets)

    # vocab-bounded broadcast lookup tables (join-free scoring)
    def collect(dset, schema: pa.Schema) -> pa.Table:
        tbls = [b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
                for b in dset.iter_batches(batch_format="pyarrow",
                                           batch_size=65536)]
        return pa.concat_tables(tbls) if tbls else schema.empty_table()

    c2_tbl = collect(c2, pa.schema([("w1", pa.string()),
                                    ("w2", pa.string()),
                                    ("n", pa.int64())]))
    c1_tbl = collect(c1, pa.schema([("w1", pa.string()),
                                    ("n", pa.int64())]))
    ref = ray.put((c2_tbl["w1"].combine_chunks(),
                   c2_tbl["w2"].combine_chunks(),
                   c2_tbl["n"].combine_chunks().cast(pa.int64()),
                   c1_tbl["w1"].combine_chunks(),
                   c1_tbl["n"].combine_chunks().cast(pa.int64())))

    class Scorer:
        """Actor-pool lookup stage: the bigram table can hold millions of
        keys, and ``pc.index_in`` would rebuild its hash table PER BATCH —
        here the pandas index hashtables are built once per actor in
        ``__init__`` and ``get_indexer`` reuses them every batch. The pair
        key is a MultiIndex over (w1, w2) — no separator string, so tokens
        containing any byte (even 0x1F) can never alias another pair."""

        def __init__(self):
            import pandas as pd

            w1, w2, n2, k1, n1 = ray.get(ref)
            self.idx2 = pd.MultiIndex.from_arrays(
                [w1.to_pandas(), w2.to_pandas()])
            self.n2 = n2.to_numpy(zero_copy_only=False).astype(np.int64)
            self.idx1 = pd.Index(k1.to_pandas())
            self.n1 = n1.to_numpy(zero_copy_only=False).astype(np.int64)

        def __call__(self, b: pa.Table) -> pa.Table:
            import pandas as pd

            if len(b) == 0:
                return pa.table({id_col: pa.array([], b[id_col].type),
                                 "pq": pa.array([], pa.int64())})
            q = pd.MultiIndex.from_arrays(
                [b["w1"].to_pandas(), b["w2"].to_pandas()])
            idx = self.idx2.get_indexer(q)
            # -1 = pair pruned from the broadcast table → scores 0
            cb = np.where(idx >= 0,
                          self.n2[np.maximum(idx, 0)]
                          if len(self.n2) else 0, 0)
            cu = self.n1[self.idx1.get_indexer(b["w1"].to_pandas())]
            pq = (cb * scale) // cu  # exact int floor-div, both engines
            return pa.table({id_col: b[id_col],
                             "pq": pa.array(pq, pa.int64())})

    from .aggregates import grouped_sums

    # AUTOSCALING pool (1, 8), never a fixed int: a fixed-size pool grabs
    # one CPU per actor up front, and with a lazy upstream + the grouped
    # sum's all-to-all downstream it can pin EVERY cpu and deadlock the
    # streaming executor (reproduced at num_cpus=8; the tuple form scales
    # up only when spare resources exist)
    scored = big.map_batches(Scorer, batch_format="pyarrow",
                             concurrency=(1, 8))
    out = grouped_sums(scored, [id_col], ["pq"], num_buckets=num_buckets)
    return out.map_batches(
        lambda b: pa.table({id_col: b[id_col],
                            "n_bigrams": pc.cast(b["n"], pa.int64()),
                            "score": pc.cast(b["sum_pq"], pa.int64())}),
        batch_format="pyarrow")


def bpe_train(ds, text_col: str = "text", n_merges: int = 100,
              min_word_count: int = 1, num_buckets: int = 32):
    """BPE vocabulary training (Sennrich et al. 2016) at corpus scale: the
    distributed stage is the WORD-FREQUENCY census — one map-side-combined
    count, the only corpus-sized pass — and the merge loop runs on that
    vocab-bounded table exactly as the textbook algorithm does (pair counts
    are weighted by word frequency; the raw corpus is never rescanned).
    Driver memory is the distinct-word table; bound it at web scale with
    ``min_word_count`` (rare words contribute negligible pair mass).

    Deterministic: merge choice is (count DESC, pair ASC); ties cannot
    depend on partitioning because the census is exact. Words are char
    sequences with a ``</w>`` end marker. Returns ``merges`` — the ranked
    list of (left, right) symbol pairs."""
    from collections import Counter

    from .aggregates import partial_count

    def words(b: pa.Table) -> pa.Table:
        import pandas as pd

        s = b[text_col].to_pandas().fillna("").str.strip()
        e = s.str.split().explode().dropna()
        return pa.table({"w": pa.array(e, pa.string())})

    census = partial_count(ds.map_batches(words, batch_format="pyarrow"),
                           ["w"], num_buckets=num_buckets)
    freq = {}
    for chunk in census.iter_batches(batch_format="pyarrow",
                                     batch_size=65536):
        for w, n in zip(chunk["w"].to_pylist(), chunk["n"].to_pylist()):
            if n >= min_word_count:
                freq[tuple(w) + ("</w>",)] = n

    # incremental pair bookkeeping (Sennrich's learn_bpe shape): pair
    # stats are built ONCE; each merge touches only the words that contain
    # the merged pair (found via the pair→words index) — per iteration
    # cost is the affected-word mass, not the whole vocab
    from collections import defaultdict

    pairs: Counter = Counter()
    where: dict = defaultdict(set)

    def account(sym, n, sign):
        for j in range(len(sym) - 1):
            p = (sym[j], sym[j + 1])
            pairs[p] += sign * n
            if sign > 0:
                where[p].add(sym)

    for sym, n in freq.items():
        account(sym, n, 1)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        # (count DESC, pair ASC): string tuples compare lexicographically
        best = min(((p, c) for p, c in pairs.items() if c > 0),
                   key=lambda kv: (-kv[1], kv[0]), default=None)
        if best is None:
            break
        bp = best[0]
        merges.append(bp)
        merged = bp[0] + bp[1]
        for sym in list(where.get(bp, ())):
            n = freq.pop(sym, None)
            if n is None:
                continue  # stale index entry: word already rewritten
            account(sym, n, -1)
            res, j = [], 0
            while j < len(sym):
                if j < len(sym) - 1 and sym[j] == bp[0] and sym[j + 1] == bp[1]:
                    res.append(merged)
                    j += 2
                else:
                    res.append(sym[j])
                    j += 1
            t = tuple(res)
            freq[t] = freq.get(t, 0) + n
            account(t, n, 1)  # only the newly-arrived mass; any existing
            # occurrences of t were accounted when t was first created
        where.pop(bp, None)
        pairs.pop(bp, None)
    return merges


def bpe_encode_word(word: str, ranks: dict) -> list:
    """Encode one word with trained merges (greedy lowest-rank-first —
    the standard BPE apply). ``ranks`` maps (left, right) → merge rank."""
    sym = list(word) + ["</w>"]
    while len(sym) > 1:
        best_rank, best_j = None, None
        for j in range(len(sym) - 1):
            r = ranks.get((sym[j], sym[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_j = r, j
        if best_j is None:
            break
        sym[best_j:best_j + 2] = [sym[best_j] + sym[best_j + 1]]
    return sym


def bpe_counter_factory(merges):
    """Factory for :class:`TokenCounter`: a real trained-BPE token counter
    (vocab built once per actor in ``__init__`` via the factory; per-word
    results memoized across the actor's lifetime)."""
    def make():
        ranks = {p: i for i, p in enumerate(merges)}
        cache: dict = {}

        def count(text: str) -> int:
            total = 0
            for w in text.split():
                c = cache.get(w)
                if c is None:
                    c = len(bpe_encode_word(w, ranks))
                    cache[w] = c
                total += c
            return total

        return count

    return make


def _lm_score_joined(big, c2, c1, id_col: str, scale: int,
                     num_buckets: int):
    """The larger-than-broadcast path of :func:`lm_score`: per-pair counts
    arrive by a composite (w1, w2) co-partitioned LEFT join (left so that
    pairs pruned by min_count/top_v stay in the stream and score 0 — the
    same row census as the broadcast path), context counts by a w1 join;
    the floor-div and the per-doc sum are unchanged, so both paths produce
    identical scores (parametrized in tests)."""
    from .aggregates import grouped_sums
    from .joins import hash_join

    c2r = c2.map_batches(
        lambda b: b.rename_columns(["p1", "p2", "c_pair"]),
        batch_format="pyarrow")
    c1r = c1.map_batches(
        lambda b: b.rename_columns(["u1", "c_ctx"]), batch_format="pyarrow")
    j = hash_join(big, c2r, ["w1", "w2"], ["p1", "p2"], how="left",
                  num_buckets=num_buckets)
    j = hash_join(j, c1r, "w1", "u1", num_buckets=num_buckets)

    def pq(b: pa.Table) -> pa.Table:
        # unmatched (pruned) pairs arrive as null OR NaN (the left join's
        # pandas path floats the right ints) → count 0; counts ≪ 2^53 so
        # the float round-trip is exact
        cb_f = b["c_pair"].to_numpy(zero_copy_only=False).astype(np.float64)
        cb = np.nan_to_num(cb_f, nan=0.0).astype(np.int64)
        cu = b["c_ctx"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({id_col: b[id_col],
                         "pq": pa.array((cb * scale) // cu, pa.int64())})

    scored = j.map_batches(pq, batch_format="pyarrow")
    out = grouped_sums(scored, [id_col], ["pq"], num_buckets=num_buckets)
    return out.map_batches(
        lambda b: pa.table({id_col: b[id_col],
                            "n_bigrams": pc.cast(b["n"], pa.int64()),
                            "score": pc.cast(b["sum_pq"], pa.int64())}),
        batch_format="pyarrow")


def sentence_stats_batch(batch: pa.Table, id_col: str = "doc_id",
                         text_col: str = "text") -> pa.Table:
    """Sentence segmentation stats, fully vectorized (zero Python per row):
    sentences are the non-blank segments after splitting on ``[.!?]+`` runs
    (RE2 — identical semantics to DuckDB's ``regexp_split_to_array``);
    blank-after-trim segments (e.g. after a trailing period) don't count.
    Per doc: ``n_sentences``, total ``n_words`` across sentences, and
    ``max_sentence_words`` — the inputs to readability / chunking rules.

    Trim charset is the explicit ``" \\t\\n\\r"`` (SQL ``trim(x, ...)``
    default strips spaces only — the oracle passes the same charset).
    """
    t = pc.fill_null(pc.cast(batch[text_col], pa.string()), "")
    sent_lists = pc.split_pattern_regex(t, r"[.!?]+")
    parent = pc.list_parent_indices(sent_lists).to_numpy(zero_copy_only=False)
    trimmed = pc.utf8_trim(pc.list_flatten(sent_lists), " \t\n\r")
    nonblank = pc.not_equal(trimmed, "").to_numpy(zero_copy_only=False)
    words = pc.list_value_length(
        pc.split_pattern_regex(trimmed, r"\s+")).to_numpy(
        zero_copy_only=False).astype(np.int64)

    n = len(batch)
    p_nb, w_nb = parent[nonblank], words[nonblank]
    n_sent = np.bincount(p_nb, minlength=n).astype(np.int64)
    # word counts are small ints — float64 bincount sums are exact
    n_words = np.bincount(p_nb, weights=w_nb, minlength=n).astype(np.int64)
    mx = np.zeros(n, dtype=np.int64)
    np.maximum.at(mx, p_nb, w_nb)
    return pa.table({
        id_col: batch[id_col],
        "n_sentences": pa.array(n_sent),
        "n_words": pa.array(n_words),
        "max_sentence_words": pa.array(mx),
    })
