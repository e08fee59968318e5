"""Deterministic corpus sampling/mixing for training-data assembly.

The LLM data-mixture primitive: each source corpus gets an EPOCH WEIGHT
(e.g. wiki×2.5, crawl×0.3) and every row's inclusion is a pure function of
(source tag, row id, repeat index) — reproducible at any parallelism, under
retries, and mirrorable in SQL (md5-hex threshold comparison; lowercase hex
compares lexicographically == numerically, so no integer parsing anywhere).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _frac_keep_mask(tag: str, ids, rep: int, frac: float) -> np.ndarray:
    """Keep row i iff md5(f"{tag}|{id}|{rep}") hex < the hex threshold of
    ``frac`` (first 12 nibbles — 48 bits of resolution)."""
    thresh = format(int(frac * 16**12), "012x")
    return np.fromiter(
        (hashlib.md5(f"{tag}|{v}|{rep}".encode()).hexdigest()[:12] < thresh
         for v in ids),
        dtype=bool, count=len(ids))


def mix_corpora(sources, id_col: str):
    """``sources`` = list of ``(tag, dataset, weight)``. Returns the union
    Dataset with columns (id_col, src, rep): each row appears
    ``floor(weight)`` times (rep = 0..) plus once more with probability
    ``weight - floor(weight)`` decided by the deterministic hash.

    Scale shape: pure per-batch map + Dataset.union — no shuffle, no RNG
    state, no driver-side row handling; duplicated epochs are emitted
    inside the batch (vectorized take). Downstream shuffling for training
    order is the consumer's random_shuffle."""
    parts = []
    for tag, ds, weight in sources:
        full, frac = int(weight), weight - int(weight)

        def expand(batch: pa.Table, tag=tag, full=full, frac=frac) -> pa.Table:
            col = batch[id_col]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            out_ids, out_rep = [], []
            for rep in range(full):
                out_ids.append(col)
                out_rep.append(np.full(len(col), rep, dtype=np.int64))
            if frac > 0:
                m = _frac_keep_mask(tag, col.to_pylist(), full, frac)
                out_ids.append(col.filter(pa.array(m)))
                out_rep.append(np.full(int(m.sum()), full, dtype=np.int64))
            if not out_ids:
                return pa.table({id_col: col.slice(0, 0),
                                 "src": pa.array([], pa.string()),
                                 "rep": pa.array([], pa.int64())})
            cat = pa.concat_arrays([a for a in out_ids])
            return pa.table({
                id_col: cat,
                "src": pa.array([tag] * len(cat), pa.string()),
                "rep": pa.array(np.concatenate(out_rep)),
            })

        parts.append(ds.map_batches(expand, batch_format="pyarrow"))
    out = parts[0]
    return out.union(*parts[1:]) if len(parts) > 1 else out


def pack_sequences(ds, id_col: str, text_col: str, tokens_per_seq: int):
    """Sequence packing for training: assign each doc to a fixed-token-
    budget sequence by GLOBAL prefix sum of token counts in id order
    (``seq_id = (cum - n) // budget`` — greedy sequential packing, docs
    spanning a boundary start the next sequence's budget accounting, the
    standard approximation when exact bin-packing isn't worth a shuffle).

    Scale shape: the text column is dropped in the FIRST map stage — only
    (id, n_tokens) metadata rows reach the prefix sum, which runs through
    the same bucketed window machinery as :func:`grouped_running_sum` under
    one constant key — note the constant key means ONE ordered scan task
    by construction (a corpus-wide prefix sum is inherently sequential);
    16 B/row of metadata keeps even 10^10 docs in the hundreds of GB —
    shard by id range and offset the cumsums if that ever exceeds a worker.
    Returns (id, n_tokens, seq_id)."""
    from .textstats import token_count_batch
    from .windows import grouped_running_sum

    def count(batch: pa.Table) -> pa.Table:
        t = token_count_batch(batch, text_col)
        return t.select([id_col, "n_tokens"]).append_column(
            "_one", pa.array(np.zeros(len(t), dtype=np.int64)))

    meta = ds.map_batches(count, batch_format="pyarrow")
    cum = grouped_running_sum(meta, key="_one", ts=id_col, val="n_tokens",
                              out="_cum", num_buckets=1)

    def finish(b: pa.Table) -> pa.Table:
        c = b["_cum"].to_numpy(zero_copy_only=False)
        n = b["n_tokens"].to_numpy(zero_copy_only=False)
        seq = (c - n) // tokens_per_seq
        return pa.table({id_col: b[id_col], "n_tokens": b["n_tokens"],
                         "seq_id": pa.array(seq.astype(np.int64))})

    return cum.map_batches(finish, batch_format="pyarrow")


#: recognized curation rules and their defaults (None = rule off)
CURATION_RULES = {
    "langs": None,              # whitelist on the lang column
    "min_tokens": None, "max_tokens": None,
    "max_dup_token_frac": None, "max_top_token_frac": None,
    "min_stop_ratio": None, "max_punct_ratio": None,
}


def curation_filter(ds, config: dict, text_col: str = "text",
                    lang_col: str = "lang"):
    """Config-driven curation funnel (the reference's metadata-as-program
    idea, U1, applied to corpus curation): a JSON dict of thresholds turns
    into ONE streaming pass of vectorized quality + repetition signals and
    a combined keep-mask — no shuffle, rules off when absent. Unknown keys
    raise (a typo'd rule silently filtering nothing is worse than an
    error)."""
    unknown = set(config) - set(CURATION_RULES)
    if unknown:
        raise ValueError(f"unknown curation rules: {sorted(unknown)}; "
                         f"known: {sorted(CURATION_RULES)}")
    cfg = {**CURATION_RULES, **config}

    from .textstats import quality_batch, repetition_batch

    quality_on = any(cfg[k] is not None for k in
                     ("min_tokens", "max_tokens", "min_stop_ratio",
                      "max_punct_ratio"))

    def funnel(b: pa.Table) -> pa.Table:
        q = quality_batch(b, text_col) if quality_on else None
        keep = pa.array(np.ones(len(b), dtype=bool))
        if cfg["langs"] is not None:
            keep = pc.and_(keep, pc.is_in(
                b[lang_col], value_set=pa.array(list(cfg["langs"]))))
        if cfg["min_tokens"] is not None:
            keep = pc.and_(keep, pc.greater_equal(q["q_n_tokens"],
                                                  cfg["min_tokens"]))
        if cfg["max_tokens"] is not None:
            keep = pc.and_(keep, pc.less_equal(q["q_n_tokens"],
                                               cfg["max_tokens"]))
        if cfg["min_stop_ratio"] is not None:
            keep = pc.and_(keep, pc.greater_equal(q["stop_ratio"],
                                                  cfg["min_stop_ratio"]))
        if cfg["max_punct_ratio"] is not None:
            keep = pc.and_(keep, pc.less_equal(q["punct_ratio"],
                                               cfg["max_punct_ratio"]))
        if (cfg["max_dup_token_frac"] is not None
                or cfg["max_top_token_frac"] is not None):
            id_col = b.column_names[0]
            r = repetition_batch(b, id_col=id_col, text_col=text_col)
            if cfg["max_dup_token_frac"] is not None:
                keep = pc.and_(keep, pc.less_equal(
                    r["dup_token_frac"], cfg["max_dup_token_frac"]))
            if cfg["max_top_token_frac"] is not None:
                keep = pc.and_(keep, pc.less_equal(
                    r["top_token_frac"], cfg["max_top_token_frac"]))
        return b.filter(keep)

    return ds.map_batches(funnel, batch_format="pyarrow")
