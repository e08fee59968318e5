"""Deterministic distributed KG-embedding training (TransE) — the
training loop the negative sampler feeds.

Why full-batch and fixed-point: SGD's row order is a partition artifact,
and float accumulation order varies with layout — either would make the
trained vectors depend on how blocks happened to split. One epoch here
is the FULL-batch subgradient of the margin ranking loss, with per-row
gradients quantized to int64 fixed-point (``grad_scale``) before the
per-entity scatter-sum — integer sums commute, so the epoch is a pure
function of (edges, dim, hyperparameters): layout/parallelism-invariant
and reproducible, the same exact-cents discipline the engine's
aggregates use.

Scale shape (the 100-TB story):

* the ENTITY embedding table is a Dataset ``(id, emb)`` with ``emb`` a
  fixed-size float32 binary payload — entity-sized, never driver-side;
  epoch 0 needs no stored table at all (deterministic hash init:
  vector j of ``id`` is a splitmix of ``h(id), j`` — TransE's uniform
  ±6/√dim window);
* corrupted pairs come from :func:`~.reason.negative_sample_edges`
  (``keep_true_dst`` pairs each corruption with its positive) — the
  sampler's own broadcast/sharded crossover applies;
* FOUR vector gathers per pair row (src, rel, true dst, corrupted dst):
  entity vectors by co-partitioned :func:`~.joins.hash_join` against
  the table, relation vectors from a ``ray.put`` broadcast (relations
  are vocabulary-sized by contract, same guard as the RDFS schema);
* the per-entity gradient sum rides ONE raw-task
  :func:`~.exchange.hash_exchange`; the update is one LEFT join of the
  table against the summed gradients.

Reference scope note: the reference system performs no training; this
is beyond-reference surface implied by the KG tier (TransE: Bordes et
al., NeurIPS 2013 — public).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_GOLD = np.uint64(0x9E3779B97F4A7C15)
MAX_RELATIONS = 1_000_000  # broadcast guard: relations are vocabulary


def _mix64(x: np.ndarray) -> np.ndarray:
    x = (x + _GOLD).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def hash_init_vecs(ids, dim: int, *, seed: int = 0) -> np.ndarray:
    """(n, dim) float32 init vectors as a pure function of the ids:
    uniform in ±6/√dim (the TransE init window) from a splitmix of
    ``(xxhash(id), column, seed)`` — no stored epoch-0 table, and any
    worker can materialize any entity's vector independently."""
    from .dedup import hash_strings64

    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    if not isinstance(ids, pa.Array):
        ids = pa.array(list(ids), pa.string())
    h = hash_strings64(pc.cast(ids, pa.string()))
    cols = np.arange(dim, dtype=np.uint64)
    m = _mix64(h[:, None] ^ (cols[None, :] * _GOLD)
               ^ np.uint64(seed))
    u = (m >> np.uint64(11)).astype(np.float64) / float(1 << 53)
    w = 6.0 / np.sqrt(dim)
    return ((u - 0.5) * 2.0 * w).astype(np.float32)


def _vec_col(mat: np.ndarray) -> pa.Array:
    """(n, dim) float32 → fixed-size-binary column (dim·4 bytes/row)."""
    dim4 = mat.shape[1] * 4
    return pa.Array.from_buffers(
        pa.binary(dim4), len(mat),
        [None, pa.py_buffer(np.ascontiguousarray(mat).tobytes())])


def _vecs(col, dim: int, dtype=np.float32) -> np.ndarray:
    """Fixed-size-binary column → (n, dim) array (zero-copy buffer view
    when the column is a single chunk)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    itemsize = np.dtype(dtype).itemsize
    buf = col.buffers()[1]
    off = col.offset * dim * itemsize
    return np.frombuffer(buf, dtype=dtype,
                         count=len(col) * dim,
                         offset=off).reshape(len(col), dim)


def entity_embeddings(edges_ds, dim: int, *, src: str = "src",
                      dst: str = "dst", seed: int = 0,
                      num_buckets: int = 32):
    """Initial entity embedding table ``(id, emb)`` for every distinct
    edge endpoint — hash-init vectors, distributed distinct, nothing
    driver-side."""
    from .aggregates import distinct

    def ends(b: pa.Table) -> pa.Table:
        a, d = b[src], b[dst]
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        if isinstance(d, pa.ChunkedArray):
            d = d.combine_chunks()
        return pa.table({"id": pa.concat_arrays([a, d])})

    ids = distinct(edges_ds.map_batches(ends, batch_format="pyarrow"),
                   ["id"], num_buckets=num_buckets)
    return ids.map_batches(
        lambda b: pa.table({"id": b["id"],
                            "emb": _vec_col(hash_init_vecs(
                                b["id"], dim, seed=seed))}),
        batch_format="pyarrow")


def _fetch_vecs(rows_ds, emb_ds, key_col: str, out_col: str, dim: int,
                num_buckets: int, rows_schema: pa.Schema):
    """Attach ``emb_ds``'s vector for ``rows[key_col]`` as ``out_col``
    via one co-partitioned inner join (every key must exist — the
    epoch derives its table from the same edges). Plan-known schemas
    thread through explicitly: chained join outputs are lazy and
    Ray can't always infer their schema without executing."""
    from .joins import hash_join

    emb_t = pa.binary(dim * 4)
    side_schema = pa.schema([(f"_k_{out_col}", pa.string()),
                             (out_col, emb_t)])
    side = emb_ds.map_batches(
        lambda b: pa.table({f"_k_{out_col}": b["id"], out_col: b["emb"]}),
        batch_format="pyarrow")
    j = hash_join(rows_ds, side, key_col, f"_k_{out_col}",
                  num_buckets=num_buckets, left_schema=rows_schema,
                  right_schema=side_schema)
    out_schema = pa.schema(list(rows_schema) + [pa.field(out_col, emb_t)])
    return j.map_batches(
        lambda b: b.drop_columns([f"_k_{out_col}"]),
        batch_format="pyarrow"), out_schema


def link_prediction_eval(edges_ds, ent_emb_ds, rel_vecs: dict, *,
                         dim: int = 16, k: int = 10,
                         src: str = "src", rel: str = "rel",
                         dst: str = "dst", seed: int = 0,
                         num_buckets: int = 16,
                         sampler_mode: str = "auto",
                         entity_max: int = 10_000_000,
                         model: str = "transe"):
    """Standard KG-embedding LINK-PREDICTION evaluation in the sampled
    setting: each test edge's true dst is ranked against its ``k``
    deterministic filtered corruptions (the same
    :func:`~.reason.negative_sample_edges` draw the training loop
    uses — so eval is as layout/parallelism-invariant as training);
    rank = 1 + #corruptions scoring strictly better, ties (exactly
    equal distance) count as beaten, the pessimistic convention.
    Returns ``{"mrr": float, "hits@1": …, "hits@3": …, "hits@10": …,
    "n_edges": int}`` — exact integer numerators over the edge count.
    Sampled ranks upper-bound full-ranking metrics at 1000× less work
    than scoring every entity per edge (the standard large-KG
    protocol); at 100 TB, full ranking is k=|V| and nobody does it."""
    import ray

    from .reason import negative_sample_edges

    if model not in ("transe", "distmult"):
        raise ValueError(f"unknown model {model!r}")
    edges_ds = edges_ds.materialize()
    rel_ref = ray.put({r: np.asarray(v, np.float32)
                       for r, v in rel_vecs.items()})
    pairs = negative_sample_edges(
        edges_ds, k=k, src=src, rel=rel, dst=dst, seed=seed,
        mode=sampler_mode, entity_max=entity_max,
        keep_true_dst="_td").filter(expr="label == 0").map_batches(
        lambda b: pa.table({"s": b[src], "r": b[rel], "dn": b[dst],
                            "d": b["_td"]}),
        batch_format="pyarrow")
    got = pairs
    got_schema = pa.schema([("s", pa.string()), ("r", pa.string()),
                            ("dn", pa.string()), ("d", pa.string())])
    for key_col, out in (("s", "es"), ("d", "ed"), ("dn", "edn")):
        got, got_schema = _fetch_vecs(got, ent_emb_ds, key_col, out,
                                      dim, num_buckets, got_schema)

    def beaten(b: pa.Table) -> pa.Table:
        # one row per (edge, corruption): did the corruption score at
        # least as well as the true dst? combine map-side per edge key
        if len(b) == 0:
            return pa.table({"k": pa.array([], pa.string()),
                             "worse": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        rv = ray.get(rel_ref)
        es = _vecs(b["es"], dim)
        ed = _vecs(b["ed"], dim)
        edn = _vecs(b["edn"], dim)
        r_np = np.asarray(b["r"].to_pylist(), dtype=object)
        r_uniq, r_inv = np.unique(r_np, return_inverse=True)
        er = np.stack([rv[x] for x in r_uniq]).astype(np.float32)[r_inv]
        if model == "transe":
            dp = np.sqrt(((es + er - ed).astype(np.float64) ** 2).sum(1))
            dn = np.sqrt(((es + er - edn).astype(np.float64)
                          ** 2).sum(1))
            win = (dn <= dp).astype(np.int64)  # pessimistic ties
        else:  # distmult: higher trilinear score wins
            f_p = (es.astype(np.float64) * er * ed).sum(1)
            f_n = (es.astype(np.float64) * er * edn).sum(1)
            win = (f_n >= f_p).astype(np.int64)
        key = np.char.add(np.char.add(
            np.asarray(b["s"].to_pylist(), dtype="U"), "\x1f"),
            np.char.add(np.char.add(r_np.astype("U"), "\x1f"),
                        np.asarray(b["d"].to_pylist(), dtype="U")))
        order = np.argsort(key, kind="stable")
        ks = key[order]
        u = np.concatenate([[0], np.nonzero(ks[1:] != ks[:-1])[0] + 1])
        worse = np.add.reduceat(win[order], u)
        cnt = np.diff(np.concatenate([u, [len(ks)]]))
        return pa.table({"k": pa.array(ks[u].tolist(), pa.string()),
                         "worse": pa.array(worse.astype(np.int64)),
                         "n": pa.array(cnt.astype(np.int64))})

    from .joins import _col_hash64

    per_edge = got.map_batches(beaten, batch_format="pyarrow")
    per_edge = per_edge.map_batches(
        lambda b: b.append_column("_bucket", pa.array(
            (_col_hash64(b["k"]) % np.uint64(num_buckets)).astype(
                np.int64))),
        batch_format="pyarrow")

    from .exchange import hash_exchange

    def finish(t: pa.Table) -> pa.Table:
        # an edge's corruption rows may split across batches: final sum
        # per edge key, then one partial metrics row per bucket (exact
        # integer numerators + a float MRR partial)
        if len(t) == 0:
            return pa.table({"n_edges": pa.array([], pa.int64()),
                             "h1": pa.array([], pa.int64()),
                             "h3": pa.array([], pa.int64()),
                             "h10": pa.array([], pa.int64()),
                             "rr": pa.array([], pa.float64())})
        import pandas as pd

        df = t.to_pandas().groupby("k", sort=False).sum(numeric_only=True)
        rank = 1 + df["worse"].to_numpy()
        return pa.table({
            "n_edges": pa.array([len(df)], pa.int64()),
            "h1": pa.array([int((rank <= 1).sum())], pa.int64()),
            "h3": pa.array([int((rank <= 3).sum())], pa.int64()),
            "h10": pa.array([int((rank <= 10).sum())], pa.int64()),
            "rr": pa.array([float((1.0 / rank).sum())], pa.float64())})

    parts = hash_exchange(per_edge, "_bucket", finish,
                          num_buckets).to_pandas()
    n = int(parts["n_edges"].sum())
    if n == 0:
        return {"mrr": 0.0, "hits@1": 0.0, "hits@3": 0.0,
                "hits@10": 0.0, "n_edges": 0}
    return {"mrr": float(parts["rr"].sum()) / n,
            "hits@1": int(parts["h1"].sum()) / n,
            "hits@3": int(parts["h3"].sum()) / n,
            "hits@10": int(parts["h10"].sum()) / n,
            "n_edges": n}


def transe_epoch(edges_ds, ent_emb_ds=None, rel_vecs: "dict | None" = None,
                 *, dim: int = 16, lr: float = 0.05, margin: float = 1.0,
                 k: int = 1, src: str = "src", rel: str = "rel",
                 dst: str = "dst", seed: int = 0,
                 grad_scale: int = 1 << 24, num_buckets: int = 16,
                 sampler_mode: str = "auto",
                 entity_max: int = 10_000_000,
                 normalize: bool = True,
                 model: str = "transe"):
    """ONE full-batch TransE epoch. Returns ``{"entities": Dataset
    (id, emb), "relations": {rel: np.ndarray}, "loss": float,
    "active_pairs": int, "pairs": int}`` — loss is the exact
    fixed-point sum of ``max(0, margin + ‖e_s+r−e_d‖ − ‖e_s+r−e_d'‖)``
    over every (positive, corruption) pair, and the updated tables are
    a pure function of the inputs (chain epochs by feeding the outputs
    back in). ``ent_emb_ds=None`` / ``rel_vecs=None`` hash-init from
    the edges themselves.

    ``model="transe"`` scores by −‖e_s + r − e_d‖ (distance, lower
    better); ``model="distmult"`` by ⟨e_s, r, e_d⟩ (trilinear product,
    higher better) — same pair machinery, same fixed-point discipline,
    different per-row kernel.

    Update rule: MEAN gradient per entity/relation (exact int64 sum ÷
    exact incident count) — a zipf hub's step stays bounded by ``lr``
    instead of exploding with its degree (measured: summed gradients
    blew the loss up 200× in one epoch on a zipf graph) — then, with
    ``normalize=True`` (TransE's constraint), entity vectors project
    onto the unit ball ``v / max(1, ‖v‖)``. Relations follow TransE
    and stay unnormalized."""
    import ray

    from .exchange import hash_exchange
    from .joins import _col_hash64
    from .reason import negative_sample_edges

    if model not in ("transe", "distmult"):
        raise ValueError(f"unknown model {model!r}")
    edges_ds = edges_ds.materialize()
    if ent_emb_ds is None:
        ent_emb_ds = entity_embeddings(edges_ds, dim, src=src, dst=dst,
                                       seed=seed,
                                       num_buckets=num_buckets)
    ent_emb_ds = ent_emb_ds.materialize()
    if rel_vecs is None:
        from .aggregates import distinct

        rels_ds = distinct(edges_ds.map_batches(
            lambda b: pa.table({"r": b[rel]}), batch_format="pyarrow"),
            ["r"], num_buckets=num_buckets)
        rels = [r["r"] for r in rels_ds.take_all()]
        if len(rels) > MAX_RELATIONS:
            raise ValueError(
                f"{len(rels)} distinct relations exceed MAX_RELATIONS="
                f"{MAX_RELATIONS} — relation vocabularies are broadcast "
                "by contract (an id-like relation column is a modelling "
                "bug)")
        rels = sorted(rels)
        rel_vecs = dict(zip(rels, hash_init_vecs(rels, dim, seed=seed
                                                 + 1)))
    rel_ref = ray.put({r: np.asarray(v, np.float32)
                       for r, v in rel_vecs.items()})

    # corruption pairs: negatives carry their positive's dst for the
    # margin pairing; positives themselves aren't needed as rows
    pairs = negative_sample_edges(
        edges_ds, k=k, src=src, rel=rel, dst=dst, seed=seed,
        mode=sampler_mode, entity_max=entity_max,
        keep_true_dst="_td").filter(expr="label == 0").map_batches(
        lambda b: pa.table({"s": b[src], "r": b[rel], "dn": b[dst],
                            "d": b["_td"]}),
        batch_format="pyarrow")
    got = pairs
    got_schema = pa.schema([("s", pa.string()), ("r", pa.string()),
                            ("dn", pa.string()), ("d", pa.string())])
    for key_col, out in (("s", "es"), ("d", "ed"), ("dn", "edn")):
        got, got_schema = _fetch_vecs(got, ent_emb_ds, key_col, out,
                                      dim, num_buckets, got_schema)
    got = got.materialize()

    def _g_col(mat: np.ndarray) -> pa.Array:
        return pa.Array.from_buffers(
            pa.binary(dim * 8), len(mat),
            [None, pa.py_buffer(np.ascontiguousarray(mat).tobytes())])

    _EMIT_SCHEMA = pa.schema([
        ("kind", pa.string()), ("id", pa.string()),
        ("g", pa.binary(dim * 8)), ("cnt", pa.int64()),
        ("loss_q", pa.int64())])

    def _combine(kinds, ids, gq):
        """Batch-local map-side combine: one (kind, id) row per batch
        with the int64 gradient sum and incident active count —
        vectorized lexsort + reduceat, no per-id Python loop."""
        key = np.char.add(np.char.add(kinds.astype("U1"), "\x1f"),
                          ids.astype(str))
        order = np.argsort(key, kind="stable")
        ks = key[order]
        uniq_idx = np.concatenate([[0], np.nonzero(ks[1:] != ks[:-1])[0]
                                   + 1])
        sums = np.add.reduceat(gq[order], uniq_idx, axis=0)
        cnts = np.diff(np.concatenate([uniq_idx, [len(ks)]]))
        return (kinds[order][uniq_idx], ids[order][uniq_idx], sums,
                cnts.astype(np.int64))

    def grad_batch(b: pa.Table) -> pa.Table:
        rv = ray.get(rel_ref)
        n = len(b)
        if n == 0:
            return _EMIT_SCHEMA.empty_table()
        es = _vecs(b["es"], dim)
        ed = _vecs(b["ed"], dim)
        edn = _vecs(b["edn"], dim)
        r_np = np.asarray(b["r"].to_pylist(), dtype=object)
        r_uniq, r_inv = np.unique(r_np, return_inverse=True)
        er = np.stack([rv[x] for x in r_uniq]).astype(
            np.float32)[r_inv]  # gather per UNIQUE relation only
        if model == "transe":
            diff_p = (es + er - ed).astype(np.float64)
            diff_n = (es + er - edn).astype(np.float64)
            d_p = np.sqrt((diff_p * diff_p).sum(1))
            d_n = np.sqrt((diff_n * diff_n).sum(1))
            loss = margin + d_p - d_n
        else:  # distmult: higher score better
            f_p = (es.astype(np.float64) * er * ed).sum(1)
            f_n = (es.astype(np.float64) * er * edn).sum(1)
            loss = margin - f_p + f_n
        act = loss > 0
        loss_q = int(np.round(loss[act] * grad_scale).sum())
        head = pa.table({
            "kind": pa.array(["loss"], pa.string()),
            "id": pa.array([""], pa.string()),
            "g": pa.array([b"\0" * (dim * 8)], pa.binary(dim * 8)),
            "cnt": pa.array([int(act.sum())], pa.int64()),
            "loss_q": pa.array([loss_q], pa.int64())}).cast(_EMIT_SCHEMA)
        if not act.any():
            return head
        if model == "transe":
            u_p = np.where(d_p[act, None] > 0, diff_p[act] / np.maximum(
                d_p[act, None], 1e-30), 0.0)
            u_n = np.where(d_n[act, None] > 0, diff_n[act] / np.maximum(
                d_n[act, None], 1e-30), 0.0)
            g_sr = u_p - u_n          # ∂L/∂e_s and ∂L/∂r
            g_d = -u_p                # ∂L/∂e_d
            g_dn = u_n                # ∂L/∂e_d'
            g_r = g_sr
        else:
            ea, ra = es[act].astype(np.float64), er[act].astype(
                np.float64)
            da, dna = ed[act].astype(np.float64), edn[act].astype(
                np.float64)
            g_sr = ra * (dna - da)    # ∂L/∂e_s
            g_r = ea * (dna - da)     # ∂L/∂r
            g_d = -(ea * ra)          # ∂L/∂e_d
            g_dn = ea * ra            # ∂L/∂e_d'
        sa = np.asarray(b["s"].to_pylist(), object)[act]
        da = np.asarray(b["d"].to_pylist(), object)[act]
        dna = np.asarray(b["dn"].to_pylist(), object)[act]
        ra = r_np[act]
        ids = np.concatenate([sa, da, dna, ra])
        kinds = np.concatenate([np.full(len(sa), "e", object),
                                np.full(len(da), "e", object),
                                np.full(len(dna), "e", object),
                                np.full(len(ra), "r", object)])
        gq = np.round(np.concatenate([g_sr, g_d, g_dn, g_r])
                      * grad_scale).astype(np.int64)
        ck, ci, cs, cc = _combine(np.asarray(kinds), np.asarray(ids), gq)
        out = pa.table({
            "kind": pa.array(ck.tolist(), pa.string()),
            "id": pa.array(ci.tolist(), pa.string()),
            "g": _g_col(cs),
            "cnt": pa.array(cc),
            "loss_q": pa.array(np.zeros(len(ci), np.int64))}).cast(
            _EMIT_SCHEMA)
        return pa.concat_tables([head, out])

    emitted = got.map_batches(grad_batch,
                              batch_format="pyarrow").materialize()
    n_pairs = got.count()

    # loss + active counts: exact int64 partials, driver-summed
    lp = emitted.map_batches(
        lambda b: b.filter(pc.equal(b["kind"], "loss")).select(
            ["loss_q", "cnt"]),
        batch_format="pyarrow").to_pandas()
    if "loss_q" not in lp.columns:  # wholly empty pair set (no edges /
        # every corruption dropped): nothing to train — inputs pass
        # through unchanged (empty frames lose their schema in Ray)
        return {"entities": ent_emb_ds, "relations": dict(rel_vecs),
                "loss": 0.0, "active_pairs": 0, "pairs": n_pairs}
    total_loss = float(lp["loss_q"].sum()) / grad_scale
    active = int(lp["cnt"].sum())

    # relation gradients: vocabulary-sized — batch partials (already
    # combined per batch) merged on the driver; MEAN gradient per
    # relation (sum/count) keeps the full-batch step bounded for hot
    # relations, same rationale as the entity mean below
    rp = emitted.map_batches(
        lambda b: b.filter(pc.equal(b["kind"], "r")).select(
            ["id", "g", "cnt"]),
        batch_format="pyarrow").to_pandas()
    new_rels = {}
    for r_id, vec in rel_vecs.items():
        sub = rp[rp["id"] == r_id] if len(rp) else rp
        if len(sub):
            gsum = np.stack([np.frombuffer(x, np.int64)
                             for x in sub["g"]]).sum(0)
            cnt = int(sub["cnt"].sum())
            step = (gsum / grad_scale / cnt).astype(np.float32)
            new_rels[r_id] = np.asarray(vec, np.float32) \
                - np.float32(lr) * step
        else:
            new_rels[r_id] = np.asarray(vec, np.float32)

    # entity gradients: one raw-task exchange, exact int64 vector sums
    ent_rows = emitted.map_batches(
        lambda b: b.filter(pc.equal(b["kind"], "e")).select(
            ["id", "g", "cnt"]),
        batch_format="pyarrow")
    ent_rows = ent_rows.map_batches(
        lambda b: b.append_column("_bucket", pa.array(
            (_col_hash64(b["id"]) % np.uint64(num_buckets)).astype(
                np.int64))),
        batch_format="pyarrow")

    _SUM_SCHEMA = pa.schema([("id", pa.string()),
                             ("gs", pa.binary(dim * 8)),
                             ("cnt", pa.int64())])

    def sum_bucket(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _SUM_SCHEMA.empty_table()
        ids = np.asarray(t["id"].to_pylist(), object)
        gq = _vecs(t["g"], dim, np.int64)
        cn = t["cnt"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids.astype(str), kind="stable")
        ids_s, gq_s, cn_s = ids[order], gq[order], cn[order]
        u = np.concatenate([[0], np.nonzero(
            ids_s[1:] != ids_s[:-1])[0] + 1])
        sums = np.add.reduceat(gq_s, u, axis=0)
        cnts = np.add.reduceat(cn_s, u)
        return pa.table({
            "id": pa.array(ids_s[u].tolist(), pa.string()),
            "gs": _g_col(sums),
            "cnt": pa.array(cnts.astype(np.int64))}).cast(_SUM_SCHEMA)

    grads = hash_exchange(ent_rows, "_bucket", sum_bucket, num_buckets)

    from .joins import hash_join

    emb_schema = pa.schema([("id", pa.string()),
                            ("emb", pa.binary(dim * 4))])
    upd = hash_join(ent_emb_ds, grads.map_batches(
        lambda b: pa.table({"_gid": b["id"], "gs": b["gs"],
                            "_gcnt": b["cnt"]}),
        batch_format="pyarrow"), "id", "_gid", how="left",
        num_buckets=num_buckets, left_schema=emb_schema,
        right_schema=pa.schema([("_gid", pa.string()),
                                ("gs", pa.binary(dim * 8)),
                                ("_gcnt", pa.int64())]))

    def apply(b: pa.Table) -> pa.Table:
        emb = _vecs(b["emb"], dim).copy()
        gs_col = b["gs"]
        if isinstance(gs_col, pa.ChunkedArray):
            gs_col = gs_col.combine_chunks()
        valid = pc.is_valid(gs_col).to_numpy(zero_copy_only=False)
        if valid.any():
            gq = _vecs(pc.fill_null(
                gs_col, b"\0" * (dim * 8)), dim, np.int64)
            cn = pc.fill_null(b["_gcnt"], 1).to_numpy(
                zero_copy_only=False).astype(np.float64)
            # MEAN gradient: a hub entity's step is bounded by lr, not
            # by its degree (the full-batch analogue of per-sample SGD)
            step = (gq / grad_scale / cn[:, None]).astype(np.float32)
            emb[valid] = emb[valid] - np.float32(lr) * step[valid]
        if normalize:
            nrm = np.sqrt((emb.astype(np.float64) ** 2).sum(1))
            scale = np.where(nrm > 1.0, nrm, 1.0)
            emb = (emb / scale[:, None]).astype(np.float32)
        return pa.table({"id": b["id"], "emb": _vec_col(emb)})

    new_ents = upd.map_batches(apply, batch_format="pyarrow")
    return {"entities": new_ents, "relations": new_rels,
            "loss": total_loss, "active_pairs": active,
            "pairs": n_pairs}
