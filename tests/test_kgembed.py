"""TransE training epoch: exact fixed-point parity with an in-memory
reference, layout invariance, and epoch chaining."""

import numpy as np
import pyarrow as pa


def _edges():
    return pa.table({"src": [f"s{i}" for i in range(40)],
                     "rel": [f"r{i % 2}" for i in range(40)],
                     "dst": [f"d{i % 7}" for i in range(40)]})


def _ref_epoch(edges, dim, k, seed, lr=0.05, margin=1.0, sc=1 << 24):
    """Pure-numpy reference of ONE epoch: same sampler pairs, same
    margin subgradient, same int64 quantization."""
    import ray.data as rd

    from cattle_ray.stages.kgembed import hash_init_vecs
    from cattle_ray.stages.reason import negative_sample_edges

    pairs = negative_sample_edges(rd.from_arrow(edges), k=k, seed=seed,
                                  keep_true_dst="_td").to_pandas()
    neg = pairs[pairs.label == 0]
    ids = sorted(set(edges["src"].to_pylist())
                 | set(edges["dst"].to_pylist()))
    E = dict(zip(ids, hash_init_vecs(ids, dim, seed=seed)))
    rels = sorted(set(edges["rel"].to_pylist()))
    R = dict(zip(rels, hash_init_vecs(rels, dim, seed=seed + 1)))
    gE = {i: np.zeros(dim, np.int64) for i in ids}
    gR = {r: np.zeros(dim, np.int64) for r in rels}
    cE = {i: 0 for i in ids}
    cR = {r: 0 for r in rels}
    tot = 0
    n_act = 0
    for _, row in neg.iterrows():
        s, r, dn, d = row["src"], row["rel"], row["dst"], row["_td"]
        dp = (E[s] + R[r] - E[d]).astype(np.float64)
        dnv = (E[s] + R[r] - E[dn]).astype(np.float64)
        ddp = np.sqrt((dp * dp).sum())
        ddn = np.sqrt((dnv * dnv).sum())
        loss = margin + ddp - ddn
        if loss <= 0:
            continue
        n_act += 1
        tot += int(np.round(loss * sc))
        up = dp / max(ddp, 1e-30)
        un = dnv / max(ddn, 1e-30)
        gE[s] += np.round((up - un) * sc).astype(np.int64)
        gR[r] += np.round((up - un) * sc).astype(np.int64)
        gE[d] += np.round(-up * sc).astype(np.int64)
        gE[dn] += np.round(un * sc).astype(np.int64)
        cE[s] += 1
        cE[d] += 1
        cE[dn] += 1
        cR[r] += 1

    def upd(v, g, c):
        if c == 0:
            return np.asarray(v, np.float32)
        step = (g / sc / float(c)).astype(np.float32)
        return np.asarray(v, np.float32) - np.float32(lr) * step

    def norm(v):
        # float64 divide then one cast — the engine's vectorized form
        n = float(np.sqrt((v.astype(np.float64) ** 2).sum()))
        return (v.astype(np.float64) / max(n, 1.0)).astype(np.float32)

    newE = {i: norm(upd(E[i], gE[i], cE[i])) for i in ids}
    newR = {r: upd(R[r], gR[r], cR[r]) for r in rels}
    return newE, newR, tot / sc, n_act


def test_transe_epoch_exact_parity_and_invariance(ray_session):
    """The distributed epoch equals the in-memory reference BIT-FOR-BIT
    (int64 fixed-point gradients commute), at any partitioning."""
    import ray.data as rd

    from cattle_ray.stages.kgembed import transe_epoch

    edges = _edges()
    refE, refR, ref_loss, ref_act = _ref_epoch(edges, 8, 2, 3)
    for parts in (1, 5):
        out = transe_epoch(rd.from_arrow(edges).repartition(parts),
                           dim=8, k=2, seed=3)
        got = {r["id"]: np.frombuffer(r["emb"], np.float32)
               for r in out["entities"].take_all()}
        assert set(got) == set(refE)
        assert all((got[i] == refE[i]).all() for i in refE)
        assert all((out["relations"][r] == refR[r]).all() for r in refR)
        assert abs(out["loss"] - ref_loss) < 1e-9
        assert out["active_pairs"] == ref_act


def test_transe_epoch_chaining(ray_session):
    """Feeding an epoch's outputs back in runs a second epoch whose
    result is deterministic, touches every entity table row, and keeps
    the vector schema stable."""
    import ray.data as rd

    from cattle_ray.stages.kgembed import transe_epoch

    edges = _edges()
    ds = rd.from_arrow(edges)
    e1 = transe_epoch(ds, dim=8, k=1, seed=7)
    outs = []
    for _ in range(2):
        e2 = transe_epoch(ds, e1["entities"], e1["relations"],
                          dim=8, k=1, seed=7)
        outs.append({r["id"]: np.frombuffer(r["emb"], np.float32)
                     for r in e2["entities"].take_all()})
    assert set(outs[0]) == set(outs[1])
    assert all((outs[0][i] == outs[1][i]).all() for i in outs[0])
    # vectors actually moved across the chained epoch
    base = {r["id"]: np.frombuffer(r["emb"], np.float32)
            for r in e1["entities"].take_all()}
    assert any((outs[0][i] != base[i]).any() for i in base)


def test_hash_init_is_pure_and_windowed():
    from cattle_ray.stages.kgembed import hash_init_vecs

    a = hash_init_vecs(["x", "y"], 16, seed=1)
    b = hash_init_vecs(["y"], 16, seed=1)
    assert (a[1] == b[0]).all()  # per-id, not per-position
    w = 6.0 / np.sqrt(16)
    assert np.abs(a).max() <= w
    assert (hash_init_vecs(["x"], 16, seed=2) != a[0]).any()


def test_cli_embed(ray_session, tmp_path):
    """`cli embed`: parquet triples → 2 TransE epochs → entity parquet
    + relation table + a loss curve on stdout."""
    import glob
    import json

    import pyarrow.parquet as pq

    from cattle_ray.cli import main

    # objs must be IRI-shaped: property_graph_tables routes literal
    # objects to node attributes, not edges
    t = pa.table({
        "subj": [f"urn:s{i}" for i in range(20)],
        "pred": ["urn:r"] * 20,
        "obj": [f"urn:d{i % 4}" for i in range(20)]})
    src = tmp_path / "triples.parquet"
    pq.write_table(t, str(src))
    out = tmp_path / "emb"
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(["embed", str(src), str(out), "--epochs", "2",
              "--dim", "8"])
    summary = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert summary["epochs"] == 2 and len(summary["loss"]) == 2
    ents = pq.read_table(glob.glob(f"{out}/entities/*.parquet"))
    assert ents.num_rows == summary["n_entities"] == 24
    rels = pq.read_table(f"{out}/relations.parquet")
    assert rels.num_rows == 1
    vec = np.frombuffer(rels["emb"][0].as_py(), np.float32)
    assert vec.shape == (8,)


def test_link_prediction_eval_parity_and_training_signal(ray_session):
    """Sampled link-prediction metrics match an in-memory reference
    exactly (same sampler draw, same pessimistic tie rule) at any
    partitioning — and training epochs IMPROVE them over hash-init."""
    import ray.data as rd

    from cattle_ray.stages.kgembed import (entity_embeddings,
                                           hash_init_vecs,
                                           link_prediction_eval,
                                           transe_epoch)
    from cattle_ray.stages.reason import negative_sample_edges

    edges = _edges()
    ds = rd.from_arrow(edges)
    ents0 = entity_embeddings(ds, 8, seed=3).materialize()
    ids = sorted(set(edges["src"].to_pylist())
                 | set(edges["dst"].to_pylist()))
    rels = sorted(set(edges["rel"].to_pylist()))
    R = dict(zip(rels, hash_init_vecs(rels, 8, seed=4)))

    # in-memory reference over the same sampler pairs
    E = dict(zip(ids, hash_init_vecs(ids, 8, seed=3)))
    pairs = negative_sample_edges(ds, k=10, seed=0,
                                  keep_true_dst="_td").to_pandas()
    neg = pairs[pairs.label == 0]
    per = {}
    for _, row in neg.iterrows():
        s, r, dn, d = row["src"], row["rel"], row["dst"], row["_td"]
        dp = float(np.sqrt(((E[s] + R[r] - E[d]).astype(np.float64)
                            ** 2).sum()))
        dnv = float(np.sqrt(((E[s] + R[r] - E[dn]).astype(np.float64)
                             ** 2).sum()))
        key = (s, r, d)
        per[key] = per.get(key, 0) + (1 if dnv <= dp else 0)
    ranks = np.array([1 + w for w in per.values()])
    want = {"mrr": float((1.0 / ranks).mean()),
            "hits@1": float((ranks <= 1).mean()),
            "n_edges": len(ranks)}

    for parts in (1, 4):
        got = link_prediction_eval(
            rd.from_arrow(edges).repartition(parts), ents0, R,
            dim=8, k=10, seed=0)
        assert got["n_edges"] == want["n_edges"]
        assert abs(got["mrr"] - want["mrr"]) < 1e-12
        assert abs(got["hits@1"] - want["hits@1"]) < 1e-12

    # the training signal: 5 chained epochs beat hash-init on MRR
    ents, rels_v = None, None
    for _ in range(5):
        out = transe_epoch(ds, ents, rels_v, dim=8, k=2, seed=3,
                           lr=0.1)
        ents, rels_v = out["entities"].materialize(), out["relations"]
    before = link_prediction_eval(ds, ents0, R, dim=8, k=10, seed=0)
    after = link_prediction_eval(ds, ents, rels_v, dim=8, k=10, seed=0)
    assert after["mrr"] > before["mrr"]


def test_distmult_model_trains_and_evals(ray_session):
    """model='distmult': trilinear scoring rides the same pair/gradient
    machinery — deterministic across partitionings, loss decreases over
    chained epochs, and training beats hash-init on sampled MRR."""
    import ray.data as rd

    from cattle_ray.stages.kgembed import (entity_embeddings,
                                           hash_init_vecs,
                                           link_prediction_eval,
                                           transe_epoch)

    edges = _edges()
    ds = rd.from_arrow(edges)
    outs = []
    for parts in (1, 4):
        o = transe_epoch(rd.from_arrow(edges).repartition(parts),
                         dim=8, k=2, seed=3, model="distmult")
        outs.append({r["id"]: np.frombuffer(r["emb"], np.float32)
                     for r in o["entities"].take_all()})
    assert all((outs[0][i] == outs[1][i]).all() for i in outs[0])
    ents = rels = None
    losses = []
    for _ in range(4):
        o = transe_epoch(ds, ents, rels, dim=8, k=2, seed=3, lr=0.1,
                         model="distmult")
        ents, rels = o["entities"].materialize(), o["relations"]
        losses.append(o["loss"])
    assert losses[-1] < losses[0]
    ents0 = entity_embeddings(ds, 8, seed=3).materialize()
    rels0 = dict(zip(sorted(set(edges["rel"].to_pylist())),
                     hash_init_vecs(sorted(set(edges["rel"].to_pylist())),
                                    8, seed=4)))
    before = link_prediction_eval(ds, ents0, rels0, dim=8, k=10,
                                  seed=0, model="distmult")
    after = link_prediction_eval(ds, ents, rels, dim=8, k=10, seed=0,
                                 model="distmult")
    assert after["mrr"] > before["mrr"]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown model"):
        transe_epoch(ds, dim=8, model="complex")
