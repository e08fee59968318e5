"""PageRank vs a dense numpy reference on small graphs; corpus dedup e2e."""

import numpy as np
import pandas as pd
import pytest


def _numpy_pagerank(edges, n, damping=0.85, iters=10):
    nodes = sorted({u for e in edges for u in e})
    idx = {v: i for i, v in enumerate(nodes)}
    N = len(nodes)
    deg = np.zeros(N)
    for s, _ in edges:
        deg[idx[s]] += 1
    r = np.full(N, 1.0 / N)
    for _ in range(iters):
        dangling = r[deg == 0].sum()
        base = (1 - damping) / N + damping * dangling / N
        new = np.full(N, base)
        for s, d in edges:
            new[idx[d]] += damping * r[idx[s]] / deg[idx[s]]
        r = new
    return {v: r[idx[v]] for v in nodes}


@pytest.mark.parametrize(
    "edges",
    [
        [(1, 2), (2, 3), (3, 1), (3, 4)],                      # cycle + tail
        [(1, 2), (1, 3), (1, 4), (5, 1)],                      # star with dangling leaves
    ],
)
@pytest.mark.parametrize("small_graph_edges", [0, 10**6])
def test_pagerank_matches_numpy(ray_session, edges, small_graph_edges):
    """Both execution paths — distributed rounds (small_graph_edges=0) and
    the single-worker small-graph solve — must match the dense reference."""
    import ray.data as rd

    from cattle_ray.stages.graph import pagerank

    df = pd.DataFrame(edges, columns=["src", "dst"])
    out = pagerank(rd.from_pandas(df), iters=8,
                   small_graph_edges=small_graph_edges).to_pandas()
    got = dict(zip(out["node"], out["rank"]))
    want = _numpy_pagerank(edges, len(got), iters=8)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_dedup_corpus_keeps_representatives(ray_session):
    import ray.data as rd

    from cattle_ray.stages.dedup import dedup_corpus

    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "through the green fields toward the old stone bridge every day")
    rows = [{"doc_id": i, "text": base} for i in range(6)]           # 6 exact dups
    rows += [{"doc_id": 10 + i, "text": f"unique document number {i} about topic "
              + " ".join(f"w{i}{j}" for j in range(20))} for i in range(4)]
    out = dedup_corpus(rd.from_pandas(pd.DataFrame(rows)), threshold=0.9).to_pandas()
    kept = set(out["doc_id"])
    assert 0 in kept                       # min-id representative survives
    assert kept & set(range(1, 6)) == set()  # other copies dropped
    assert set(range(10, 14)) <= kept      # uniques untouched


def test_dedup_corpus_no_driver_collection(ray_session, monkeypatch):
    """The corpus-dedup drop set must never be collected to the driver
    (scale contract): patch Dataset.to_pandas to raise inside dedup_corpus's
    label/filter path and assert the pipeline still completes."""
    import pandas as pd
    import ray.data as rd
    from ray.data import Dataset

    from cattle_ray.stages import dedup as dedup_mod
    from cattle_ray.stages.dedup import dedup_corpus

    rows = [{"doc_id": i, "text": f"unique document number {i} " * 5}
            for i in range(30)]
    rows.append({"doc_id": 100, "text": rows[0]["text"]})  # exact dup of 0
    ds = rd.from_pandas(pd.DataFrame(rows))

    real_to_pandas = Dataset.to_pandas
    calls = []

    def guarded(self, *a, **k):
        calls.append(1)
        return real_to_pandas(self, *a, **k)

    # sig broadcast verify legitimately collects the (id,sig) table under the
    # documented size gate; drop_broadcast_max=0 forces the distributed
    # anti-join so NOTHING else may collect
    monkeypatch.setattr(Dataset, "to_pandas", guarded)
    out = dedup_corpus(ds, threshold=0.9, drop_broadcast_max=0)
    monkeypatch.setattr(Dataset, "to_pandas", real_to_pandas)
    got = sorted(out.to_pandas()["doc_id"])
    assert 100 not in got and 0 in got and len(got) == 30
    # the only permitted driver collection is the gated sig-verify broadcast
    assert len(calls) <= 1, f"unexpected driver collections: {len(calls)}"


def test_uri_ids64_no_collisions_past_2_16():
    """64-bit node ids must stay distinct well past the 32-bit birthday bound
    (~65k) where the old crc32 ids started merging entities."""
    import pyarrow as pa

    from cattle_ray.stages.graph import uri_ids64

    n = 70_000
    uris = pa.array([f"https://example.org/id/entity/Entity{i}" for i in range(n)])
    ids = uri_ids64(uris).to_pylist()
    assert len(set(ids)) == n


def _sym(pairs):
    out = set()
    for a, b in pairs:
        out.add((a, b))
        out.add((b, a))
    return sorted(out)


def _kcore_ref(pairs, k):
    """Sequential peeling reference."""
    adj = {}
    for a, b in _sym(pairs):
        adj.setdefault(a, set()).add(b)
    changed = True
    while changed:
        changed = False
        for n in [n for n, nb in adj.items() if len(nb) < k]:
            for m in adj.pop(n):
                adj[m].discard(n)
            changed = True
    return {n: len(nb) for n, nb in adj.items() if nb}


def test_kcore_peels_to_reference(ray_session):
    """Chain + pendant + clique graph: 2-core strips the chain layer by
    layer (multi-round peeling), 3-core keeps only the 4-clique; both match
    a sequential peeling reference; string node ids exercise the key-type-
    aware shuffle path."""
    import pandas as pd
    import ray.data as rd

    from cattle_ray.stages.graph import kcore

    clique = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
              ("c", "d")]
    cycle = [("p", "q"), ("q", "r"), ("r", "p"), ("p", "a")]
    chain = [("d", "x1"), ("x1", "x2"), ("x2", "x3")]
    pairs = clique + cycle + chain
    und = pd.DataFrame(_sym(pairs), columns=["s", "o"])
    ds = rd.from_pandas(und).repartition(4)
    for k in (2, 3):
        got = {r["node"]: r["deg"] for r in kcore(ds, k).take_all()}
        assert got == _kcore_ref(pairs, k), k


def test_kcore_random_graph_and_empty(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from cattle_ray.stages.graph import kcore

    rng = np.random.RandomState(5)
    a = rng.randint(0, 60, 400)
    b = rng.randint(0, 60, 400)
    pairs = [(int(x), int(y)) for x, y in zip(a, b) if x != y]
    und = pd.DataFrame(_sym(pairs), columns=["s", "o"])
    ds = rd.from_pandas(und).repartition(5)
    got = {r["node"]: r["deg"] for r in kcore(ds, 8).take_all()}
    assert got == _kcore_ref(pairs, 8)
    # k above max degree: empty result with stable (node, deg) schema
    empty = kcore(ds, 10_000)
    assert empty.count() == 0
    assert set(empty.schema().names) == {"node", "deg"}


def test_kcore_raises_when_rounds_exhausted(ray_session):
    """A 14-node path peels 2 endpoints per round (depth 7): max_rounds=3
    must raise instead of silently returning a non-2-core."""
    import pandas as pd
    import pytest
    import ray.data as rd

    from cattle_ray.stages.graph import kcore

    pairs = [(i, i + 1) for i in range(13)]
    und = pd.DataFrame(_sym(pairs), columns=["s", "o"])
    ds = rd.from_pandas(und)
    with pytest.raises(ValueError, match="max_rounds"):
        kcore(ds, 2, max_rounds=3)
    # with enough rounds the same graph converges (2-core of a path: empty)
    assert kcore(ds, 2, max_rounds=10).count() == 0


def _numpy_hits(edges, iters=3):
    nodes = sorted({u for e in edges for u in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    a, h = np.ones(n), np.ones(n)
    for _ in range(iters):
        a = np.zeros(n)
        for s, d in edges:
            a[idx[d]] += h[idx[s]]
        a = a / a.sum()
        h = np.zeros(n)
        for s, d in edges:
            h[idx[s]] += a[idx[d]]
        h = h / h.sum()
    return {v: (a[idx[v]], h[idx[v]]) for v in nodes}


@pytest.mark.parametrize(
    "edges",
    [
        [(1, 2), (2, 3), (3, 1), (3, 4)],
        [(1, 2), (1, 3), (1, 4), (5, 1), (2, 4)],
    ],
)
@pytest.mark.parametrize("small_graph_edges", [0, 10**6])
def test_hits_matches_numpy(ray_session, edges, small_graph_edges):
    """Both HITS paths (distributed half-rounds and the single-worker
    solve) must match the dense reference to 1e-9."""
    import ray.data as rd

    from cattle_ray.stages.graph import hits

    df = pd.DataFrame(edges, columns=["src", "dst"])
    out = hits(rd.from_pandas(df), iters=3,
               small_graph_edges=small_graph_edges).to_pandas()
    got = {r.node: (r.auth, r.hub) for r in out.itertuples()}
    want = _numpy_hits(edges, iters=3)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v][0] - want[v][0]) < 1e-9
        assert abs(got[v][1] - want[v][1]) < 1e-9


def test_pagerank_checkpoint_resume(ray_session, tmp_path):
    """Kill-and-resume equivalence: 3 rounds checkpointed, then a second
    call with iters=6 must resume from round 3 (not recompute 1-3) and
    match the uninterrupted 6-round run to 1e-12."""
    import os

    import ray.data as rd

    from cattle_ray.stages.graph import pagerank

    rng = np.random.RandomState(5)
    edges = pd.DataFrame({
        "src": rng.randint(0, 200, 3000).astype("int64"),
        "dst": rng.randint(0, 200, 3000).astype("int64"),
    })
    ds = lambda: rd.from_pandas(edges).repartition(4)  # noqa: E731

    want = pagerank(ds(), iters=6, small_graph_edges=0).to_pandas()

    ck = str(tmp_path / "pr_ck")
    os.makedirs(ck)
    pagerank(ds(), iters=3, small_graph_edges=0, checkpoint_dir=ck)
    assert os.path.exists(os.path.join(ck, "round_3", "_DONE"))
    assert not os.path.exists(os.path.join(ck, "round_4"))

    got = pagerank(ds(), iters=6, small_graph_edges=0,
                   checkpoint_dir=ck).to_pandas()
    assert os.path.exists(os.path.join(ck, "round_6", "_DONE"))
    w = dict(zip(want["node"], want["rank"]))
    g = dict(zip(got["node"], got["rank"]))
    assert set(w) == set(g)
    for k in w:
        assert abs(w[k] - g[k]) < 1e-12


def test_label_propagation_two_triangles(ray_session):
    """Synchronous LPA on two triangles joined by a bridge: hand-unrolled
    3 rounds — {a,b,c} converge to label 'a', {x,y,z} to 'c' (the bridge
    pulls c's round-2 label into the right triangle). Also pins: broadcast
    and co-partitioned-join paths agree, and the result is
    parallelism-invariant."""
    import pandas as pd
    import ray.data as rd

    from cattle_ray.stages.graph import label_propagation

    edges = pd.DataFrame({
        "s": ["a", "b", "a", "x", "y", "x", "c"],
        "o": ["b", "c", "c", "y", "z", "z", "x"],
    })
    want = {"a": "a", "b": "a", "c": "a", "x": "c", "y": "c", "z": "c"}

    for blocks in (1, 3):
        for bmax in (2_000_000, 0):  # broadcast path vs join path
            got = label_propagation(
                rd.from_pandas(edges).repartition(blocks), iters=3,
                node_broadcast_max=bmax).to_pandas()
            assert dict(zip(got["node"], got["label"])) == want


def test_label_propagation_multi_edge_collapses(ray_session):
    """Duplicate and reversed edge rows are ONE undirected edge — votes
    are per neighbor, not per edge row."""
    import pandas as pd
    import ray.data as rd

    from cattle_ray.stages.graph import label_propagation

    # star: center m with leaves p, q; q—m listed 3× and both directions.
    # Round 1: m ← min(p, q) = p; leaves ← m. Round 2: m ← m (both leaves
    # vote m), leaves ← p. Round 3: m ← p, leaves ← m... with duplicate
    # edges NOT collapsed, q's votes would dominate m's mode instead.
    edges = pd.DataFrame({
        "s": ["m", "m", "q", "m"],
        "o": ["p", "q", "m", "q"],
    })
    got = label_propagation(rd.from_pandas(edges), iters=1).to_pandas()
    assert dict(zip(got["node"], got["label"])) == \
        {"m": "p", "p": "m", "q": "m"}


def test_label_propagation_int64_keys(ray_session):
    """Node ids need not be strings — int64 graphs take the same paths
    (regression: the broadcast attach once hardcoded pa.string())."""
    import pandas as pd
    import ray.data as rd

    from cattle_ray.stages.graph import label_propagation

    m = {"a": 10, "b": 11, "c": 12, "x": 20, "y": 21, "z": 22}
    edges = pd.DataFrame({
        "s": [m[v] for v in ["a", "b", "a", "x", "y", "x", "c"]],
        "o": [m[v] for v in ["b", "c", "c", "y", "z", "z", "x"]],
    })
    for bmax in (2_000_000, 0):
        got = label_propagation(rd.from_pandas(edges), iters=3,
                                node_broadcast_max=bmax).to_pandas()
        assert dict(zip(got["node"], got["label"])) == \
            {10: 10, 11: 10, 12: 10, 20: 12, 21: 12, 22: 12}


def _numpy_ppr(edges, seeds, damping=0.85, iters=8):
    nodes = sorted({u for e in edges for u in e})
    idx = {v: i for i, v in enumerate(nodes)}
    N = len(nodes)
    deg = np.zeros(N)
    for s, _ in edges:
        deg[idx[s]] += 1
    in_graph = [s for s in seeds if s in idx]
    p = np.zeros(N)
    for s in in_graph:
        p[idx[s]] = 1.0 / len(in_graph)
    r = p.copy()
    for _ in range(iters):
        non_dangling = r[deg > 0].sum()
        coef = (1 - damping) + damping * (1.0 - non_dangling)
        new = coef * p
        for s, d in edges:
            new[idx[d]] += damping * r[idx[s]] / deg[idx[s]]
        r = new
    return {v: r[idx[v]] for v in nodes}


@pytest.mark.parametrize("small_graph_edges", [0, 10**6])
def test_personalized_pagerank_matches_numpy(ray_session, small_graph_edges):
    """Seeded teleport on both execution paths vs the dense reference;
    non-seed sinks get mass only through walks FROM the seeds."""
    import ray.data as rd

    from cattle_ray.stages.graph import pagerank

    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (5, 1), (4, 5), (6, 1)]
    seeds = [1, 99]  # 99 absent from the graph → ignored
    df = pd.DataFrame(edges, columns=["src", "dst"])
    out = pagerank(rd.from_pandas(df), iters=8, seeds=seeds,
                   small_graph_edges=small_graph_edges).to_pandas()
    got = dict(zip(out["node"], out["rank"]))
    want = _numpy_ppr(edges, seeds)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])
    assert abs(sum(got.values()) - 1.0) < 1e-6
    # proximity semantics: the seed outranks the far sink
    assert got[1] > got[4]


@pytest.mark.parametrize("small_graph_edges", [0, 10**6])
def test_personalized_pagerank_all_seeds_absent(ray_session,
                                                small_graph_edges):
    import ray.data as rd

    from cattle_ray.stages.graph import pagerank

    df = pd.DataFrame([(1, 2)], columns=["src", "dst"])
    with pytest.raises(ValueError, match="no seed"):
        pagerank(rd.from_pandas(df), iters=2, seeds=[42],
                 small_graph_edges=small_graph_edges)


def test_sample_neighbors_deterministic_fanout(ray_session):
    """GNN neighbor sampling: fanout bound per source, hop tags, layout
    invariance, no re-expansion of already-expanded nodes."""
    import pyarrow as pa
    import ray.data as rd

    from cattle_ray.stages.graph import sample_neighbors

    e = pa.table({"s": ["a"] + ["h"] * 100 + ["n0"],
                  "o": ["h"] + [f"n{i}" for i in range(100)] + ["a"]})
    outs = []
    for parts in (2, 7):
        got = sample_neighbors(rd.from_arrow(e).repartition(parts),
                               ["a"], fanout=5, hops=2).to_pandas()
        outs.append(set(map(tuple, got.values.tolist())))
    assert outs[0] == outs[1]
    got = outs[0]
    hop1 = {t for t in got if t[2] == 1}
    hop2 = {t for t in got if t[2] == 2}
    assert hop1 == {("a", "h", 1)}
    assert len(hop2) == 5 and all(s == "h" for s, _o, _h in hop2)
    # different seed → different draw (overwhelmingly likely at 100C5)
    alt = sample_neighbors(rd.from_arrow(e), ["a"], fanout=5, hops=2,
                           seed=1).to_pandas()
    assert set(map(tuple, alt.values.tolist())) != got
    # unknown seed → empty with the right schema
    empty = sample_neighbors(rd.from_arrow(e), ["zz"], fanout=3,
                             hops=2).to_pandas()
    assert len(empty) == 0
