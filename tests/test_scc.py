"""Strongly connected components — Tarjan crossover + FW-BW coloring."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _run(edges, **kw):
    import ray.data as rd

    from cattle_ray.stages.graph import scc

    ds = rd.from_pandas(pd.DataFrame(edges, columns=["s", "o"])).repartition(3)
    out = scc(ds, **kw).to_pandas()
    comps = {}
    for r in out.itertuples():
        comps.setdefault(r.scc, set()).add(r.node)
    return out, comps


HAND_EDGES = [
    # 3-cycle {1,2,3}, 2-cycle {7,8}, DAG bridge 3→7, tail 7→9, self-loop 11
    (1, 2), (2, 3), (3, 1),
    (7, 8), (8, 7),
    (3, 7), (7, 9), (11, 11), (9, 11),
]
HAND_SCCS = {3: {1, 2, 3}, 8: {7, 8}, 9: {9}, 11: {11}}


@pytest.mark.parametrize("force_distributed", [False, True])
def test_scc_handcrafted(ray_session, force_distributed):
    kw = {"small_graph_edges": 0, "max_rounds": 40} if force_distributed \
        else {}
    out, comps = _run(HAND_EDGES, **kw)
    assert comps == HAND_SCCS
    # every node appearing in an edge is covered exactly once
    assert sorted(out["node"]) == [1, 2, 3, 7, 8, 9, 11]


@pytest.mark.parametrize("force_distributed", [False, True])
def test_scc_random_parity(ray_session, force_distributed):
    """Both paths agree with the in-process Tarjan reference on a random
    digraph (dense enough to have nontrivial SCCs)."""
    from cattle_ray.stages.graph import _scc_local

    rng = np.random.RandomState(5)
    n_nodes, n_edges = 60, 150
    edges = list({(int(a), int(b)) for a, b in
                  zip(rng.randint(0, n_nodes, n_edges),
                      rng.randint(0, n_nodes, n_edges))})
    ref_t = _scc_local(pd.DataFrame(edges, columns=["s", "o"]), "s", "o")
    ref = dict(zip(ref_t["node"].to_pylist(), ref_t["scc"].to_pylist()))

    kw = {"small_graph_edges": 0, "max_rounds": 60} if force_distributed \
        else {}
    out, _ = _run(edges, **kw)
    got = dict(zip(out["node"], out["scc"]))
    assert got == ref
    # sanity: the random graph actually has a nontrivial SCC
    assert len(set(ref.values())) < len(ref)


def test_scc_giant_cycle_plus_dag(ray_session):
    """Distributed path: one 20-node cycle with DAG in/out fringes — the
    bowtie shape — settles with the cycle as one SCC and fringe nodes as
    singletons."""
    cyc = [(i, (i + 1) % 20) for i in range(20)]
    fringe = [(100, 0), (101, 100), (5, 200), (200, 201)]
    out, comps = _run(cyc + fringe, small_graph_edges=0, max_rounds=40)
    assert comps[19] == set(range(20))
    for single in (100, 101, 200, 201):
        assert comps[single] == {single}


@pytest.mark.parametrize("force_distributed", [False, True])
def test_scc_negative_ids(ray_session, force_distributed):
    """Real node ids are int64 URI hashes — about half are NEGATIVE. The
    distributed backward root-reach must settle classes whose root id is
    <= 0 (regression: a 0 'no-seed' sentinel left them unsettled until
    max_rounds exhausted)."""
    from cattle_ray.stages.graph import _scc_local

    # shift the handcrafted graph so every id is negative, plus a cycle
    # whose root (max id) is exactly 0 and one huge-magnitude pair
    shift = -1000
    edges = [(a + shift, b + shift) for a, b in HAND_EDGES]
    edges += [(0, -5), (-5, 0)]                      # root id == 0
    big = 2 ** 62
    edges += [(-big, big - 7), (big - 7, -big)]      # |id| near 2^63
    ref_t = _scc_local(pd.DataFrame(edges, columns=["s", "o"]), "s", "o")
    ref = dict(zip(ref_t["node"].to_pylist(), ref_t["scc"].to_pylist()))

    kw = {"small_graph_edges": 0, "max_rounds": 40} if force_distributed \
        else {}
    out, comps = _run(edges, **kw)
    got = dict(zip(out["node"], out["scc"]))
    assert got == ref
    assert comps[0] == {0, -5}
    assert comps[big - 7] == {-big, big - 7}


def test_scc_empty_and_local_reference(ray_session):
    import ray.data as rd

    from cattle_ray.stages.graph import _scc_local, scc

    empty = rd.from_arrow(pa.table({"s": pa.array([], pa.int64()),
                                    "o": pa.array([], pa.int64())}))
    assert scc(empty).count() == 0

    # Tarjan reference on the textbook example (CLRS fig 22.9 shape)
    edges = pd.DataFrame(
        [(0, 1), (1, 2), (2, 0), (1, 3), (3, 4), (4, 3)],
        columns=["s", "o"])
    t = _scc_local(edges, "s", "o")
    comps = {}
    for n, c in zip(t["node"].to_pylist(), t["scc"].to_pylist()):
        comps.setdefault(c, set()).add(n)
    assert comps == {2: {0, 1, 2}, 4: {3, 4}}
