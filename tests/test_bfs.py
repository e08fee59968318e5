"""Frontier-at-a-time BFS: min distances, direction, early exit."""

import pyarrow as pa
import ray.data as rd

from cattle_ray.stages.graph import bfs

#       a - b - c - d     (chain)  +  a - c  (shortcut)
EDGES = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")]


def _edges(pairs, blocks=2):
    s = [p[0] for p in pairs]
    o = [p[1] for p in pairs]
    return rd.from_arrow(pa.table({"s": s, "o": o})).repartition(blocks)


def _dists(ds):
    return {r["node"]: r["dist"] for r in ds.take_all()}


def test_bfs_min_distance_wins(ray_session):
    # c is reachable at hop 2 (a→b→c) AND hop 1 (a→c): dist must be 1
    d = _dists(bfs(_edges(EDGES), ["a"], hops=3))
    assert d == {"a": 0, "b": 1, "c": 1, "d": 2}


def test_bfs_hop_cap(ray_session):
    d = _dists(bfs(_edges([("a", "b"), ("b", "c"), ("c", "d")]), ["a"], hops=2))
    assert d == {"a": 0, "b": 1, "c": 2}  # d is 3 hops out — capped


def test_bfs_directed(ray_session):
    d = _dists(bfs(_edges([("a", "b"), ("c", "b")]), ["a"], hops=3,
                   undirected=False))
    assert d == {"a": 0, "b": 1}  # c only reaches b, never reachable FROM a


def test_bfs_multi_seed_and_early_exit(ray_session):
    # two components; hops=10 must stop as soon as frontiers empty
    d = _dists(bfs(_edges([("a", "b"), ("x", "y")]), ["a", "x"], hops=10))
    assert d == {"a": 0, "x": 0, "b": 1, "y": 1}


def test_bfs_isolated_seed(ray_session):
    d = _dists(bfs(_edges([("a", "b")]), ["zzz"], hops=2))
    assert d == {"zzz": 0}
