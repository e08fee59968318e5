"""Transitive closure: tree/DAG/cycle semantics, both execution paths."""

import pyarrow as pa
import pytest
import ray.data as rd

from cattle_ray.stages.graph import transitive_closure

#: small_edges=0 forces the distributed doubling loop; default takes the
#: in-process crossover — semantics must be identical
PATHS = [{"small_edges": 0}, {}]


def _edges(pairs, blocks=2):
    return rd.from_arrow(pa.table({
        "s": [p[0] for p in pairs], "o": [p[1] for p in pairs]
    })).repartition(blocks)


def _pairs(ds):
    return sorted((r["s"], r["o"]) for r in ds.take_all())


@pytest.mark.parametrize("kw", PATHS)
def test_chain_closure(ray_session, kw):
    got = _pairs(transitive_closure(_edges([("a", "b"), ("b", "c"), ("c", "d")]),
                                    **kw))
    assert got == [("a", "b"), ("a", "c"), ("a", "d"),
                   ("b", "c"), ("b", "d"), ("c", "d")]


@pytest.mark.parametrize("kw", PATHS)
def test_diamond_dag_dedups_paths(ray_session, kw):
    # two distinct paths a→d collapse to ONE closure pair
    got = _pairs(transitive_closure(
        _edges([("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")]), **kw))
    assert got == [("a", "b"), ("a", "c"), ("a", "d"),
                   ("b", "d"), ("c", "d")]


@pytest.mark.parametrize("kw", PATHS)
def test_cycle_reaches_self(ray_session, kw):
    got = _pairs(transitive_closure(_edges([("a", "b"), ("b", "a")]), **kw))
    assert got == [("a", "a"), ("a", "b"), ("b", "a"), ("b", "b")]


def test_paths_agree_on_random_dag(ray_session):
    # 60-node layered DAG: i → i//2 tree plus shortcut edges
    pairs = [(f"n{i}", f"n{i // 2}") for i in range(1, 60)]
    pairs += [(f"n{i}", f"n{max(0, i - 7)}") for i in range(7, 60, 11)]
    a = _pairs(transitive_closure(_edges(pairs), small_edges=0))
    b = _pairs(transitive_closure(_edges(pairs)))
    assert a == b and len(a) >= len(pairs)
