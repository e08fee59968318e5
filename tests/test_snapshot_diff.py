"""Snapshot diff: exact added/removed delta, null-safe identity, set semantics."""

import pyarrow as pa
import ray.data as rd

from cattle_ray.stages.dedup import snapshot_diff


SCHEMA = pa.schema([("k", pa.string()), ("v", pa.string())])


def _ds(rows, blocks=2):
    a = [r[0] for r in rows]
    b = [r[1] for r in rows]
    t = pa.table({"k": pa.array(a, pa.string()), "v": pa.array(b, pa.string())},
                 schema=SCHEMA)
    return rd.from_arrow(t).repartition(blocks)


def _delta(old, new, **kw):
    out = snapshot_diff(old, new, ["k", "v"], **kw).take_all()
    return sorted(((r["k"], r["v"], r["change"]) for r in out),
                  key=lambda t: (t[0], t[1] or "", t[2]))


def test_added_and_removed(ray_session):
    old = _ds([("a", "1"), ("b", "2"), ("c", "3")])
    new = _ds([("b", "2"), ("c", "CHANGED"), ("d", "4")])
    assert _delta(old, new) == [
        ("a", "1", "removed"),
        ("c", "3", "removed"),
        ("c", "CHANGED", "added"),
        ("d", "4", "added"),
    ]


def test_identical_snapshots_empty_delta(ray_session):
    rows = [("a", "1"), ("b", "2")]
    assert _delta(_ds(rows), _ds(rows)) == []


def test_null_values_compare_equal_to_null(ray_session):
    # a null cell is part of the row identity (sentinel join): (a, NULL) in
    # both sides is unchanged; NULL -> value is a remove+add pair
    old = _ds([("a", None), ("b", None)])
    new = _ds([("a", None), ("b", "2")])
    assert _delta(old, new) == [("b", None, "removed"), ("b", "2", "added")]


def test_set_semantics_within_one_side(ray_session):
    # duplicate rows inside one snapshot collapse; no phantom delta
    old = _ds([("a", "1"), ("a", "1"), ("b", "2")])
    new = _ds([("a", "1")])
    assert _delta(old, new) == [("b", "2", "removed")]


def test_layout_invariant(ray_session):
    old = [("x%d" % i, str(i)) for i in range(50)]
    new = [("x%d" % i, str(i if i % 3 else -i)) for i in range(40)]
    a = _delta(_ds(old, 1), _ds(new, 1))
    b = _delta(_ds(old, 5), _ds(new, 3))
    assert a == b and len(a) > 0
