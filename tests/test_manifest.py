"""R3 resume semantics (SURVEY.md §5.2-4): kill after k partitions, rerun,
assert committed partitions skipped and final output identical."""

import json
import os

import pytest

from cattle_ray.state.manifest import Manifest, content_hash, run_partitioned, template_hash


def _partitions(n=6):
    return [
        {"part_id": i, "input_part_hash": content_hash(f"part{i}".encode())}
        for i in range(n)
    ]


def test_resume_skips_committed(tmp_path):
    man = Manifest(str(tmp_path / "manifest.jsonl"))
    tmpl_h = template_hash({"a": 1})
    ran = []

    def run_ok(part):
        ran.append(part["part_id"])
        out = tmp_path / f"out{part['part_id']}.parquet"
        out.write_text("data")
        return str(out), 100, 250

    class Boom(Exception):
        pass

    def run_failing(part):
        if part["part_id"] >= 3:
            raise Boom()
        return run_ok(part)

    # first run dies after 3 partitions
    with pytest.raises(Boom):
        run_partitioned(_partitions(), run_failing, man, tmpl_h)
    assert ran == [0, 1, 2]
    assert len(man.load()) == 3

    # rerun completes ONLY the missing ones
    committed = run_partitioned(_partitions(), run_ok, man, tmpl_h)
    assert [r["part_id"] for r in committed] == [3, 4, 5]
    assert ran == [0, 1, 2, 3, 4, 5]  # no partition ran twice
    assert len(man.load()) == 6


def test_template_change_invalidates(tmp_path):
    man = Manifest(str(tmp_path / "m.jsonl"))
    h1, h2 = template_hash({"v": 1}), template_hash({"v": 2})

    def run(part):
        return "out", 1, 1

    run_partitioned(_partitions(2), run, man, h1)
    # different template → all partitions pending again
    assert len(man.pending(_partitions(2), h2)) == 2
    assert len(man.pending(_partitions(2), h1)) == 0


def test_manifest_rows_carry_metrics(tmp_path):
    man = Manifest(str(tmp_path / "m.jsonl"))
    rows = run_partitioned(
        _partitions(1), lambda p: ("o", 10, 25), man, template_hash({})
    )
    r = rows[0]
    assert r["n_rows_in"] == 10 and r["n_triples_out"] == 25
    assert r["wall_ms"] >= 0
    on_disk = [json.loads(l) for l in open(man.path)]
    assert on_disk[0]["status"] == "committed"


def test_commit_is_atomic_append(tmp_path):
    man = Manifest(str(tmp_path / "m.jsonl"))
    tmpl_h = template_hash({})
    for i in range(10):
        man.commit(
            {
                "part_id": i, "input_part_hash": "h", "template_hash": tmpl_h,
                "out_path": "o", "n_rows_in": 1, "n_triples_out": 1,
                "wall_ms": 0.1, "status": "committed", "run_ts": "t",
            }
        )
    assert len(man.load()) == 10


def test_manifest_tolerates_torn_trailing_line(tmp_path):
    """A crash mid-append leaves a torn final JSONL line; load() must skip it
    (with a warning) instead of raising and blocking resume."""
    import warnings

    from cattle_ray.state.manifest import Manifest

    m = Manifest(str(tmp_path / "m.jsonl"))
    row = {k: "x" for k in
           ("part_id", "input_part_hash", "template_hash", "out_path", "run_ts")}
    row.update(n_rows_in=1, n_triples_out=2, wall_ms=3, status="committed")
    m.commit(row)
    with open(m.path, "a") as f:
        f.write('{"part_id": "torn, no clo')  # simulated crash mid-append
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        done = m.load()
    assert len(done) == 1  # the committed row survives, torn line skipped
    assert any("torn" in str(x.message) for x in w)


def test_commit_after_torn_line_preserves_both(tmp_path):
    """A commit issued on RESUME (after a crash left a torn trailing line)
    must not glue onto the fragment — both the old committed rows and the
    new commit must survive load()."""
    from cattle_ray.state.manifest import Manifest

    m = Manifest(str(tmp_path / "m.jsonl"))

    def row(pid):
        r = {k: "x" for k in
             ("input_part_hash", "template_hash", "out_path", "run_ts")}
        r.update(part_id=pid, n_rows_in=1, n_triples_out=2, wall_ms=3,
                 status="committed")
        return r

    m.commit(row("p1"))
    with open(m.path, "a") as f:
        f.write('{"part_id": "torn')  # crash mid-append, no newline
    m.commit(row("p2"))  # the resume run's first commit
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        done = m.load()
    assert {k[0] for k in done} == {"p1", "p2"}
