"""Config-driven KG validation — rule kinds + CLI surface."""

import json
import subprocess
import sys

import pyarrow as pa
import pytest


def _triples():
    rows = [
        # subjects s0..s3 with a 'rank' and an 'ent' triple; s4 lacks 'ent'
        ("s0", "rank", "1", False), ("s1", "rank", "2", False),
        ("s2", "rank", "7", False), ("s3", "rank", "x", False),
        ("s4", "rank", "3", False),
        ("s0", "ent", "https://e/0", True), ("s1", "ent", "https://e/1", True),
        ("s2", "ent", "notaniri", False), ("s3", "ent", "https://e/3", True),
        ("s0", "name", "Alpha", False), ("s1", "name", "beta", False),
    ]
    s, p, o, iri = zip(*rows)
    return pa.table({
        "subj": list(s), "pred": list(p), "obj": list(o),
        "obj_is_iri": list(iri),
        "obj_datatype": pa.array([None] * len(rows), pa.string()),
        "obj_lang": pa.array([None] * len(rows), pa.string()),
    })


RULES = [
    {"name": "rank_domain", "pred": "rank", "check": "in_set",
     "values": ["1", "2", "3"]},                       # 7, x → 2
    {"name": "rank_range", "pred": "rank", "check": "int_range",
     "lo": 1, "hi": 5},                                # 7, x → 2
    {"name": "ent_iri", "pred": "ent", "check": "iri_object"},   # 1
    {"name": "name_cap", "pred": "name", "check": "regex",
     "pattern": "[A-Z][a-z]+"},                        # beta → 1
    {"name": "rank_needs_ent", "check": "required_pred",
     "if_pred": "rank", "then_pred": "ent"},           # s4 → 1
]

WANT = {"rank_domain": 2, "rank_range": 2, "ent_iri": 1,
        "name_cap": 1, "rank_needs_ent": 1}


def test_validate_triples_all_rule_kinds(ray_session):
    import ray.data as rd

    from cattle_ray.stages.validate import validate_triples

    for parts in (1, 4):
        out = validate_triples(rd.from_arrow(_triples()).repartition(parts),
                               RULES)
        got = dict(zip(out["rule"].to_pylist(),
                       out["violations"].to_pylist()))
        assert got == WANT, parts


def test_validate_rejects_unknown_check(ray_session):
    import ray.data as rd

    from cattle_ray.stages.validate import validate_triples

    with pytest.raises(ValueError, match="unknown check"):
        validate_triples(rd.from_arrow(_triples()),
                         [{"name": "x", "pred": "p", "check": "nope"}])
    with pytest.raises(ValueError, match="needs values"):
        validate_triples(rd.from_arrow(_triples()),
                         [{"name": "x", "pred": "p", "check": "in_set"}])


def test_validate_cli(ray_session, tmp_path):
    """store on disk + rules JSON → one violations JSON object."""
    import ray.data as rd

    from cattle_ray.sources.triple_sink import write_triples_hash_partitioned

    store = str(tmp_path / "store")
    write_triples_hash_partitioned(rd.from_arrow(_triples()), store,
                                   num_partitions=4)
    rules_path = tmp_path / "rules.json"
    rules_path.write_text(json.dumps(RULES))
    r = subprocess.run(
        [sys.executable, "-m", "cattle_ray.cli", "--num-cpus", "2",
         "validate", store, str(rules_path)],
        capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert json.loads(r.stdout.strip().splitlines()[-1]) == WANT
