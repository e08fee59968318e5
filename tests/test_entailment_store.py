"""Incremental RDFS maintenance over tracked-store deltas: the
entailment store's build / stale-flag / DRed-refresh lifecycle must
converge to exactly the closure of the current asserted store."""

import pyarrow as pa
import pytest

from cattle_ray.stages.reason import (RDF_TYPE, RDFS_DOMAIN, RDFS_RANGE,
                                      RDFS_SUBCLASS,
                                      build_entailment_store,
                                      refresh_entailment_store)

EX = "urn:ex:"

SCHEMA = pa.table({
    "subj": [EX + "Student", EX + "teaches", EX + "teaches"],
    "pred": [RDFS_SUBCLASS, RDFS_DOMAIN, RDFS_RANGE],
    "obj": [EX + "Person", EX + "Teacher", EX + "Student"],
})


def _triples(rows):
    import ray.data as rd

    s, p, o = zip(*rows)
    return rd.from_arrow(pa.table({
        "subj": list(s), "pred": list(p), "obj": list(o)}))


BASE = [
    ("s1", RDF_TYPE, EX + "Student"),
    ("s1", EX + "teaches", "s2"),
    ("s3", RDF_TYPE, EX + "Person"),
]


def _closure_set(store_dir):
    from cattle_ray.sources.triple_sink import read_store_asof

    rows = read_store_asof(store_dir).take_all()
    return {(r["subj"], r["pred"], r["obj"]) for r in rows}


def _build_primary(tmp_path, name="primary"):
    from cattle_ray.sources.triple_sink import \
        write_triples_hash_partitioned

    pdir = str(tmp_path / name)
    write_triples_hash_partitioned(_triples(BASE), pdir, num_partitions=4)
    return pdir


def test_build_entailment_store_closure(ray_session, tmp_path):
    pdir = _build_primary(tmp_path)
    edir = str(tmp_path / "ent")
    build_entailment_store(pdir, edir, schema=SCHEMA)
    got = _closure_set(edir)
    assert got == {
        ("s1", RDF_TYPE, EX + "Student"),
        ("s1", RDF_TYPE, EX + "Person"),       # rdfs9 via subclass
        ("s1", EX + "teaches", "s2"),
        ("s1", RDF_TYPE, EX + "Teacher"),      # rdfs2 domain
        ("s2", RDF_TYPE, EX + "Student"),      # rdfs3 range
        ("s2", RDF_TYPE, EX + "Person"),       # range + subclass
        ("s3", RDF_TYPE, EX + "Person"),
    }
    from cattle_ray.sources.triple_sink import index_is_stale

    assert not index_is_stale(edir)


def test_refresh_dred_matches_full_rebuild(ray_session, tmp_path):
    """Merge + delete on the primary, DRed refresh on the entailment
    store: the over-deleted facts still derivable from surviving or
    newly-added evidence come back; facts with no remaining evidence
    stay gone; the result equals a from-scratch rebuild."""
    from cattle_ray.sources.triple_sink import (
        delete_exact_rows, index_is_stale, merge_triples_hash_partitioned)

    pdir = _build_primary(tmp_path)
    edir = str(tmp_path / "ent")
    build_entailment_store(pdir, edir, schema=SCHEMA)

    # tracked mutations: a new teaches edge into s2 plus an asserted
    # type, then retract the ORIGINAL teaches edge
    merge_triples_hash_partitioned(
        _triples([("s4", EX + "teaches", "s2"),
                  ("s2", RDF_TYPE, EX + "Student")]),
        pdir, num_partitions=4, track_generations=True)
    delete_exact_rows(pdir, pa.table({
        "subj": ["s1"], "pred": [EX + "teaches"], "obj": ["s2"]}))
    assert index_is_stale(edir)

    summary = refresh_entailment_store(edir)
    assert summary["applied_gens"] == 2
    assert summary["n_overdeleted"] > 0 and summary["n_rederived"] > 0
    assert not index_is_stale(edir)

    got = _closure_set(edir)
    # (s1 type Teacher) lost its only evidence; (s2 type Student/Person)
    # re-derive from the new s4 edge (and the asserted type)
    assert ("s1", RDF_TYPE, EX + "Teacher") not in got
    assert ("s1", EX + "teaches", "s2") not in got
    assert ("s2", RDF_TYPE, EX + "Student") in got
    assert ("s2", RDF_TYPE, EX + "Person") in got
    assert ("s4", RDF_TYPE, EX + "Teacher") in got

    # ground truth: full rebuild over the current primary
    e2 = str(tmp_path / "ent_rebuilt")
    build_entailment_store(pdir, e2, schema=SCHEMA)
    assert got == _closure_set(e2)

    # idempotent: nothing left to apply
    s2 = refresh_entailment_store(edir)
    assert s2["applied_gens"] == 0


def test_refresh_with_fresh_obj_index_route(ray_session, tmp_path):
    """A fresh obj-routed secondary index narrows the re-derivation's
    obj-side gather to point reads; the result is identical."""
    from cattle_ray.sources.triple_sink import (build_secondary_index,
                                                delete_exact_rows,
                                                merge_triples_hash_partitioned)

    pdir = _build_primary(tmp_path)
    edir = str(tmp_path / "ent")
    build_entailment_store(pdir, edir, schema=SCHEMA)
    merge_triples_hash_partitioned(
        _triples([("s4", EX + "teaches", "s2")]), pdir,
        num_partitions=4, track_generations=True)
    delete_exact_rows(pdir, pa.table({
        "subj": ["s1"], "pred": [EX + "teaches"], "obj": ["s2"]}))

    idx = str(tmp_path / "obj_idx")
    build_secondary_index(pdir, idx, key="obj")  # fresh: built after
    refresh_entailment_store(edir, obj_index_dir=idx)

    e2 = str(tmp_path / "ent_rebuilt")
    build_entailment_store(pdir, e2, schema=SCHEMA)
    assert _closure_set(edir) == _closure_set(e2)


def test_refresh_refuses_schema_mutation(ray_session, tmp_path):
    """A delta that touches the RDFS vocabulary invalidates per-row
    increments globally — the refresh must demand a rebuild."""
    from cattle_ray.sources.triple_sink import \
        merge_triples_hash_partitioned

    pdir = _build_primary(tmp_path)
    edir = str(tmp_path / "ent")
    build_entailment_store(pdir, edir, schema=SCHEMA)
    merge_triples_hash_partitioned(
        _triples([(EX + "Teacher", RDFS_SUBCLASS, EX + "Person")]),
        pdir, num_partitions=4, track_generations=True)
    with pytest.raises(ValueError, match="vocabulary"):
        refresh_entailment_store(edir)
    # the demanded rebuild resolves it
    build_entailment_store(pdir, edir, schema=pa.concat_tables([
        SCHEMA, pa.table({"subj": [EX + "Teacher"],
                          "pred": [RDFS_SUBCLASS],
                          "obj": [EX + "Person"]})]))
    assert ("s1", RDF_TYPE, EX + "Person") in _closure_set(edir)


def test_refresh_requires_provenance_and_rejects_backwards(
        ray_session, tmp_path):
    from cattle_ray.sources.triple_sink import \
        write_triples_hash_partitioned

    pdir = _build_primary(tmp_path)
    plain = str(tmp_path / "plain")
    write_triples_hash_partitioned(_triples(BASE), plain,
                                   num_partitions=4)
    with pytest.raises(ValueError, match="provenance"):
        refresh_entailment_store(plain)

    edir = str(tmp_path / "ent")
    build_entailment_store(pdir, edir, schema=SCHEMA)
    # simulate a compacted/replaced primary: generation went backwards
    from cattle_ray.sources.triple_sink import _load_meta, _save_meta

    m = _load_meta(edir)
    m["source_generation"] = 7
    _save_meta(edir, m)
    with pytest.raises(ValueError, match="compacted or replaced"):
        refresh_entailment_store(edir)


OWL_SCHEMA = None  # built lazily (imports at module top stay minimal)


def _owl_schema():
    from cattle_ray.stages.reason import (OWL_INVERSE_OF, OWL_SYMMETRIC,
                                          RDF_TYPE)

    return pa.table({
        "subj": [EX + "Student", EX + "teaches", EX + "teaches",
                 EX + "teaches", EX + "knows"],
        "pred": [RDFS_SUBCLASS, RDFS_DOMAIN, RDFS_RANGE,
                 OWL_INVERSE_OF, RDF_TYPE],
        "obj": [EX + "Person", EX + "Teacher", EX + "Student",
                EX + "taughtBy", OWL_SYMMETRIC],
    })


def test_owl_lite_entailment_store_build_and_refresh(ray_session,
                                                     tmp_path):
    """A schema with single-premise OWL axioms (inverseOf + Symmetric)
    rides the SAME incremental path: build uses the combined fixpoint
    kernel, DRed refresh converges to exactly a from-scratch rebuild —
    including inverse-derived facts whose evidence sits on the OBJECT
    side of the deleted fact's subject."""
    from cattle_ray.sources.triple_sink import (
        delete_exact_rows, merge_triples_hash_partitioned)

    pdir = _build_primary(tmp_path)
    # add a symmetric edge to the primary before building
    merge_triples_hash_partitioned(
        _triples([("s5", EX + "knows", "s6")]), pdir, num_partitions=4)
    edir = str(tmp_path / "ent")
    build_entailment_store(pdir, edir, schema=_owl_schema())
    got = _closure_set(edir)
    assert ("s2", EX + "taughtBy", "s1") in got      # inverseOf
    assert ("s6", EX + "knows", "s5") in got         # symmetric
    assert ("s1", RDF_TYPE, EX + "Teacher") in got   # rdfs2 still fires

    # mutate: new teaches edge + retract the original one
    merge_triples_hash_partitioned(
        _triples([("s4", EX + "teaches", "s2")]), pdir,
        num_partitions=4, track_generations=True)
    delete_exact_rows(pdir, pa.table({
        "subj": ["s1"], "pred": [EX + "teaches"], "obj": ["s2"]}))
    summary = refresh_entailment_store(edir)
    assert summary["applied_gens"] == 2
    got = _closure_set(edir)
    assert ("s2", EX + "taughtBy", "s1") not in got  # evidence gone
    assert ("s2", EX + "taughtBy", "s4") in got      # new evidence
    e2 = str(tmp_path / "ent_rebuilt")
    build_entailment_store(pdir, e2, schema=_owl_schema())
    assert got == _closure_set(e2)


def test_owl_multipremise_axioms_refuse_incremental(ray_session,
                                                    tmp_path):
    """Transitive / propertyChain axioms are multi-premise — the
    entailment store refuses them with the rebuild rationale."""
    from cattle_ray.stages.reason import (OWL_TRANSITIVE, RDF_TYPE)

    pdir = _build_primary(tmp_path)
    edir = str(tmp_path / "ent")
    bad = pa.table({
        "subj": [EX + "teaches"], "pred": [RDF_TYPE],
        "obj": [OWL_TRANSITIVE]})
    with pytest.raises(ValueError, match="multi-premise"):
        build_entailment_store(pdir, edir, schema=bad)


def test_owl_axiom_delta_demands_rebuild(ray_session, tmp_path):
    """A tracked delta that adds an OWL axiom row invalidates per-row
    increments, same as an RDFS vocabulary change."""
    from cattle_ray.sources.triple_sink import \
        merge_triples_hash_partitioned
    from cattle_ray.stages.reason import OWL_INVERSE_OF

    pdir = _build_primary(tmp_path)
    edir = str(tmp_path / "ent")
    build_entailment_store(pdir, edir, schema=_owl_schema())
    merge_triples_hash_partitioned(
        _triples([(EX + "p", OWL_INVERSE_OF, EX + "q")]),
        pdir, num_partitions=4, track_generations=True)
    with pytest.raises(ValueError, match="vocabulary"):
        refresh_entailment_store(edir)
