"""Turtle reader: serializer roundtrip + hand-written forms."""

import pyarrow as pa
import pytest

from cattle_ray.sources.turtle import TurtleError, parse_turtle, read_turtle
from cattle_ray.stages.sparql import RDF_TYPE


def _table(rows):
    cols = list(zip(*rows))
    return pa.table({
        "subj": pa.array(cols[0], pa.string()),
        "pred": pa.array(cols[1], pa.string()),
        "obj": pa.array(cols[2], pa.string()),
        "obj_is_iri": pa.array(cols[3], pa.bool_()),
        "obj_datatype": pa.array(cols[4], pa.string()),
        "obj_lang": pa.array(cols[5], pa.string()),
    })


def test_serializer_roundtrip():
    from cattle_ray.serialize import _DOC_SERIALIZERS as SERIALIZERS

    rows = [
        ("https://ex.org/a", RDF_TYPE, "https://ex.org/Doc",
         True, None, None),
        ("https://ex.org/a", "https://ex.org/def/name", "Ali\"ce\n",
         False, None, "en"),
        ("https://ex.org/a", "https://ex.org/def/rank", "3",
         False, "http://www.w3.org/2001/XMLSchema#integer", None),
        ("_:b0", "https://ex.org/def/seen", "plain", False, None, None),
    ]
    text = SERIALIZERS["turtle"](_table(rows))
    got = parse_turtle(text)
    assert sorted(map(tuple, got.to_pylist()[0].items())) is not None
    back = [tuple(r.values()) for r in got.to_pylist()]
    assert sorted(back) == sorted(rows)


def test_hand_written_forms(tmp_path):
    text = """
    @prefix ex: <https://ex.org/> .
    PREFIX d: <https://ex.org/def/>
    ex:a a ex:Doc ; d:rank 3, 4.5 ; d:ok true .
    ex:b d:note "x"@en-GB .
    ex:c.d d:near ex:a.
    """
    t = parse_turtle(text)
    rows = {tuple(r.values()) for r in t.to_pylist()}
    X = "http://www.w3.org/2001/XMLSchema#"
    assert ("https://ex.org/a", RDF_TYPE, "https://ex.org/Doc",
            True, None, None) in rows
    assert ("https://ex.org/a", "https://ex.org/def/rank", "3",
            False, X + "integer", None) in rows
    assert ("https://ex.org/a", "https://ex.org/def/rank", "4.5",
            False, X + "decimal", None) in rows
    assert ("https://ex.org/a", "https://ex.org/def/ok", "true",
            False, X + "boolean", None) in rows
    assert ("https://ex.org/b", "https://ex.org/def/note", "x",
            False, None, "en-GB") in rows
    # pname ending in a dot-containing local, terminator without space
    assert ("https://ex.org/c.d", "https://ex.org/def/near",
            "https://ex.org/a", True, None, None) in rows

    p = tmp_path / "f.ttl"
    p.write_text(text)
    assert read_turtle(str(p)).num_rows == t.num_rows


def test_rejections():
    with pytest.raises(TurtleError, match="@base"):
        parse_turtle("@base <https://ex.org/> .")
    with pytest.raises(TurtleError, match="anonymous"):
        parse_turtle("@prefix ex: <urn:x:> . ex:a ex:p [] .")
    with pytest.raises(TurtleError, match="collections"):
        parse_turtle("@prefix ex: <urn:x:> . ex:a ex:p (1 2) .")
    with pytest.raises(TurtleError, match="vocabulary-sized|triples"):
        import cattle_ray.sources.turtle as tt
        old = tt.MAX_TURTLE_ROWS
        tt.MAX_TURTLE_ROWS = 1
        try:
            parse_turtle('@prefix ex: <urn:x:> . ex:a ex:p "1", "2" .')
        finally:
            tt.MAX_TURTLE_ROWS = old


def test_ontology_feeds_reasoner(ray_session):
    """The user story: load schema.ttl, materialize the closure."""
    import ray.data as rd

    from cattle_ray.stages.reason import rdfs_materialize

    schema = parse_turtle("""
    @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
    @prefix ex: <https://ex.org/> .
    ex:B rdfs:subClassOf ex:A . ex:C rdfs:subClassOf ex:B .
    """)
    inst = pa.table({"subj": ["x"], "pred": [RDF_TYPE],
                     "obj": ["https://ex.org/C"]})
    out = rdfs_materialize(rd.from_arrow(inst),
                           schema.select(["subj", "pred", "obj"]))
    got = {(r["subj"], r["obj"]) for r in out.to_pandas().to_dict("records")}
    assert got == {("x", "https://ex.org/C"), ("x", "https://ex.org/B"),
                   ("x", "https://ex.org/A")}
