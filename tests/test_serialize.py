"""S7/S9: multi-format serializer registry + gzip determinism + 415 behavior
(format surface: /root/reference/src/cattle.py:45-63,313-328)."""

import gzip
import json

import pyarrow as pa
import pytest

from cattle_ray.model import triples_table
from cattle_ray.serialize import ACCEPTED_FORMATS, EXTENSION_DICT, MIME_TYPE_DICT, serialize_collected


def _table():
    return triples_table(
        pa.array(["http://s1", "http://s1", "http://s2"]),
        pa.array(["http://p1", "http://p2", "http://p1"]),
        pa.array(["http://o", "lit & <val>", "5"]),
        pa.array([True, False, False]),
        pa.array([None, None, "http://www.w3.org/2001/XMLSchema#integer"]),
        pa.array([None, "en", None]),
        pa.array(["http://g"] * 3),
        pa.array([None, None, None], pa.string()),
    )


@pytest.mark.parametrize("fmt", ACCEPTED_FORMATS)
def test_every_format_serializes(fmt):
    payload = serialize_collected(_table(), fmt)
    assert isinstance(payload, bytes) and len(payload) > 0
    assert fmt in EXTENSION_DICT or fmt in ("nt", "nquads")
    assert fmt in MIME_TYPE_DICT or fmt in ("nt", "nquads")


def test_unknown_format_raises():
    with pytest.raises(ValueError):
        serialize_collected(_table(), "not-a-format")


def test_gzip_deterministic():
    a = serialize_collected(_table(), "nquads", zip_output=True)
    b = serialize_collected(_table(), "nquads", zip_output=True)
    assert a == b  # mtime=0 → byte-identical
    assert gzip.decompress(a) == serialize_collected(_table(), "nquads")


def test_turtle_prefix_compression():
    payload = serialize_collected(_table(), "turtle").decode()
    assert "@prefix" in payload
    # repeated namespaces compressed; s1 appears as a prefixed name
    assert ":s1" in payload
    # full form still parseable alternative: prefix declarations name real namespaces
    for line in payload.splitlines():
        if line.startswith("@prefix"):
            assert line.endswith(" .") and "<http" in line


def test_trig_single_prefix_header():
    payload = serialize_collected(_table(), "trig").decode()
    assert payload.count("@prefix ns0:") <= 1
    assert "{" in payload and "}" in payload


def test_jsonld_valid_json():
    payload = serialize_collected(_table(), "json-ld")
    doc = json.loads(payload)
    ids = {n["@id"] for n in doc}
    assert ids == {"http://s1", "http://s2"}


def test_xml_escaped():
    payload = serialize_collected(_table(), "rdfxml").decode()
    assert "lit &amp; &lt;val&gt;" in payload


def test_nt_drops_graph():
    nt = serialize_collected(_table(), "nt").decode()
    nq = serialize_collected(_table(), "nquads").decode()
    assert "<http://g>" not in nt
    assert "<http://g>" in nq


def _bnode_table():
    return triples_table(
        pa.array(["http://s1", "_:b0", "_:b0"]),
        pa.array(["http://p1", "http://ns#first", "http://ns#rest"]),
        pa.array(["_:b0", "lit", "http://ns#nil"]),
        pa.array([True, False, True]),
        pa.array([None, None, None], pa.string()),
        pa.array([None, None, None], pa.string()),
        pa.array(["http://g"] * 3),
        pa.array([None, None, None], pa.string()),
    )


@pytest.mark.parametrize("fmt", ACCEPTED_FORMATS)
def test_bnodes_every_format(fmt):
    """Blank nodes must serialize validly in every document format: raw
    label in turtle-family, rdf:nodeID in rdfxml, <id> in trix."""
    payload = serialize_collected(_bnode_table(), fmt).decode()
    assert "<_:" not in payload          # never a bnode label inside <...>
    assert 'rdf:about="_:' not in payload
    assert 'rdf:resource="_:' not in payload
    if fmt in ("turtle", "n3", "trig"):
        assert "_:b0" in payload
    if fmt in ("rdfxml", "xml"):
        assert 'rdf:nodeID="b0"' in payload
    if fmt == "trix":
        assert "<id>b0</id>" in payload
    if fmt == "json-ld":
        assert {"@id": "_:b0"} in [
            v for n in json.loads(payload) for vs in n.values()
            if isinstance(vs, list) for v in vs
        ] or any(n["@id"] == "_:b0" for n in json.loads(payload))
