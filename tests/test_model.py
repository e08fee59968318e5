"""N-Quads serializer/parser + escaping (mirrors the reference's re-parse
validity gate at src/cattle.py:308-311)."""

import pyarrow as pa

from cattle_ray.model import (
    TRIPLE_SCHEMA,
    format_nquads_batch,
    parse_nquads_lines,
    triples_table,
    unescape_literal,
)


def _mk(rows):
    cols = list(zip(*rows))
    return triples_table(*[pa.array(list(c)) for c in cols])


def test_literal_escaping_roundtrip():
    nasty = 'line1\nline2\t"quoted" back\\slash\r'
    t = _mk([("http://s", "http://p", nasty, False, None, None, "http://g", None)])
    line = format_nquads_batch(t)["line"][0].as_py()
    assert "\n" not in line
    back = parse_nquads_lines([line])
    assert back["obj"][0].as_py() == nasty


def test_graphless_triple():
    t = _mk([("http://s", "http://p", "http://o", True, None, None, None, None)])
    line = format_nquads_batch(t)["line"][0].as_py()
    assert line == "<http://s> <http://p> <http://o> ."
    back = parse_nquads_lines([line])
    assert back["graph"][0].as_py() is None


def test_lang_and_datatype_terms():
    t = _mk(
        [
            ("http://s", "http://p", "hi", False, None, "en", "http://g", None),
            ("http://s", "http://p", "5", False, "http://www.w3.org/2001/XMLSchema#integer",
             None, "http://g", None),
        ]
    )
    lines = format_nquads_batch(t)["line"].to_pylist()
    assert '"hi"@en' in lines[0]
    assert '"5"^^<http://www.w3.org/2001/XMLSchema#integer>' in lines[1]
    back = parse_nquads_lines(lines)
    assert back["obj_lang"].to_pylist() == ["en", None]


def test_parse_skips_comments_blank():
    t = parse_nquads_lines(["", "# comment", "<http://s> <http://p> <http://o> ."])
    assert t.num_rows == 1
    assert t.schema.equals(TRIPLE_SCHEMA)


def test_unescape_single_pass():
    assert unescape_literal("a\\\\nb") == "a\\nb"  # escaped backslash then n
    assert unescape_literal('\\"x\\"') == '"x"'
