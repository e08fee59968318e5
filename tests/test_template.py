"""Unit tests: template compile/render, IRI encoding, datatype formatting
(SURVEY.md §5.2-2)."""

import pyarrow as pa
import pytest

from cattle_ray.model import XSD
from cattle_ray.template import (
    CompiledTemplate,
    MappingTemplate,
    format_literal_array,
    iri_encode_array,
    resolve_datatype,
)


def test_compile_segments():
    t = CompiledTemplate.compile("https://ex.org/{A}/x/{_row}")
    assert t.columns == ("A", "_row")
    assert t.segments[0] == "https://ex.org/"


def test_render_vectorized():
    t = CompiledTemplate.compile("https://ex.org/id/{name}/r{_row}")
    batch = pa.table({"name": ["a", "b c"], "_row": [1, 2]})
    out = t.render(batch).to_pylist()
    assert out == ["https://ex.org/id/a/r1", "https://ex.org/id/b%20c/r2"]


def test_render_constant():
    t = CompiledTemplate.compile("https://ex.org/p")
    assert t.is_constant
    assert t.render(pa.table({"x": [1, 2, 3]})).to_pylist() == ["https://ex.org/p"] * 3


def test_iri_encode_only_when_needed():
    arr = pa.array(["clean", "has space", "Ünïcode", None])
    out = iri_encode_array(arr).to_pylist()
    assert out[0] == "clean"
    assert out[1] == "has%20space"
    assert "%" in out[2]
    assert out[3] is None


def test_resolve_datatype():
    assert resolve_datatype("xsd:decimal") == XSD + "decimal"
    assert resolve_datatype("gYear") == XSD + "gYear"
    assert resolve_datatype("http://ex.org/dt") == "http://ex.org/dt"
    assert resolve_datatype(None) is None


def test_group_char_strip():
    meta = {
        "tableSchema": {
            "columns": [
                {"name": "Int", "datatype": "xsd:decimal", "csvw:format": {"groupChar": ","}}
            ]
        }
    }
    tmpl = MappingTemplate.from_dict(meta)
    spec = tmpl.columns[0]
    arr, ok = format_literal_array(pa.array(["131,063", "7", "bad"]), spec)
    assert arr.to_pylist() == ["131063", "7", "bad"]
    assert ok.to_pylist() == [True, True, False]


def test_lang_only_for_strings():
    meta = {
        "tableSchema": {
            "columns": [
                {"name": "a", "datatype": "xsd:integer", "lang": "en"},
                {"name": "b", "datatype": "xsd:string", "lang": "en"},
            ]
        }
    }
    tmpl = MappingTemplate.from_dict(meta)
    assert tmpl.columns[0].lang is None
    assert tmpl.columns[1].lang == "en"


def test_separator_explode_with_value_url():
    """separator + valueUrl: each split element renders its own IRI
    (COW multi-valued cells — SURVEY.md §1.2 separators)."""
    from cattle_ray.stages.convert import convert_batch

    meta = {
        "@id": "https://ex.org/t",
        "aboutUrl": "https://ex.org/t/row/{_row}",
        "tableSchema": {
            "columns": [
                {"name": "tags", "separator": "|",
                 "propertyUrl": "https://ex.org/def/tag",
                 "valueUrl": "https://ex.org/id/tag/{tags}"},
            ]
        },
    }
    batch = pa.table({"tags": ["a|b c|d", "x", ""], "_row": [1, 2, 3]})
    out = convert_batch(batch, MappingTemplate.from_dict(meta), graph="https://g")
    assert out.num_rows == 4  # 3 split values + 1 single; empty cell skipped
    objs = out["obj"].to_pylist()
    assert "https://ex.org/id/tag/a" in objs
    assert "https://ex.org/id/tag/b%20c" in objs  # element IRI-encoded
    assert "https://ex.org/id/tag/x" in objs


def test_separator_explode_literals():
    from cattle_ray.stages.convert import convert_batch

    meta = {
        "@id": "https://ex.org/t",
        "aboutUrl": "https://ex.org/t/row/{_row}",
        "tableSchema": {
            "columns": [
                {"name": "nums", "separator": ",", "datatype": "xsd:integer",
                 "propertyUrl": "https://ex.org/def/n"},
            ]
        },
    }
    batch = pa.table({"nums": ["1,2,3"], "_row": [1]})
    out = convert_batch(batch, MappingTemplate.from_dict(meta), graph="https://g")
    assert out["obj"].to_pylist() == ["1", "2", "3"]
    assert out["subj"].to_pylist() == ["https://ex.org/t/row/1"] * 3


def test_missing_column_raises():
    t = CompiledTemplate.compile("x{nope}")
    with pytest.raises(KeyError):
        t.render(pa.table({"a": [1]}))


def test_collection_url_rdf_list():
    """csvw:collectionUrl: ordered RDF list with deterministic bnodes."""
    from cattle_ray.model import RDF_NS, format_nquads_batch, parse_nquads_lines
    from cattle_ray.stages.convert import convert_batch

    meta = {
        "@id": "https://ex.org/t",
        "aboutUrl": "https://ex.org/t/row/{_row}",
        "tableSchema": {
            "columns": [
                {"name": "tags", "separator": "|", "csvw:collectionUrl": True,
                 "propertyUrl": "https://ex.org/def/tags"},
            ]
        },
    }
    batch = pa.table({"tags": ["a|b", "", "x", "|"], "_row": [1, 2, 3, 4]})
    out = convert_batch(batch, MappingTemplate.from_dict(meta), graph="https://g")
    # row1: head + 2×(first,rest) = 5; row2 empty cell → skipped entirely
    # (engine-wide skip-on-empty); row3: head + 2 = 3; row4 "|" → empty list
    # after element filtering → rdf:nil head only
    assert out.num_rows == 5 + 0 + 3 + 1
    d = out.to_pylist()
    by_pred = {}
    for r in d:
        by_pred.setdefault(r["pred"], []).append(r)
    heads = by_pred["https://ex.org/def/tags"]
    assert any(r["obj"] == RDF_NS + "nil" for r in heads)  # "|" cell → nil
    first_objs = [r["obj"] for r in by_pred[RDF_NS + "first"]]
    assert set(first_objs) == {"a", "b", "x"}
    # deterministic: same input → same bnode labels
    out2 = convert_batch(batch, MappingTemplate.from_dict(meta), graph="https://g")
    assert out.to_pylist() == out2.to_pylist()
    # bnode round-trip through N-Quads
    lines = format_nquads_batch(out)["line"].to_pylist()
    assert any(l.startswith("_:c") for l in lines)
    back = parse_nquads_lines(lines)
    assert back.num_rows == out.num_rows


def test_collection_bnodes_distinct_per_row():
    """Two rows rendering the SAME (aboutUrl, propertyUrl) — aboutUrl without
    {_row} — must get distinct list chains per distinct cell (regression:
    labels hashed from (subj, pred) only merged/corrupted the lists)."""
    from cattle_ray.model import RDF_NS
    from cattle_ray.stages.convert import convert_batch

    meta = {
        "@id": "https://ex.org/t",
        "aboutUrl": "https://ex.org/country/{iso}",
        "tableSchema": {
            "columns": [
                {"name": "tags", "separator": "|", "csvw:collectionUrl": True,
                 "propertyUrl": "https://ex.org/def/tags"},
            ]
        },
    }
    # same iso → same subject for both rows, different cells
    batch = pa.table({"iso": ["BE", "BE"], "tags": ["a|b", "c|d"], "_row": [1, 2]})
    out = convert_batch(batch, MappingTemplate.from_dict(meta), graph="https://g")
    rows = out.to_pylist()
    firsts = [r for r in rows if r["pred"] == RDF_NS + "first"]
    # each bnode carries exactly ONE rdf:first value
    by_subj = {}
    for r in firsts:
        by_subj.setdefault(r["subj"], set()).add(r["obj"])
    assert all(len(v) == 1 for v in by_subj.values()), by_subj
    assert {o for v in by_subj.values() for o in v} == {"a", "b", "c", "d"}
    # two distinct heads hang off the shared subject
    heads = [r["obj"] for r in rows if r["pred"] == "https://ex.org/def/tags"]
    assert len(set(heads)) == 2


# ---------------------------------------------------------------------------
# COW-style {{ }} expression templates (VERDICT r2 "Missing #1")


def test_expr_string_ops_and_interleave():
    t = CompiledTemplate.compile(
        "https://ex.org/{kind}/{{ name.lower().replace(' ', '-') }}/r{_row}")
    assert set(t.columns) >= {"kind", "name"}
    batch = pa.table({"kind": ["p", "p"], "name": ["Ada Lovelace", "Bob"],
                      "_row": [1, 2]})
    out = t.render(batch).to_pylist()
    assert out == ["https://ex.org/p/ada-lovelace/r1",
                   "https://ex.org/p/bob/r2"]


def test_expr_conditional_and_arithmetic():
    t = CompiledTemplate.compile(
        "https://ex.org/{{ 'even' if int(n) % 2 == 0 else 'odd' }}/"
        "{{ int(n) * 10 }}")
    batch = pa.table({"n": ["1", "2"]})
    assert t.render(batch).to_pylist() == [
        "https://ex.org/odd/10", "https://ex.org/even/20"]


def test_expr_none_skips_whole_template():
    """Expression returning None → NULL render (conditional skip), and the
    conversion drops those triples."""
    from cattle_ray.stages.convert import convert_batch

    t = CompiledTemplate.compile(
        "https://ex.org/{{ code if code != 'NA' else None }}")
    batch = pa.table({"code": ["BE", "NA", "FR"]})
    assert t.render(batch).to_pylist() == [
        "https://ex.org/BE", None, "https://ex.org/FR"]

    meta = {
        "@id": "https://ex.org/t",
        "tableSchema": {"columns": [
            {"name": "code",
             "valueUrl": "https://ex.org/c/{{ code if code != 'NA' else None }}",
             "propertyUrl": "https://ex.org/def/code"},
        ]},
    }
    out = convert_batch(batch.append_column("_row", pa.array([1, 2, 3])),
                        MappingTemplate.from_dict(meta), graph="https://g")
    objs = out["obj"].to_pylist()
    assert objs == ["https://ex.org/c/BE", "https://ex.org/c/FR"]


def test_expr_runtime_error_yields_null_not_crash():
    t = CompiledTemplate.compile("https://ex.org/{{ int(v) }}")
    batch = pa.table({"v": ["3", "boom"]})
    assert t.render(batch).to_pylist() == ["https://ex.org/3", None]


def test_expr_constant_expression_evaluates():
    t = CompiledTemplate.compile("https://ex.org/{{ 1 + 2 }}")
    assert not t.is_constant
    assert t.render(pa.table({"x": ["a", "b"]})).to_pylist() == [
        "https://ex.org/3"] * 2


def test_expr_iri_encoding_applies():
    t = CompiledTemplate.compile("https://ex.org/{{ name.upper() }}")
    batch = pa.table({"name": ["a b"]})
    assert t.render(batch).to_pylist() == ["https://ex.org/A%20B"]


def test_expr_rejects_unsafe():
    for bad in [
        "__import__('os')",                 # name starting with _
        "name.__class__",                   # dunder attribute
        "(lambda: 1)()",                    # lambda
        "[x for x in name]",                # comprehension
        "open('/etc/passwd')",              # unknown callable name is a
                                            # column ref, but calling a
                                            # string fails safe → still
                                            # rejected via Attribute rule?
    ]:
        if bad == "open('/etc/passwd')":
            # 'open' parses as a column name; compile succeeds but eval of
            # a missing column raises KeyError at render — never reaches
            # the real builtin (empty __builtins__)
            t = CompiledTemplate.compile("x{{ open('/e') }}")
            with pytest.raises(KeyError):
                t.render(pa.table({"y": ["1"]}))
            continue
        with pytest.raises(ValueError):
            CompiledTemplate.compile("x{{ %s }}" % bad)


def test_expr_missing_column_raises():
    t = CompiledTemplate.compile("x{{ nope.lower() }}")
    with pytest.raises(KeyError):
        t.render(pa.table({"y": ["1"]}))
