"""Property tests (SURVEY.md §5.2-5): random small tables × random templates
→ invariants of the conversion kernel, extractor, and N-Quads round-trip."""

import string

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from cattle_ray.model import QUAD_KEY, format_nquads_batch, parse_nquads_lines
from cattle_ray.stages.convert import convert_batch
from cattle_ray.stages.extract import extract_tables_bytes, extract_text_bytes, render_html
from cattle_ray.template import MappingTemplate

cell = st.text(
    alphabet=string.ascii_letters + string.digits + " .,;:!?'\"&<>\\/-_\n\tÄöü",
    max_size=30,
)
colname = st.sampled_from(["A", "B", "C"])


@st.composite
def table_and_template(draw):
    n = draw(st.integers(1, 12))
    cols = ["A", "B", "C"]
    data = {c: draw(st.lists(cell, min_size=n, max_size=n)) for c in cols}
    data["_row"] = list(range(1, n + 1))
    specs = []
    for c in cols:
        use_value_url = draw(st.booleans())
        spec = {"name": c, "propertyUrl": f"https://ex.org/def/{c}"}
        if use_value_url:
            spec["valueUrl"] = f"https://ex.org/id/{{{c}}}"
        else:
            spec["datatype"] = draw(st.sampled_from(["xsd:string", "xsd:integer"]))
        specs.append(spec)
    if draw(st.booleans()):
        specs.append(
            {"name": "A", "virtual": True, "propertyUrl": "https://ex.org/def/v",
             "csvw:value": "fixed"}
        )
    meta = {
        "@id": "https://ex.org/t",
        "aboutUrl": "https://ex.org/t/row/{_row}",
        "tableSchema": {"columns": specs},
    }
    return pa.table(data), meta


@given(table_and_template())
@settings(max_examples=60, deadline=None)
def test_triple_count_invariant(tt):
    """triples = Σ non-empty cells of mapped columns + virtuals × rows."""
    table, meta = tt
    tmpl = MappingTemplate.from_dict(meta)
    triples = convert_batch(table, tmpl, graph="https://g")
    expected = 0
    for spec in meta["tableSchema"]["columns"]:
        if spec.get("virtual"):
            expected += len(table)
        else:
            expected += sum(1 for v in table[spec["name"]].to_pylist() if v not in ("", None))
    assert triples.num_rows == expected


@given(table_and_template())
@settings(max_examples=30, deadline=None)
def test_nquads_roundtrip_property(tt):
    table, meta = tt
    triples = convert_batch(table, MappingTemplate.from_dict(meta), graph="https://g")
    lines = format_nquads_batch(triples)["line"].to_pylist()
    back = parse_nquads_lines(lines)
    got = list(zip(*[back[c].to_pylist() for c in QUAD_KEY])) if back.num_rows else []
    want = list(zip(*[triples[c].to_pylist() for c in QUAD_KEY])) if triples.num_rows else []
    assert sorted(got) == sorted(want)


@given(st.lists(st.text(alphabet=string.printable, max_size=40), min_size=1, max_size=5))
@settings(max_examples=60, deadline=None)
def test_extractor_inverse_property(lines):
    text = "\n".join(l.replace("\r", "") for l in lines).rstrip()
    html = render_html(text)
    assert extract_text_bytes(html) == text


@given(
    st.lists(
        st.lists(st.text(alphabet=string.ascii_letters + " &<>", max_size=8),
                 min_size=1, max_size=4),
        min_size=1, max_size=4,
    )
)
@settings(max_examples=40, deadline=None)
def test_table_extraction_inverse_property(rows):
    width = len(rows[0])
    rows = [r[:width] + [""] * (width - len(r)) for r in rows]
    tbl = {"headers": [f"h{i}" for i in range(width)], "rows": rows}
    html = render_html("x", [tbl])
    assert extract_tables_bytes(html) == [tbl]


@given(st.text(alphabet=string.printable.replace("\n", "").replace("\r", ""), max_size=50))
@settings(max_examples=100, deadline=None)
def test_canonical_uri_idempotent(s):
    from cattle_ray.stages.link import canonical_uri

    once = canonical_uri(s)
    assert canonical_uri(once) == once


@given(table_and_template())
@settings(max_examples=20, deadline=None)
def test_dedup_idempotent(tt):
    """Converting twice and set-deduping equals converting once + dedup."""
    table, meta = tt
    tmpl = MappingTemplate.from_dict(meta)
    t1 = convert_batch(table, tmpl, graph="https://g")
    t2 = convert_batch(table, tmpl, graph="https://g")
    ones = set(zip(*[t1[c].to_pylist() for c in QUAD_KEY])) if t1.num_rows else set()
    both = pa.concat_tables([t1, t2])
    twos = set(zip(*[both[c].to_pylist() for c in QUAD_KEY])) if both.num_rows else set()
    assert ones == twos


word = st.text(alphabet=string.ascii_lowercase + string.digits, min_size=1,
               max_size=8)


@given(st.lists(st.lists(word, max_size=40), min_size=1, max_size=8),
       st.integers(2, 7))
@settings(max_examples=40, deadline=None)
def test_chunk_windows_partition_tokens(docs, k):
    """chunk_words_batch windows PARTITION each doc's token stream: chunks
    concatenate back to the tokens, every chunk except a doc's last has
    exactly k words, and chunk indexes are 0..n-1 dense."""
    from cattle_ray.stages.dedup import chunk_words_batch

    batch = pa.table({"doc_id": list(range(len(docs))),
                      "text": [" ".join(d) for d in docs]})
    out = chunk_words_batch(batch, chunk_words=k).to_pydict()
    per_doc = {}
    for d, i, c in zip(out["doc_id"], out["chunk_idx"], out["chunk"]):
        per_doc.setdefault(d, []).append((i, c))
    for d, toks in enumerate(docs):
        got = sorted(per_doc.get(d, []))
        assert [i for i, _ in got] == list(range(len(got)))
        rebuilt = [w for _, c in got for w in c.split(" ")]
        assert rebuilt == toks
        for j, (_, c) in enumerate(got[:-1]):
            assert len(c.split(" ")) == k


@given(st.dictionaries(
    st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=6),
    st.one_of(st.integers(-10**12, 10**12), st.floats(allow_nan=False),
              st.text(alphabet=string.ascii_letters, max_size=5)),
    max_size=6))
@settings(max_examples=60, deadline=None)
def test_json_int_field_matches_json_loads(obj):
    """json_int_field_batch agrees with json.loads for flat objects: the
    extracted value equals the parsed value when it is an int, and is null
    when the field is absent or not a bare integer."""
    import json

    from cattle_ray.stages.textstats import json_int_field_batch

    s = json.dumps(obj)
    out = json_int_field_batch(pa.table({"props": [s]}), "props", "k")
    got = out["k"][0].as_py()
    want = obj.get("k")
    if isinstance(want, int) and not isinstance(want, bool):
        assert got == want
    else:
        assert got is None
