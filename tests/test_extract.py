"""M6/M7: extractor determinism + inverse-renderer invariant (FIXTURES.md §1:
extract_text(html) == text byte-identically, twice, at any parallelism)."""

import pyarrow as pa

from cattle_ray.pages import gen_row, pages_table
from cattle_ray.stages.extract import (
    extract_batch,
    extract_tables_bytes,
    extract_text_bytes,
    render_html,
)


def test_inverse_invariant_500_rows():
    t = pages_table(500)
    ex = extract_batch(t)
    assert ex["text"].to_pylist() == t["text"].to_pylist()
    assert "html" not in ex.column_names  # projection drops wide binary


def test_determinism_same_bytes_twice():
    html = gen_row(123)["html"]
    assert extract_text_bytes(html) == extract_text_bytes(html)
    assert extract_tables_bytes(html) == extract_tables_bytes(html)


def test_entity_escaping_roundtrip():
    text = 'a < b & "c" > d\nsecond <p>not a tag</p>'
    html = render_html(text, [])
    assert extract_text_bytes(html) == text


def test_table_extraction_exact():
    tables = [
        {"headers": ["Rank", "Country", "Int"],
         "rows": [["1", "Qatar", "131,063"], ["2", "Lux & co", "104,906"]]},
        {"headers": ["key", "value"], "rows": [["k0", "v<0>"]]},
    ]
    html = render_html("some text", tables)
    assert extract_tables_bytes(html) == tables


def test_n_tables_matches_sidecar():
    t = pages_table(100)
    ex = extract_batch(t)
    got = [len(x) for x in ex["tables"].to_pylist()]
    assert got == t["_n_tables"].to_pylist()


def test_empty_and_null_html():
    batch = pa.table({"html": pa.array([b"", None], pa.binary()), "url": ["a", "b"]})
    out = extract_batch(batch)
    assert out["text"].to_pylist() == ["", None]


def test_links_roundtrip_and_invisibility():
    """Anchor nav block: extract_links_batch recovers hrefs exactly
    (entity-unescaped, document order); text/table extraction stays
    byte-identical with or without links."""
    from cattle_ray.stages.extract import extract_links_batch

    text = "line one\nline & two"
    urls = ["https://x.org/a?b=1&c=2", "https://x.org/é"]
    html = render_html(text, [{"headers": ["h"], "rows": [["v"]]}],
                       links=urls)
    plain = render_html(text, [{"headers": ["h"], "rows": [["v"]]}])
    assert extract_text_bytes(html) == extract_text_bytes(plain) == text
    assert extract_tables_bytes(html) == extract_tables_bytes(plain)

    batch = pa.table({"url": ["https://src"], "html": [html]})
    links = extract_links_batch(batch)
    assert links["src"].to_pylist() == ["https://src"] * 2
    assert links["dst"].to_pylist() == urls

    # a page with no anchors contributes zero edge rows; null html skipped
    none_batch = pa.table(
        {"url": ["u1", "u2"],
         "html": pa.array([plain, None], pa.binary())})
    assert len(extract_links_batch(none_batch)) == 0


def test_doc_link_dsts_fixture_properties():
    """Link fixture arithmetic: out-degree == doc_id % 4, never a
    self-link, targets in range, degenerate corpora are linkless."""
    from cattle_ray.pages import doc_link_dsts

    n = 97
    for i in range(60):
        dsts = doc_link_dsts(i, n)
        assert len(dsts) == i % 4
        assert all(0 <= d < n and d != i for d in dsts)
    assert doc_link_dsts(3, 1) == []
    assert doc_link_dsts(3, 0) == []
