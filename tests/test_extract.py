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
