"""Golden-triple test on the reference's own fixture (SURVEY.md §5.2-1;
fixture: /root/reference/data/imf.csv, copied verbatim to tests/fixtures).
P/R computed by exact set comparison — gate ≥0.95 (BASELINE.json), expect 1.0.
"""

import json
from pathlib import Path

import pyarrow as pa

from cattle_ray.model import QUAD_KEY, XSD, format_nquads_batch, parse_nquads_lines
from cattle_ray.sources.csv_source import read_csv_table
from cattle_ray.stages.convert import convert_batch
from cattle_ray.template import MappingTemplate

FIX = Path(__file__).parent / "fixtures"
GRAPH = "https://example.org/imf.csv/graph/run1"


def load_fixture():
    meta = json.loads((FIX / "imf-metadata.json").read_text())
    tbl = read_csv_table(str(FIX / "imf.csv"), meta.get("dialect"))
    return tbl, meta


def quad_set(table: pa.Table) -> set:
    return set(zip(*[table[c].to_pylist() for c in QUAD_KEY]))


def test_imf_golden_triples():
    tbl, meta = load_fixture()
    tmpl = MappingTemplate.from_dict(meta)
    triples = convert_batch(tbl, tmpl, graph=GRAPH)
    assert triples.num_rows == 32  # 8 rows × (3 regular + 1 virtual)

    got = quad_set(triples)
    golden = parse_nquads_lines((FIX / "imf-golden.nq").read_text().splitlines())
    want = quad_set(golden)
    tp = len(got & want)
    precision = tp / len(got)
    recall = tp / len(want)
    assert precision == 1.0 and recall == 1.0, (
        f"P={precision} R={recall}; missing={sorted(want - got)[:3]} "
        f"extra={sorted(got - want)[:3]}"
    )


def test_imf_specific_rows():
    tbl, meta = load_fixture()
    triples = convert_batch(tbl, MappingTemplate.from_dict(meta), graph=GRAPH)
    lines = set(format_nquads_batch(triples, include_graph=False)["line"].to_pylist())
    # FIXTURES.md §3 golden examples
    assert (
        '<https://example.org/imf.csv/row/1> <https://example.org/def/country> "Qatar"@en .'
        in lines
    )
    assert (
        "<https://example.org/imf.csv/row/1> <https://example.org/def/countryResource> "
        "<https://example.org/id/country/Qatar> ." in lines
    )
    assert (
        "<https://example.org/imf.csv/row/1> <https://example.org/def/gdpPerCapita> "
        f'"131063"^^<{XSD}decimal> .' in lines
    )
    # multi-word country percent-encoded in valueUrl
    assert any("Brunei%20Darussalam" in ln for ln in lines)


def test_imf_roundtrip_parse():
    """Output must re-parse (mirrors src/cattle.py:308-311 validity check)."""
    tbl, meta = load_fixture()
    triples = convert_batch(tbl, MappingTemplate.from_dict(meta), graph=GRAPH)
    nq = format_nquads_batch(triples)["line"].to_pylist()
    back = parse_nquads_lines(nq)
    assert quad_set(back) == quad_set(triples)
    assert back["graph"].to_pylist() == [GRAPH] * 32
