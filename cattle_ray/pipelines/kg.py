"""The flagship KG-construction pipeline (SURVEY.md §3.4 / BASELINE.json
north_star):

    pages ──filter(lang)──► extract(text+tables)
          ├─► TableConvert (CSVW templates over embedded tables)   [M7→M1]
          └─► OpenIEExtract over text                              [M8]
        union (D4) ─► EntityLinker ─► Canonicalizer ─► dedup (D2)
        ─► partitioned/sorted Parquet triples (S8/O1) + manifest (R3/G1)

Every stage boundary is a zero-copy Arrow handoff; the only wide ops are the
dedup groupby and the subject partition of the sink. The html column is
dropped at extraction so no shuffle ever carries page bytes.
"""

from __future__ import annotations

import pyarrow as pa

from ..aliases import alias_table
from ..model import QUAD_KEY
from ..stages.convert import CsvwConvert
from ..stages.dedup import dedup_exact
from ..stages.extract import extract_batch
from ..stages.link import Canonicalizer, EntityLinker, build_alias_index
from ..stages.openie import OpenIEExtract
from ..stages.tables import TableConvert, filter_lang

#: mapping template for the imf-shaped embedded tables (FIXTURES.md §3,
#: "pages-table-metadata.json": aboutUrl templated on {url}+table idx+{_row})
PAGES_TABLE_TEMPLATE = {
    "@id": "https://example.org/pages-table",
    "aboutUrl": "{_url}#table{_tbl}/row/{_row}",
    "tableSchema": {
        "columns": [
            {"name": "Rank", "datatype": "xsd:integer",
             "propertyUrl": "https://example.org/def/rank"},
            {"name": "Country", "datatype": "xsd:string", "lang": "en",
             "propertyUrl": "https://example.org/def/country"},
            {"name": "Country", "virtual": True,
             "propertyUrl": "https://example.org/def/countryResource",
             "valueUrl": "https://example.org/id/country/{Country}"},
            {"name": "Int", "datatype": "xsd:decimal", "csvw:format": {"groupChar": ","},
             "propertyUrl": "https://example.org/def/gdpPerCapita"},
        ]
    },
}

KV_TABLE_TEMPLATE = {
    "@id": "https://example.org/pages-kv",
    "aboutUrl": "{_url}#table{_tbl}/row/{_row}",
    "tableSchema": {
        "columns": [
            {"name": "value", "datatype": "xsd:string",
             "propertyUrl": "https://example.org/def/{key}"},
        ]
    },
}

TEMPLATES_BY_SIGNATURE = {
    ("Rank", "Country", "Int"): PAGES_TABLE_TEMPLATE,
    ("key", "value"): KV_TABLE_TEMPLATE,
}


def build_triples(
    pages_ds,
    *,
    graph: str = "https://example.org/graph/run",
    langs: tuple = ("en",),
    templates: dict | None = None,
    openie_rules=None,
    link_entities: bool = True,
    concurrency: int | tuple = 4,
    dedup: bool = True,
):
    """pages Dataset (input_hint schema) → deduplicated quad Dataset."""
    import ray

    templates = templates or TEMPLATES_BY_SIGNATURE

    extracted = pages_ds.map_batches(
        lambda b: filter_lang(extract_batch(b), langs), batch_format="pyarrow"
    )

    tmpl_ref = ray.put(templates)
    table_triples = extracted.map_batches(
        TableConvert,
        fn_constructor_kwargs=dict(templates=tmpl_ref, graph=graph),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    openie_triples = extracted.map_batches(
        OpenIEExtract,
        fn_constructor_kwargs=dict(rules=openie_rules, graph=graph),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    triples = table_triples.union(openie_triples)  # D4

    if link_entities:
        idx_ref = ray.put(build_alias_index(alias_table()))
        triples = triples.map_batches(
            EntityLinker,
            fn_constructor_kwargs=dict(alias_index=idx_ref),
            batch_format="pyarrow",
            concurrency=concurrency,
        )
    triples = triples.map_batches(
        Canonicalizer, batch_format="pyarrow", concurrency=concurrency
    )
    if dedup:
        triples = dedup_exact(triples, QUAD_KEY + ["graph"])
    return triples


def csv_to_nquads(csv_path: str, metadata: dict, graph: str):
    """The reference's own main path (§3.1: csv+json → .nq), Ray-Data-form:
    read_csv → convert → N-Quads lines Dataset."""
    from ..sources.csv_source import read_csv_dataset
    from ..sources.nquads import nquads_lines
    from ..template import MappingTemplate

    tmpl = MappingTemplate.from_dict(metadata)
    ds = read_csv_dataset(csv_path, tmpl.dialect)
    triples = ds.map_batches(
        CsvwConvert,
        fn_constructor_kwargs=dict(template=metadata, graph=graph),
        batch_format="pyarrow",
        concurrency=2,
    )
    return triples, nquads_lines(triples)
