"""The flagship KG-construction pipeline (SURVEY.md §3.4 / BASELINE.json
north_star):

    pages ──filter(lang)──► extract(text+tables)
          ├─► CSVW templates over embedded tables                  [M7→M1]
          └─► OpenIE pattern extraction over text                  [M8]
        union (D4) ─► entity linking ─► canonicalization ─► dedup (D2)
        ─► partitioned/sorted Parquet triples (S8/O1) + manifest (R3/G1)

Physical plan note (learned the hard way): expressing each logical stage as
its own ``ActorPoolMapOperator`` starves the task-pool operators when
Σ(pool CPUs) reaches ``num_cpus`` — and a Dataset-level ``union`` of the
table/OpenIE channels re-executes the shared extraction ONCE PER BRANCH.
So the narrow stages are FUSED into one actor (:class:`KgStage`): per batch
it extracts, converts, pattern-extracts, links, and canonicalizes in a single
zero-copy pass — one actor pool, one read, no union operator. The only wide
op left is the dedup groupby (D2), exactly as the shuffle budget in
SURVEY.md §7.3 prescribes. The individual stage classes in ``stages/`` stay
available for composing custom pipelines.
"""

from __future__ import annotations

import pyarrow as pa

from ..aliases import alias_table
from ..model import QUAD_KEY, TRIPLE_SCHEMA
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


class KgStage:
    """Fused per-batch KG stage (actor pool): lang-filter → extract →
    [table-convert ∪ OpenIE] → entity-link → canonicalize.

    All per-actor state (compiled templates, compiled rule regexes, alias
    index from a ``ray.put`` broadcast ref) is built once in ``__init__``
    (input_hint actor-pool idiom). One zero-copy Arrow pass per batch.
    """

    def __init__(self, templates, graph: str, alias_index=None, openie_rules=None,
                 langs: tuple = ("en",)):
        self.langs = tuple(langs)
        self.table_convert = TableConvert(templates, graph)
        # entity linking fused INTO extraction (alias_index given to OpenIE):
        # spans link via one dict hit instead of quote→mention-URI→unquote;
        # the standalone EntityLinker still covers mention URIs arriving from
        # other channels (none in this pipeline, so it is skipped).
        import ray

        if alias_index is not None and isinstance(alias_index, ray.ObjectRef):
            alias_index = ray.get(alias_index)
        self.openie = OpenIEExtract(rules=openie_rules, graph=graph,
                                    alias_index=alias_index)
        self.canon = Canonicalizer()

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = filter_lang(extract_batch(batch), self.langs)
        parts = [self.table_convert(batch), self.openie(batch)]  # D4 union
        triples = pa.concat_tables([p for p in parts if p.num_rows] or
                                   [TRIPLE_SCHEMA.empty_table()])
        return self.canon(triples)


def build_triples(
    pages_ds,
    *,
    graph: str = "https://example.org/graph/run",
    langs: tuple = ("en",),
    templates: dict | None = None,
    openie_rules=None,
    link_entities: bool = True,
    concurrency: int | tuple | None = None,
    batch_size: int | None = None,
    dedup: bool = True,
):
    """pages Dataset (input_hint schema) → deduplicated quad Dataset.

    ``concurrency`` is an autoscaling ``(min, max)`` actor-pool range so the
    pool never reserves every CPU away from the read/shuffle stages.
    ``None`` sizes it from the session's CPUs as ``(cpus//4, cpus//2)``
    (floor 1 / 8): the (1, N) ramp spends the first seconds of every run
    at low parallelism — a flat tax the scaling job already measured at
    ~1.5× wall (16.6 s → 11.4 s at 32 cpus); a quarter-size floor prefills
    the pool without starving the read of CPUs (measured best among
    (1,8)/(4,8)/(8,16)/(16,32) floors on the sf0.1 headline at 32 cpus).

    ``batch_size=None`` hands each actor call a WHOLE block: the per-call
    overhead (scheduling + Arrow slice + result serialization) at the old
    512-row default cost the 2M-page job ~2× wall at 32 cpus (29-35 s →
    15.8 s measured) — right-size blocks at the read instead; a block is
    the natural memory unit. Pass an explicit size only for payloads where
    a block exceeds worker heap (images/audio).
    """
    import ray

    if concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        concurrency = (max(1, cpus // 4), max(8, cpus // 2))

    templates = templates or TEMPLATES_BY_SIGNATURE
    idx_ref = ray.put(build_alias_index(alias_table())) if link_entities else None
    tmpl_ref = ray.put(templates)

    triples = pages_ds.map_batches(
        KgStage,
        fn_constructor_kwargs=dict(
            templates=tmpl_ref, graph=graph, alias_index=idx_ref,
            openie_rules=openie_rules, langs=langs,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
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
        concurrency=(1, 2),
    )
    return triples, nquads_lines(triples)
