"""CLI driver — the reference's job lifecycle as headless commands.

Mirrors cattle's entry points (SURVEY.md §3):

- ``build``    ≙ ``POST /build``: infer metadata JSON from a CSV
  (``/root/reference/src/cattle.py:177-214`` via COW build).
- ``convert``  ≙ ``POST /build_convert`` + download: CSV+metadata → RDF in
  any supported format (``src/cattle.py:243-333``); ``--zip`` gzips the
  payload (``:313-319``); unknown formats exit 65 (the 415-equivalent,
  ``:328``); ``--output-format`` replaces HTTP content negotiation
  (``:312-328`` — S10).
- ``pages``    — the web-scale path: pages parquet → triples parquet with
  the flagship pipeline, partitioned + manifest-resumable.

Run-identity is content-hashed, not random (F2 determinism): the graph name
carries ``md5(csv ‖ metadata)`` instead of the reference's timestamp, so
reruns are idempotent; pass ``--run-ts`` to reproduce the reference's
timestamped-graph behavior (``druid.md:21``).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def cmd_build(args):
    from .infer import infer_metadata

    meta = infer_metadata(args.csv, base=args.base)
    out = args.out or (args.csv[: -len(".csv")] + "-metadata.json"
                       if args.csv.endswith(".csv") else args.csv + "-metadata.json")
    with open(out, "w") as f:
        json.dump(meta, f, indent=2)
    print(out)


def cmd_convert(args):
    from .pipelines.kg import csv_to_nquads
    from .serialize import ACCEPTED_FORMATS, EXTENSION_DICT, serialize_collected
    from .state.manifest import content_hash

    if args.output_format not in ACCEPTED_FORMATS:
        print(f"unsupported format {args.output_format!r}; accepted: {ACCEPTED_FORMATS}",
              file=sys.stderr)
        sys.exit(65)
    _ensure_ray(args.num_cpus)
    meta = json.load(open(args.metadata))
    with open(args.csv, "rb") as f:
        run_id = content_hash(f.read() + json.dumps(meta, sort_keys=True).encode())
    graph = args.graph or f"{meta.get('@id', 'https://example.org/run')}/graph/{args.run_ts or run_id}"
    triples, _lines = csv_to_nquads(args.csv, meta, graph)
    payload = serialize_collected(triples, args.output_format, zip_output=args.zip)
    ext = EXTENSION_DICT.get(args.output_format, ".out") + (".gz" if args.zip else "")
    out = args.out or (args.csv + ext)
    with open(out, "wb") as f:
        f.write(payload)
    print(out)


def cmd_pages(args):
    _ensure_ray(args.num_cpus)
    import ray.data as rd

    from .pipelines.kg import build_triples
    from .sources.triple_sink import write_triples_hash_partitioned

    if args.input.endswith((".jsonl", ".jsonl.gz")):
        from .sources.jsonl import read_pages_jsonl

        pages = read_pages_jsonl(args.input)
    else:
        pages = rd.read_parquet(args.input)
    if getattr(args, "latest_per_url", False):
        # recrawl upsert: many captures of a url → keep the newest by
        # warc_ts BEFORE extraction. Winners are decided over projected
        # (url, ts, hash) columns; html never enters a shuffle. The content
        # hash breaks same-ts ties between DIFFERING captures; byte-
        # identical twins (same url+ts+content, e.g. a re-uploaded dump)
        # all pass the filter but collapse at the triple dedup (D2) below,
        # so the OUTPUT carries no duplicates either way.
        from .stages.dedup import add_content_hash, latest_by_key

        pages = pages.map_batches(
            lambda b: add_content_hash(b, ["html"], "_h"),
            batch_format="pyarrow")
        pages = latest_by_key(pages, "url", "warc_ts", tie_cols=("_h",))
        pages = pages.map_batches(lambda b: b.drop_columns(["_h"]),
                                  batch_format="pyarrow")
    triples = build_triples(pages, graph=args.graph or "https://example.org/graph/run")
    if args.format == "nquads":
        from .sources.nquads import write_nquads

        man = write_nquads(triples, args.out, gzip_parts=args.zip)
        print(json.dumps({"format": "nquads",
                          "n_triples": int(man["n_lines"].sum()),
                          "parts": len(man), "out": args.out}))
        return
    if getattr(args, "merge", False):
        # incremental generation: merge this crawl's triples into the
        # existing store, rewriting ONLY the partitions the new subjects
        # hash into (set semantics per partition, atomic replace,
        # idempotent on rerun)
        from .sources.triple_sink import merge_triples_hash_partitioned

        manifest = merge_triples_hash_partitioned(
            triples, args.out, num_partitions=args.partitions)
        print(json.dumps({
            "merged_partitions": len(manifest),
            "n_added": int(manifest["n_added"].sum()),
            "n_total_touched": int(manifest["n_total"].sum()),
            "out": args.out,
        }))
        return
    manifest = write_triples_hash_partitioned(triples, args.out,
                                              num_partitions=args.partitions)
    print(json.dumps({
        "partitions": len(manifest),
        "n_triples": int(manifest["n_triples"].sum()),
        "out": args.out,
    }))


def cmd_webrank(args):
    """pages → extracted link graph → PageRank → globally rank-sorted
    range-partitioned parquet (part-00000 holds the top pages; readers
    prune parts by rank range from footer stats)."""
    _ensure_ray(args.num_cpus)
    import ray.data as rd

    from .pipelines.web import rank_pages
    from .sources.sorted_sink import write_sorted_range_partitioned

    if args.input.endswith((".jsonl", ".jsonl.gz")):
        from .sources.jsonl import read_pages_jsonl

        pages = read_pages_jsonl(args.input)
    else:
        pages = rd.read_parquet(args.input)
    ranked = rank_pages(pages, iters=args.iters)
    man = write_sorted_range_partitioned(ranked, "rank", args.out,
                                         descending=True)
    print(json.dumps({
        "pages_ranked": int(man["n_rows"].sum()),
        "parts": len(man),
        "iters": args.iters,
        "out": args.out,
    }))


def cmd_compact(args):
    """Store maintenance from the shell: re-layout a grown (or re-keyed)
    store; prints the new manifest as one JSON line."""
    import json as _json

    from .sources.triple_sink import compact_store, store_key, \
        store_num_partitions

    _ensure_ray(args.num_cpus)
    m = compact_store(args.store, num_partitions=args.partitions,
                      key=args.key, drop_history=args.drop_history)
    print(_json.dumps({
        "partitions": int(store_num_partitions(args.store)),
        "key": store_key(args.store),
        "n_triples": int(m["n_triples"].sum()),
        "out": args.store,
    }))


def cmd_index(args):
    """Build (or rebuild) a key-routed secondary index from a primary
    store, with provenance; prints one JSON line incl. staleness.
    ``--refresh`` applies the primary's tracked-mutation deltas to an
    existing stale index instead of rescanning the primary (cost ∝ what
    changed, not the store)."""
    import json as _json

    from .sources.triple_sink import (build_secondary_index, index_is_stale,
                                      refresh_secondary_index)

    _ensure_ray(args.num_cpus)
    if args.refresh:
        m = refresh_secondary_index(args.index, args.primary)
        print(_json.dumps({
            "applied_added": int(m["n_applied_added"].sum()),
            "applied_removed": int(m["n_applied_removed"].sum()),
            "partitions_rewritten": int(len(m)), "out": args.index,
            "stale": bool(index_is_stale(args.index)),
        }))
        return
    m = build_secondary_index(args.primary, args.index, key=args.key,
                              num_partitions=args.partitions)
    print(_json.dumps({
        "n_triples": int(m["n_triples"].sum()), "key": args.key,
        "out": args.index, "stale": bool(index_is_stale(args.index)),
    }))


def cmd_store(args):
    """Triple-pattern query over a partitioned store (SPARQL BGP primitive
    from the shell): subject-bound patterns open ONE partition file —
    a purely LOCAL parquet read, no Ray session; unbound-subject patterns
    push pred/obj filters into a parallel Ray scan. Prints matching
    triples as N-Quads lines. The partition count comes from the store's
    recorded ``_meta.json`` unless ``--partitions`` overrides."""
    import pyarrow as pa

    from .model import format_nquads_batch
    from .sources.triple_sink import match_triples, read_store_asof

    if args.subject is None or args.asof is not None:
        _ensure_ray(args.num_cpus)  # the parallel scan / replay needs Ray
    if args.asof is not None:
        # time travel: replay the generation deltas, then pattern-filter
        got = read_store_asof(args.store, args.asof)
        bound = {k: v for k, v in (("subj", args.subject),
                                   ("pred", args.predicate),
                                   ("obj", args.object),
                                   ("graph", args.graph)) if v is not None}
        if bound:
            import pyarrow.compute as _pc

            # validate the bound columns up front: a filter on a column the
            # replayed store never had (e.g. --graph on a triples-only
            # store) must fail like the live match_triples path — one clear
            # ValueError here, not a raw KeyError inside map_batches at
            # iteration time. The replay preserves the stored file schema,
            # so one footer read answers without executing the pipeline.
            import glob as _glob

            import pyarrow.parquet as _pq

            any_part = _glob.glob(f"{args.store}/part_id=*/data.parquet")
            have = (set(_pq.read_schema(any_part[0]).names)
                    if any_part else set())
            for col in bound:
                if col not in have:
                    what = ("no named-graph column — it was written from "
                            "plain triples; a graph filter cannot match"
                            if col == "graph"
                            else f"no {col!r} column")
                    raise ValueError(f"store {args.store!r} has {what}")

            def _flt(b, bound=bound):
                m = None
                for col, v in bound.items():
                    e = _pc.fill_null(_pc.equal(b[col], v), False)
                    m = e if m is None else _pc.and_(m, e)
                return b.filter(m)

            got = got.map_batches(_flt, batch_format="pyarrow")
    else:
        got = match_triples(args.store, subj=args.subject,
                            pred=args.predicate, obj=args.object,
                            graph=args.graph,
                            num_partitions=args.partitions)
    batches = (got.to_batches() if isinstance(got, pa.Table)
               else got.iter_batches(batch_format="pyarrow"))
    for batch in batches:
        if len(batch) == 0:
            continue
        if isinstance(batch, pa.RecordBatch):
            batch = pa.Table.from_batches([batch])
        for line in format_nquads_batch(batch)["line"].to_pylist():
            print(line)


def cmd_validate(args):
    """Constraint-rule violation counts over a partitioned triple store:
    rules JSON in (the metadata-as-program surface applied to graph QA),
    one {rule: violations} JSON object out. Row-local rules cost one
    zero-shuffle streaming pass over the store's parallel scan."""
    _ensure_ray(args.num_cpus)
    from .sources.triple_sink import match_triples
    from .stages.validate import validate_triples

    rules = json.load(open(args.rules))
    ds = match_triples(args.store, num_partitions=args.partitions)
    out = validate_triples(ds, rules)
    print(json.dumps(dict(zip(out["rule"].to_pylist(),
                              out["violations"].to_pylist()))))


def cmd_curate(args):
    """Config-driven corpus curation: documents parquet or FLAT JSONL in
    (one JSON object per line with doc columns — pages-shaped JSONL goes
    through `pages`), kept rows out as parquet, stats JSON on stdout. The
    rule config is a JSON file — the reference's metadata-as-program
    surface (U1) applied to curation. Input is scanned twice (count +
    filter/write); the filter itself is one streaming vectorized pass."""
    import os

    _ensure_ray(args.num_cpus)
    import ray.data as rd

    from .stages.sampling import curation_filter

    config = json.load(open(args.config))
    if os.path.isdir(args.out) and os.listdir(args.out):
        print(f"output dir {args.out!r} is not empty — refusing to mix "
              "generations", file=sys.stderr)
        sys.exit(65)
    if args.input.endswith((".jsonl", ".jsonl.gz")):
        ds = rd.read_json(args.input)
    else:
        ds = rd.read_parquet(args.input)
    n_in = ds.count()
    kept = curation_filter(ds, config).materialize()
    n_out = kept.count()  # free on the materialized result
    kept.write_parquet(args.out)
    print(json.dumps({"n_in": int(n_in), "n_kept": int(n_out),
                      "kept_frac": round(n_out / max(n_in, 1), 4),
                      "out": args.out}))


def cmd_sparql(args):
    """SPARQL text query from the shell. A store-directory source gets
    read-pruned per-pattern scans (point reads when the routing key
    binds); a parquet file/dir source streams the triples. SELECT/
    CONSTRUCT print one row per line (TSV by default, ``--json`` for
    JSON lines — NULL optional bindings print empty/null); ASK prints
    ``true``/``false`` and exits 0/1. Syntax errors exit 65 with the
    parser's reason on stderr."""
    import os

    from .stages.sparql import SparqlSyntaxError, sparql

    query = args.query
    if query.startswith("@"):
        query = open(query[1:]).read()
    _ensure_ray(args.num_cpus)
    source = args.source

    def is_store(p):
        return os.path.isdir(p) and os.path.exists(
            os.path.join(p, "_meta.json"))

    if "," in source and all(is_store(p) for p in source.split(",")):
        # federation: comma-separated store dirs — each pattern's pruned
        # scans union across stores (bag semantics)
        source = source.split(",")
    elif not is_store(source):
        import ray.data as rd

        source = rd.read_parquet(source)
    try:
        out = sparql(source, query, obj_index_dir=args.index)
    except (SparqlSyntaxError, ValueError, NotImplementedError) as e:
        print(f"sparql: {e}", file=sys.stderr)
        sys.exit(65)
    if isinstance(out, bool):
        if getattr(args, "srj", False):
            print(json.dumps({"head": {}, "boolean": out}))
        else:
            print("true" if out else "false")
        sys.exit(0 if out else 1)
    if getattr(args, "out", None):
        # durable results instead of stdout: CONSTRUCT/DESCRIBE graphs
        # land as N-Quads parts (the engine's distributed RDF sink),
        # SELECT bindings as partitioned parquet
        from .stages.sparql import parse_sparql

        kind = parse_sparql(query)["kind"]
        if kind == "construct":
            import pyarrow as pa
            import pyarrow.compute as pc

            from .sources.nquads import write_nquads

            def pad(b):
                # CONSTRUCT graphs carry bare (subj, pred, obj); the
                # N-Quads formatter needs the annotation side columns —
                # IRI-shaped objects (URI scheme prefix) serialize as
                # IRIs, everything else as plain literals
                n = len(b)
                is_iri = pc.match_substring_regex(
                    pc.cast(b["obj"], pa.string()),
                    r"^[A-Za-z][A-Za-z0-9+.\-]*:")
                return pa.table({
                    "subj": b["subj"], "pred": b["pred"],
                    "obj": b["obj"],
                    "obj_is_iri": pc.fill_null(is_iri, False),
                    "obj_datatype": pa.nulls(n, pa.string()),
                    "obj_lang": pa.nulls(n, pa.string())})

            write_nquads(out.map_batches(pad, batch_format="pyarrow"),
                         args.out, include_graph=False)
            print(json.dumps({"out": args.out, "format": "nquads"}))
        else:
            out.write_parquet(args.out)
            print(json.dumps({"out": args.out, "format": "parquet"}))
        return
    names = out.schema().names
    if getattr(args, "srj", False):
        # W3C SPARQL 1.1 Query Results JSON — the interchange format
        # SPARQL clients parse. Streamed: header, then one binding
        # object per row (typed "literal"/"uri" by shape), footer.
        sys.stdout.write(json.dumps({"head": {"vars": list(names)}})
                         [:-1] + ', "results": {"bindings": [\n')
        first = True
        for batch in out.iter_batches(batch_format="pyarrow"):
            for row in batch.to_pylist():
                b = {}
                for n in names:
                    v = row[n]
                    if v is None:
                        continue  # unbound: omitted per the spec
                    v = str(v)
                    kind = "uri" if v.startswith(
                        ("http://", "https://", "urn:")) else "literal"
                    b[n] = {"type": kind, "value": v}
                sys.stdout.write(("" if first else ",\n")
                                 + json.dumps(b, ensure_ascii=False))
                first = False
        sys.stdout.write("\n]}}\n")
        return
    for batch in out.iter_batches(batch_format="pyarrow"):
        for row in batch.to_pylist():
            if args.json:
                print(json.dumps(row, ensure_ascii=False))
            else:
                print("\t".join("" if row[n] is None else str(row[n])
                                for n in names))


def cmd_update(args):
    """SPARQL UPDATE from the shell: every mutation is a tracked
    generation (``store --asof`` resurrects pre-update snapshots).
    Prints the ``{op, matched, removed, inserted, generation}`` summary
    as one JSON line; syntax/validation errors exit 65."""
    from .stages.sparql import SparqlSyntaxError, sparql_update

    text = args.update
    if text.startswith("@"):
        text = open(text[1:]).read()
    _ensure_ray(args.num_cpus)
    try:
        out = sparql_update(args.store, text)
    except (SparqlSyntaxError, ValueError, NotImplementedError) as e:
        print(f"update: {e}", file=sys.stderr)
        sys.exit(65)
    print(json.dumps(out))


def cmd_reason(args):
    """Ontology reasoning from the shell: materialize the RDFS closure
    of a triple source (parquet file/dir or partitioned store) against a
    schema — inline (schema triples extracted from the stream) or a
    Turtle/parquet ontology file — and/or canonicalize owl:sameAs
    clusters; write the result as partitioned parquet. Prints one JSON
    summary line."""
    import os

    from .stages.reason import rdfs_materialize, sameas_rewrite

    _ensure_ray(args.num_cpus)
    import ray.data as rd

    src = args.source
    if os.path.isdir(src) and os.path.exists(
            os.path.join(src, "_meta.json")):
        from .sources.triple_sink import read_store_asof

        ds = read_store_asof(src)
    else:
        ds = rd.read_parquet(src)
    schema = None
    if args.schema:
        if args.schema.endswith((".ttl", ".ttl.gz", ".turtle")):
            from .sources.turtle import read_turtle

            schema = read_turtle(args.schema).select(
                ["subj", "pred", "obj"])
        else:
            import pyarrow.parquet as pq

            schema = pq.read_table(args.schema).select(
                ["subj", "pred", "obj"])
    if args.sameas:
        ds = sameas_rewrite(ds)
    if not args.no_rdfs:
        ds = rdfs_materialize(ds, schema,
                              drop_schema_rows=args.drop_schema)
    n = 0
    if args.out:
        ds.write_parquet(args.out)
        out_ds = rd.read_parquet(args.out)
        n = out_ds.count()
    else:
        n = ds.count()
    print(json.dumps({"rows_out": int(n), "out": args.out,
                      "schema_rows": (schema.num_rows
                                      if schema is not None else None)}))


def cmd_embed(args):
    """KG-embedding training from the shell: N deterministic full-batch
    TransE epochs over a triple source's resource-to-resource edges
    (stages/kgembed.py — layout/parallelism-invariant fixed-point
    gradients), entity vectors written as partitioned parquet
    ``(id, emb float32-bytes)``, relation vectors as one small parquet.
    Prints one JSON line with the per-epoch loss curve."""
    import os

    from .stages.kgembed import transe_epoch
    from .stages.reason import property_graph_tables

    _ensure_ray(args.num_cpus)
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    src = args.source
    if os.path.isdir(src) and os.path.exists(
            os.path.join(src, "_meta.json")):
        from .sources.triple_sink import read_store_asof

        ds = read_store_asof(src)
    else:
        ds = rd.read_parquet(src)
    _nodes, edges = property_graph_tables(ds)
    ents = rels = None
    losses = []
    for _ in range(max(1, args.epochs)):
        out = transe_epoch(edges, ents, rels, dim=args.dim,
                           lr=args.lr, margin=args.margin, k=args.k,
                           seed=args.seed, model=args.model)
        ents, rels = out["entities"].materialize(), out["relations"]
        losses.append(round(out["loss"], 4))
    ents.write_parquet(os.path.join(args.out, "entities"))
    rel_ids = sorted(rels)
    pq.write_table(pa.table({
        "rel": pa.array(rel_ids, pa.string()),
        "emb": pa.array([np.asarray(rels[r], np.float32).tobytes()
                         for r in rel_ids], pa.binary())}),
        os.path.join(args.out, "relations.parquet"))
    print(json.dumps({"epochs": len(losses), "loss": losses,
                      "dim": args.dim,
                      "n_entities": int(ents.count()),
                      "n_relations": len(rel_ids), "out": args.out}))


def main(argv=None):
    p = argparse.ArgumentParser(prog="cattle-ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="infer CSVW metadata from a CSV")
    b.add_argument("csv")
    b.add_argument("--base")
    b.add_argument("--out")
    b.set_defaults(fn=cmd_build)

    c = sub.add_parser("convert", help="CSV+metadata → RDF file")
    c.add_argument("csv")
    c.add_argument("metadata")
    c.add_argument("--output-format", default="nquads")
    c.add_argument("--zip", action="store_true")
    c.add_argument("--graph")
    c.add_argument("--run-ts")
    c.add_argument("--out")
    c.set_defaults(fn=cmd_convert)

    g = sub.add_parser("pages", help="pages parquet → partitioned triple parquet")
    g.add_argument("input")
    g.add_argument("out")
    g.add_argument("--graph")
    g.add_argument("--partitions", type=int, default=16)
    g.add_argument("--merge", action="store_true",
                   help="merge triples into an existing partitioned store "
                        "(incremental crawl generation; touches only "
                        "affected partitions)")
    g.add_argument("--latest-per-url", action="store_true",
                   help="keep only the newest capture of each url "
                        "(recrawl upsert by warc_ts) before extraction")
    g.add_argument("--format", choices=["parquet", "nquads"], default="parquet",
                   help="parquet = subject-partitioned sorted tables; "
                        "nquads = distributed line-format .nq part files")
    g.add_argument("--zip", action="store_true",
                   help="with --format nquads: gzip each part (.nq.gz)")
    g.set_defaults(fn=cmd_pages)

    q = sub.add_parser("store", help="triple-pattern query over a "
                                     "partitioned triple store")
    q.add_argument("store", help="directory written by `pages` "
                                 "(part_id=N/data.parquet layout)")
    q.add_argument("-s", "--subject")
    q.add_argument("-p", "--predicate")
    q.add_argument("-o", "--object")
    q.add_argument("-g", "--graph", help="named-graph scope (exact match)")
    q.add_argument("--partitions", type=int, default=None,
                   help="override the partition count (default: the "
                        "store's recorded _meta.json)")
    q.add_argument("--asof", type=int, default=None,
                   help="time travel: answer as of this generation "
                        "(tracked merges/deletes; default: live)")
    q.set_defaults(fn=cmd_store)

    cp = sub.add_parser("compact", help="rebuild a partitioned store at a "
                                        "new partition count / routing key")
    cp.add_argument("store")
    cp.add_argument("--partitions", type=int, default=None,
                    help="new partition count (default: keep)")
    cp.add_argument("--key", default=None, choices=["subj", "obj", "pred"],
                    help="new routing key (default: keep)")
    cp.add_argument("--drop-history", action="store_true",
                    help="allow compacting a store with tracked "
                         "generations (time travel resets)")
    cp.set_defaults(fn=cmd_compact)

    ix = sub.add_parser("index", help="build a key-routed secondary index "
                                      "from a primary store (provenance-"
                                      "tracked; rerun to rebuild)")
    ix.add_argument("primary")
    ix.add_argument("index")
    ix.add_argument("--key", default="obj", choices=["subj", "obj", "pred"])
    ix.add_argument("--partitions", type=int, default=None,
                    help="index partition count (default: the primary's)")
    ix.add_argument("--refresh", action="store_true",
                    help="apply the primary's tracked deltas to the "
                         "existing index instead of a full rebuild")
    ix.set_defaults(fn=cmd_index)

    w = sub.add_parser("webrank", help="pages → link graph → PageRank → "
                                       "rank-sorted parquet")
    w.add_argument("input", help="pages parquet or .jsonl")
    w.add_argument("out", help="output directory (range-partitioned parts)")
    w.add_argument("--iters", type=int, default=10)
    w.set_defaults(fn=cmd_webrank)

    va = sub.add_parser("validate", help="constraint-rule violation counts "
                                         "over a partitioned triple store")
    va.add_argument("store")
    va.add_argument("rules", help="JSON rule list (stages/validate.py)")
    va.add_argument("--partitions", type=int, default=None)
    va.set_defaults(fn=cmd_validate)

    sp = sub.add_parser("sparql", help="SPARQL query (SELECT/ASK/"
                                       "CONSTRUCT text) over a store dir "
                                       "or triples parquet")
    sp.add_argument("source", help="partitioned store directory "
                                   "(read-pruned scans) or a triples "
                                   "parquet file/dir (in-stream scans)")
    sp.add_argument("query", help="the SPARQL query string, or @file to "
                                  "read it from a file")
    sp.add_argument("--index", default=None,
                    help="obj-routed secondary index dir (store source "
                         "only; used when fresh)")
    sp.add_argument("--json", action="store_true",
                    help="print JSON lines instead of TSV")
    sp.add_argument("--srj", action="store_true",
                    help="W3C SPARQL 1.1 Query Results JSON "
                         "(application/sparql-results+json)")
    sp.add_argument("--out", default=None,
                    help="write results durably instead of stdout: "
                         "CONSTRUCT/DESCRIBE → N-Quads part files, "
                         "SELECT → partitioned parquet")
    sp.set_defaults(fn=cmd_sparql)

    up = sub.add_parser("update", help="SPARQL UPDATE (INSERT/DELETE "
                                       "DATA, DELETE WHERE, DELETE/"
                                       "INSERT WHERE) over a tracked "
                                       "store")
    up.add_argument("store", help="generation-tracked partitioned store")
    up.add_argument("update", help="the SPARQL update string, or @file")
    up.set_defaults(fn=cmd_update)

    rn = sub.add_parser("reason", help="materialize the RDFS closure / "
                                       "canonicalize owl:sameAs over a "
                                       "triple source")
    rn.add_argument("source", help="triples parquet file/dir or "
                                   "partitioned store")
    rn.add_argument("--schema", default=None,
                    help="ontology file (.ttl or parquet); default: "
                         "extract schema triples from the stream")
    rn.add_argument("--out", default=None,
                    help="output parquet dir (default: count only)")
    rn.add_argument("--sameas", action="store_true",
                    help="owl:sameAs-canonicalize before reasoning")
    rn.add_argument("--no-rdfs", action="store_true",
                    help="skip RDFS materialization (sameAs only)")
    rn.add_argument("--drop-schema", action="store_true",
                    help="drop schema triples from the output")
    rn.set_defaults(fn=cmd_reason)

    eb = sub.add_parser("embed", help="train TransE KG embeddings over "
                                      "a triple source (deterministic "
                                      "full-batch epochs)")
    eb.add_argument("source", help="triples parquet file/dir or "
                                   "partitioned store")
    eb.add_argument("out", help="output dir (entities/ parquet + "
                                "relations.parquet)")
    eb.add_argument("--epochs", type=int, default=1)
    eb.add_argument("--dim", type=int, default=32)
    eb.add_argument("--lr", type=float, default=0.05)
    eb.add_argument("--margin", type=float, default=1.0)
    eb.add_argument("--k", type=int, default=1,
                    help="corruptions per positive edge")
    eb.add_argument("--seed", type=int, default=0)
    eb.add_argument("--model", default="transe",
                    choices=("transe", "distmult"))
    eb.set_defaults(fn=cmd_embed)

    cu = sub.add_parser("curate", help="config-driven corpus curation "
                                       "(quality/repetition/lang rules)")
    cu.add_argument("input", help="documents parquet or .jsonl")
    cu.add_argument("out", help="output parquet directory")
    cu.add_argument("--config", required=True,
                    help="JSON rule file (see stages.sampling.CURATION_RULES)")
    cu.set_defaults(fn=cmd_curate)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
