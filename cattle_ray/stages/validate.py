"""Config-driven KG validation — SHACL-style constraint counts over a
triple stream. The ``kg_validate`` query generalized to USER rules: the
reference's metadata-as-program surface (U1, json config drives the
engine) applied to graph QA. Violation COUNTS travel, never violating
rows.

Rule config (a JSON list):

- ``{"name": n, "pred": p, "check": "iri_object"}`` — p's objects must
  be IRIs;
- ``{"name": n, "pred": p, "check": "in_set", "values": [...]}`` —
  value domain;
- ``{"name": n, "pred": p, "check": "int_range", "lo": a, "hi": b}`` —
  violation = non-numeric or outside [a, b];
- ``{"name": n, "pred": p, "check": "regex", "pattern": r}`` — obj must
  FULLY match r;
- ``{"name": n, "check": "required_pred", "if_pred": a, "then_pred": b}``
  — every subject carrying a must also carry b.

Row-local rules run in ONE zero-shuffle vectorized pass (each block
emits one small int64 partial per rule); ``required_pred`` is two
distinct subject sets and one adaptive anti semi-join. Unknown check
kinds raise up front — a typo'd rule silently counting 0 would be a QA
tool lying about QA.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

ROW_CHECKS = ("iri_object", "in_set", "int_range", "regex")


def _check_rules(rules):
    for r in rules:
        kind = r.get("check")
        if kind in ROW_CHECKS:
            if "pred" not in r or "name" not in r:
                raise ValueError(f"rule needs name+pred: {r!r}")
            if kind == "in_set" and "values" not in r:
                raise ValueError(f"in_set rule needs values: {r!r}")
            if kind == "int_range" and not {"lo", "hi"} <= set(r):
                raise ValueError(f"int_range rule needs lo+hi: {r!r}")
            if kind == "regex" and "pattern" not in r:
                raise ValueError(f"regex rule needs pattern: {r!r}")
        elif kind == "required_pred":
            if not {"name", "if_pred", "then_pred"} <= set(r):
                raise ValueError(f"required_pred rule needs "
                                 f"name+if_pred+then_pred: {r!r}")
        else:
            raise ValueError(f"unknown check {kind!r} in rule {r!r}")


def validate_triples(triples_ds, rules, num_buckets: int = 32) -> pa.Table:
    """Triples Dataset + rule list → small (rule, violations) table."""
    from .aggregates import distinct, grouped_sums
    from .joins import semi_join

    rules = list(rules)
    _check_rules(rules)
    row_rules = [r for r in rules if r["check"] in ROW_CHECKS]
    sub_rules = [r for r in rules if r["check"] == "required_pred"]
    if sub_rules and len(rules) > 1:
        triples_ds = triples_ds.materialize()  # multiple consumers

    names, viols = [], []

    if row_rules:
        def partials(b: pa.Table) -> pa.Table:
            pred, obj = b["pred"], b["obj"]
            ns, vs = [], []
            for r in row_rules:
                m = pc.equal(pred, r["pred"])
                kind = r["check"]
                if kind == "iri_object":
                    bad = pc.and_(m, pc.invert(b["obj_is_iri"]))
                    n_bad = pc.sum(bad).as_py() or 0
                elif kind == "in_set":
                    ok = pc.is_in(obj, value_set=pa.array(
                        [str(v) for v in r["values"]]))
                    n_bad = pc.sum(pc.and_(m, pc.invert(ok))).as_py() or 0
                elif kind == "int_range":
                    sel = obj.filter(m)
                    vals = pd.to_numeric(sel.to_pandas(), errors="coerce")
                    bad = vals.isna() | (vals < r["lo"]) | (vals > r["hi"])
                    n_bad = int(bad.sum())
                else:  # regex, full match
                    ok = pc.match_substring_regex(
                        obj, pattern=f"^(?:{r['pattern']})$")
                    n_bad = pc.sum(pc.and_(m, pc.invert(ok))).as_py() or 0
                ns.append(r["name"])
                vs.append(int(n_bad))
            return pa.table({"rule": pa.array(ns, pa.string()),
                             "viol": pa.array(vs, pa.int64())})

        summed = grouped_sums(
            triples_ds.map_batches(partials, batch_format="pyarrow"),
            ["rule"], ["viol"]).to_pandas()
        got = dict(zip(summed["rule"], summed["sum_viol"]))
        for r in row_rules:
            names.append(r["name"])
            viols.append(int(got.get(r["name"], 0)))

    for r in sub_rules:
        with_if = distinct(triples_ds.map_batches(
            lambda t, p=r["if_pred"]: pa.table(
                {"subj": t["subj"].filter(pc.equal(t["pred"], p))}),
            batch_format="pyarrow"), ["subj"])
        with_then = distinct(triples_ds.map_batches(
            lambda t, p=r["then_pred"]: pa.table(
                {"other": t["subj"].filter(pc.equal(t["pred"], p))}),
            batch_format="pyarrow"), ["other"])
        missing = semi_join(with_if, with_then, "subj", "other",
                            anti=True, num_buckets=num_buckets)
        names.append(r["name"])
        viols.append(int(missing.count()))

    return pa.table({"rule": pa.array(names, pa.string()),
                     "violations": pa.array(viols, pa.int64())})
