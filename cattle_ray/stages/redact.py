"""PII redaction over a text corpus — vectorized RE2 scrubbing.

Training-data pipelines scrub personally identifiable information before
any tokenization or publication pass. This stage applies an ordered list
of (name, pattern, replacement) rules to a text column with
``pyarrow.compute`` regex kernels (RE2 — the same engine DuckDB embeds,
so an oracle can mirror the rules verbatim) and reports a per-rule match
count per row, so downstream curation can drop or flag PII-dense docs.

Scale shape: pure per-batch map — zero shuffle, zero state, streams at
read speed. Rules are applied IN ORDER to the progressively redacted
text (an earlier rule's replacement token can never be re-matched by a
later rule, and counts are taken against the text as that rule saw it),
which makes the output a pure function of (text, rules) independent of
partitioning.

Reference scope: the reference engine (CLARIAH/cattle) has no PII pass;
this is one of the training-data-pipeline extensions the build brief
requires as first-class. Patterns deliberately conservative: redaction
at corpus scale prefers precision (a false positive destroys signal
text) — recall tuning belongs to the rule list, which is a parameter.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

#: default ruleset, applied in order. RE2 syntax only (no lookaround) so
#: the exact strings run unchanged in pyarrow AND DuckDB's regexp_*.
PII_RULES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?\d{3}[-. ]\d{3}[-. ]\d{4}", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def redact_batch(batch: pa.Table, text_col: str = "text",
                 rules: list[tuple[str, str, str]] = PII_RULES,
                 out_col: str = "redacted") -> pa.Table:
    """Apply ``rules`` in order; emit the scrubbed text plus one int64
    ``n_<rule>`` match-count column per rule. Null text stays null with
    null counts (Arrow kernel semantics — mirrors SQL)."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    counts = []
    for name, pat, repl in rules:
        counts.append((f"n_{name}", pc.cast(pc.count_substring_regex(col, pat),
                                            pa.int64())))
        col = pc.replace_substring_regex(col, pat, repl)
    out = batch.append_column(out_col, col)
    for cname, carr in counts:
        out = out.append_column(cname, carr)
    return out
