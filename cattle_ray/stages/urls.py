"""URL canonicalization — the crawl-frontier / dedup-key primitive.

Every web corpus carries the same page under syntactic URL variants
(scheme/host case, default ports, fragments, tracking params, param
order, trailing slashes); canonicalizing BEFORE url-keyed dedup,
latest-capture upsert, or link-graph construction is what makes those
keys mean "a page" instead of "a byte string". The generalization of the
reference's URI handling (src/cattle.py builds example.org URIs from
user-controlled filenames) to crawl-scale inputs.

One ``map_batches`` kernel, stateless (precompiled module-level regexes).
The scheme://host head, default ports, fragments, and trailing slash are
handled with vectorized pandas string ops; query-string rewriting
(tracking-param drop + param sort) runs a per-row loop ONLY over rows
that HAVE a query string (the doc_normalize ASCII-prefilter discipline —
the overwhelming majority of crawl URLs skip it vectorized).

Scope (documented, tested): absolute http(s) URLs with plain reg-name
hosts. Rows that don't match the absolute-URL shape — and rows whose
authority carries userinfo or an IPv6 literal (case-sensitive
credentials, bracketed hosts) — pass through UNCHANGED; IDN and
percent-encoding normalization are out of scope.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa

#: scheme://authority split; group 1 lowercases, group 2 keeps case
_HEAD_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*)([^#]*)")
_DEFAULT_PORT_RE = re.compile(r"^(https://[^/:]+):443$|^(http://[^/:]+):80$")
#: tracking params dropped wholesale (the CCNet/crawler convention)
TRACKING_PREFIXES = ("utm_", "fbclid", "gclid", "msclkid")


def _rewrite_query(q: str) -> str:
    """Drop tracking params, sort the rest bytewise (param order is not
    semantic for the overwhelming majority of endpoints; sorting makes the
    canonical form order-independent). Empty result drops the '?'."""
    parts = [p for p in q.split("&")
             if p and not p.lower().startswith(TRACKING_PREFIXES)]
    if not parts:
        return ""
    return "?" + "&".join(sorted(parts))


def normalize_url_series(s: pd.Series) -> pd.Series:
    """Vectorized canonicalization of a pandas string Series."""
    ext = s.str.extract(_HEAD_RE)
    head, tail = ext[0], ext[1]
    bad = head.isna()  # not an absolute http(s)-style URL → pass through
    # authorities with userinfo ('@' — case-sensitive credentials must not
    # be lowercased) or an IPv6 literal ('[' — breaks the default-port
    # regex's host class) take the same pass-through as bad rows rather
    # than an inconsistent half-normalization (documented scope)
    bad |= head.str.contains(r"://[^/?#]*[@\[]", regex=True, na=False)

    head = head.fillna("")
    tail = tail.fillna("")
    # scheme + host lowercase; default ports stripped
    head = head.str.lower()
    head = head.str.replace(_DEFAULT_PORT_RE, lambda m: m.group(1) or m.group(2),
                            regex=True)
    # fragment is already excluded by _HEAD_RE's tail group ([^#]*)

    pq = tail.str.extract(r"^([^?]*)(?:\?(.*))?$")
    path, query = pq[0].fillna(""), pq[1]
    # trailing slash: /a/b/ ≡ /a/b (root '/' kept)
    path = path.str.replace(r"(.+?)/+$", r"\1", regex=True)
    path = path.mask(path.eq(""), "/")

    # per-row query rewrite ONLY where a query exists
    has_q = query.notna()
    if has_q.any():
        query = query.copy()
        query[has_q] = [_rewrite_query(q) for q in query[has_q]]
    out = head + path + query.fillna("")
    return out.mask(bad, s)


def normalize_url_batch(batch: pa.Table, *, col: str = "url",
                        out_col: str = "url_norm") -> pa.Table:
    """map_batches kernel: append ``out_col`` = canonical form of ``col``."""
    s = batch[col].to_pandas()
    return batch.append_column(out_col,
                               pa.array(normalize_url_series(s), pa.string()))
