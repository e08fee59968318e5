"""Round-4 continuation stress: the reasoning layer at scale.

1. ``rdfs_2m`` — RDFS materialization over 2M instance triples against
   a 10k-class / 1k-property schema (depth-14 class tree): schema
   closes driver-side, inference is one vectorized map_batches pass —
   the number to watch is triples/sec through the kernel (zero shuffle).
2. ``sameas_2m`` — owl:sameAs rewrite over 2M triples with 300k
   chain-edges (100k clusters of size 4, transitive): distributed CC +
   broadcast-crossover rewrite; and the forced JOIN path at the same
   size for the crossover comparison.
3. ``store_eq_pointread`` — a 4M-triple store, a 2-pattern SPARQL query
   whose FILTER binds the routing key: the eq-propagation turns a full
   scan into a 1-partition point read; A/B vs the same query with the
   filter disabled at the scan (reorder path identical).

Fixture synthesis untimed. Fresh Ray session; prints one JSON line.
Run: python scripts/stress_r4b.py  (from the repo root)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR", log_to_driver=False)
    from cattle_ray.stages.reason import (RDF_TYPE, RDFS_SUBCLASS,
                                          rdfs_materialize, sameas_rewrite)

    out = {}

    # ---- 1. RDFS over 2M instance triples -------------------------
    n = 2_000_000
    n_cls, n_prop = 10_000, 1_000
    schema = pa.table({
        "subj": pa.array([f"c{k}" for k in range(1, n_cls)]
                         + [f"p{k}" for k in range(1, n_prop)]),
        "pred": pa.array([RDFS_SUBCLASS] * (n_cls - 1)
                         + ["http://www.w3.org/2000/01/rdf-schema#"
                            "subPropertyOf"] * (n_prop - 1)),
        "obj": pa.array([f"c{k // 2}" for k in range(1, n_cls)]
                        + [f"p{k // 2}" for k in range(1, n_prop)]),
    })
    i = np.arange(n)
    half = n // 2
    inst = pa.table({
        "subj": pa.array(np.char.add("e", i.astype("U9"))),
        "pred": pa.array(
            np.where(i < half, RDF_TYPE,
                     np.char.add("p", (i % n_prop).astype("U6")))),
        "obj": pa.array(
            np.where(i < half,
                     np.char.add("c", (i % n_cls).astype("U6")),
                     np.char.add("e", ((i * 7) % n).astype("U9")))),
    })
    ds = rd.from_arrow(inst).repartition(32).materialize()
    t0 = time.perf_counter()
    n_out = rdfs_materialize(ds, schema).count()
    dt = time.perf_counter() - t0
    out["rdfs_2m_sec"] = round(dt, 2)
    out["rdfs_rows_out"] = int(n_out)
    out["rdfs_in_triples_per_sec"] = int(n / dt)

    # ---- 2. sameAs rewrite: 100k clusters of 4, chains ------------
    k = 100_000
    mem = np.arange(4 * k)
    cluster = mem // 4
    pos = mem % 4
    ids = np.char.add(np.char.add("u", cluster.astype("U7")),
                      np.char.add("_", pos.astype("U1")))
    chain_src = ids[pos > 0]
    prev = np.char.add(np.char.add("u", (cluster[pos > 0]).astype("U7")),
                       np.char.add("_", (pos[pos > 0] - 1).astype("U1")))
    sameas = pa.table({
        "subj": pa.array(chain_src),
        "pred": pa.array(["http://www.w3.org/2002/07/owl#sameAs"]
                         * len(chain_src)),
        "obj": pa.array(prev)})
    m = 2_000_000
    j = np.arange(m)
    facts = pa.table({
        "subj": pa.array(np.char.add(
            np.char.add("u", (j % k).astype("U7")),
            np.char.add("_", (j % 4).astype("U1")))),
        "pred": pa.array(np.full(m, "likes", dtype=object).tolist()),
        "obj": pa.array(np.char.add("v", j.astype("U8"))),
    })
    both = rd.from_arrow(pa.concat_tables([facts, sameas])) \
        .repartition(32).materialize()
    t0 = time.perf_counter()
    n_rw = sameas_rewrite(both).count()
    dt_b = time.perf_counter() - t0
    out["sameas_2m_broadcast_sec"] = round(dt_b, 2)
    out["sameas_rows_out"] = int(n_rw)
    t0 = time.perf_counter()
    sameas_rewrite(both, broadcast_max=1).count()
    out["sameas_2m_join_sec"] = round(time.perf_counter() - t0, 2)

    # ---- 3. store eq-propagation point read -----------------------
    from cattle_ray.sources.triple_sink import write_triples_hash_partitioned
    from cattle_ray.stages.bgp import evaluate_bgp_store

    n_s = 4_000_000
    i = np.arange(n_s)
    trip = pa.table({
        "subj": pa.array(np.char.add("s", (i % 1_000_000).astype("U8"))),
        "pred": pa.array(
            np.where((i // 1_000_000) % 2 == 0, "knows", "name").astype("U6")),
        "obj": pa.array(np.char.add("o", i.astype("U8"))),
    })
    store = tempfile.mkdtemp(prefix="r4b_store_", dir="/tmp")
    shutil.rmtree(store)
    write_triples_hash_partitioned(rd.from_arrow(trip).repartition(32),
                                   store, num_partitions=32)
    pats = [("?s", "knows", "?o"), ("?s", "name", "?n")]
    t0 = time.perf_counter()
    n1 = evaluate_bgp_store(store, pats,
                            filters=[("?s", "=", "s776")]).count()
    out["store_eqprop_sec"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    # the same result computed WITHOUT propagation: scan-all + top filter
    # (simulated by a contains-regex filter the propagator cannot push)
    n2 = evaluate_bgp_store(store, pats,
                            filters=[("?s", "regex", "^s776$")]).count()
    out["store_scanall_sec"] = round(time.perf_counter() - t0, 2)
    assert n1 == n2, (n1, n2)
    out["store_rows"] = int(n1)
    shutil.rmtree(store, ignore_errors=True)

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
