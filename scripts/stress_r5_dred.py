"""Round-5 DRed stress (VERDICT r4 order #8, BASELINE.md "Stress"
rows): prove refresh_entailment_store's over-delete/re-derive cost is
DELTA-proportional at 2.5M+ closure-store triples — the r4
trigger-flatness protocol applied to entailment maintenance.

Protocol: a 2.5M-triple primary (1.25M subjects; type + teaches facts
under a Student⊑Person / domain Teacher / range Student schema) gets
its entailment store built ONCE (timed: the full-closure baseline),
then K rounds of tracked mutations (5k-edge merge + 2k-row exact
delete each) refresh the store incrementally. Reported:

* per-round refresh seconds + flatness (mean of the last half over
  the first half — a ratio near 1 means cost tracks the DELTA, not
  the growing mutation history or the closure size);
* refresh-vs-rebuild ratio (how much the increment saves);
* exactness at scale: the final refreshed store equals a from-scratch
  rebuild of the current primary (row count + order-independent
  content hash).

Prints one JSON line. Run: python scripts/stress_r5_dred.py
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

N_SUBJ = int(os.environ.get("STRESS_DRED_SUBJECTS", 1_250_000))
ROUNDS = 8
MERGE_K = 5_000
DELETE_K = 2_000
EX = "urn:ex:"


def _instances(n: int) -> pa.Table:
    from cattle_ray.stages.reason import RDF_TYPE

    i = np.arange(n)
    s = np.char.add("urn:ex:s", i.astype("U9"))
    o = np.char.add("urn:ex:s", ((i + 1) % n).astype("U9"))
    return pa.table({
        "subj": pa.array(np.concatenate([s, s])),
        "pred": pa.array([RDF_TYPE] * n + [EX + "teaches"] * n),
        "obj": pa.array(np.concatenate(
            [np.full(n, EX + "Student", object), o])),
    })


def _store_digest(store_dir: str):
    """(rows, order-independent content hash) over the store stream."""
    import ray.data as rd

    from cattle_ray.sources.triple_sink import read_store_asof
    from cattle_ray.stages.dedup import add_content_hash

    def h(b: pa.Table) -> pa.Table:
        t = add_content_hash(b.select(["subj", "pred", "obj"]),
                             ["subj", "pred", "obj"])
        import pyarrow.compute as pc

        return pa.table({
            "n": pa.array([len(t)], pa.int64()),
            "x": pa.array([int(pc.sum(t["_chash"]).as_py() or 0)
                           & ((1 << 64) - 1)], pa.uint64())})

    parts = read_store_asof(store_dir).map_batches(
        h, batch_format="pyarrow").to_pandas()
    return int(parts["n"].sum()), int(parts["x"].sum()) & ((1 << 64) - 1)


def main() -> None:
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=int(os.environ.get(
        "RAY_GRAFT_CPUS", 32)), include_dashboard=False,
        logging_level="ERROR")
    from cattle_ray.sources.triple_sink import (
        delete_exact_rows, merge_triples_hash_partitioned,
        write_triples_hash_partitioned)
    from cattle_ray.stages.reason import (RDFS_DOMAIN, RDFS_RANGE,
                                          RDFS_SUBCLASS,
                                          build_entailment_store,
                                          refresh_entailment_store)

    if os.environ.get("STRESS_DRED_OWL"):
        # OWL-lite variant: the combined RDFS+inverseOf fixpoint kernel
        # drives both build and refresh (roadmap r5 item 2's scale
        # evidence) — every teaches edge additionally entails its
        # taughtBy inverse
        from cattle_ray.stages.reason import OWL_INVERSE_OF

        schema = pa.table({
            "subj": [EX + "Student", EX + "teaches", EX + "teaches",
                     EX + "teaches"],
            "pred": [RDFS_SUBCLASS, RDFS_DOMAIN, RDFS_RANGE,
                     OWL_INVERSE_OF],
            "obj": [EX + "Person", EX + "Teacher", EX + "Student",
                    EX + "taughtBy"],
        })
    else:
        schema = pa.table({
            "subj": [EX + "Student", EX + "teaches", EX + "teaches"],
            "pred": [RDFS_SUBCLASS, RDFS_DOMAIN, RDFS_RANGE],
            "obj": [EX + "Person", EX + "Teacher", EX + "Student"],
        })
    base = tempfile.mkdtemp(prefix="dred_stress_", dir="/tmp")
    pdir, edir = f"{base}/primary", f"{base}/ent"
    write_triples_hash_partitioned(
        rd.from_arrow(_instances(N_SUBJ)), pdir, num_partitions=16)
    t0 = time.perf_counter()
    build_entailment_store(pdir, edir, schema=schema)
    t_build = time.perf_counter() - t0

    refresh_secs = []
    for r in range(ROUNDS):
        # 5k new teaches edges from fresh subjects into existing ones
        j = np.arange(MERGE_K)
        tgt = (r * 31 + j * 17) % N_SUBJ
        merge = pa.table({
            "subj": pa.array(np.char.add(f"urn:ex:z{r}_",
                                         j.astype("U7"))),
            "pred": pa.array([EX + "teaches"] * MERGE_K),
            "obj": pa.array(np.char.add("urn:ex:s", tgt.astype("U9"))),
        })
        merge_triples_hash_partitioned(rd.from_arrow(merge), pdir,
                                       num_partitions=16,
                                       track_generations=True)
        # 2k exact deletes: this round's slice of original teaches edges
        k = np.arange(r * DELETE_K, (r + 1) * DELETE_K)
        delete_exact_rows(pdir, pa.table({
            "subj": pa.array(np.char.add("urn:ex:s", k.astype("U9"))),
            "pred": pa.array([EX + "teaches"] * DELETE_K),
            "obj": pa.array(np.char.add(
                "urn:ex:s", ((k + 1) % N_SUBJ).astype("U9"))),
        }))
        t0 = time.perf_counter()
        s = refresh_entailment_store(edir)
        refresh_secs.append(round(time.perf_counter() - t0, 2))
        assert s["applied_gens"] == 2, s

    # exactness at scale: refreshed == from-scratch rebuild
    e2 = f"{base}/ent_rebuilt"
    build_entailment_store(pdir, e2, schema=schema)
    got = _store_digest(edir)
    want = _store_digest(e2)
    first = np.mean(refresh_secs[:ROUNDS // 2])
    last = np.mean(refresh_secs[ROUNDS // 2:])
    out = {
        "owl_lite": bool(os.environ.get("STRESS_DRED_OWL")),
        "n_primary_triples": 2 * N_SUBJ,
        "closure_triples": got[0],
        "rounds": ROUNDS, "merge_rows": MERGE_K, "delete_rows": DELETE_K,
        "build_sec": round(t_build, 2),
        "refresh_secs": refresh_secs,
        "flatness_last_over_first": round(float(last / first), 3),
        "refresh_mean_over_build": round(
            float(np.mean(refresh_secs) / t_build), 3),
        "exact_match_vs_rebuild": bool(got == want),
        "cpus": int(os.environ.get("RAY_GRAFT_CPUS", 32)),
    }
    print(json.dumps(out))
    shutil.rmtree(base, ignore_errors=True)
    ray.shutdown()
    assert got == want, (got, want)


if __name__ == "__main__":
    main()
