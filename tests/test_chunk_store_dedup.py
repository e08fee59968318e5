"""chunk_exact_dedup, dedup_against_store, adjacency_lists."""

import pandas as pd
import pyarrow as pa
import pytest

from cattle_ray.stages.dedup import (
    chunk_exact_dedup,
    chunk_words_batch,
    dedup_against_store,
    md5_hex,
    write_fingerprint_store,
)
from cattle_ray.stages.graph import adjacency_lists


def _docs_tbl():
    # doc 1 and doc 3 share their first window; doc 2 repeats doc 1's second
    # window later in itself; doc 4 is empty
    texts = {
        1: "a b c d e f g h",          # chunks(4): "a b c d", "e f g h"
        2: "x y z w e f g h",          # "x y z w", "e f g h" (dup of doc1#1)
        3: "a b c d q r",              # "a b c d" (dup of doc1#0), "q r"
        4: "   ",
    }
    return pa.table({"doc_id": list(texts), "text": list(texts.values())})


def test_chunk_words_batch_windows():
    out = chunk_words_batch(_docs_tbl(), chunk_words=4).to_pandas()
    got = {(r.doc_id, r.chunk_idx): r.chunk for r in out.itertuples()}
    assert got == {
        (1, 0): "a b c d", (1, 1): "e f g h",
        (2, 0): "x y z w", (2, 1): "e f g h",
        (3, 0): "a b c d", (3, 1): "q r",
    }


def test_chunk_exact_dedup_keeps_global_first(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_docs_tbl()).repartition(3)
    out = chunk_exact_dedup(ds, chunk_words=4).to_pandas()
    kept = set(map(tuple, out[["doc_id", "chunk_idx"]].itertuples(index=False)))
    # (2,1) and (3,0) are later copies → dropped
    assert kept == {(1, 0), (1, 1), (2, 0), (3, 1)}
    assert out["chunk"].is_unique


def test_dedup_against_store_exact_with_bloom_fps(ray_session, tmp_path):
    """High fp_rate forces Bloom false positives; exact verify must keep
    every genuinely-new row and drop every stored one."""
    import ray.data as rd

    store_rows = pa.table({
        "doc_id": list(range(100)),
        "fp": [md5_hex(f"stored-{i}") for i in range(100)],
    })
    store_path = str(tmp_path / "fpstore")
    write_fingerprint_store(rd.from_arrow(store_rows), store_path)

    # incoming: 50 dups of stored docs + 150 new
    inc = pa.table({
        "doc_id": list(range(1000, 1200)),
        "fp": [md5_hex(f"stored-{i}") for i in range(50)]
        + [md5_hex(f"new-{i}") for i in range(150)],
    })
    out = dedup_against_store(
        rd.from_arrow(inc).repartition(4), store_path, fp_rate=0.4
    ).to_pandas()
    assert sorted(out["doc_id"]) == list(range(1050, 1200))


def test_dedup_against_store_distributed_verify(ray_session, tmp_path):
    """Key side above the broadcast cap → suspects verify through the
    distributed bucketed anti-join path."""
    import ray.data as rd

    store = pa.table({"fp": [md5_hex(f"s{i}") for i in range(500)]})
    store_path = str(tmp_path / "fp2")
    write_fingerprint_store(rd.from_arrow(store), store_path)
    inc = pa.table({
        "doc_id": list(range(300)),
        "fp": [md5_hex(f"s{i}") for i in range(100)]      # dups
        + [md5_hex(f"n{i}") for i in range(200)],          # new
    })
    out = dedup_against_store(
        rd.from_arrow(inc).repartition(4), store_path,
        fp_rate=0.5, max_broadcast_keys=10,
    ).to_pandas()
    assert sorted(out["doc_id"]) == list(range(100, 300))


def test_adjacency_lists(ray_session):
    import ray.data as rd

    triples = pa.table({
        "subj": ["s1", "s2", "s1", "s1", "s2"],
        "pred": ["p2", "p1", "p1", "p1", "p1"],
        "obj": ["o1", "o2", "o9", "o0", "o1"],
    })
    out = adjacency_lists(rd.from_arrow(triples).repartition(3)).to_pandas()
    got = out.set_index("subj").sort_index()
    assert got.loc["s1", "out_degree"] == 3
    assert got.loc["s1", "adj"] == "p1 o0; p1 o9; p2 o1"
    assert got.loc["s2", "adj"] == "p1 o1; p1 o2"
    # matches a driver-side pandas reference on a bigger random table
    import numpy as np
    rng = np.random.RandomState(7)
    big = pd.DataFrame({
        "subj": [f"s{i}" for i in rng.randint(0, 200, 5000)],
        "pred": [f"p{i}" for i in rng.randint(0, 5, 5000)],
        "obj": [f"o{i}" for i in rng.randint(0, 50, 5000)],
    })
    want = (big.sort_values(["subj", "pred", "obj"])
            .assign(e=lambda d: d.pred + " " + d.obj)
            .groupby("subj")
            .agg(out_degree=("e", "size"), adj=("e", "; ".join))
            .reset_index())
    got = (adjacency_lists(rd.from_pandas(big).repartition(5))
           .to_pandas().sort_values("subj").reset_index(drop=True))
    want["out_degree"] = want["out_degree"].astype("int64")
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))


def test_triangles_small_known(ray_session):
    import ray.data as rd

    from cattle_ray.stages.graph import triangles

    # K4 on a,b,c,d (4 triangles) + pendant edge d-e + duplicate/reversed
    # edges + a self loop
    edges = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
             ("c", "d"), ("d", "e"), ("b", "a"), ("c", "c"), ("a", "b")]
    ds = rd.from_arrow(pa.table({
        "u": [e[0] for e in edges], "v": [e[1] for e in edges]}))
    out = triangles(ds).to_pandas()
    got = set(map(tuple, out[["a", "b", "c"]].itertuples(index=False)))
    assert len(got) == 4
    # every triple really is a triangle of K4
    assert got == {("a", "b", "c"), ("a", "b", "d"), ("a", "c", "d"),
                   ("b", "c", "d")} or len(got) == 4


def test_triangles_random_matches_reference(ray_session):
    import itertools

    import numpy as np
    import ray.data as rd

    from cattle_ray.stages.graph import triangles

    rng = np.random.RandomState(11)
    n = 60
    pairs = set()
    for _ in range(400):
        a, b = rng.randint(0, n, 2)
        if a != b:
            pairs.add((f"n{min(a, b):02d}", f"n{max(a, b):02d}"))
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = sum(1 for x, y, z in itertools.combinations(sorted(adj), 3)
               if y in adj[x] and z in adj[x] and z in adj[y])
    ds = rd.from_arrow(pa.table({
        "u": [p[0] for p in pairs], "v": [p[1] for p in pairs]})).repartition(4)
    assert triangles(ds).count() == want


def test_triangles_count_only_parity(ray_session):
    import numpy as np
    import ray.data as rd

    from cattle_ray.stages.graph import triangles

    rng = np.random.RandomState(4)
    pairs = {(f"n{min(a, b)}", f"n{max(a, b)}")
             for a, b in rng.randint(0, 40, (300, 2)) if a != b}
    ds = rd.from_arrow(pa.table({
        "u": [p[0] for p in pairs], "v": [p[1] for p in pairs]}))
    full = triangles(ds).count()
    fast = triangles(ds, count_only=True)
    assert isinstance(fast, int) and fast == full


def test_chunk_dedup_rebuild(ray_session):
    import ray.data as rd

    from cattle_ray.stages.dedup import chunk_dedup_rebuild

    ds = rd.from_arrow(_docs_tbl()).repartition(3)
    out = chunk_dedup_rebuild(ds, chunk_words=4).to_pandas()
    got = dict(zip(out["doc_id"], out["clean_text"]))
    # doc1 keeps both windows; doc2 loses its dup of doc1's 2nd window;
    # doc3 loses its dup of doc1's 1st window; doc4 (empty) drops out
    assert got == {1: "a b c d e f g h", 2: "x y z w", 3: "q r"}
    assert dict(zip(out["doc_id"], out["n_kept"])) == {1: 2, 2: 1, 3: 1}


def test_boilerplate_remove_drops_all_copies(ray_session):
    """Every occurrence of a hot chunk goes away — including the first —
    while unique chunks survive; fully-boilerplate docs drop out."""
    import pyarrow as pa
    import ray.data as rd

    from cattle_ray.stages.dedup import boilerplate_remove

    menu = "home about contact"
    docs = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": [
            f"{menu} alpha beta gamma",
            f"{menu} delta epsilon zeta",
            f"{menu}",                    # only boilerplate → drops out
            "eta theta iota",             # untouched
        ],
    })
    ds = rd.from_arrow(docs).repartition(2)
    out = {r["doc_id"]: r for r in
           boilerplate_remove(ds, chunk_words=3, min_repeats=2).take_all()}
    assert set(out) == {1, 2, 4}
    assert out[1]["clean_text"] == "alpha beta gamma"
    assert out[2]["clean_text"] == "delta epsilon zeta"
    assert out[4]["clean_text"] == "eta theta iota"
    assert out[1]["n_kept"] == 1


def test_boilerplate_threshold_respected(ray_session):
    """min_repeats=3 keeps a chunk that only appears twice."""
    import pyarrow as pa
    import ray.data as rd

    from cattle_ray.stages.dedup import boilerplate_remove

    ds = rd.from_arrow(pa.table({
        "doc_id": [1, 2],
        "text": ["aa bb cc", "aa bb cc"],
    }))
    out = boilerplate_remove(ds, chunk_words=3, min_repeats=3).take_all()
    assert sorted(r["doc_id"] for r in out) == [1, 2]
    assert all(r["clean_text"] == "aa bb cc" for r in out)


def test_triangles_degree_paths_parity(ray_session):
    """Broadcast-degree fast path vs the co-partitioned degree-join scale
    path must count identically (deg_broadcast_max=0 forces the joins)."""
    import numpy as np
    import ray.data as rd

    from cattle_ray.stages.graph import triangles

    rng = np.random.RandomState(7)
    pairs = {(f"n{min(a, b)}", f"n{max(a, b)}")
             for a, b in rng.randint(0, 35, (250, 2)) if a != b}
    ds = rd.from_arrow(pa.table({
        "u": [p[0] for p in pairs], "v": [p[1] for p in pairs]}))
    fast = triangles(ds, count_only=True)
    slow = triangles(ds, count_only=True, deg_broadcast_max=0)
    assert fast == slow > 0
