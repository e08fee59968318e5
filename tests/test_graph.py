"""PageRank vs a dense numpy reference on small graphs; corpus dedup e2e."""

import numpy as np
import pandas as pd
import pytest


def _numpy_pagerank(edges, n, damping=0.85, iters=10):
    nodes = sorted({u for e in edges for u in e})
    idx = {v: i for i, v in enumerate(nodes)}
    N = len(nodes)
    deg = np.zeros(N)
    for s, _ in edges:
        deg[idx[s]] += 1
    r = np.full(N, 1.0 / N)
    for _ in range(iters):
        dangling = r[deg == 0].sum()
        base = (1 - damping) / N + damping * dangling / N
        new = np.full(N, base)
        for s, d in edges:
            new[idx[d]] += damping * r[idx[s]] / deg[idx[s]]
        r = new
    return {v: r[idx[v]] for v in nodes}


@pytest.mark.parametrize(
    "edges",
    [
        [(1, 2), (2, 3), (3, 1), (3, 4)],                      # cycle + tail
        [(1, 2), (1, 3), (1, 4), (5, 1)],                      # star with dangling leaves
    ],
)
def test_pagerank_matches_numpy(ray_session, edges):
    import ray.data as rd

    from cattle_ray.stages.graph import pagerank

    df = pd.DataFrame(edges, columns=["src", "dst"])
    out = pagerank(rd.from_pandas(df), iters=8).to_pandas()
    got = dict(zip(out["node"], out["rank"]))
    want = _numpy_pagerank(edges, len(got), iters=8)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_dedup_corpus_keeps_representatives(ray_session):
    import ray.data as rd

    from cattle_ray.stages.dedup import dedup_corpus

    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "through the green fields toward the old stone bridge every day")
    rows = [{"doc_id": i, "text": base} for i in range(6)]           # 6 exact dups
    rows += [{"doc_id": 10 + i, "text": f"unique document number {i} about topic "
              + " ".join(f"w{i}{j}" for j in range(20))} for i in range(4)]
    out = dedup_corpus(rd.from_pandas(pd.DataFrame(rows)), threshold=0.9).to_pandas()
    kept = set(out["doc_id"])
    assert 0 in kept                       # min-id representative survives
    assert kept & set(range(1, 6)) == set()  # other copies dropped
    assert set(range(10, 14)) <= kept      # uniques untouched
