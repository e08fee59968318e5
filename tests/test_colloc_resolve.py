"""collocation_lift (bigram lift / PMI core) and entity_resolution."""

import collections

import numpy as np
import pandas as pd
import pyarrow as pa

from cattle_ray.stages.link import entity_resolution
from cattle_ray.stages.textstats import bigrams_batch, collocation_lift


def test_bigrams_batch():
    t = pa.table({"text": ["a b c", "x y", "solo", "", None]})
    out = bigrams_batch(t).to_pandas()
    got = list(map(tuple, out.itertuples(index=False)))
    assert got == [("a", "b"), ("b", "c"), ("x", "y")]


def test_collocation_lift_matches_counter_reference(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(3)
    vocab = [f"w{i}" for i in range(12)]
    texts = []
    for i in range(200):
        words = [vocab[j] for j in rng.randint(0, 12, 30)]
        if i % 3 == 0:
            words[5:7] = ["hot", "pair"]  # planted collocation
        texts.append(" ".join(words))
    ds = rd.from_arrow(pa.table({"text": texts})).repartition(4)
    out = collocation_lift(ds, min_count=3, k=20).to_pandas()

    # driver reference
    uni = collections.Counter()
    big = collections.Counter()
    for t in texts:
        ws = t.split()
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
    nt, nb = sum(uni.values()), sum(big.values())
    rows = []
    for (w1, w2), c12 in big.items():
        if c12 >= 3:
            lift = np.round(
                np.float64(c12 * nt * nt) / np.float64(nb * uni[w1] * uni[w2]), 6)
            rows.append((w1, w2, c12, lift))
    want = (pd.DataFrame(rows, columns=["w1", "w2", "c12", "lift"])
            .sort_values(["lift", "w1", "w2"], ascending=[False, True, True])
            .head(20).reset_index(drop=True))
    got = out.reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["w1", "w2", "c12", "lift"]],
        want.astype({"c12": "int64"}))
    assert got.iloc[0][["w1", "w2"]].tolist() == ["hot", "pair"]


def test_entity_resolution_blocks_and_singletons(ray_session):
    import ray.data as rd

    rows = []
    # block "alpha": 9 members → canonical = min id; "beta": 2; "gamma": 1
    for i in range(9):
        rows.append({"uri": f"http://e/a{i}", "name": "alpha"})
    rows += [{"uri": "http://e/b1", "name": "beta"},
             {"uri": "http://e/b0", "name": "beta"},
             {"uri": "http://e/solo", "name": "gamma"}]
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
    out = entity_resolution(ds, "uri", "name").to_pandas()
    got = dict(zip(out["uri"], out["canonical"]))
    assert len(got) == 12
    for i in range(9):
        assert got[f"http://e/a{i}"] == "http://e/a0"
    assert got["http://e/b0"] == got["http://e/b1"] == "http://e/b0"
    assert got["http://e/solo"] == "http://e/solo"


def test_entity_resolution_deep_tree_propagation(ray_session):
    """Forcing the distributed CC path (small_cc_pairs=0) with ~200-member
    blocks exercises ~8 levels of tree-label propagation."""
    import ray.data as rd

    n = 600
    rows = [{"uri": f"http://e/n{i:05d}", "name": f"blk{i % 3}"}
            for i in range(n)]
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(4)
    out = entity_resolution(ds, "uri", "name", small_cc_pairs=0).to_pandas()
    want_canon = {f"blk{k}": f"http://e/n{k:05d}" for k in range(3)}
    got = dict(zip(out["uri"], out["canonical"]))
    assert len(got) == n
    for i in range(n):
        assert got[f"http://e/n{i:05d}"] == want_canon[f"blk{i % 3}"]


def test_grouped_topk_multi_order_and_rank(ray_session):
    import ray.data as rd

    from cattle_ray.stages.aggregates import grouped_topk

    t = pa.table({
        "k": ["a"] * 4 + ["b"] * 2,
        "x": [3, 3, 9, 1, 5, 5],
        "y": ["z", "m", "q", "q", "b", "a"],
    })
    out = grouped_topk(rd.from_arrow(t).repartition(3), "k",
                       ["x", "y"], [False, True], 2,
                       rank_col="rank").to_pandas()
    got = out.sort_values(["k", "rank"]).reset_index(drop=True)
    # a: x desc → 9 first; then x=3 tie → y asc 'm' before 'z'
    assert got[["k", "x", "y", "rank"]].values.tolist() == [
        ["a", 9, "q", 1], ["a", 3, "m", 2],
        ["b", 5, "a", 1], ["b", 5, "b", 2]]


def test_entity_resolution_multi_rule_transitive(ray_session):
    """A~B share a name, B~C share an alias, D's keys are all null:
    multi-rule blocking must put {A,B,C} in one cluster and keep D a
    singleton."""
    import ray.data as rd

    rows = [
        {"uri": "http://e/A", "name": "n1", "alias": None},
        {"uri": "http://e/B", "name": "n1", "alias": "x9"},
        {"uri": "http://e/C", "name": "n2", "alias": "x9"},
        {"uri": "http://e/D", "name": None, "alias": None},
        # a name value colliding with an ALIAS value must NOT link (rule
        # namespacing): E's alias equals F's name
        {"uri": "http://e/E", "name": None, "alias": "zz"},
        {"uri": "http://e/F", "name": "zz", "alias": None},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(2)
    out = entity_resolution(ds, "uri", ["name", "alias"]).to_pandas()
    got = dict(zip(out["uri"], out["canonical"]))
    assert len(got) == 6
    assert got["http://e/A"] == got["http://e/B"] == got["http://e/C"] \
        == "http://e/A"
    assert got["http://e/D"] == "http://e/D"
    assert got["http://e/E"] == "http://e/E"
    assert got["http://e/F"] == "http://e/F"
