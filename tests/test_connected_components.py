"""Distributed min-label-propagation CC vs driver union-find."""

import pandas as pd
import pytest

from cattle_ray.stages.dedup import connected_components, connected_components_distributed


@pytest.mark.parametrize(
    "pairs",
    [
        # two triangles + an isolated edge
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (20, 21)],
        # a chain (worst case for propagation rounds)
        [(i, i + 1) for i in range(15)],
    ],
)
@pytest.mark.parametrize("small_cc_pairs", [0, 10**6])
def test_matches_union_find(ray_session, pairs, small_cc_pairs):
    # both paths: distributed propagation (small_cc_pairs=0) and the
    # single-worker union-find small-graph solve
    import ray.data as rd

    df = pd.DataFrame(pairs, columns=["a", "b"])
    dist = connected_components_distributed(
        rd.from_pandas(df), small_cc_pairs=small_cc_pairs).to_pandas()
    got = dict(zip(dist["id"], dist["label"]))

    uf = connected_components(df)
    # normalize union-find roots to min-id per component
    comp_members: dict = {}
    for node in set(df["a"]) | set(df["b"]):
        comp_members.setdefault(uf.get(node, node), []).append(node)
    want = {}
    for members in comp_members.values():
        m = min(members)
        for x in members:
            want[x] = m
    assert got == want
