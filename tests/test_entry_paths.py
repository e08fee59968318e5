"""Execution-path parity for size-adaptive driver queries: both sides of
an adaptive crossover must produce identical results (the oracle gate only
ever exercises the small-side path on test data)."""

import sys

sys.path.insert(0, "/root/repo")


def test_link_prediction_join_path_matches_broadcast(ray_session,
                                                     monkeypatch):
    import __ray_entry__ as em

    sf = "/root/testdata/sf0.001"
    want = em.q_kg_link_prediction(sf).to_pandas()
    monkeypatch.setattr(em, "LINKPRED_DEG_BROADCAST_MAX", 0)
    got = em.q_kg_link_prediction(sf).to_pandas()
    key = ["ea", "eb"]
    w = want.sort_values(key).reset_index(drop=True)
    g = got.sort_values(key).reset_index(drop=True)
    assert list(w.columns) == list(g.columns)
    assert w.equals(g[w.columns])
