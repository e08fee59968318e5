"""BGP evaluator properties: the planner's pure invariants under
hypothesis, and randomized bag-semantics parity of the full evaluator
against a naive backtracking reference (join order must not matter)."""

import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cattle_ray.stages.bgp import _display_vars, order_patterns

_TERM = st.one_of(
    st.sampled_from(["?a", "?b", "?c", "?d"]),
    st.sampled_from(["k1", "k2", "k3"]),
)


def _pvars(p):
    return {t[1:] for t in p if t.startswith("?")}


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(_TERM, _TERM, _TERM), min_size=1, max_size=5))
def test_order_patterns_invariants(pats):
    """The plan is a permutation; every prefix that CAN connect does
    (a disconnected suffix only when no remaining pattern connects);
    constants-first greedy start; deterministic."""
    plan = order_patterns(pats)
    assert sorted(map(tuple, plan)) == sorted(map(tuple, pats))
    assert plan == order_patterns(pats)  # deterministic

    # the first pattern has the max constant count among all patterns
    def score(p):
        return sum(0 if t.startswith("?") else 1 for t in p)

    assert score(plan[0]) == max(score(p) for p in pats)

    # connectivity-greedy: once a pattern in the plan shares no var with
    # everything before it, NO later pattern may share a var with the
    # bound set either (the planner only falls through when stuck)
    bound = _pvars(plan[0])
    stuck = False
    for p in plan[1:]:
        if _pvars(p) & bound:
            assert not stuck, "connected pattern scheduled after fallout"
            bound |= _pvars(p)
        else:
            if _pvars(p):  # constant-only patterns never connect
                stuck = stuck or all(
                    not (_pvars(q) & bound) for q in plan[1:])
    # display vars: first appearance in USER order, planner-independent
    assert _display_vars(pats) == _display_vars(list(pats))


def _ref_eval(rows, patterns):
    """Naive backtracking evaluation — bag semantics, any pattern order."""
    sols = [dict()]
    for pat in patterns:
        out = []
        for b in sols:
            for (s, p, o) in rows:
                m, ok = dict(b), True
                for term, val in zip(pat, (s, p, o)):
                    if term.startswith("?"):
                        v = term[1:]
                        if v in m and m[v] != val:
                            ok = False
                            break
                        m[v] = val
                    elif term != val:
                        ok = False
                        break
                if ok:
                    out.append(m)
        sols = out
    return sols


def test_evaluate_bgp_matches_backtracking_reference(ray_session):
    """Seeded random graphs × chain patterns: the distributed fold (with
    the planner on) returns exactly the reference's solution BAG."""
    import random

    import ray.data as rd

    from cattle_ray.stages.bgp import evaluate_bgp

    for seed in range(5):
        rng = random.Random(seed)
        nodes = [f"n{i}" for i in range(8)]
        preds = ["p", "q", "r"]
        rows = list({(rng.choice(nodes), rng.choice(preds),
                      rng.choice(nodes)) for _ in range(40)})
        # connected chain: ?v0 —p— ?v1 —p— ?v2, with a random constant
        # endpoint sometimes
        pats = []
        n_pat = rng.randint(1, 3)
        for i in range(n_pat):
            s = f"?v{i}"
            o = f"?v{i + 1}" if (i < n_pat - 1 or rng.random() < 0.5) \
                else rng.choice(nodes)
            pats.append((s, rng.choice(preds), o))
        ref = _ref_eval(rows, pats)
        vars_ = sorted({v for m in ref for v in m})
        want = sorted(tuple(m[v] for v in vars_) for m in ref)

        t = pa.table({"subj": [r[0] for r in rows],
                      "pred": [r[1] for r in rows],
                      "obj": [r[2] for r in rows]})
        got_df = evaluate_bgp(rd.from_arrow(t).repartition(3), pats,
                              num_buckets=4).to_pandas()
        if not ref:
            assert len(got_df) == 0
            continue
        got = sorted(tuple(r) for r in got_df[vars_].itertuples(index=False))
        assert got == want, (seed, pats)
