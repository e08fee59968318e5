"""Inverted index + conjunctive search: exact postings, layout invariance."""

import pyarrow as pa
import ray.data as rd

from cattle_ray.stages.textstats import inverted_index, search_all_terms

DOCS = [
    (0, "apple banana apple"),
    (1, "banana cherry"),
    (2, "apple cherry durian"),
    (3, ""),
    (4, None),
    (5, "cherry banana apple"),
]


def _ds(num_blocks):
    ids = [d[0] for d in DOCS]
    txt = [d[1] for d in DOCS]
    return rd.from_arrow(pa.table({"doc_id": ids, "text": txt})).repartition(
        num_blocks)


def test_inverted_index_exact_postings(ray_session):
    rows = {r["term"]: r for r in inverted_index(_ds(2)).take_all()}
    assert rows["apple"]["postings"] == "0,2,5"
    assert rows["apple"]["df"] == 3
    assert rows["banana"]["postings"] == "0,1,5"
    assert rows["cherry"]["postings"] == "1,2,5"
    assert rows["durian"]["postings"] == "2"
    assert set(rows) == {"apple", "banana", "cherry", "durian"}


def test_inverted_index_layout_invariant(ray_session):
    a = sorted(map(tuple, (r.values() for r in inverted_index(_ds(1)).take_all())))
    b = sorted(map(tuple, (r.values() for r in inverted_index(_ds(3)).take_all())))
    assert a == b


def test_search_all_terms_conjunctive(ray_session):
    hit = search_all_terms(_ds(2), ["apple", "cherry"])
    assert sorted(r["doc_id"] for r in hit.take_all()) == [2, 5]
    # single term degenerates to a contains query
    one = search_all_terms(_ds(2), ["durian"])
    assert [r["doc_id"] for r in one.take_all()] == [2]
    # duplicate query terms don't inflate the required count
    dup = search_all_terms(_ds(2), ["apple", "apple", "cherry"])
    assert sorted(r["doc_id"] for r in dup.take_all()) == [2, 5]


def test_related_doc_pairs_scores_and_pruning(ray_session):
    from cattle_ray.stages.textstats import related_doc_pairs

    # "x y" appears in docs 1,2 (rare, df=2) — twice in doc 1 (tf=2)
    # "c c" appears in all 4 docs (df=4 > max_df=2) — pruned, no signal
    docs = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "x y q x y c c",   # tf(x y)=2
            "x y r c c",       # tf(x y)=1
            "s t c c",
            "s t u c c",       # shares rare "s t" with doc 3
        ],
    })
    ds = rd.from_arrow(docs).repartition(2)
    out = [(r["doc_a"], r["doc_b"], r["score"])
           for r in related_doc_pairs(ds, max_df=2, k=10).take_all()]
    # score(1,2) = tf1*tf2 = 2; score(3,4) = 1; common "c c" contributes 0
    assert out == [(1, 2, 2), (3, 4, 1)]


def test_related_doc_pairs_topk_tiebreak(ray_session):
    from cattle_ray.stages.textstats import related_doc_pairs

    docs = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": ["a b", "a b", "c d", "c d"],
    })
    out = [(r["doc_a"], r["doc_b"])
           for r in related_doc_pairs(rd.from_arrow(docs), max_df=3,
                                      k=1).take_all()]
    # equal scores: deterministic (score DESC, doc_a, doc_b) keeps (1,2)
    assert out == [(1, 2)]
