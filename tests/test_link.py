"""T2/T3/T4: mention detection, candidate generation with ambiguity,
linking max-prior rule, canonicalization."""

import pyarrow as pa

from cattle_ray.aliases import alias_table, entity_uri
from cattle_ray.stages.link import (
    Canonicalizer,
    EntityLinker,
    MentionDetector,
    build_alias_index,
    candidates_batch,
    canonical_uri,
)
from cattle_ray.stages.openie import mention_uri


def test_mention_detector_longest_match():
    det = MentionDetector([a["alias"] for a in __import__("cattle_ray.aliases", fromlist=["alias_rows"]).alias_rows()])
    batch = pa.table(
        {"text": ["Brunei Darussalam borders Qatar.", "no entities here"],
         "url": ["u1", "u2"]}
    )
    out = det(batch)
    mentions = out["mention"].to_pylist()
    assert "Brunei Darussalam" in mentions  # longest-first, not just "Brunei"
    assert "Qatar" in mentions
    assert out["url"].to_pylist() == ["u1", "u1"]


def test_word_boundary():
    det = MentionDetector(["Qatar"])
    out = det(pa.table({"text": ["Qatarish is not Qatar"], "url": ["u"]}))
    assert out["mention"].to_pylist() == ["Qatar"]
    assert out["begin"].to_pylist() == [16]


def test_candidates_ambiguous_alias_emits_both():
    idx = build_alias_index(alias_table())
    # entities 8..15 have an engineered second reading (k+32)
    from cattle_ray.pages import ENTITIES

    amb = ENTITIES[8]
    mentions = pa.table(
        {"url": ["u"], "mention": [amb], "alias_norm": [amb.lower()]}
    )
    cands = candidates_batch(mentions, idx)
    uris = set(cands["entity_uri"].to_pylist())
    assert uris == {entity_uri(8), entity_uri(40)}
    # max-prior first
    assert cands["prior"][0].as_py() == 1.0


def test_linker_rewrites_mention_uris_max_prior():
    import ray

    idx = build_alias_index(alias_table())
    linker = EntityLinker.__new__(EntityLinker)
    linker.index = idx
    linker.cols = ("subj", "obj")
    linker._prefix = "https://example.org/mention/"
    batch = pa.table(
        {
            "subj": [mention_uri("Qatar"), "https://other/x"],
            "obj": [mention_uri("Norway"), mention_uri("Norway")],
            "obj_is_iri": [True, False],
        }
    )
    out = linker(batch)
    assert out["subj"].to_pylist() == [entity_uri(0), "https://other/x"]
    # second row obj is a literal → untouched even though it looks like a mention uri
    assert out["obj"].to_pylist() == [entity_uri(7), mention_uri("Norway")]


def test_canonical_uri_rules():
    assert canonical_uri("HTTPS://Example.ORG/A//b/") == "https://example.org/A/b"
    assert canonical_uri("https://example.org/x") == "https://example.org/x"
    assert canonical_uri("not a uri") == "not a uri"


def test_canonicalizer_batch_prefilter():
    c = Canonicalizer()
    batch = pa.table(
        {
            "subj": ["https://Example.org/a/", "https://example.org/ok"],
            "pred": ["https://example.org/p", "https://example.org/p"],
            "obj": ["KeepMe Literal", "https://UPPER.example/x"],
            "obj_is_iri": [False, True],
        }
    )
    out = c(batch)
    assert out["subj"].to_pylist() == ["https://example.org/a", "https://example.org/ok"]
    assert out["obj"].to_pylist() == ["KeepMe Literal", "https://upper.example/x"]
