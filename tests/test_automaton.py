"""Aho-Corasick detector ≡ regex-alternation detector (and scales without
regex compilation)."""

import random

import pyarrow as pa

from cattle_ray.aliases import alias_rows
from cattle_ray.stages.automaton import AhoCorasick, AutomatonMentionDetector
from cattle_ray.stages.link import MentionDetector


def _mention_tuples(out: pa.Table):
    return sorted(
        zip(out["url"].to_pylist(), out["mention"].to_pylist(),
            out["begin"].to_pylist(), out["end"].to_pylist())
    )


def test_matches_regex_detector_on_fixture_aliases():
    aliases = [r["alias"] for r in alias_rows()]
    texts = [
        "Brunei Darussalam borders Qatar.",
        "Qatarish is not Qatar but qatar is.",
        "Entity08 met Entity09; entity08 too. Kuwait!",
        "no entities at all",
        "",
    ]
    batch = pa.table({"text": texts, "url": [f"u{i}" for i in range(len(texts))]})
    rx = MentionDetector(aliases)(batch)
    ac = AutomatonMentionDetector(aliases)(batch)
    assert _mention_tuples(rx) == _mention_tuples(ac)


def test_matches_regex_on_random_text():
    aliases = [r["alias"] for r in alias_rows()]
    rng = random.Random(7)
    words = [r["alias"] for r in alias_rows()] + ["filler", "words", "and", "stuff"]
    texts = [
        " ".join(rng.choice(words) for _ in range(40)) for _ in range(30)
    ]
    batch = pa.table({"text": texts, "url": [str(i) for i in range(len(texts))]})
    rx = MentionDetector(aliases)(batch)
    ac = AutomatonMentionDetector(aliases)(batch)
    assert _mention_tuples(rx) == _mention_tuples(ac)


def test_scales_past_regex_comfort_zone():
    """10^5 patterns: automaton builds and matches fine (regex alternation
    at this size is where compilation becomes the bottleneck)."""
    pats = [f"Entity{i:06d}" for i in range(100_000)]
    ac = AhoCorasick(pats)
    hits = ac.find("see Entity012345 and Entity099999 here")
    assert [h[2] for h in hits] == ["Entity012345", "Entity099999"]


def test_longest_match_wins():
    ac = AhoCorasick(["New York", "New York City", "York"])
    hits = ac.find("in New York City today")
    assert [(h[2]) for h in hits] == ["New York City"]
