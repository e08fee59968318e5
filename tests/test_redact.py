"""PII redaction: ordered RE2 rules, per-rule counts, null passthrough."""

import pyarrow as pa

from cattle_ray.stages.redact import PII_RULES, redact_batch


def _batch(texts):
    return pa.table({"doc_id": list(range(len(texts))), "text": texts})


def test_redacts_all_three_kinds():
    out = redact_batch(_batch([
        "mail a@b.co or c.d@e-f.org",
        "call 555-123-4567 now",
        "from 10.0.0.1 and 192.168.1.42",
        "clean text",
    ]))
    assert out["redacted"].to_pylist() == [
        "mail <EMAIL> or <EMAIL>",
        "call <PHONE> now",
        "from <IP> and <IP>",
        "clean text",
    ]
    assert out["n_email"].to_pylist() == [2, 0, 0, 0]
    assert out["n_phone"].to_pylist() == [0, 1, 0, 0]
    assert out["n_ip"].to_pylist() == [0, 0, 2, 0]


def test_rule_order_is_load_bearing():
    # the email rule runs first, so a phone-shaped local part is consumed
    # by <EMAIL> and never double-counted by the phone rule
    out = redact_batch(_batch(["reach 555-123-4567@corp.example please"]))
    assert out["redacted"].to_pylist() == ["reach <EMAIL> please"]
    assert out["n_email"].to_pylist() == [1]
    assert out["n_phone"].to_pylist() == [0]


def test_null_text_stays_null():
    out = redact_batch(_batch([None, "a@b.co"]))
    assert out["redacted"].to_pylist() == [None, "<EMAIL>"]
    assert out["n_email"].to_pylist() == [None, 1]


def test_custom_rules_and_counts_against_pre_rule_text():
    rules = [("num", r"\d+", "<N>"), ("n_token", r"<N>", "#")]
    out = redact_batch(_batch(["a 12 b 345"]), rules=rules)
    # second rule sees the FIRST rule's output (2 <N> tokens), not the raw text
    assert out["redacted"].to_pylist() == ["a # b #"]
    assert out["n_num"].to_pylist() == [2]
    assert out["n_n_token"].to_pylist() == [2]
    assert len(PII_RULES) == 3
