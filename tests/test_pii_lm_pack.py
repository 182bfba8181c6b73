"""Unit tests for the round-3 LLM-data operators: PII detect/redact
(operators/pii.py) and char-ngram rarity scoring (operators/lm.py).
Their catalog queries (q142/q143/q144) are additionally covered by the
DuckDB differential suite in test_oracle_parity.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from logistics_data_pipeline_project_spark.operators.lm import char_ngram_rarity
from logistics_data_pipeline_project_spark.operators.pii import (
    pii_audit,
    pii_counts,
    redact_pii,
)


def _redact_one(spark, s: str) -> str:
    df = spark.createDataFrame([(s,)], "t string")
    return df.select(redact_pii("t").alias("r")).first()["r"]


def test_redact_pii_literals(spark):
    assert (
        _redact_one(spark, "mail me at jane.doe+spam@corp.example.co.uk today")
        == "mail me at <EMAIL> today"
    )
    assert _redact_one(spark, "call +91-98765-4321098 now") == "call <PHONE> now"
    assert _redact_one(spark, "host 192.168.0.254 down") == "host <IPV4> down"
    assert _redact_one(spark, "acct 123456789012 closed") == "acct <IDNUM> closed"
    # ordering: the phone must be consumed as PHONE, not as digit runs;
    # the email's digits must never surface as IDNUM
    assert (
        _redact_one(spark, "a1b2c3@x.io or 040-12345-67890123")
        == "<EMAIL> or <PHONE>"
    )
    # short digit runs survive
    assert _redact_one(spark, "order 12345678 shipped") == "order 12345678 shipped"


def test_pii_counts_independent_per_pattern(spark):
    df = spark.createDataFrame(
        [("x@y.io and 10.0.0.1 and 987654321",)], "t string"
    )
    row = df.select(
        *[c.alias(k) for k, c in pii_counts("t").items()]
    ).first()
    assert (row["EMAIL"], row["IPV4"], row["IDNUM"]) == (1, 1, 1)
    assert row["PHONE"] == 0


def test_pii_audit_global_and_grouped(spark):
    df = spark.createDataFrame(
        [
            ("a", "contact x@y.io"),
            ("a", "nothing here"),
            ("b", "ip 10.1.2.3 and 1234567890"),
        ],
        "g string, t string",
    )
    glob = pii_audit(df, "t").first()
    assert glob["n_rows"] == 3
    assert glob["n_email"] == 1 and glob["n_ipv4"] == 1 and glob["n_idnum"] == 1
    assert glob["n_rows_with_pii"] == 2
    by_g = {r["g"]: r for r in pii_audit(df, "t", ["g"]).collect()}
    assert by_g["a"]["n_rows_with_pii"] == 1
    assert by_g["b"]["n_idnum"] == 1
    # chars_delta is the signed original-minus-redacted length
    assert glob["chars_delta"] == sum(
        len(s) - len(_redact_one(spark, s))
        for s in ("contact x@y.io", "nothing here", "ip 10.1.2.3 and 1234567890")
    )


def test_char_ngram_rarity_hand_computed(spark):
    # corpus: "aaa" and "aab" → trigram counts {aaa:1, aab:1},
    # prefix "aa" count 2 ⇒ every doc: sum_prefix=2, sum_gram=1, rarity=2.0
    df = spark.createDataFrame([(1, "aaa"), (2, "aab"), (3, "x")], "id long, t string")
    out = {r["id"]: r for r in char_ngram_rarity(df, "t", "id").collect()}
    assert set(out) == {1, 2}  # "x" is shorter than n and absent
    for i in (1, 2):
        assert out[i]["n_grams"] == 1
        assert out[i]["sum_prefix"] == 2
        assert out[i]["sum_gram"] == 1
        assert out[i]["rarity"] == 2.0


def test_char_ngram_rarity_orders_common_vs_rare(spark):
    # Conditional-model semantics: surprise = a COMMON prefix taking a
    # RARE continuation. The aberrant doc reuses the corpus's frequent
    # bigram prefixes ("th", "ca", "sa") but continues them with "z"
    # ⇒ strictly higher rarity than the repetitive majority doc. (A doc
    # whose prefixes are themselves unique scores 1.0 — p(cont|prefix)=1
    # — matching an unsmoothed conditional model, same as -logp would.)
    rows = [(i, "the cat sat on the mat") for i in range(9)]
    rows.append((99, "thz caz saz"))
    df = spark.createDataFrame(rows, "id long, t string")
    out = {r["id"]: r["rarity"] for r in char_ngram_rarity(df, "t", "id").collect()}
    assert out[99] > out[0]
    # fully-OOV prefixes ⇒ every conditional is 1 ⇒ rarity exactly 1
    solo = spark.createDataFrame([(1, "qqq")], "id long, t string")
    assert char_ngram_rarity(solo, "t", "id").first()["rarity"] == 1.0
