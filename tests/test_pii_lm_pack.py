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


def test_chunk_documents_covers_and_overlaps(spark):
    from logistics_data_pipeline_project_spark.operators.text import (
        chunk_documents,
    )

    text = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame([(1, text), (2, "a b"), (3, "solo")], "id long, t string")
    out = chunk_documents(df, "t", "id", chunk_tokens=16, overlap=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["id"], []).append(r)
    # doc 1: stride 12, starts 1,13,...,97 → ceil(100/12)=9 chunks
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert len(c1) == 9
    assert [r["start_tok"] for r in c1] == [1 + 12 * i for i in range(9)]
    # consecutive chunks overlap by exactly 4 tokens
    for a, b in zip(c1, c1[1:]):
        at = a["chunk_text"].split(" ")
        bt = b["chunk_text"].split(" ")
        assert at[-4:] == bt[:4]
    # dropping each chunk's leading overlap reconstructs the original
    rebuilt = c1[0]["chunk_text"].split(" ")
    for b in c1[1:]:
        rebuilt += b["chunk_text"].split(" ")[4:]
    assert " ".join(rebuilt) == text
    # short docs produce one (possibly short) chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_len"] == 2
    assert by_doc[3][0]["chunk_text"] == "solo"


def test_redact_pii_idempotent_property(spark):
    """Redaction must be a fixpoint: the <TYPE> tokens and surviving text
    must never re-match any pattern (hypothesis over adversarial
    fragments that straddle pattern boundaries)."""
    from hypothesis import given, settings, strategies as st

    frag = st.sampled_from(
        [
            "a@b.io",
            "x@y.example.com",
            "+91-12345-6789012",
            "12-345-6789",
            "10.0.0.1",
            "999.999.999.999",
            "123456789",
            "12345678",
            "@",
            ".",
            "-",
            " ",
            "word",
            "<EMAIL>",
            "9",
        ]
    )
    texts = st.lists(frag, min_size=0, max_size=6).map("".join)

    @settings(max_examples=30, deadline=None)
    @given(texts)
    def check(s):
        once = _redact_one(spark, s)
        twice = _redact_one(spark, once)
        assert once == twice

    check()


def test_bpe_merge_fold_edge_cases(spark):
    from logistics_data_pipeline_project_spark.operators.bpe import _apply_merge

    def run(sym, left, right):
        df = spark.createDataFrame([(sym,)], "sym string")
        return df.select(_apply_merge(F.col("sym"), left, right).alias("o")).first()["o"]

    assert run("l o w", "l", "o") == "lo w"
    # overlapping run merges non-overlapping left-to-right: a a a -> aa a
    assert run("a a a", "a", "a") == "aa a"
    assert run("a a a a", "a", "a") == "aa aa"
    # the freshly merged symbol must not chain-merge in the same round
    assert run("a b b", "a", "b") == "ab b"
    # multi-char symbols and the word-boundary (whole-acc) case
    assert run("ab c", "ab", "c") == "abc"
    assert run("x ab c y", "ab", "c") == "x abc y"
    # no match -> unchanged
    assert run("q r s", "a", "b") == "q r s"


def test_bpe_learn_classic_example(spark):
    from logistics_data_pipeline_project_spark.operators.bpe import bpe_learn

    df = spark.createDataFrame(
        [("low lower lowest low low newer newest new",),
         ("wider wide new newer low",)],
        "t string",
    )
    merges, words = bpe_learn(df, "t", rounds=4)
    assert [m["merged"] for m in merges] == ["lo", "low", "ew", "new"]
    assert merges[0]["pair_weight"] == 6  # 'l o' in low(3-weighted forms)+...
    sym = {r["word"]: r["sym"] for r in words.collect()}
    assert sym["low"] == "low" and sym["newest"] == "new e s t"


def test_normalize_text_merges_trivial_variants(spark):
    from logistics_data_pipeline_project_spark.operators.text import (
        normalize_text,
    )

    rows = [
        (1, "Hello  World"),
        (2, "hello world"),
        (3, " hello\tworld "),      # tab is a control char -> space
        (4, "hello\x00world"),      # NUL -> space
        (5, "different text"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    out = df.select("id", normalize_text("t").alias("n"))
    forms = {r["id"]: r["n"] for r in out.collect()}
    assert forms[1] == forms[2] == forms[3] == forms[4] == "hello world"
    assert forms[5] == "different text"


def test_bpe_merge_exhaustion_matches_oracle(spark):
    """When the corpus runs out of pairs before the configured rounds,
    Spark breaks out of the loop keeping the words table — the unrolled
    SQL chain must pass the vocabulary through its empty-argmax rounds
    rather than cross-joining it away (review finding)."""
    import duckdb

    from logistics_data_pipeline_project_spark.operators.bpe import bpe_learn
    from logistics_data_pipeline_project_spark.queries.llmdata import _bpe_ctes

    df = spark.createDataFrame([("ab ab cd",)], "text string")
    merges, words = bpe_learn(df, "text", rounds=8)
    assert [m["merged"] for m in merges] == ["ab", "cd"]
    got = {(r["word"], r["w"], r["sym"]) for r in words.collect()}

    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT 'ab ab cd' AS text")
    want = set(
        con.sql(
            "WITH " + _bpe_ctes(8) + " SELECT word, w, sym FROM w8"
        ).fetchall()
    )
    assert got == want == {("ab", 2, "ab"), ("cd", 1, "cd")}
    m_sql = con.sql(
        "WITH " + _bpe_ctes(8) + " SELECT rnd, merged FROM merges ORDER BY rnd"
    ).fetchall()
    assert [x[1] for x in m_sql] == ["ab", "cd"]


def test_importance_tiers_skew_on_real_signal(spark):
    """q154's tier machinery on a corpus WITH distributional signal:
    target docs written in a distinct alphabet must land in strictly
    higher tiers than off-target docs (the driver corpus is signal-free
    by construction, so the skew is demonstrated here)."""
    from pyspark.sql import functions as F

    rows = [(i, "qxz wvk jqx zzq wkv") for i in range(10)]          # target-ish
    rows += [(100 + i, "aaa bbb ccc ddd eee") for i in range(10)]   # off-target
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    t = docs.select("doc_id", F.col("text").alias("__t"))
    tok = t.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, length(__t) - 2),"
                " i -> substring(__t, i, 3))"
            )
        ).alias("tri"),
    )
    all_model = tok.groupBy("tri").agg(F.count(F.lit(1)).alias("ca"))
    tgt_model = (
        tok.join(docs.filter("doc_id < 100").select("doc_id"), "doc_id")
        .groupBy("tri")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    per_doc = (
        tok.join(F.broadcast(all_model), "tri")
        .join(F.broadcast(tgt_model), "tri", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("ca").alias("sum_all"),
            F.sum(F.coalesce("ct", F.lit(0))).alias("sum_tgt"),
        )
    )
    mass = all_model.agg(F.sum("ca").alias("n_all")).crossJoin(
        tgt_model.agg(F.sum("ct").alias("n_tgt"))
    )
    tiers = {
        r["doc_id"]: r["tier"]
        for r in per_doc.crossJoin(F.broadcast(mass))
        .select(
            "doc_id",
            (
                F.lit(1)
                + F.least(
                    F.lit(7),
                    F.greatest(
                        F.lit(0),
                        F.expr(
                            "(8 * sum_tgt * n_all) DIV (sum_all * n_tgt) - 4"
                        ),
                    ),
                )
            ).alias("tier"),
        )
        .collect()
    }
    assert min(tiers[i] for i in range(10)) > max(tiers[100 + i] for i in range(10))
    assert max(tiers[100 + i] for i in range(10)) == 1  # off-target floor
