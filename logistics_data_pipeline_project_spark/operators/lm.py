"""Corpus-statistics language-model scoring — the quality-filter family
(CCNet-style: score every document against a model trained on the corpus
itself, then gate or bucket on the score), built entirely from DataFrame
aggregations.

The classic scorer is char-n-gram perplexity: exp(mean -log p(c_i |
c_{i-n+1..i-1})). Floating-point log/exp are libm calls whose last bits
differ across engines, which would break this engine's bit-equality
determinism policy (queries/registry.py) — so :func:`char_ngram_rarity`
reports the INTEGER-EXACT macro proxy instead: per document,
``sum(prefix_count) / sum(ngram_count)`` over its n-gram occurrences.
Each summand pair is the reciprocal conditional probability's numerator/
denominator; the ratio of the two integer sums is a weighted average
branching factor — high when the document's continuations are rare under
the corpus model, exactly the signal the -log-mean orders by — computed
with one IEEE division per document (bit-identical everywhere). A true
-log scorer is the one-line variant (``sum(log(c2) - log(c3))``) for
consumers that tolerate last-bit drift.

Scale shape (the reason this formulation wins at 100 TB):
- n-gram explosion is map-side (``transform(sequence(...))`` + explode —
  whole-stage codegen, no Python);
- the two model aggregations shuffle only n-gram keys, and the model's
  cardinality is bounded by charset^n, NOT corpus size — both models
  broadcast;
- scoring is therefore a map-side broadcast join; the only full shuffle
  keyed on documents is the final per-doc sum, map-side combined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def char_ngram_rarity(
    df: DataFrame, text_col: str, id_col: str, n: int = 3
) -> DataFrame:
    """Per-document rarity under the corpus's own char-``n``-gram model.

    Returns ``(id_col, n_grams, sum_prefix, sum_gram, rarity)`` where
    ``rarity = sum_prefix / sum_gram`` as DOUBLE (one exact IEEE
    division of two < 2^53 integer sums). Documents shorter than ``n``
    characters carry no n-grams and are absent from the result — the
    same convention the length-filter stage upstream would enforce.
    """
    if n < 2:
        raise ValueError("char_ngram_rarity needs n >= 2 (a conditional model)")
    from .scale import fan_out

    # n-gram explosion multiplies work per row ~|text|-fold, but scan
    # parallelism follows bytes — fan the (byte-small) raw rows out to
    # cluster parallelism before exploding; a no-op when the scan is
    # already wide (real scale)
    t = fan_out(
        df.select(id_col, F.col(text_col).alias("__t")).where(
            F.length("__t") >= n
        )
    )
    # Hierarchical rollup — per-doc gram counts are computed ONCE and
    # every coarser statistic derives from the previous level, never
    # re-reading the corpus: tokens -> per-doc gram counts -> gram model
    # -> prefix model.  The per-doc counts come from the Arrow twin
    # (text.py::char_ngram_count_rows — the interpreted substring
    # transform was the stage's dominant CPU); the groupBy below only
    # re-reduces across input rows sharing an id, same semantics as the
    # old explode + count.
    from .text import char_ngram_count_rows

    doc_grams = (
        char_ngram_count_rows(t, id_col, "__t", n)
        .groupBy(id_col, "__g")
        .agg(F.sum("__cnt").alias("__cnt"))
    )
    # doc_grams feeds the scoring probe AND both broadcast model
    # subtrees; Spark does not reuse logically-shared subtrees across a
    # broadcast boundary, so without a barrier the n-gram explode +
    # first-level aggregate ran once per consumer (profiled at sf0.1:
    # two ~10 s 32-task stages for one explode — guide §2.4, remove
    # recomputation).  Lazy localCheckpoint materializes it once.
    doc_grams = doc_grams.localCheckpoint(eager=False)
    gram_model = doc_grams.groupBy("__g").agg(F.sum("__cnt").alias("__c3"))
    # charset^n-bounded — tiny; keeps the pre_model broadcast job from
    # re-aggregating doc_grams a second time
    gram_model = gram_model.localCheckpoint(eager=False)
    pre_model = gram_model.groupBy(
        F.substring("__g", 1, n - 1).alias("__pre")
    ).agg(F.sum("__c3").alias("__c2"))
    # scoring = broadcast joins against the bounded-cardinality models;
    # per-doc sums weight each distinct gram by its occurrence count
    # (identical to summing per occurrence, with far fewer join rows)
    scored = doc_grams.join(F.broadcast(gram_model), "__g").join(
        F.broadcast(pre_model),
        F.substring(F.col("__g"), 1, n - 1) == F.col("__pre"),
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.sum("__cnt").alias("n_grams"),
            F.sum(F.col("__cnt") * F.col("__c2")).alias("sum_prefix"),
            F.sum(F.col("__cnt") * F.col("__c3")).alias("sum_gram"),
        )
        .withColumn(
            "rarity",
            F.col("sum_prefix").cast("double")
            / F.col("sum_gram").cast("double"),
        )
    )
