"""Corpus-curation model set: the LLM-data operators wired into the
engine's dbt-style runner as a dependency DAG — the medallion pattern
the reference applies to logistics facts, applied to a document corpus:

    raw documents
      → docs_normalized   (canonical text form + token stats)
      → docs_filtered     (quality gates: length + repetition)
      → docs_deduped      (exact dedup on the normalized hash)
      → docs_packed       (context-window sequence packing)
      → quality_model     (full-batch perceptron trained ON the corpus)
      → docs_scored       (the trained weights applied back as a column)
      → curation_report   (per-source funnel: raw→clean→unique→tokens)

The quality_model → docs_scored pair is the train-then-score loop every
curation pipeline runs: the model is learned from the corpus itself
(operators/linear.py: one integer-exact aggregate per epoch) and its
final weights come back as a plain column expression — scoring is pure
codegen, no Python in the hot path, and the learned margin rides along
for threshold tuning downstream.

Each stage materializes atomically through the TableStore, carries
dbt-style data-quality checks gated BEFORE the write, and appends audit
rows — so a corpus refresh gets the same operational guarantees as the
reference's silver/gold builds (audit, alerts, rollback). The stages
re-use the catalog operators (text.normalize_text, dedup.exact_dedup,
ranking.with_running_sum), so everything here inherits their 100 TB
shapes: hash-keyed dedup shuffles, range-partitioned prefix sums, no
single-partition sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.dedup import exact_dedup
from ..operators.linear import perceptron_epochs
from ..operators.ranking import with_running_sum
from ..operators.text import normalize_text, top_ngram_repetition
from ..plans.quality import accepted_values, not_null, run_checks, unique
from ..plans.runner import Model, ModelRunner

#: quality gates (Gopher-style bounds, scaled to the toy corpus)
MIN_TOKENS = 3
MAX_TOKENS = 100_000
MAX_TOP_TOKEN_SHARE = 0.5  # most frequent token may cover ≤ half the doc
PACK_BUDGET = 512
#: quality-model hyperparameters: the label rule (docs at/above the cut
#: are "long-form quality") and the feature centering that keeps
#: full-batch steps from overshooting (see queries/llmdata.py q156)
QUALITY_LEN_CUT = 5
QUALITY_EPOCHS = 4


def docs_normalized(docs: DataFrame) -> DataFrame:
    d = docs.select(
        "doc_id",
        "source",
        "lang",
        "text",
        normalize_text("text").alias("norm"),
    )
    toks = F.split(F.col("norm"), " ")
    return d.withColumn("n_tokens", F.size(toks).cast("long"))


def docs_filtered(normalized: DataFrame) -> DataFrame:
    # Gopher-style repetition gate reusing the catalog operator: the
    # top 1-gram's character coverage per doc (q029's metric)
    rep = top_ngram_repetition(
        normalized.select("doc_id", "norm"), "norm", "doc_id", n=1
    ).select("doc_id", F.col("char_frac").alias("top_token_share"))
    return (
        normalized.join(rep, "doc_id", "left")
        .withColumn(
            "top_token_share", F.coalesce("top_token_share", F.lit(0.0))
        )
        .filter(
            (F.col("n_tokens") >= MIN_TOKENS)
            & (F.col("n_tokens") <= MAX_TOKENS)
            & (F.col("top_token_share") <= MAX_TOP_TOKEN_SHARE)
        )
    )


def docs_deduped(filtered: DataFrame) -> DataFrame:
    keepers = exact_dedup(filtered, "norm", "doc_id").select(
        F.col("keeper_doc_id").alias("doc_id"), "dup_count"
    )
    return filtered.join(keepers, "doc_id")


def docs_packed(deduped: DataFrame) -> DataFrame:
    c = with_running_sum(
        deduped.select("doc_id", "source", "n_tokens"),
        [F.asc("doc_id")],
        "n_tokens",
        cum="cum",
        total="__tot",
    )
    return c.select(
        "doc_id",
        "source",
        "n_tokens",
        F.expr(f"(cum - n_tokens) DIV {PACK_BUDGET}").alias("bin_id"),
    )


def _quality_feats(deduped: DataFrame) -> DataFrame:
    nd = F.size(F.array_distinct(F.split(F.col("norm"), " ")))
    return deduped.select(
        "doc_id",
        F.lit(1).alias("x0"),
        (F.col("n_tokens") - QUALITY_LEN_CUT).alias("x1"),
        (nd - QUALITY_LEN_CUT).alias("x2"),
        F.when(F.col("n_tokens") >= QUALITY_LEN_CUT, 1)
        .otherwise(-1)
        .alias("y"),
    )


def quality_model(deduped: DataFrame) -> DataFrame:
    """Per-epoch perceptron trajectory trained on the deduped corpus —
    the model table a curation run materializes next to its data, so
    any later scoring run (or audit) can replay which weights were
    live."""
    return perceptron_epochs(
        _quality_feats(deduped), ["x0", "x1", "x2"], "y", QUALITY_EPOCHS
    )


def docs_scored(deduped: DataFrame, model: DataFrame) -> DataFrame:
    """Apply the final-epoch weights back to every document as a pure
    column expression: integer margin + predicted label. The weight
    fetch is an O(1) one-row collect from the tiny model table; scoring
    itself is whole-stage codegen over the corpus — no Python per row."""
    w = model.orderBy(F.desc("epoch")).first()
    feats = _quality_feats(deduped)
    margin = (
        F.lit(int(w["w0"])) * F.col("x0")
        + F.lit(int(w["w1"])) * F.col("x1")
        + F.lit(int(w["w2"])) * F.col("x2")
    ).cast("long")
    scored = feats.select(
        "doc_id",
        margin.alias("quality_margin"),
        F.when(margin > 0, 1).otherwise(-1).cast("int").alias("pred_quality"),
        F.col("y").cast("int").alias("rule_label"),
    )
    return deduped.select("doc_id", "source", "lang", "n_tokens").join(
        scored, "doc_id"
    )


def curation_report(
    raw: DataFrame, filtered: DataFrame, deduped: DataFrame
) -> DataFrame:
    r = raw.groupBy("source").agg(F.count(F.lit(1)).alias("n_raw"))
    f = filtered.groupBy("source").agg(F.count(F.lit(1)).alias("n_clean"))
    d = deduped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_unique"),
        F.sum("n_tokens").alias("tokens_kept"),
    )
    return (
        r.join(f, "source", "left")
        .join(d, "source", "left")
        .select(
            "source",
            "n_raw",
            F.coalesce("n_clean", F.lit(0)).alias("n_clean"),
            F.coalesce("n_unique", F.lit(0)).alias("n_unique"),
            F.coalesce("tokens_kept", F.lit(0)).alias("tokens_kept"),
        )
    )


def register_curation_models(runner: ModelRunner, raw_docs_fn) -> None:
    """Wire the curation DAG into ``runner``. ``raw_docs_fn(spark)``
    yields the raw documents DataFrame (a landing read in production,
    a fixture in tests)."""
    runner.register(
        Model(
            name="docs_normalized",
            fn=lambda sp, ref: docs_normalized(raw_docs_fn(sp)),
            checks=lambda df: run_checks(
                [
                    (
                        "not_null_norm",
                        "docs_normalized",
                        lambda: not_null(df, ["doc_id", "norm"]),
                    )
                ]
            ),
        )
    )
    runner.register(
        Model(
            name="docs_filtered",
            fn=lambda sp, ref: docs_filtered(ref("docs_normalized")),
            deps=("docs_normalized",),
        )
    )
    runner.register(
        Model(
            name="docs_deduped",
            fn=lambda sp, ref: docs_deduped(ref("docs_filtered")),
            deps=("docs_filtered",),
            checks=lambda df: run_checks(
                [
                    (
                        "unique_norm",
                        "docs_deduped",
                        lambda: unique(df, ["norm"]),
                    )
                ]
            ),
        )
    )
    runner.register(
        Model(
            name="docs_packed",
            fn=lambda sp, ref: docs_packed(ref("docs_deduped")),
            deps=("docs_deduped",),
        )
    )
    runner.register(
        Model(
            name="quality_model",
            fn=lambda sp, ref: quality_model(ref("docs_deduped")),
            deps=("docs_deduped",),
            checks=lambda df: run_checks(
                [
                    (
                        "not_null_weights",
                        "quality_model",
                        lambda: not_null(df, ["epoch", "w0", "w1", "w2"]),
                    )
                ]
            ),
        )
    )
    runner.register(
        Model(
            name="docs_scored",
            fn=lambda sp, ref: docs_scored(
                ref("docs_deduped"), ref("quality_model")
            ),
            deps=("docs_deduped", "quality_model"),
            checks=lambda df: run_checks(
                [
                    (
                        "valid_pred_quality",
                        "docs_scored",
                        lambda: accepted_values(df, "pred_quality", [1, -1]),
                    )
                ]
            ),
        )
    )
    runner.register(
        Model(
            name="curation_report",
            fn=lambda sp, ref: curation_report(
                ref("docs_normalized"), ref("docs_filtered"), ref("docs_deduped")
            ),
            deps=("docs_normalized", "docs_filtered", "docs_deduped"),
        )
    )
