"""Exact, integer-arithmetic evaluation metrics for trained filters.

The engine ships trained scorers (perceptrons ``operators/linear.py``,
quality models ``models/curation.py``, retrieval rankers
``operators/retrieval.py``); these operators measure them without any
float nondeterminism, so results are bit-identical across engines,
partitionings and reruns:

- ``exact_binary_auc``: ROC AUC as the Mann-Whitney pair statistic,
  ties counted at half weight, kept integral by carrying 2U: over the
  per-distinct-score histogram, 2U = Σ_s pos_s · (2·neg_below_s + neg_s)
  and AUC_ppm = 2U·10⁶ div (2·n_pos·n_neg). One corpus-sized hash
  aggregate (groupBy score), then a window over DISTINCT SCORES — a
  bounded domain whenever the score is a bounded integer scale (the
  engine's scores are ppm ints ≤ 10⁶), never over the corpus.
- ``roc_points``: TPR/FPR (ppm) at exact score-decile thresholds via
  ``operators.ranking.exact_ntile`` — range-partitioned, no
  single-partition sort of the corpus.

Reference anchor: the reference repo ships a trained ticket classifier
(dags/4_logistics_ticket_classifier_full_dag.py) but no evaluation of
it; an eval harness is the missing piece a production pipeline needs,
so it is built here as a first-class beyond-reference operator family
(SURVEY §8).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["exact_binary_auc", "roc_points", "cohens_kappa"]


def exact_binary_auc(
    df: DataFrame, score: Column | str, label: Column | str
) -> DataFrame:
    """One row: (n_pos, n_neg, u2, auc_ppm) — AUC = P(score_pos >
    score_neg) + ½·P(tie), exactly, via the tie-aware rank-sum identity.

    ``score`` must be integral (cast upstream); ``label`` boolean.
    The window runs over the distinct-score histogram: O(score domain)
    rows, pre-aggregated map-side, NOT the corpus.
    """
    s = F.col(score) if isinstance(score, str) else score
    y = F.col(label) if isinstance(label, str) else label
    g = (
        df.select(s.cast("long").alias("__s"), y.cast("boolean").alias("__y"))
        .groupBy("__s")
        .agg(
            F.sum(F.when(F.col("__y"), 1).otherwise(0)).cast("long").alias("pos"),
            F.sum(F.when(F.col("__y"), 0).otherwise(1)).cast("long").alias("neg"),
        )
    )
    w = (
        Window.orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = g.withColumn("cnb", F.coalesce(F.sum("neg").over(w), F.lit(0)))
    return c.agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("neg").cast("long").alias("n_neg"),
        F.sum(F.col("pos") * (2 * F.col("cnb") + F.col("neg")))
        .cast("long")
        .alias("u2"),
    ).select(
        "n_pos",
        "n_neg",
        "u2",
        F.expr("u2 * 1000000 div (2 * n_pos * n_neg)").cast("long").alias("auc_ppm"),
    )


def roc_points(
    df: DataFrame,
    score: Column | str,
    label: Column | str,
    tiebreak: Column | str,
    n_cuts: int = 10,
) -> DataFrame:
    """ROC operating points at exact count-decile thresholds: rows are
    (cut, n_pred_pos, tp, fp, tpr_ppm, fpr_ppm) where cut d predicts
    positive for the top-d/n_cuts of the corpus by (score DESC,
    tiebreak ASC) — the deterministic total order. Deciles come from
    ``exact_ntile`` (range-partitioned global rank, q110 precedent)."""
    from .ranking import exact_ntile

    s = F.col(score) if isinstance(score, str) else score
    y = F.col(label) if isinstance(label, str) else label
    t = F.col(tiebreak) if isinstance(tiebreak, str) else tiebreak
    d = df.select(
        s.cast("long").alias("__s"), y.cast("boolean").alias("__y"), t.alias("__t")
    )
    binned = exact_ntile(d, [F.desc("__s"), F.asc("__t")], n_cuts, out="__cut")
    per = binned.groupBy("__cut").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(F.col("__y"), 1).otherwise(0)).cast("long").alias("n_pos"),
    )
    w = Window.orderBy("__cut").rowsBetween(Window.unboundedPreceding, 0)
    tot_pos = F.sum("n_pos").over(Window.partitionBy())
    tot_rows = F.sum("n_rows").over(Window.partitionBy())
    return (
        per.withColumn("n_pred_pos", F.sum("n_rows").over(w))
        .withColumn("tp", F.sum("n_pos").over(w))
        .withColumn("fp", F.col("n_pred_pos") - F.col("tp"))
        .withColumn("__tp_tot", tot_pos)
        .withColumn("__neg_tot", tot_rows - tot_pos)
        .select(
            F.col("__cut").cast("integer").alias("cut"),
            "n_pred_pos",
            "tp",
            "fp",
            F.expr("tp * 1000000 div __tp_tot").cast("long").alias("tpr_ppm"),
            F.expr("fp * 1000000 div __neg_tot").cast("long").alias("fpr_ppm"),
        )
    )


def cohens_kappa(df: DataFrame, label_a: Column | str, label_b: Column | str) -> DataFrame:
    """One row: (n, n_agree, chance_pairs, kappa_num, kappa_den,
    kappa_ppm) — Cohen's κ between two categorical labelings, exactly:
    κ = (n·Σdiag − Σ_k row_k·col_k) / (n² − Σ_k row_k·col_k), all
    integers. kappa_ppm truncates toward zero on BOTH engines (κ can be
    negative; floor-vs-truncate differs there, so the division is done
    on the absolute value and re-signed).

    Scale shape: one hash aggregate over the corpus (the k×k confusion
    matrix), then O(k)/O(k²) arithmetic on the matrix rows — the corpus
    never shuffles twice."""
    a = F.col(label_a) if isinstance(label_a, str) else label_a
    b = F.col(label_b) if isinstance(label_b, str) else label_b
    m = (
        df.select(a.alias("__a"), b.alias("__b"))
        .groupBy("__a", "__b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    rows = m.groupBy("__a").agg(F.sum("c").alias("r")).withColumnRenamed("__a", "k")
    cols = m.groupBy("__b").agg(F.sum("c").alias("cc")).withColumnRenamed("__b", "k")
    e = (
        rows.join(cols, "k", "left")
        .agg(F.sum(F.col("r") * F.coalesce("cc", F.lit(0))).cast("long").alias("e"))
    )
    tot = m.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.when(F.col("__a") == F.col("__b"), F.col("c")).otherwise(0))
        .cast("long")
        .alias("n_agree"),
    )
    return (
        tot.crossJoin(F.broadcast(e))
        .select(
            "n",
            "n_agree",
            F.col("e").alias("chance_pairs"),
            (F.col("n") * F.col("n_agree") - F.col("e")).alias("kappa_num"),
            (F.col("n") * F.col("n") - F.col("e")).alias("kappa_den"),
        )
        .select(
            "n",
            "n_agree",
            "chance_pairs",
            "kappa_num",
            "kappa_den",
            F.expr(
                "cast(case when kappa_num >= 0"
                " then (kappa_num * 1000000) div kappa_den"
                " else -((-kappa_num * 1000000) div kappa_den) end as bigint)"
            ).alias("kappa_ppm"),
        )
    )
