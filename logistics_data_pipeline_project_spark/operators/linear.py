"""Distributed training of integer linear classifiers.

The quality-classifier stage of a curation pipeline (FastText-style
"good vs bad document" models) is a linear model trained over simple
per-document features.  At 100 TB the training loop must be a sequence
of full-corpus aggregates — never a driver-side sample — and to be
*verifiable* the trajectory must be bit-exact: the same weights on any
engine, any partitioning, any core count.

Full-batch perceptron delivers exactly that when features and labels
are integers: each epoch's update is

    w  <-  w + sum_{i : y_i * (w . x_i) <= 0}  y_i * x_i

a SUM of integer vectors over the mistake set — associative and
commutative, so Spark's partial aggregation order cannot change it,
and an unrolled SQL replay reproduces it bit-for-bit (contrast SGD,
whose per-row sequential updates are order-defined and unparallelizable;
full-batch is the distributed formulation).

Each epoch is ONE map-side-combined aggregate over the feature table —
the O(1)-row ``.first()`` per epoch is the same justified scalar
collect as the k-means centroid refresh (similarity.py).  Epoch count
is a fixed hyperparameter; the plan is ``epochs`` sequential scans of
a (cheaply cached) feature projection, nothing iterative inside a
stage.

Reference scope: the reference repo trains its ticket classifier on a
driver-side 10-row list (dags/4_logistics_ticket_classifier_full_dag.py:32-52);
this module is the distributed-training counterpart for corpus-scale
labels, part of the beyond-reference LLM-data family.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["perceptron_epochs"]


def perceptron_epochs(
    feats: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    epochs: int,
) -> DataFrame:
    """Train a full-batch perceptron for ``epochs`` rounds and return
    the per-epoch trajectory: one row per epoch with the post-update
    weights and that epoch's mistake count.

    ``feature_cols`` are INTEGER columns (include an explicit all-ones
    bias column); ``label_col`` is +1 / -1.  Weights start at zero, so
    epoch 1 counts every row as a mistake (margin 0) — the standard
    convention, and the one the unrolled SQL oracle replays.
    """
    spark = feats.sparkSession
    d = feats.select(
        *[F.col(c).cast("long").alias(c) for c in feature_cols],
        F.col(label_col).cast("long").alias("_y"),
    )
    # epochs sequential scans hit this projection, not the source table
    d = d.persist()
    n_feats = len(feature_cols)
    w = [0] * n_feats
    out: list[tuple] = []
    for epoch in range(1, epochs + 1):
        margin = sum(
            (F.lit(w[i]) * F.col(feature_cols[i]) for i in range(n_feats)),
            start=F.lit(0),
        )
        mistake = (F.col("_y") * margin) <= 0
        row = d.agg(
            *[
                F.coalesce(
                    F.sum(F.when(mistake, F.col("_y") * F.col(c))), F.lit(0)
                ).alias(f"g{i}")
                for i, c in enumerate(feature_cols)
            ],
            F.count(F.when(mistake, F.lit(1))).alias("n_mistakes"),
        ).first()
        w = [w[i] + row[f"g{i}"] for i in range(n_feats)]
        out.append((epoch, *w, row["n_mistakes"]))
    d.unpersist()
    schema = (
        "epoch int, "
        + ", ".join(f"w{i} bigint" for i in range(n_feats))
        + ", n_mistakes bigint"
    )
    return spark.createDataFrame(out, schema)
