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

__all__ = ["perceptron_epochs", "hashed_perceptron"]


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


def hashed_perceptron(
    feats: DataFrame,
    labels: DataFrame,
    epochs: int,
    id_col: str = "doc_id",
    bucket_col: str = "bucket",
    count_col: str = "c",
    label_col: str = "y",
) -> DataFrame:
    """Full-batch perceptron over SPARSE hashed features (the hashing
    trick: token -> md5 hex-prefix bucket upstream, so the model is a
    fixed 256-weight vector regardless of vocabulary — FastText's
    memory model).  ``feats`` is the sparse layout (id, bucket, count);
    ``labels`` one (+1/-1) row per id.

    Per epoch: margins come from ONE aggregate over the sparse rows
    with the current weights riding as a literal map (codegen lookup,
    no join build side), and the update is ONE mistake-filtered
    aggregate per bucket — both map-side combined.  The per-epoch
    driver collect is the O(buckets) weight vector, the same justified
    scalar pattern as k-means centroids.  Integer counts and labels
    make every epoch an associative integer sum — bit-exact under any
    partitioning, replayable by an unrolled SQL chain.

    Returns the FINAL model as (bucket, w) rows — every feature bucket
    plus the ``__bias__`` row — a complete, exactly-checkable artifact.
    """
    spark = feats.sparkSession
    f = feats.select(
        F.col(id_col).alias("_id"),
        F.col(bucket_col).alias("_b"),
        F.col(count_col).cast("long").alias("_c"),
    )
    lab = labels.select(
        F.col(id_col).alias("_id"), F.col(label_col).cast("long").alias("_y")
    )
    # Per-id SPARSE VECTOR layout, materialized once: (_id, _bc, _y)
    # with _bc = the id's (bucket, count) pairs.  The flat layout paid
    # TWO shuffles of the O(docs·buckets) row stream per epoch (the
    # margin groupBy(_id) and the mistake join) — profiled at ~14 s of
    # 32-task stage time per epoch at sf0.1.  On this layout the margin
    # is a row-local integer fold (weights ride as a literal map —
    # codegen lookup, no build side), so each epoch is ONE map-side
    # scan of the vector table plus one tiny per-bucket update
    # aggregate over mistakes only (guide §2.4: remove shuffles
    # outright; §2.3: aggregate before you shuffle).  Integer sums are
    # associative-commutative, so margins (and therefore the whole
    # trajectory) are bit-identical to the flat layout under any
    # collect_list order and any partitioning.
    fvec = (
        f.groupBy("_id")
        .agg(F.collect_list(F.struct("_b", "_c")).alias("_bc"))
        .join(lab, "_id")
        .localCheckpoint(eager=False)
    )
    # bucket universe from the PRE-label-join features: buckets seen
    # only in unlabeled docs still get their zero-weight rows in the
    # returned model (the docstring's "every feature bucket" contract;
    # with full label coverage — q165 — the set is identical)
    buckets = sorted(
        r["_b"] for r in f.select("_b").distinct().collect()
    )
    w: dict[str, int] = {b: 0 for b in buckets}
    bias = 0
    for _ in range(epochs):
        entries: list = []
        for b, v in w.items():
            if v:
                entries += [F.lit(b), F.lit(v)]
        wmap = F.create_map(*entries) if entries else F.create_map()
        margin = (
            F.aggregate(
                F.col("_bc"),
                F.lit(0).cast("long"),
                lambda acc, e: acc
                + F.coalesce(F.element_at(wmap, e["_b"]), F.lit(0))
                * e["_c"],
            )
            + F.lit(bias)
        )
        mistakes = fvec.filter((F.col("_y") * margin) <= 0)
        # ONE update aggregate per epoch: the bias rides as a synthetic
        # '__bias__' row per mistake doc (c=1), unioned into the same
        # per-bucket sum — the exact shape of the oracle's hp_u CTE
        upd_input = (
            mistakes.select("_y", F.explode("_bc").alias("e"))
            .select(F.col("e._b").alias("_b"), "_y", F.col("e._c").alias("_c"))
            .unionByName(
                mistakes.select(
                    F.lit("__bias__").alias("_b"),
                    F.col("_y"),
                    F.lit(1).cast("long").alias("_c"),
                )
            )
        )
        upd = {
            r["_b"]: r["_dw"]
            for r in upd_input.groupBy("_b")
            .agg(F.sum(F.col("_y") * F.col("_c")).alias("_dw"))
            .collect()
        }
        for b, dw in upd.items():
            if b == "__bias__":
                bias += dw
            else:
                w[b] = w[b] + dw
    rows = [(b, int(v)) for b, v in sorted(w.items())] + [("__bias__", int(bias))]
    return spark.createDataFrame(rows, "bucket string, w bigint")
