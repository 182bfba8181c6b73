"""Streaming frozen-model scoring: the per-source quality tally
maintained over a file stream must equal the one-shot batch tally of
everything delivered — under any batch slicing and across a
checkpointed restart (the integer sums are associative/commutative, so
slicing cannot change them; the committed-batch-id guard keeps replays
from double-counting)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from logistics_data_pipeline_project_spark.plans.materialize import TableStore
from logistics_data_pipeline_project_spark.streaming.scoring import (
    quality_tally,
    stream_quality_tally,
)

SCHEMA = "doc_id long, source string, text string"

DOCS = [
    (1, "web", "alpha beta gamma delta epsilon zeta eta"),
    (2, "web", "a b"),
    (3, "books", "one two three four five six seven eight nine"),
    (4, "books", "x"),
    (5, "web", "lorem ipsum dolor sit amet consectetur"),
    (6, "news", "breaking short"),
    (7, "news", "longer piece with many more words than the cut here"),
]

# frozen model: bias -5, +1 per token => positive iff n_tokens > 5
WEIGHTS = [-5, 1]
FEATURES = ["x0", "x1"]


def _features(df):
    nt = F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != ""))
    return df.select(
        "source", F.lit(1).alias("x0"), nt.cast("long").alias("x1")
    )


def _write_batch(landing, name, rows):
    with open(os.path.join(landing, name), "w") as f:
        for i, s, t in rows:
            f.write(json.dumps({"doc_id": i, "source": s, "text": t}) + "\n")


def _drain(spark, landing, store, chk):
    stream = spark.readStream.format("json").schema(SCHEMA).load(landing)
    q = stream_quality_tally(
        _features(stream),
        store,
        "quality_tally",
        WEIGHTS,
        FEATURES,
        "source",
        checkpoint_dir=chk,
    )
    try:
        q.awaitTermination(180)
    finally:
        if q.isActive:
            q.stop()


def _table(store):
    return {
        r["source"]: (r["n_docs"], r["n_positive"], r["sum_margin"])
        for r in store.read("quality_tally").collect()
    }


def test_stream_scoring_matches_batch_across_restart(spark, tmp_path):
    landing = str(tmp_path / "landing")
    chk = str(tmp_path / "chk")
    os.makedirs(landing)
    store = TableStore(spark, str(tmp_path / "wh"))

    # first two deliveries, one drain
    _write_batch(landing, "b0.json", DOCS[:3])
    _write_batch(landing, "b1.json", DOCS[3:5])
    _drain(spark, landing, store, chk)

    # restart from the checkpoint with two more files
    _write_batch(landing, "b2.json", DOCS[5:6])
    _write_batch(landing, "b3.json", DOCS[6:])
    _drain(spark, landing, store, chk)

    batch = {
        r["source"]: (r["n_docs"], r["n_positive"], r["sum_margin"])
        for r in quality_tally(
            _features(
                spark.createDataFrame([tuple(d) for d in DOCS], SCHEMA)
            ),
            WEIGHTS,
            FEATURES,
            "source",
        ).collect()
    }
    assert _table(store) == batch
    # spot-check the frozen rule: web has 2 of 3 docs above the cut
    assert batch["web"][0] == 3 and batch["web"][1] == 2
