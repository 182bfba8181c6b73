"""Corpus-curation model DAG end-to-end through the dbt-style runner:
normalize → quality-filter → dedup → pack → report, materialized via the
TableStore with pre-write data-quality gates and audit rows — the
reference's operational pattern applied to a document corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logistics_data_pipeline_project_spark.models.curation import (
    PACK_BUDGET,
    register_curation_models,
)
from logistics_data_pipeline_project_spark.plans.materialize import TableStore
from logistics_data_pipeline_project_spark.plans.runner import (
    DataQualityError,
    Model,
    ModelRunner,
)

DOCS = [
    # (doc_id, source, lang, text)
    (1, "web", "en", "alpha beta gamma delta"),
    (2, "web", "en", "Alpha  Beta gamma delta"),   # normalization dup of 1
    (3, "web", "en", "unique interesting content here"),
    (4, "books", "en", "x y"),                     # too short -> filtered
    (5, "books", "en", "spam spam spam spam spam spam"),  # repetitious
    (6, "books", "en", "a longer clean document with many words inside"),
    (7, "books", "en", "alpha beta gamma delta"),  # exact dup of 1
]


def _raw(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, source string, lang string, text string"
    )


def test_curation_dag_end_to_end(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "wh"))
    runner = ModelRunner(spark, store, threads=3)
    register_curation_models(runner, _raw)
    runner.run()

    norm = {r["doc_id"]: r for r in store.read("docs_normalized").collect()}
    assert norm[2]["norm"] == norm[1]["norm"] == "alpha beta gamma delta"

    filtered = {r["doc_id"] for r in store.read("docs_filtered").collect()}
    assert 4 not in filtered, "too-short doc must be gated"
    assert 5 not in filtered, "repetitious doc must be gated"
    assert {1, 2, 3, 6, 7} <= filtered

    deduped = {r["doc_id"]: r for r in store.read("docs_deduped").collect()}
    assert set(deduped) == {1, 3, 6}, "keeper = smallest id per canonical form"
    assert deduped[1]["dup_count"] == 3  # docs 1, 2, 7 collapse

    packed = store.read("docs_packed").collect()
    assert {r["doc_id"] for r in packed} == {1, 3, 6}
    assert all(r["bin_id"] == 0 for r in packed)  # tiny corpus: one bin
    assert PACK_BUDGET > sum(r["n_tokens"] for r in packed)

    # train-then-score loop: the toy set is separable through the cut,
    # so the full-batch perceptron converges by epoch 2 (all-mistakes
    # first epoch from zero weights is the convention)
    traj = sorted(
        store.read("quality_model").collect(), key=lambda r: r["epoch"]
    )
    assert traj[0]["n_mistakes"] == 3
    assert traj[-1]["n_mistakes"] == 0
    scored = {r["doc_id"]: r for r in store.read("docs_scored").collect()}
    assert set(scored) == {1, 3, 6}
    assert all(
        r["pred_quality"] == r["rule_label"] for r in scored.values()
    ), "converged model must agree with the label rule on the train set"
    assert scored[6]["pred_quality"] == 1  # the one long-form doc
    assert scored[1]["pred_quality"] == -1

    report = {r["source"]: r for r in store.read("curation_report").collect()}
    assert report["web"]["n_raw"] == 3
    assert report["web"]["n_clean"] == 3
    assert report["web"]["n_unique"] == 2  # doc 2 deduped into 1
    assert report["books"]["n_raw"] == 4
    assert report["books"]["n_clean"] == 2
    assert report["books"]["n_unique"] == 1  # doc 7 deduped into 1

    audit = runner.audit_log()
    ok = audit.filter(F.col("status") == "SUCCESS")
    assert ok.filter(
        F.col("job_name").isin(
            "docs_normalized", "docs_filtered", "docs_deduped",
            "docs_packed", "quality_model", "docs_scored",
            "curation_report",
        )
    ).count() == 7


def test_curation_quality_gate_aborts_before_write(spark, tmp_path):
    """A NULL doc_id fails docs_normalized's not_null gate: the model
    must abort with a FAILED audit row and WITHOUT materializing — the
    engine's stricter-than-dbt ordering (gate, then write)."""
    store = TableStore(spark, str(tmp_path / "wh"))
    runner = ModelRunner(spark, store, threads=1)

    def bad_raw(sp):
        return sp.createDataFrame(
            [(None, "web", "en", "some text here")],
            "doc_id long, source string, lang string, text string",
        )

    register_curation_models(runner, bad_raw)
    with pytest.raises(DataQualityError):
        runner.run()
    assert not store.exists("docs_normalized")
    audit = runner.audit_log()
    assert audit.filter(
        (F.col("job_name") == "docs_normalized")
        & (F.col("status") == "FAILED")
    ).count() == 1
