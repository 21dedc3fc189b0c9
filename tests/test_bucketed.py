"""Bucketed ingestion removes the aggregation exchange entirely, with
byte-identical results."""

import pytest

from document_quality_assessment_ocr_spark.plans.pipeline import run_extraction
from document_quality_assessment_ocr_spark.sources import tables
from document_quality_assessment_ocr_spark.sources.bucketed import (
    read_bucketed_spans,
    save_bucketed_spans,
)


def _result_set(df):
    return {
        (
            r["doc_id"],
            r["accepted"],
            tuple(r["reasons"]),
            tuple((s["kind"], s["text"], s["media_ref"], s["order"]) for s in r["spans"]),
        )
        for r in df.collect()
    }


@pytest.mark.slow
def test_bucketed_scan_is_shuffle_free_and_identical(spark, small_corpus_dir):
    spans, pay = tables.read_corpus(spark, small_corpus_dir)
    save_bucketed_spans(spans, "spans_bucketed", n_buckets=8)
    bucketed = read_bucketed_spans(spark, "spans_bucketed")

    plain = run_extraction(spans, pay, assume_unique_doc_ids=True)
    fast = run_extraction(bucketed, pay, assume_unique_doc_ids=True)

    plan_plain = plain._jdf.queryExecution().executedPlan().toString()
    plan_fast = fast._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in plan_plain
    assert "Exchange hashpartitioning" not in plan_fast  # bucket scan feeds agg

    assert _result_set(fast) == _result_set(plain)


def test_score_join_broadcasts_statically(spark, small_corpus_dir):
    """Round-3 plan invariant: the score join ships payload SCORES to span
    rows as a BroadcastHashJoin even with AQE OFF (explicit hint, default
    broadcast_scores=True) — the static plan a 1000-executor run compiles
    has exactly ONE live hash exchange (the verdict aggregate); span rows
    never shuffle for the join. (broadcast_scores=False is not pinned
    here: without the hint the strategy is stats-driven — tiny fixture
    tables auto-broadcast anyway.)"""
    spans, pay = tables.read_corpus(spark, small_corpus_dir)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        hinted = run_extraction(spans, pay, assume_unique_doc_ids=True)
        plan = hinted._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan
        assert plan.count("Exchange hashpartitioning") == 1, plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
