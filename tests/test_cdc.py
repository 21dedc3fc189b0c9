"""CDC MERGE semantics (operators/cdc.apply_changes): update, delete,
insert, upsert-on-missing, last-wins sequencing, and plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_quality_assessment_ocr_spark.operators.cdc import apply_changes


@pytest.fixture(scope="module")
def merged(spark):
    base = spark.createDataFrame(
        [(1, "one", "en"), (2, "two", "en"), (3, "three", "de"), (4, "four", "fr")],
        "doc_id long, text string, lang string",
    )
    changes = spark.createDataFrame(
        [
            (2, 1, "U", "TWO", "en"),        # update
            (3, 1, "D", None, None),          # delete
            (5, 1, "I", "five", "es"),        # insert (new key)
            (6, 1, "U", "six", "es"),         # upsert: U on missing key inserts
            (4, 1, "U", "stale", "fr"),       # superseded …
            (4, 2, "U", "FOUR", "fr"),        # … by higher seq (last wins)
        ],
        "doc_id long, seq long, op string, text string, lang string",
    )
    return {r["doc_id"]: r for r in apply_changes(base, changes).collect()}


def test_update_delete_insert_upsert(merged):
    assert merged[1]["text"] == "one"        # untouched passes through
    assert merged[2]["text"] == "TWO"
    assert 3 not in merged                    # deleted
    assert merged[5]["text"] == "five"
    assert merged[6]["text"] == "six"


def test_last_wins(merged):
    assert merged[4]["text"] == "FOUR"


def test_missing_columns_raise(spark):
    base = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    bad = spark.createDataFrame([(1, 1, "U")], "doc_id long, seq long, op string")
    with pytest.raises(ValueError, match="text"):
        apply_changes(base, bad)


def test_plan_reuses_changelog_partitioning(spark):
    """The collapsed changelog's HashPartitioning from its groupBy must be
    reused by the full-outer join — two hash exchanges total (base + changes),
    not three."""
    base = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit("t").alias("text")
    )
    changes = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit(1).alias("seq"),
        F.lit("U").alias("op"), F.lit("u").alias("text"),
    )
    plan = (
        apply_changes(base, changes)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_snapshot_diff_semantics(spark):
    """table_changes analog: I/U/D classification with null-safe payload
    compare; unchanged rows drop."""
    from document_quality_assessment_ocr_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", "en"), (2, "b", "en"), (3, "c", None), (4, "d", "de")],
        "doc_id long, text string, lang string",
    )
    new = spark.createDataFrame(
        [(1, "a", "en"), (2, "B2", "en"), (3, "c", "fr"), (5, "e", "es")],
        "doc_id long, text string, lang string",
    )
    rows = {r["doc_id"]: r for r in snapshot_diff(old, new).collect()}
    assert set(rows) == {2, 3, 4, 5}  # doc 1 unchanged → dropped
    assert rows[2]["op"] == "U" and rows[2]["text"] == "B2"
    assert rows[3]["op"] == "U" and rows[3]["lang"] == "fr"  # NULL→value = U
    assert rows[4]["op"] == "D" and rows[4]["text"] == "d"
    assert rows[5]["op"] == "I" and rows[5]["text"] == "e"


def test_snapshot_diff_roundtrips_through_apply_changes(spark):
    """diff is apply_changes' inverse: old ⊕ diff(old,new) == new."""
    from document_quality_assessment_ocr_spark.operators.cdc import (
        apply_changes,
        snapshot_diff,
    )
    from pyspark.sql import functions as F

    old = spark.createDataFrame(
        [(i, f"t{i}", "en" if i % 2 else None) for i in range(30)],
        "doc_id long, text string, lang string",
    )
    new = spark.createDataFrame(
        [(i, f"t{i}" if i % 5 else f"mod{i}", "en" if i % 2 else "de")
         for i in range(3, 33)],
        "doc_id long, text string, lang string",
    )
    ch = snapshot_diff(old, new).withColumn("seq", F.lit(1))
    rebuilt = apply_changes(old, ch).collect()
    expect = {tuple(r) for r in new.collect()}
    assert {tuple(r) for r in rebuilt} == expect
