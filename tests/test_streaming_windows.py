"""Streaming windowed agg + stateful operator vs their batch twins."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from document_quality_assessment_ocr_spark.streaming import windows as W

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def event_drops(spark, tmp_path):
    """events split into 3 file drops (micro-batches), ordered by ts so the
    watermark advances monotonically."""
    ev = spark.read.parquet(f"{SF}/events.parquet").orderBy("ts")
    out = str(tmp_path / "events_in")
    # deterministic split by ts rank into three drops
    rows = ev.collect()
    os.makedirs(out)
    third = len(rows) // 3
    for i, chunk in enumerate((rows[:third], rows[third : 2 * third], rows[2 * third :])):
        spark.createDataFrame(chunk, schema=W.EVENTS_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(out, f"drop{i}"))
        # move parquet files up so the directory is a flat file-stream source
        d = os.path.join(out, f"drop{i}")
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                shutil.move(os.path.join(d, f), os.path.join(out, f"drop{i}.parquet"))
        shutil.rmtree(d)
    return out


@pytest.mark.slow
def test_tumbling_window_stream_matches_batch(spark, event_drops, tmp_path):
    W.tumbling_counts_stream(
        spark, event_drops, str(tmp_path / "ckpt"), query_name="tc_test"
    )
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("select * from tc_test").collect()
    }
    ev = spark.read.parquet(f"{SF}/events.parquet")
    expect = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in W.tumbling_counts_batch(ev).collect()
    }
    assert got == expect


@pytest.mark.slow
def test_stateful_user_stats_matches_batch(spark, event_drops, tmp_path):
    W.user_stats_stream(spark, event_drops, str(tmp_path / "ckpt2"), query_name="us_test")
    # terminal state per user = last update emitted across micro-batches
    got = {
        r["user_id"]: (r["n_events"], round(r["sum_value"], 6), r["max_ts"])
        for r in spark.sql(
            """select user_id, n_events, sum_value, max_ts from (
                 select *, row_number() over (partition by user_id
                                              order by n_events desc) rn
                 from us_test) where rn = 1"""
        ).collect()
    }
    ev = spark.read.parquet(f"{SF}/events.parquet")
    expect = {
        r["user_id"]: (r["n_events"], round(r["sum_value"], 6), r["max_ts"])
        for r in W.user_stats_batch(ev).collect()
    }
    assert got == expect
