"""Streaming windowed aggregation + custom stateful operator over the events
stream (beyond-reference breadth: the reference is batch-only, SURVEY §2.9;
these are the Structured Streaming idioms a production ingest needs).

Both operators share their column logic with a batch twin so tests can
compare stream output (availableNow run-to-completion) against the batch
plan on identical input.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def tumbling_counts_batch(events: DataFrame, window: str = "1 hour") -> DataFrame:
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            F.round("sum_value", 6).alias("sum_value"),
        )
    )


def tumbling_counts_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    query_name: str = "tumbling_counts",
):
    """readStream → watermark (late-data bound) → tumbling window agg →
    memory sink, run to completion with availableNow. Complete mode: every
    window is (re-)emitted each micro-batch and full window state is retained
    — the watermark bounds accepted late data, not emission. (Append mode
    would emit each window exactly once after the watermark passes it, but
    never flushes the final windows of a bounded availableNow run.)"""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    agg = tumbling_counts_batch(stream.withWatermark("ts", watermark), window)
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


# ---------------------------------------------------------------------------
# custom stateful operator: per-user running stats via applyInPandasWithState
# ---------------------------------------------------------------------------

USER_STATS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("max_ts", T.TimestampType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
        T.StructField("mx", T.LongType()),  # epoch micros
    ]
)


def _update_user_stats(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, s, mx = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        mx = max(mx, int(pdf["ts"].astype("int64").max()) // 1000)  # ns → µs
    state.update((n, s, mx))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [s],
            "max_ts": [pd.Timestamp(mx, unit="us")],
        }
    )


def user_stats_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    query_name: str = "user_stats",
):
    """Custom stateful streaming operator (applyInPandasWithState): per-user
    running (count, sum, latest-ts) maintained across micro-batches; each
    batch emits the UPDATED state for users it saw. The terminal state after
    an availableNow run equals the batch aggregation."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    out = stream.groupBy("user_id").applyInPandasWithState(
        _update_user_stats,
        outputStructType=USER_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def user_stats_batch(events: DataFrame) -> DataFrame:
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.max("ts").alias("max_ts"),
    )
