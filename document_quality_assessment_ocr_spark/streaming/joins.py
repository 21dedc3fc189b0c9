"""Watermarked stream-stream interval join — the remaining Structured
Streaming join primitive (windows, stateful ops, dedup, foreachBatch
merge live in the sibling modules): attribute each conversion event to
the same user's earlier trigger event within an attribution window,
as a NATIVE stream-stream inner join (no foreachBatch — Spark manages
the two-sided join state, and the watermarks bound it).

State story (the part that matters at scale): without watermarks a
stream-stream join buffers both sides forever; with a watermark on each
side and a time-range join condition, Spark derives how long a buffered
row can still match and evicts it afterwards — state is bounded by
(rate × (watermark + window)), not by stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def interval_join_plan(
    left: DataFrame,
    right: DataFrame,
    within_minutes: int = 30,
) -> DataFrame:
    """The join itself — shared by the stream and its batch twin.

    left = trigger events (l_id, user_id, l_ts); right = conversion
    events (r_id, user_id, r_ts); emits conversions within
    ``within_minutes`` AFTER the trigger.
    """
    return left.join(
        right,
        (left["user_id"] == right["user_id"])
        & (right["r_ts"] >= left["l_ts"])
        & (right["r_ts"] <= left["l_ts"] + F.expr(f"INTERVAL {within_minutes} MINUTES")),
    ).select(
        left["user_id"].alias("user_id"),
        F.col("l_id"),
        F.col("l_ts"),
        F.col("r_id"),
        F.col("r_ts"),
    )


def _sides(events: DataFrame, left_type: str, right_type: str, watermark: str):
    left = (
        events.where(F.col("event_type") == left_type)
        .select(
            F.col("event_id").alias("l_id"),
            "user_id",
            F.col("ts").alias("l_ts"),
        )
        .withWatermark("l_ts", watermark)
    )
    right = (
        events.where(F.col("event_type") == right_type)
        .select(
            F.col("event_id").alias("r_id"),
            F.col("user_id").alias("r_user"),
            F.col("ts").alias("r_ts"),
        )
        .withWatermark("r_ts", watermark)
        .withColumnRenamed("r_user", "user_id")
    )
    return left, right


def stream_interval_join(
    spark: SparkSession,
    events_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    left_type: str = "signup",
    right_type: str = "purchase",
    within_minutes: int = 30,
    watermark: str = "10 minutes",
    available_now: bool = True,
):
    """Tail an events directory; write attributed (trigger, conversion)
    pairs to a parquet sink in append mode (the only mode stream-stream
    inner joins support — exactly what attribution wants)."""
    ev = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    left, right = _sides(ev, left_type, right_type, watermark)
    out = interval_join_plan(left, right, within_minutes)
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def batch_interval_join(
    events: DataFrame,
    left_type: str = "signup",
    right_type: str = "purchase",
    within_minutes: int = 30,
) -> DataFrame:
    """Batch twin over the same plan (no watermarks — batch sees all)."""
    left = events.where(F.col("event_type") == left_type).select(
        F.col("event_id").alias("l_id"), "user_id", F.col("ts").alias("l_ts")
    )
    right = events.where(F.col("event_type") == right_type).select(
        F.col("event_id").alias("r_id"),
        F.col("user_id").alias("user_id"),
        F.col("ts").alias("r_ts"),
    )
    return left.alias("l").join(
        right.alias("r"),
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within_minutes} MINUTES")),
    ).select(
        F.col("l.user_id").alias("user_id"), "l_id", "l_ts", "r_id", "r_ts"
    )
