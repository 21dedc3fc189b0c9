"""Sessionization (gaps-and-islands) over an event table — the behavioral
slicing op a training-data ingest pairs with the document pipeline (activity
windows, rate features, per-user curricula).

Shape: ONE exchange. The lag-gap flag and the running session counter are two
window functions over the same (user_id; ts, event_id) ordering — one
Exchange + one Sort — and the final per-session aggregate groups on
(user_id, session_idx), whose clustering HashPartitioning(user_id) already
satisfies, so no second shuffle.

Timestamps are compared in integer MICROSECONDS (``unix_micros`` /
DuckDB ``EPOCH_US``) — float epoch seconds round differently across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Events → one row per (user, session): a new session starts when the
    gap to the previous event exceeds ``gap_seconds``."""
    gap_us = int(gap_seconds) * 1_000_000
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    # parquet naive timestamps arrive as TIMESTAMP_NTZ; the session runs UTC
    # (session.get_spark), so the cast is a pure reinterpretation and matches
    # DuckDB's EPOCH_US of the same naive value
    tus = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(tus).over(w)
    new_s = F.when(prev.isNull() | ((tus - prev) > F.lit(gap_us)), 1).otherwise(0)
    sid = F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        events.select(
            F.col(user_col).cast("long").alias("user_id"),
            tus.alias("tus"),
            sid.alias("sid"),
            F.col(value_col).alias("value"),
        )
        .groupBy("user_id", F.col("sid").cast("int").alias("session_idx"))
        .agg(
            F.min("tus").alias("session_start_us"),
            F.max("tus").alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )
