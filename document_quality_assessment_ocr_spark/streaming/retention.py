"""Streaming retention-cohort maintenance — the incremental twin of
``operators/sessions.retention_cohorts`` (the ninth incremental twin,
and the third whose state is keyed by ENTITY after streaming/transitions
and streaming/funnel).

State per version is two bounded tables:

- ``first``  — (u, cohort): each user's first-activity period so far;
- ``active`` — (u, period): the DISTINCT (user, period) activity set.

``first`` is |users| rows; ``active`` is |users|x|periods| rows, bounded
by wall-clock periods (weeks), NOT by event count — history length never
enters the state size.

Unlike funnel/transitions, this twin needs NO arrival-order contract:
its two merges are a per-user MIN (commutative, idempotent) and a
DISTINCT union (commutative, idempotent), so any interleaving of events
across micro-batches converges to the same state — late data folds in
exactly.  Replay idempotence follows streaming/sketches: state version
= ``v{batch_id + 1}`` (batch ids are monotone from the checkpoint and
REUSED on replay, so a crashed-then-replayed batch merges the same base
and overwrites the same target).

``read_retention`` rolls the latest state into EXACTLY the batch
operator's output (cohort_period, offset, cohort_size, n_active,
retained_micro) — the stream == batch equality surface.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_STREAM_SCHEMA = (
    "event_id long, user_id long, event_type string, ts timestamp"
)


def _versions(state_dir: str) -> list[int]:
    if not os.path.isdir(state_dir):
        return []
    return sorted(
        int(d[1:]) for d in os.listdir(state_dir)
        if d.startswith("v") and d[1:].isdigit()
    )


def stream_retention(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    period_us: int = 604_800_000_000,
):
    """readStream events → per-batch min-merge of first-seen periods +
    distinct-union of (user, period) activity → versioned state tables.
    availableNow; returns the StreamingQuery."""
    pu = int(period_us)
    stream = (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def merge(batch: DataFrame, batch_id: int) -> None:
        vs = _versions(state_dir)
        ahead = [v for v in vs if v > batch_id + 1]
        if ahead:
            raise RuntimeError(
                f"state_dir {state_dir!r} already holds versions "
                f"{ahead} beyond v{batch_id + 1}: fresh checkpoint "
                "against old retention state — reset checkpoint_dir and "
                "state_dir together (paired unit)."
            )
        ss = batch.sparkSession
        ev = batch.select(
            F.col("user_id").alias("u"),
            F.expr(f"unix_micros(ts) DIV {pu}L").cast("long").alias("p"),
        )
        if batch_id > 0:
            base = os.path.join(state_dir, f"v{batch_id}")
            prev_first = ss.read.parquet(os.path.join(base, "first"))
            prev_active = ss.read.parquet(os.path.join(base, "active"))
        else:
            prev_first = ss.createDataFrame([], "u long, cohort long")
            prev_active = ss.createDataFrame([], "u long, p long")
        first = (
            ev.select("u", F.col("p").alias("cohort"))
            .unionByName(prev_first)
            .groupBy("u")
            .agg(F.min("cohort").cast("long").alias("cohort"))
        )
        active = ev.select("u", "p").unionByName(prev_active).distinct()
        out = os.path.join(state_dir, f"v{batch_id + 1}")
        first.write.mode("overwrite").parquet(os.path.join(out, "first"))
        active.write.mode("overwrite").parquet(os.path.join(out, "active"))

    q = (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def read_retention(spark: SparkSession, state_dir: str) -> DataFrame:
    """Latest persisted state rolled up EXACTLY like
    ``sessions.retention_cohorts``: (cohort_period, offset, cohort_size,
    n_active, retained_micro) — offset 0 anchors each cohort's size."""
    vs = _versions(state_dir)
    if not vs:
        raise FileNotFoundError(f"no retention state under {state_dir!r}")
    base = os.path.join(state_dir, f"v{vs[-1]}")
    first = spark.read.parquet(os.path.join(base, "first"))
    active = spark.read.parquet(os.path.join(base, "active"))
    sizes = first.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    return (
        active.join(first, "u")
        .groupBy(
            "cohort", (F.col("p") - F.col("cohort")).alias("offset")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
        .join(sizes, "cohort")
        .select(
            F.col("cohort").alias("cohort_period"),
            F.col("offset").cast("long").alias("offset"),
            "cohort_size",
            "n_active",
            F.expr("(n_active * 1000000L) DIV greatest(cohort_size, 1L)")
            .cast("long")
            .alias("retained_micro"),
        )
    )
