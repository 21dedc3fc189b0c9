"""Streaming funnel maintenance — the incremental twin of
``operators/sessions.funnel_steps`` (the eighth incremental twin, and the
second whose state is keyed by ENTITY rather than sketch cell, after
streaming/transitions).

The funnel's per-user state is the earliest-qualifying time of each level
reached so far (a filled PREFIX of the step list). Under per-user MONOTONE
(ts, event_id) arrival across micro-batches — the same in-order-ingest
contract streaming/transitions documents — greedy level filling is exact:

- a new event's ts is ≥ every previously-arrived ts for that user, so an
  already-filled level's earliest-qualifying time can never improve;
- an event that could fill level i but arrived before level i−1 was
  filled would need ts strictly greater than the later-arriving level-
  (i−1) event's ts — impossible in (ts, id)-ordered arrival (the ts-equal
  case is excluded by the funnel's STRICTLY-after rule on both sides);

so no event buffer is needed: state is exactly the |users|×|steps|-bounded
(user, level, t) table, independent of history length. Out-of-order
arrivals need a watermark-bounded reorder buffer upstream; this module
deliberately does not hide that requirement.

Each micro-batch replays the batch operator's level chain SEEDED by the
persisted level table: level-i candidates are the batch's steps[i−1]
events strictly after the user's NEW level-(i−1) time, and the new level-i
time is the min of the persisted time and the candidate (the min is a
no-op under the contract but keeps the merge idempotent-shaped). That is
``len(steps)`` small joins per batch, every side ≤ |users| rows.

Versioning and replay idempotence follow streaming/sketches exactly:
state version = ``v{batch_id + 1}`` (batch ids are monotone from the
checkpoint and REUSED on replay, so a crashed-then-replayed batch merges
the same base and overwrites the same target).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
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


def stream_funnel(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    steps: list[str],
):
    """readStream events → per-batch seeded level chain → versioned
    (user, level, t) state table. availableNow; returns the
    StreamingQuery."""
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
                "against old funnel state — reset checkpoint_dir and "
                "state_dir together (paired unit)."
            )
        ss = batch.sparkSession
        ev = batch.select(
            F.col("user_id").alias("u"),
            F.unix_micros(F.col("ts")).alias("t"),
            F.coalesce("event_type", F.lit("")).alias("ty"),
        )
        if batch_id > 0:
            prev = ss.read.parquet(
                os.path.join(state_dir, f"v{batch_id}", "levels")
            )
        else:
            prev = ss.createDataFrame([], "u long, level int, t long")

        outs = []
        cur = None
        for i, st in enumerate(steps):
            seed = prev.where(F.col("level") == i + 1).select("u", "t")
            cand = ev.where(F.col("ty") == F.lit(st)).select("u", "t")
            if cur is not None:
                cand = (
                    cand.join(cur.select("u", F.col("t").alias("tp")), "u")
                    .where(F.col("t") > F.col("tp"))
                    .select("u", "t")
                )
            cur = (
                seed.unionByName(cand)
                .groupBy("u")
                .agg(F.min("t").alias("t"))
            )
            outs.append(
                cur.select(
                    "u", F.lit(i + 1).cast("int").alias("level"), "t"
                )
            )
        levels = outs[0]
        for o in outs[1:]:
            levels = levels.unionByName(o)
        out = os.path.join(state_dir, f"v{batch_id + 1}")
        levels.write.mode("overwrite").parquet(os.path.join(out, "levels"))

    q = (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def read_funnel(
    spark: SparkSession, state_dir: str, steps: list[str]
) -> DataFrame:
    """Latest persisted level table rolled up EXACTLY like the batch
    operator's output (step, event_type, n_users, conv_from_first_micro,
    conv_from_prev_micro) — the equality surface for the stream==batch
    contract (zero-user levels emit rows, same as the batch agg)."""
    vs = _versions(state_dir)
    if not vs:
        raise FileNotFoundError(f"no funnel state under {state_dir!r}")
    levels = spark.read.parquet(
        os.path.join(state_dir, f"v{vs[-1]}", "levels")
    )
    counts = levels.groupBy("level").agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    grid = spark.createDataFrame(
        [(i + 1, st) for i, st in enumerate(steps)],
        "step int, event_type string",
    )
    base = (
        grid.join(counts, grid["step"] == counts["level"], "left")
        .select(
            "step",
            "event_type",
            F.coalesce("n_users", F.lit(0)).cast("long").alias("n_users"),
        )
    )
    w = Window.orderBy("step")
    wall = Window.orderBy("step").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return base.select(
        "step",
        "event_type",
        "n_users",
        F.expr("(n_users * 1000000L)").alias("_num"),
        F.first("n_users").over(wall).alias("_n1"),
        F.lag("n_users", 1).over(w).alias("_np"),
    ).select(
        "step",
        "event_type",
        "n_users",
        F.expr("_num DIV greatest(_n1, 1L)").cast("long").alias(
            "conv_from_first_micro"
        ),
        F.expr("_num DIV greatest(coalesce(_np, n_users), 1L)")
        .cast("long")
        .alias("conv_from_prev_micro"),
    )
