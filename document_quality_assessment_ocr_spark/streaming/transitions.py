"""Streaming Markov-transition maintenance — the incremental twin of
``operators/sessions.transition_matrix``.

The transition grid is an ALGEBRAIC aggregate (pair counts add), so a
continuously-ingesting event stream keeps it fresh by merging each
micro-batch's pair counts into a persisted grid. The only extra state a
batch boundary needs is EACH USER'S LAST EVENT: the first event of a
user's next batch pairs with it (the cross-boundary transition the
per-batch window cannot see). State is therefore two tables — the
≤ |types|² grid and the |users|-row last-event table — both independent
of history length.

Exactness contract (proved by tests/test_streaming.py): when events
arrive per-user MONOTONE in (ts, event_id) across micro-batches
(in-order ingest — the same assumption every batch-boundary lag carries),
the persisted grid after consuming the whole input is ROW-FOR-ROW the
batch operator's grid over the same data. Out-of-order arrivals need a
watermark-bounded reorder buffer upstream; this module deliberately does
not hide that requirement.

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


def _batch_pairs(events: DataFrame) -> DataFrame:
    """(prev_type, next_type, n) pairs within one relation — the SAME
    (ts, event_id) deterministic ordering as the batch operator, with
    ``is_seed`` rows acting only as predecessors (a seed's own arrival
    was already counted in an earlier batch)."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("t").asc(), F.col("event_id").asc()
    )
    pairs = (
        events.select(
            "user_id",
            "t",
            "event_id",
            "ty",
            "is_seed",
            F.lag("ty").over(w).alias("prev_type"),
        )
        .where(F.col("prev_type").isNotNull() & (~F.col("is_seed")))
        .select("prev_type", F.col("ty").alias("next_type"))
    )
    return pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def stream_transitions(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    state_dir: str,
):
    """readStream events → per-batch transition pairs (seeded with each
    user's persisted last event) → additive merge into the versioned
    grid; last-event state advances by per-user (ts, event_id) max.
    availableNow; returns the StreamingQuery."""
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
                "against old transition state — reset checkpoint_dir "
                "and state_dir together (paired unit)."
            )
        ss = batch.sparkSession
        ev = batch.select(
            "user_id",
            F.unix_micros(F.col("ts")).alias("t"),
            "event_id",
            F.coalesce("event_type", F.lit("")).alias("ty"),
            F.lit(False).alias("is_seed"),
        )
        if batch_id > 0:
            base = os.path.join(state_dir, f"v{batch_id}")
            prev_last = ss.read.parquet(os.path.join(base, "last")).select(
                "user_id", "t", "event_id", "ty",
                F.lit(True).alias("is_seed"),
            )
            prev_grid = ss.read.parquet(os.path.join(base, "grid"))
            ev = prev_last.unionByName(ev)
        else:
            prev_grid = None

        grid = _batch_pairs(ev)
        if prev_grid is not None:
            grid = (
                prev_grid.unionByName(grid)
                .groupBy("prev_type", "next_type")
                .agg(F.sum("n").cast("long").alias("n"))
            )
        # per-user (t, event_id) max-struct winner — the new last event
        last = (
            ev.groupBy("user_id")
            .agg(
                F.max(
                    F.struct(
                        F.col("t"), F.col("event_id"), F.col("ty")
                    )
                ).alias("w")
            )
            .select(
                "user_id",
                F.col("w.t").alias("t"),
                F.col("w.event_id").alias("event_id"),
                F.col("w.ty").alias("ty"),
            )
        )
        out = os.path.join(state_dir, f"v{batch_id + 1}")
        grid.write.mode("overwrite").parquet(os.path.join(out, "grid"))
        last.write.mode("overwrite").parquet(os.path.join(out, "last"))

    q = (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def read_transitions(spark: SparkSession, state_dir: str) -> DataFrame:
    """Latest persisted grid, row-normalized EXACTLY like the batch
    operator's output (prev_type, next_type, n, prob_micro) — the
    equality surface for the stream==batch contract."""
    vs = _versions(state_dir)
    if not vs:
        raise FileNotFoundError(f"no transition state under {state_dir!r}")
    grid = spark.read.parquet(
        os.path.join(state_dir, f"v{vs[-1]}", "grid")
    )
    marg = grid.groupBy("prev_type").agg(
        F.sum("n").cast("long").alias("out_mass")
    )
    return (
        grid.join(marg, "prev_type")
        .select(
            "prev_type",
            "next_type",
            F.col("n").cast("long").alias("n"),
            F.expr("(n * 1000000L) DIV out_mass").cast("long").alias(
                "prob_micro"
            ),
        )
        .orderBy("prev_type", "next_type")
    )
