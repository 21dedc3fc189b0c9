"""Streaming sessionization — the incremental twin of
``operators/sessions.sessionize`` (tenth incremental twin).

Gaps-and-islands is NOT algebraic (a session can span a batch boundary),
but its carry state is tiny and entity-keyed, exactly like
streaming/transitions' last-event table: per user, only the OPEN session
(global index, start, last-event time, running integer aggregates) can
be affected by future events — every earlier session is closed forever
once a later event arrives.  State is therefore two tables — the
append-only CLOSED sessions and the |users|-row OPEN table — and each
micro-batch:

1. seeds the batch's events with each user's open-session row (a pseudo
   event at the open session's last timestamp carrying its aggregates),
2. runs the SAME (ts, event_id)-ordered gaps-and-islands window the
   batch operator runs (seed rows sort first at their timestamp),
3. renumbers: island s of a seeded user maps to global index
   ``open_idx + s - 1`` (the seed's island continues the open session);
   unseeded users start at their island number offset by nothing,
4. closes every island except the user's last, which becomes the new
   open row.

Aggregates carried across the boundary are INTEGER-only (n_events,
start/end micros, per-event milli-value truncation — the q168 portable
path), so the merged session rows are bit-identical to the batch
operator in ``milli_values=True`` mode; a float running sum would
re-associate across boundaries and could differ in the last ulp.

Exactness contract (tests/test_streaming.py): when events arrive
per-user MONOTONE in (ts, event_id) across micro-batches — the same
in-order-ingest assumption streaming/transitions documents — the union
of closed + open sessions after consuming the whole input is
ROW-FOR-ROW ``sessionize(all_events, milli_values=True)``.  Out-of-order
arrivals need a watermark-bounded reorder buffer upstream.

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
    "event_id long, user_id long, event_type string, ts timestamp, "
    "value double"
)


def _versions(state_dir: str) -> list[int]:
    if not os.path.isdir(state_dir):
        return []
    return sorted(
        int(d[1:]) for d in os.listdir(state_dir)
        if d.startswith("v") and d[1:].isdigit()
    )


def stream_sessions(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    gap_seconds: int = 1800,
):
    """readStream events → seeded gaps-and-islands per batch → closed
    sessions appended, open sessions re-persisted (versioned).
    availableNow; returns the StreamingQuery."""
    gap_us = int(gap_seconds) * 1_000_000
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
                "against old session state — reset checkpoint_dir and "
                "state_dir together (paired unit)."
            )
        ss = batch.sparkSession
        ev = batch.select(
            F.col("user_id").cast("long").alias("user_id"),
            F.unix_micros(F.col("ts")).alias("t"),
            F.col("event_id").cast("long").alias("event_id"),
            F.lit(0).alias("seed_rank"),
            F.lit(None).cast("long").alias("seed_idx"),
            F.lit(None).cast("long").alias("seed_start"),
            F.lit(None).cast("long").alias("seed_n"),
            F.lit(None).cast("long").alias("seed_vm"),
            (
                F.col("value").cast("double")
                * F.lit(1000).cast("double")
            )
            .cast("long")
            .alias("vm"),
        )
        if batch_id > 0:
            base = os.path.join(state_dir, f"v{batch_id}")
            prev_open = ss.read.parquet(os.path.join(base, "open"))
            prev_closed = ss.read.parquet(os.path.join(base, "closed"))
            seeds = prev_open.select(
                "user_id",
                F.col("session_end_us").alias("t"),
                F.lit(-1).cast("long").alias("event_id"),
                F.lit(-1).alias("seed_rank"),
                F.col("session_idx").cast("long").alias("seed_idx"),
                F.col("session_start_us").alias("seed_start"),
                F.col("n_events").alias("seed_n"),
                F.col("value_milli").alias("seed_vm"),
                F.lit(0).cast("long").alias("vm"),
            )
            ev = seeds.unionByName(ev)
        else:
            prev_closed = None

        # the batch operator's window, with seeds pinned first at their
        # timestamp (seed_rank -1 < 0) so a continuing session extends
        w = Window.partitionBy("user_id").orderBy(
            F.col("t").asc(), F.col("seed_rank").asc(),
            F.col("event_id").asc(),
        )
        prev_t = F.lag("t").over(w)
        new_s = F.when(
            prev_t.isNull() | ((F.col("t") - prev_t) > F.lit(gap_us)), 1
        ).otherwise(0)
        sid = F.sum(new_s).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        marked = ev.select(
            "user_id", "t", "seed_idx", "seed_start", "seed_n",
            "seed_vm", "vm", sid.cast("long").alias("sid"),
        )
        # per-user base index: a seeded user's island s is global
        # session open_idx + s - 1; an unseeded user's is just s
        wbase = Window.partitionBy("user_id")
        sess = (
            marked.select(
                "user_id",
                "sid",
                (
                    F.coalesce(
                        F.max("seed_idx").over(wbase), F.lit(1).cast("long")
                    )
                    - 1
                ).alias("base"),
                F.coalesce(F.col("seed_start"), F.col("t")).alias("st"),
                F.col("t"),
                F.coalesce(F.col("seed_n"), F.lit(1).cast("long")).alias(
                    "ne"
                ),
                F.coalesce(F.col("seed_vm"), F.col("vm")).alias("v"),
            )
            .groupBy("user_id", "sid", "base")
            .agg(
                F.min("st").cast("long").alias("session_start_us"),
                F.max("t").cast("long").alias("session_end_us"),
                F.sum("ne").cast("long").alias("n_events"),
                F.sum("v").cast("long").alias("value_milli"),
            )
            .select(
                "user_id",
                (F.col("base") + F.col("sid")).cast("int").alias(
                    "session_idx"
                ),
                "session_start_us",
                "session_end_us",
                "n_events",
                "value_milli",
            )
        )
        wlast = Window.partitionBy("user_id")
        flagged = sess.withColumn(
            "is_open",
            F.col("session_idx") == F.max("session_idx").over(wlast),
        ).persist()
        newly_closed = flagged.where(~F.col("is_open")).drop("is_open")
        open_now = flagged.where(F.col("is_open")).drop("is_open")
        closed = (
            prev_closed.unionByName(newly_closed)
            if prev_closed is not None
            else newly_closed
        )
        out = os.path.join(state_dir, f"v{batch_id + 1}")
        closed.write.mode("overwrite").parquet(
            os.path.join(out, "closed")
        )
        open_now.write.mode("overwrite").parquet(os.path.join(out, "open"))
        flagged.unpersist()

    q = (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def read_sessions(spark: SparkSession, state_dir: str) -> DataFrame:
    """Latest persisted closed ∪ open sessions — the equality surface
    for ``sessionize(all_events, milli_values=True)``, same columns,
    ordered by (user_id, session_idx)."""
    vs = _versions(state_dir)
    if not vs:
        raise FileNotFoundError(f"no session state under {state_dir!r}")
    base = os.path.join(state_dir, f"v{vs[-1]}")
    closed = spark.read.parquet(os.path.join(base, "closed"))
    open_now = spark.read.parquet(os.path.join(base, "open"))
    return (
        closed.unionByName(open_now)
        .select(
            "user_id",
            "session_idx",
            "session_start_us",
            "session_end_us",
            "n_events",
            "value_milli",
        )
        .orderBy("user_id", "session_idx")
    )


def stream_rfm(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    state_dir: str,
):
    """Streaming RFM maintenance — the thirteenth incremental twin,
    pairing ``sessions.rfm_segments`` (q231) and the second whose state
    is keyed by ENTITY rather than sketch cell (after transitions'
    last-event table): the per-user (last_us, n_events, value_milli)
    statistics are ALGEBRAIC per user (max / sum / sum —
    ``rfm_user_state`` is the shared partial builder), so a
    continuously ingesting event log keeps its segmentation grid fresh
    for a per-batch cost of one user-keyed aggregate over its own rows
    plus a |users|-bounded state merge.  Unlike sessionize, NO arrival
    -order contract is needed — max/sum are order-free, so late or
    shuffled events still converge to the batch answer.

    State is bounded by |users| (not history).  Versioning / replay
    idempotence: ``v{batch_id + 1}`` (the sketch-family rule).

    Reading the grid (``read_rfm``) runs the SHARED
    ``sessions.rfm_from_state`` stage (fixed bucket rules, corpus-max
    recency reference) over the persisted state — stream == batch
    row-for-row exact.
    """
    from ..operators.sessions import rfm_user_state

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
                "against old state history — reset checkpoint_dir and "
                "state_dir together (paired unit)."
            )
        part = rfm_user_state(batch)
        if batch_id > 0:
            prev = batch.sparkSession.read.parquet(
                os.path.join(state_dir, f"v{batch_id}")
            )
            part = (
                prev.unionByName(part)
                .groupBy("u")
                .agg(
                    F.max("last_us").cast("long").alias("last_us"),
                    F.sum("n_events").cast("long").alias("n_events"),
                    F.sum("value_milli").cast("long").alias("value_milli"),
                )
            )
        part.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"v{batch_id + 1}")
        )

    q = (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def read_rfm(spark: SparkSession, state_dir: str) -> DataFrame:
    """Current RFM segment grid from the persisted per-user state — the
    SHARED ``sessions.rfm_from_state`` stage over everything ingested."""
    from ..operators.sessions import rfm_from_state

    vs = _versions(state_dir)
    if not vs:
        raise FileNotFoundError(f"no persisted state under {state_dir!r}")
    state = spark.read.parquet(os.path.join(state_dir, f"v{vs[-1]}"))
    return rfm_from_state(state)


def stream_daily(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    state_dir: str,
):
    """Streaming daily-count grid maintenance — the fifteenth
    incremental twin and the first whose ONE state table serves TWO
    batch statistics: ``sessions.daily_autocorr`` (q241) and
    ``sessions.mann_kendall_daily`` (q253) both read the same (day, c)
    grid, so keeping it fresh incrementally (``daily_counts`` is the
    shared partial builder; counts ADD) gives a continuously ingesting
    event log live seasonality and trend monitors for one additive
    day-keyed merge per batch.  Order-free (sums), no arrival
    contract; state bounded by the day domain.  Versioning / replay
    idempotence: ``v{batch_id + 1}`` (the sketch-family rule).
    """
    from ..operators.sessions import daily_counts

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
                "against old state history — reset checkpoint_dir and "
                "state_dir together (paired unit)."
            )
        part = daily_counts(batch)
        if batch_id > 0:
            prev = batch.sparkSession.read.parquet(
                os.path.join(state_dir, f"v{batch_id}")
            )
            part = (
                prev.unionByName(part)
                .groupBy("day")
                .agg(F.sum("c").cast("long").alias("c"))
            )
        part.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"v{batch_id + 1}")
        )

    q = (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def _read_daily_grid(spark: SparkSession, state_dir: str) -> DataFrame:
    vs = _versions(state_dir)
    if not vs:
        raise FileNotFoundError(f"no persisted grid under {state_dir!r}")
    return spark.read.parquet(os.path.join(state_dir, f"v{vs[-1]}"))


def read_daily_autocorr(
    spark: SparkSession, state_dir: str, max_lag: int = 7
) -> DataFrame:
    """Current lag autocorrelations from the persisted day grid — the
    SHARED ``sessions.daily_autocorr_from_grid`` stage."""
    from ..operators.sessions import daily_autocorr_from_grid

    return daily_autocorr_from_grid(
        _read_daily_grid(spark, state_dir), max_lag
    )


def read_daily_mann_kendall(
    spark: SparkSession, state_dir: str
) -> DataFrame:
    """Current Mann-Kendall trend from the persisted day grid — the
    SHARED ``sessions.mann_kendall_from_grid`` stage."""
    from ..operators.sessions import mann_kendall_from_grid

    return mann_kendall_from_grid(_read_daily_grid(spark, state_dir))
