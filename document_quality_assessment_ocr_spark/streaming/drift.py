"""Streaming KS-drift maintenance — the sixth incremental twin, pairing
``operators/experiment.ks_drift`` the way streaming/sketches pairs the
batch sketches.

The drift statistic's sufficient state is the per-bucket (ca, cb) count
grid, which is ALGEBRAIC (counts add across micro-batches), so a
continuously-ingesting corpus keeps the monitor fresh by summing each
batch's partial grid into a persisted state table of ≤ |buckets| rows —
independent of history length.  Reading the statistic at any time runs
the SHARED ``experiment.ks_from_grid`` stage over the persisted grid, so
stream == batch is row-for-row exact (proved in tests/test_streaming.py)
— no approximation, no watermark assumptions (the statistic is
order-free, unlike streaming/transitions' per-user monotone contract).

Versioning and replay idempotence follow streaming/sketches exactly:
state version = ``v{batch_id + 1}`` (batch ids are monotone from the
checkpoint and REUSED on replay, so a crashed-then-replayed batch merges
the same base and overwrites the same target).

At 100 TB: each micro-batch pays one map-side bucket aggregate over its
own rows plus a grid-sized parquet read/merge/write — the corpus never
re-aggregates, and the monitor the curation run watches (is today's
length distribution drifting from the even-id reference?) is always one
grid read away.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sketches import DOC_STREAM_SCHEMA, _versions


def _grid_partial(
    batch: DataFrame, side_expr: str, value_expr: str, bucket_width: int
) -> DataFrame:
    """One batch's (bucket, ca, cb) partial — the SAME bucket/side
    derivation as the batch operator's grid stage."""
    return (
        batch.select(
            F.expr(side_expr).alias("_l"),
            F.expr(
                f"CAST(greatest(CAST(({value_expr}) AS LONG), 0L) "
                f"DIV {int(bucket_width)} AS LONG)"
            ).alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("_l"), 1).otherwise(0)).cast("long").alias("ca"),
            F.sum(F.when(~F.col("_l"), 1).otherwise(0)).cast("long").alias("cb"),
        )
    )


def stream_ks_drift(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    side_expr: str = "doc_id % 2 = 0",
    value_expr: str = "length(coalesce(text, ''))",
    bucket_width: int = 64,
):
    """Maintain the KS-drift bucket grid incrementally over a document
    stream (availableNow file source, one file per trigger — the module
    test shape)."""
    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def merge(batch: DataFrame, batch_id: int) -> None:
        vs = _versions(state_dir)
        ahead = [v for v in vs if v > batch_id + 1]
        if ahead:
            raise RuntimeError(
                f"state_dir {state_dir!r} already holds versions {ahead} "
                f"beyond v{batch_id + 1}: fresh checkpoint against old "
                "state history — reset checkpoint_dir and state_dir "
                "together (paired unit)."
            )
        part = _grid_partial(batch, side_expr, value_expr, bucket_width)
        if batch_id > 0:
            prev = batch.sparkSession.read.parquet(
                os.path.join(state_dir, f"v{batch_id}")
            )
            part = (
                prev.unionByName(part)
                .groupBy("bucket")
                .agg(
                    F.sum("ca").cast("long").alias("ca"),
                    F.sum("cb").cast("long").alias("cb"),
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


def read_ks(spark: SparkSession, state_dir: str) -> DataFrame:
    """Current KS statistic from the persisted grid — the SHARED
    ``experiment.ks_from_grid`` stage, so the result is row-for-row the
    batch operator's output over everything ingested so far."""
    from ..operators.experiment import ks_from_grid

    vs = _versions(state_dir)
    if not vs:
        raise FileNotFoundError(f"no persisted grid under {state_dir!r}")
    grid = spark.read.parquet(os.path.join(state_dir, f"v{vs[-1]}"))
    return ks_from_grid(grid)


EMB_STREAM_SCHEMA = "vec_id long, embedding array<double>"


def stream_isotropy(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    scale: int = 64,
):
    """Streaming isotropy maintenance — the seventh incremental twin,
    pairing ``similarity.isotropy_audit`` exactly as ``stream_ks_drift``
    pairs ``ks_drift``: the per-dim (s, ssq, cnt) sufficient-statistic
    grid is ALGEBRAIC (``similarity.isotropy_grid`` is the shared
    partial builder), so each micro-batch pays one ×dim posexplode over
    its own rows plus a |dim|-row state merge. Versioning / replay
    idempotence: ``v{batch_id + 1}`` (the sketch-family rule).

    At 100 TB: a continuously ingesting embedding corpus keeps its
    anisotropy monitor fresh for a per-batch cost independent of
    history; reading the statistic (``read_isotropy``) runs the shared
    ``isotropy_from_grid`` stage over |dim| persisted rows — stream ==
    batch row-for-row exact, order-free (no watermark assumptions).
    """
    from ..operators.similarity import isotropy_grid

    stream = (
        spark.readStream.schema(EMB_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def merge(batch: DataFrame, batch_id: int) -> None:
        vs = _versions(state_dir)
        ahead = [v for v in vs if v > batch_id + 1]
        if ahead:
            raise RuntimeError(
                f"state_dir {state_dir!r} already holds versions {ahead} "
                f"beyond v{batch_id + 1}: fresh checkpoint against old "
                "state history — reset checkpoint_dir and state_dir "
                "together (paired unit)."
            )
        part = isotropy_grid(batch, scale=scale)
        if batch_id > 0:
            prev = batch.sparkSession.read.parquet(
                os.path.join(state_dir, f"v{batch_id}")
            )
            part = (
                prev.unionByName(part)
                .groupBy("dim")
                .agg(
                    F.sum("s").cast("long").alias("s"),
                    F.sum("ssq").cast("long").alias("ssq"),
                    F.sum("cnt").cast("long").alias("cnt"),
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


def read_isotropy(spark: SparkSession, state_dir: str) -> DataFrame:
    """Current isotropy statistic from the persisted grid — the SHARED
    ``similarity.isotropy_from_grid`` stage over everything ingested."""
    from ..operators.similarity import isotropy_from_grid

    vs = _versions(state_dir)
    if not vs:
        raise FileNotFoundError(f"no persisted grid under {state_dir!r}")
    grid = spark.read.parquet(os.path.join(state_dir, f"v{vs[-1]}"))
    return isotropy_from_grid(grid)


def stream_centroid_drift(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    scale: int = 64,
    tag: str = "cd",
):
    """Streaming centroid-drift maintenance — the eleventh incremental
    twin, pairing ``similarity.centroid_drift`` exactly as
    ``stream_isotropy`` pairs ``isotropy_audit``: the (half, dim, s,
    cnt) sufficient-statistic grid is ALGEBRAIC
    (``similarity.centroid_drift_grid`` is the shared partial builder),
    so each micro-batch pays one ×dim posexplode over its own rows plus
    a 2·|dim|-row state merge.  Versioning / replay idempotence:
    ``v{batch_id + 1}`` (the sketch-family rule).

    At 100 TB: a continuously ingesting embedding corpus keeps its
    per-dimension centroid monitor fresh for a per-batch cost
    independent of history; reading the panel
    (``read_centroid_drift``) runs the shared
    ``centroid_drift_from_grid`` stage over the persisted grid —
    stream == batch row-for-row exact, order-free (no watermark
    assumptions).
    """
    from ..operators.similarity import centroid_drift_grid

    stream = (
        spark.readStream.schema(EMB_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def merge(batch: DataFrame, batch_id: int) -> None:
        vs = _versions(state_dir)
        ahead = [v for v in vs if v > batch_id + 1]
        if ahead:
            raise RuntimeError(
                f"state_dir {state_dir!r} already holds versions {ahead} "
                f"beyond v{batch_id + 1}: fresh checkpoint against old "
                "state history — reset checkpoint_dir and state_dir "
                "together (paired unit)."
            )
        part = centroid_drift_grid(batch, scale=scale, tag=tag)
        if batch_id > 0:
            prev = batch.sparkSession.read.parquet(
                os.path.join(state_dir, f"v{batch_id}")
            )
            part = (
                prev.unionByName(part)
                .groupBy("half", "dim")
                .agg(
                    F.sum("s").cast("long").alias("s"),
                    F.sum("cnt").cast("long").alias("cnt"),
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


def read_centroid_drift(
    spark: SparkSession, state_dir: str, scale: int = 64
) -> DataFrame:
    """Current per-dim drift panel from the persisted grid — the SHARED
    ``similarity.centroid_drift_from_grid`` stage over everything
    ingested."""
    from ..operators.similarity import centroid_drift_from_grid

    vs = _versions(state_dir)
    if not vs:
        raise FileNotFoundError(f"no persisted grid under {state_dir!r}")
    grid = spark.read.parquet(os.path.join(state_dir, f"v{vs[-1]}"))
    return centroid_drift_from_grid(grid, scale=scale)


AUC_STREAM_SCHEMA = "doc_id long, text string, source string, n_chars long"


def _auc_partial(batch: DataFrame) -> DataFrame:
    """One batch's (g, v, pos, neg) partial — the SAME gopher_labeled
    projection + auc_grid stage as the q238 batch query."""
    from ..operators.experiment import auc_grid
    from ..operators.quality import gopher_labeled

    lab = gopher_labeled(batch, ["source", "n_chars"]).select(
        "source", "n_chars", F.col("keep").cast("long").alias("label")
    )
    return auc_grid(lab, "n_chars", "label", "source")


def stream_auc(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    state_dir: str,
):
    """Streaming AUC maintenance — the twelfth incremental twin, pairing
    ``experiment.auc_by_group`` (q238): the (g, v, pos, neg) value grid
    is ALGEBRAIC (``auc_grid`` is the shared partial builder; pos/neg
    counts add), so a continuously ingesting corpus keeps its
    classifier-ranking monitor fresh for a per-batch cost of one
    map-side label projection + grid aggregate over its own rows plus a
    grid-sized state merge.  State is bounded by |groups| × |score
    domain| — history-independent.  Versioning / replay idempotence:
    ``v{batch_id + 1}`` (the sketch-family rule).

    Reading the statistic (``read_auc``) runs the SHARED
    ``auc_from_grid`` stage over the persisted grid — stream == batch
    row-for-row exact, order-free (no watermark assumptions).
    """

    stream = (
        spark.readStream.schema(AUC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def merge(batch: DataFrame, batch_id: int) -> None:
        vs = _versions(state_dir)
        ahead = [v for v in vs if v > batch_id + 1]
        if ahead:
            raise RuntimeError(
                f"state_dir {state_dir!r} already holds versions {ahead} "
                f"beyond v{batch_id + 1}: fresh checkpoint against old "
                "state history — reset checkpoint_dir and state_dir "
                "together (paired unit)."
            )
        part = _auc_partial(batch)
        if batch_id > 0:
            prev = batch.sparkSession.read.parquet(
                os.path.join(state_dir, f"v{batch_id}")
            )
            part = (
                prev.unionByName(part)
                .groupBy("g", "v")
                .agg(
                    F.sum("pos").cast("long").alias("pos"),
                    F.sum("neg").cast("long").alias("neg"),
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


def read_auc(spark: SparkSession, state_dir: str) -> DataFrame:
    """Current per-group AUC from the persisted grid — the SHARED
    ``experiment.auc_from_grid`` stage over everything ingested."""
    from ..operators.experiment import auc_from_grid

    vs = _versions(state_dir)
    if not vs:
        raise FileNotFoundError(f"no persisted grid under {state_dir!r}")
    grid = spark.read.parquet(os.path.join(state_dir, f"v{vs[-1]}"))
    return auc_from_grid(grid, "source")


ZONE_THRESHOLDS = [100, 300, 1000, 3000]


def stream_zone_map(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    bucket_size: int = 16,
):
    """Streaming zone-map maintenance — the fourteenth incremental twin,
    pairing ``profile.zone_map_audit`` (q158) and modelling EXACTLY what
    an Iceberg/parquet writer does on commit: fold each new file's
    per-bucket (min, max, count) into the table's manifest statistics.
    ``zone_map_grid`` is the shared partial builder; the merge is
    ALGEBRAIC (MIN/MAX/SUM per bucket), so state is bounded by the
    bucket domain (rows/bucket_size), order-free, history-independent.
    Versioning / replay idempotence: ``v{batch_id + 1}`` (the
    sketch-family rule).

    Reading the audit (``read_zone_map``) runs the SHARED
    ``zone_map_from_grid`` threshold fan over the persisted manifest —
    stream == batch row-for-row exact.
    """
    from ..operators.profile import zone_map_grid

    stream = (
        spark.readStream.schema(AUC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def merge(batch: DataFrame, batch_id: int) -> None:
        vs = _versions(state_dir)
        ahead = [v for v in vs if v > batch_id + 1]
        if ahead:
            raise RuntimeError(
                f"state_dir {state_dir!r} already holds versions {ahead} "
                f"beyond v{batch_id + 1}: fresh checkpoint against old "
                "state history — reset checkpoint_dir and state_dir "
                "together (paired unit)."
            )
        part = zone_map_grid(batch, "n_chars", "doc_id", bucket_size)
        if batch_id > 0:
            prev = batch.sparkSession.read.parquet(
                os.path.join(state_dir, f"v{batch_id}")
            )
            part = (
                prev.unionByName(part)
                .groupBy("bucket")
                .agg(
                    F.min("vmin").alias("vmin"),
                    F.max("vmax").alias("vmax"),
                    F.sum("n").cast("long").alias("n"),
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


def read_zone_map(
    spark: SparkSession,
    state_dir: str,
    thresholds: list[int] | None = None,
) -> DataFrame:
    """Current zone-map audit from the persisted manifest grid — the
    SHARED ``profile.zone_map_from_grid`` stage over everything
    ingested."""
    from ..operators.profile import zone_map_from_grid

    vs = _versions(state_dir)
    if not vs:
        raise FileNotFoundError(f"no persisted grid under {state_dir!r}")
    grid = spark.read.parquet(os.path.join(state_dir, f"v{vs[-1]}"))
    return zone_map_from_grid(grid, thresholds or ZONE_THRESHOLDS)
