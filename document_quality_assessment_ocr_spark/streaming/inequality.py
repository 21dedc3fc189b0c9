"""Streaming inequality-grid maintenance — the SIXTEENTH incremental twin,
second of the ONE-STATE-MANY-READS shape (after ``sessions.stream_daily``):
one additive ``(g, v, c)`` value-count grid serves BOTH batch inequality
indices — ``profile.gini_by_group`` (q230) and ``profile.hoover_by_group``
(q263) — through the SHARED ``profile.value_grid`` partial builder and the
``gini_from_grid`` / ``hoover_from_grid`` statistic stages. A continuously
ingesting corpus manifest keeps live concentration monitors (is one
source's mass collapsing onto a handful of mega-documents?) for one
grid-keyed additive merge per batch.

Order-free (counts add), no arrival contract; state bounded by the
(group × value) domain, never history. Versioning / replay idempotence:
``v{batch_id + 1}`` (the sketch-family rule — a replayed batch overwrites
the same version it wrote before, derived from the same committed
predecessor).

The stream carries ingest MANIFEST rows (doc_id, ts, source, n_chars) —
inequality monitoring consumes metadata, not text; the batch equality
surface is exact because both sides run the identical integer stages over
the identical grid.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sessions import _versions

MANIFEST_STREAM_SCHEMA = "doc_id long, ts timestamp, source string, n_chars long"


def stream_value_grid(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    value_col: str = "n_chars",
    group_col: str = "source",
):
    """readStream (doc_id, ts, source, n_chars) → per-batch
    ``profile.value_grid`` partial → additive (g, v)-keyed merge into the
    versioned state table."""
    from ..operators.profile import value_grid

    stream = (
        spark.readStream.schema(MANIFEST_STREAM_SCHEMA)
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
        part = value_grid(batch, value_col, group_col)
        if batch_id > 0:
            prev = batch.sparkSession.read.parquet(
                os.path.join(state_dir, f"v{batch_id}")
            )
            part = (
                prev.unionByName(part)
                .groupBy("g", "v")
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


def _read_grid(spark: SparkSession, state_dir: str) -> DataFrame:
    vs = _versions(state_dir)
    if not vs:
        raise FileNotFoundError(f"no persisted grid under {state_dir!r}")
    return spark.read.parquet(os.path.join(state_dir, f"v{vs[-1]}"))


def read_gini(
    spark: SparkSession, state_dir: str, group_col: str = "source"
) -> DataFrame:
    """Current per-group Gini from the persisted grid — the SHARED
    ``profile.gini_from_grid`` stage: stream == batch row-for-row."""
    from ..operators.profile import gini_from_grid

    return gini_from_grid(_read_grid(spark, state_dir), group_col)


def read_hoover(
    spark: SparkSession, state_dir: str, group_col: str = "source"
) -> DataFrame:
    """Current per-group Hoover index from the persisted grid — the
    SHARED ``profile.hoover_from_grid`` stage."""
    from ..operators.profile import hoover_from_grid

    return hoover_from_grid(_read_grid(spark, state_dir), group_col)
