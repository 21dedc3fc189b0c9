"""Small-file compaction planning — the Iceberg ``rewrite_data_files``
maintenance analog for the checkpointed corpus tables.

Streaming/CDC ingest (``streaming/extract``, ``operators/cdc``) leaves
many small files; a compaction pass groups them into ~``target_bytes``
rewrite tasks. Grouping rule: files in manifest order, each group a
contiguous run, cut at every ``target_bytes`` boundary of the running
byte total — ``group_id = floor(start_byte / target_bytes)``. A group
overshoots the target by less than one file, and contiguity preserves
any sort-order clustering the table already has (why Iceberg's binpack
strategy also packs adjacent files).

The running sum is the single-reducer anti-pattern if written as a
global ``SUM OVER (ORDER BY …)`` window; this reuses
``operators/packing.pack_offsets`` — the distributed two-level prefix
sum (range buckets + bounded per-bucket windows) — so no task ever
holds more than one bucket of the manifest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .packing import pack_offsets


def plan_compaction(
    manifest: DataFrame,
    target_bytes: int,
    id_col: str = "file_id",
    size_col: str = "size_bytes",
    n_buckets: int = 64,
) -> DataFrame:
    """File manifest → per-file compaction-group assignment.

    ``manifest`` rows are ``(id_col: numeric manifest ordinal,
    size_col: bytes)``. Output: (id_col, size_bytes, start_byte,
    group_id). Integer-exact past 2^53 total bytes.
    """
    packed = pack_offsets(
        manifest,
        seq_len=int(target_bytes),
        id_col=id_col,
        tokens_col=size_col,
        n_buckets=n_buckets,
    )
    return packed.select(
        F.col(id_col),
        F.col("n_tokens").alias("size_bytes"),
        F.col("start_token").alias("start_byte"),
        F.col("first_seq").alias("group_id"),
    )


def compaction_summary(plan: DataFrame) -> DataFrame:
    """Per-group rollup of a compaction plan: file count, total bytes —
    the rewrite task list. One hash aggregate."""
    return plan.groupBy("group_id").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("size_bytes").cast("long").alias("total_bytes"),
        F.min("start_byte").cast("long").alias("group_start"),
    )
