"""Streaming deduplication — the incremental twin of the batch dedup family.

`dropDuplicatesWithinWatermark` keeps the FIRST arrival per key and holds
per-key state only until the watermark passes it, so state is bounded by
(key cardinality within the watermark horizon), not by stream history —
the property that makes continuous corpus ingest dedup feasible: an
unbounded `dropDuplicates` on a 10¹²-doc firehose would accrete state
forever, while the watermarked form ages keys out as event time advances.

Keys are the same normalized-text md5 fingerprint the batch operators use
(`functions/text.fingerprint`), so a document that was deduped in a batch
backfill is recognized as the same document when it re-arrives on the
stream.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..functions.text import fingerprint

DOC_STREAM_SCHEMA = "doc_id long, ts timestamp, text string"


def stream_fingerprint_dedup(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    query_name: str = "stream_dedup",
    watermark: str = "2 hours",
):
    """readStream (doc_id, ts, text) → fingerprint → first-occurrence
    dedup with watermark-bounded state → memory sink (append). Runs to
    completion with availableNow; returns the StreamingQuery."""
    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    deduped = (
        stream.withColumn("fp", fingerprint(F.col("text")))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
