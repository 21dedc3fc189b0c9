"""Incremental extraction via Structured Streaming.

``readStream`` tails a spans directory; every micro-batch runs the identical
batch plan (:func:`..plans.pipeline.run_extraction`) through ``foreachBatch``
and appends to the output — the idiomatic Spark pattern when the per-batch
logic includes joins + multi-aggregate folds that append-mode streaming
aggregation cannot express. Checkpointing gives exactly-once file-sink
semantics; combined with plans/checkpoint.py manifests this is the resume
story at production scale.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession

from ..config import CriteriaConfig
from ..plans.pipeline import run_extraction
from ..sources.tables import SPANS_SCHEMA


def stream_extraction(
    spark: SparkSession,
    input_dir: str,
    payloads_df: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    criteria: Optional[List[CriteriaConfig]] = None,
    available_now: bool = True,
    scored_payloads: Optional[DataFrame] = None,
):
    """Start (and with ``available_now`` run-to-completion) the incremental
    extraction stream. Returns the StreamingQuery."""
    stream = (
        spark.readStream.schema(SPANS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        out = run_extraction(
            batch_df,
            payloads_df,
            criteria=criteria,
            scored_payloads=scored_payloads,
            # within one micro-batch files may still carry duplicate doc_ids;
            # cross-batch dedup is the caller's contract (last-wins applies
            # per batch exactly like the reference's per-run dedup)
            assume_unique_doc_ids=False,
        )
        out.write.mode("append").parquet(output_dir)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def stream_binary_extraction(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    criteria: Optional[List[CriteriaConfig]] = None,
    max_pages: int = 5,
    parser=None,
    available_now: bool = True,
):
    """Incremental ingest of BINARY documents: readStream tails a parquet
    directory of (doc_id, fmt, content, requires_ocr) rows; every micro-batch
    runs the identical batch front-end + extraction plan
    (:func:`..sources.binary_docs.extract_from_binary`) and appends.

    The production analog of the reference's one-shot CLI run turned into a
    continuously-fed pipeline: new document files land, get rasterized,
    scored, folded and appended exactly once (stream checkpointing), with
    all of the batch path's caps/dispatch/error contracts intact."""
    from ..sources.binary_docs import (
        BINARY_DOCS_SCHEMA,
        extract_from_binary,
        parse_page_container,
    )

    stream = (
        spark.readStream.schema(BINARY_DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        out = extract_from_binary(
            batch_df,
            criteria=criteria,
            max_pages=max_pages,
            parser=parser or parse_page_container,
        )
        out.write.mode("append").parquet(output_dir)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
