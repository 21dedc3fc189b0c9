"""SparkSession factory with scale-oriented defaults.

Single place where execution knobs live so tests / bench / entry share one
tuned profile: AQE on (runtime re-plan + skew handling), Arrow on (all kernels
are Arrow-batched pandas UDFs), modest Arrow batch size (media payloads are
fat binary rows — a 10k-row Arrow batch of page images would blow executor
memory at production page sizes).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "document_quality_assessment_ocr_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_batch: int = 256,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: ~2x cores keeps all slots busy without tiny-task overhead
        n = int(cpus) if cpus.isdigit() else (os.cpu_count() or 4)
        shuffle_partitions = max(2 * n, 8)
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
