"""Table readers with explicit schemas (SURVEY.md §2.1 S1–S3).

Parquet today; the same call sites take ``spark.read.format("iceberg")`` in a
catalog-equipped deployment (the fixture layout matches the Iceberg-style
``(doc_id, spans)`` table of BASELINE.json's input_hint). Schemas are declared
(FAILFAST-style), not inferred — the reference validates with pydantic on read
(``evaluator.py:54``); here malformed rows fail the scan analyzer-side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)

SPANS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("skip_checks", T.BooleanType()),
        T.StructField("ingest_seq", T.LongType()),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT)),
    ]
)

PAYLOADS_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("dpi", T.IntegerType()),
        T.StructField("png", T.BinaryType()),
    ]
)

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _effective_splits(path: str) -> int:
    """Ceiling on real scan parallelism for a parquet path: parquet splits
    at ROW-GROUP boundaries, so a 29 MB file with one row group yields one
    non-empty task no matter how small ``maxPartitionBytes`` is — and
    ``rdd.getNumPartitions()`` happily reports 32 empty splits around it.
    Metadata-only probe (footers, no data pages); unreadable/exotic
    layouts return a large number so callers skip the repartition."""
    import glob as _glob

    try:
        import pyarrow.parquet as pq

        if os.path.isdir(path):
            files = _glob.glob(os.path.join(path, "*.parquet"))
        else:
            files = _glob.glob(path) or [path]
        n = 0
        for f in files:
            n += pq.ParquetFile(f).metadata.num_row_groups
            if n >= 4096:
                break
        return max(n, 1)
    except Exception:
        return 1 << 30


def effective_scan_parallelism(df: DataFrame) -> int:
    """Ceiling on a DataFrame's REAL scan parallelism from its leaf
    parquet files' row-group counts (``df.inputFiles()`` + footers).
    ``rdd.getNumPartitions()`` lies twice about unsplittable inputs: a
    1-row-group file reports however many (empty) splits
    ``maxPartitionBytes`` carves, and with a small ``maxPartitionBytes``
    or ``minPartitionNum`` the nominal count even exceeds the core count,
    silencing any partition-count guard (the r6 driver-conf lesson: the
    bench session's 1 MB ``maxPartitionBytes`` made every 1-row-group
    table report 32 splits while one task did all the work). Non-file or
    unprobeable sources return a large number (callers skip the
    repartition)."""
    try:
        files = df.inputFiles()
    except Exception:
        return 1 << 30
    if not files:
        return 1 << 30
    key = tuple(sorted(files))
    hit = _SPLITS_MEMO.get(key)
    if hit is not None:
        return hit
    try:
        import pyarrow.parquet as pq

        n = 0
        for f in files[:512]:
            p = f[7:] if f.startswith("file://") else f
            if not p.endswith(".parquet"):
                return 1 << 30
            n += pq.ParquetFile(p).metadata.num_row_groups
            if n >= 4096:
                break
        n = max(n, 1)
    except Exception:
        n = 1 << 30
    if len(_SPLITS_MEMO) < 1024:
        _SPLITS_MEMO[key] = n
    return n


#: per-process memo for :func:`effective_scan_parallelism` footer probes
#: (file lists are stable within a bench/driver session; bounded)
_SPLITS_MEMO: dict = {}


def read_spans(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.schema(SPANS_SCHEMA).parquet(path)
    # unsplittable-input guard (optimization guide §2.5): the span-side
    # gate/fold map work otherwise serializes on the single non-empty scan
    # task (r6 sf1 probe: one straggler task carried the whole 200k-doc
    # span plan). Scale-adaptive; a real multi-row-group/multi-file layout
    # skips the shuffle entirely. Results are partitioning-invariant (the
    # pipeline keys every aggregate by doc_id and last-wins uses the
    # explicit ingest_seq column this schema declares).
    n = spark.sparkContext.defaultParallelism
    if _effective_splits(path) < n:
        df = df.repartition(n)
    return df


def read_payloads(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(PAYLOADS_SCHEMA).parquet(path)


def read_corpus(spark: SparkSession, dir_: str) -> tuple[DataFrame, DataFrame]:
    return (
        read_spans(spark, os.path.join(dir_, "documents_spans.parquet")),
        read_payloads(spark, os.path.join(dir_, "media_payloads.parquet")),
    )


def load_testdata(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> dict:
    """Load the driver-generated TPC-H-ish tables as DataFrames and register
    temp views with the same names."""
    out = {}
    for t in tables or TESTDATA_TABLES:
        df = spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))
        df.createOrReplaceTempView(t)
        out[t] = df
    return out
