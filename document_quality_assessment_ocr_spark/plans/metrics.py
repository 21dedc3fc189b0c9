"""Run-metrics rollup + per-partition manifests (SURVEY.md §2.4 A4, §2.1 S9).

The reference collects driver-side counters and a rejection_summary dict and
writes ``logs/run_{id}.json`` (``evaluator.py:59-65,91-121``,
``utils.py:188-204``). Distributed analog: pure aggregations over the
extraction result (one job), plus per-partition manifest rows recording
lineage + extraction metrics (north_rule: spans kept/dropped and score
distributions per partition, so a resumed run can verify what is already
committed)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def run_metrics(result: DataFrame) -> DataFrame:
    """One-row summary: totals + accept/reject counts (reference
    ``evaluator.py:91-121``)."""
    return result.agg(
        F.count(F.lit(1)).alias("total_documents"),
        F.sum(F.when(F.col("accepted"), 1).otherwise(0)).alias("accepted_count"),
        F.sum(F.when(~F.col("accepted"), 1).otherwise(0)).alias("rejected_count"),
        F.sum(F.size("spans")).alias("spans_kept"),
        F.sum(F.when(F.size("warnings") > 0, 1).otherwise(0)).alias("docs_with_warnings"),
    )


def rejection_summary(result: DataFrame) -> DataFrame:
    """reason string → count (reference ``evaluator.py:104-112``)."""
    return (
        result.select(F.explode("reasons").alias("reason"))
        .groupBy("reason")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("reason"))
    )


def rejected_documents(result: DataFrame) -> DataFrame:
    """doc_id + reasons of rejected docs (reference ``evaluator.py:113-121``)."""
    return result.filter(~F.col("accepted")).select("doc_id", "reasons")


def partition_manifest(result_with_scores: DataFrame) -> DataFrame:
    """Per-partition lineage + metrics rows (north_rule).

    Input: ``run_extraction(..., include_metrics_cols=True)`` output. Each
    output partition contributes one manifest row: row/span counters plus
    blur/skew/noise score distribution sketches (min/max/avg + approx
    percentiles). Written alongside the snapshot, a restarted run lists
    committed partition ids and skips them (see plans/checkpoint.py)."""
    return (
        result_with_scores.withColumn("part_id", F.spark_partition_id())
        .groupBy("part_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("accepted"), 1).otherwise(0)).alias("n_accepted"),
            F.sum("n_spans").alias("spans_in"),
            F.sum("n_kept").alias("spans_kept"),
            F.min("min_lap").alias("blur_min"),
            F.avg("min_lap").alias("blur_avg"),
            F.percentile_approx("min_lap", F.array(F.lit(0.5), F.lit(0.95))).alias("blur_p50_p95"),
            F.max("max_abs_skew").alias("skew_max"),
            F.avg("max_abs_skew").alias("skew_avg"),
            F.max("max_noise").alias("noise_max"),
            F.avg("max_noise").alias("noise_avg"),
            F.percentile_approx("max_noise", F.array(F.lit(0.5), F.lit(0.95))).alias(
                "noise_p50_p95"
            ),
        )
    )


def spans_length_histogram(spans_df: DataFrame, n_buckets: int = 16) -> DataFrame:
    """log2-bucketed histogram of spans-array lengths — drives the salted
    repartition / AQE-skew decision for mega-documents (north_rule; SURVEY.md
    §7.4-4): if the top bucket holds doc spans orders of magnitude above the
    median, enable salting in plans/pipeline."""
    n = F.coalesce(F.size("spans"), F.lit(0))
    bucket = F.when(n <= 0, F.lit(-1)).otherwise(
        F.least(F.floor(F.log2(n.cast("double"))), F.lit(n_buckets - 1)).cast("int")
    )
    return (
        spans_df.select(bucket.alias("log2_bucket"), n.alias("n"))
        .groupBy("log2_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n").alias("max_spans"),
            F.sum("n").alias("total_spans"),
        )
        .orderBy("log2_bucket")
    )
