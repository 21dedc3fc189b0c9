"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship extraction pipeline over a spans corpus derived
deterministically from /root/testdata/sf0.001/documents.parquet plus the
seeded payload catalog.

``queries()`` / ``oracle_sql()`` — SQL-expressible operators from SURVEY.md §2
run side-by-side against DuckDB on the sf_dir parquet views. Every aggregate /
computed column is aliased identically on both sides; float expressions use
the same operation order so IEEE results are bit-identical; money sums go
through decimal(18,2) to stay order-independent.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"

# ASCII whitespace class — pinned on both engines (functions/text.py)
WS = "[ \\t\\n\\r\\f\\x0b]"


def _doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: main-content extraction over interleaved text+media spans."""
    from document_quality_assessment_ocr_spark.plans.pipeline import run_extraction
    from document_quality_assessment_ocr_spark.sources.derive import (
        payloads_df,
        spans_from_documents,
    )

    pay = payloads_df(spark)
    names = [r["media_ref"] for r in pay.select("media_ref").collect()]
    spans = spans_from_documents(_doc(spark, SF0001), sorted(names))
    return run_extraction(spans, pay, assume_unique_doc_ids=True)


# ---------------------------------------------------------------------------
# driver-checked queries (Spark impl + DuckDB oracle SQL)
# ---------------------------------------------------------------------------


def _q_text_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_quality_assessment_ocr_spark.functions.text import text_density, text_keep

    d = _doc(spark, sf_dir)
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        text_density(F.col("text")).alias("density"),
        text_keep(F.col("text")).alias("keep"),
    )


def _q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_quality_assessment_ocr_spark.functions.text import token_count

    d = _doc(spark, sf_dir)
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        token_count(F.col("text")).alias("n_tokens"),
    )


def _q_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_quality_assessment_ocr_spark.functions.text import fingerprint

    d = _doc(spark, sf_dir)
    return (
        d.select(fingerprint(F.col("text")).alias("fp"), F.col("doc_id").cast("long").alias("doc_id"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def _q_agg_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.avg("l_quantity").alias("avg_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("decimal(28,2)").alias("sum_price"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def _q_verdict_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 verdict fold on SQL-computable per-doc scores: criteria in order
    (length required, density required, lang recommended) with required
    short-circuit (reference criteria.py:316-325)."""
    from document_quality_assessment_ocr_spark.functions.text import text_density

    d = _doc(spark, sf_dir)
    dens = text_density(F.col("text"))
    c0_fail = F.col("n_chars") < F.lit(50)
    c1_fail = ~((dens >= F.lit(1.0)) & (dens <= F.lit(80.0)))
    c2_fail = F.col("lang") != F.lit("en")  # recommended tier
    accepted = ~c0_fail & ~c1_fail
    reasons = F.when(c0_fail, F.array(F.lit("too short"))).otherwise(
        F.when(
            c1_fail,
            F.array(F.lit("density out of range")),
        ).otherwise(
            F.when(c2_fail, F.array(F.lit("non-english"))).otherwise(
                F.array().cast("array<string>")
            )
        )
    )
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        accepted.alias("accepted"),
        F.array_join(reasons, "|").alias("reasons"),
    )


def _q_dedup_last_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("event_id").cast("long").alias("last_event_id"),
            F.col("event_type").alias("last_type"),
        )
    )


def _q_reassembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 ordered reassembly, exploded form: rank of each event within its
    user stream (span order = offset rank analog)."""
    from pyspark.sql.window import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return ev.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        (F.row_number().over(w) - 1).alias("ord"),
    )


def _q_metrics_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 run-metrics rollup analog: counts per rejection reason."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(F.col("event_type").alias("reason"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("reason")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_text_density": _q_text_density,
        "q02_token_count": _q_token_count,
        "q03_fingerprint_dedup": _q_fingerprint_dedup,
        "q04_agg_modes": _q_agg_modes,
        "q05_verdict_fold": _q_verdict_fold,
        "q06_dedup_last_wins": _q_dedup_last_wins,
        "q07_reassembly": _q_reassembly,
        "q08_metrics_rollup": _q_metrics_rollup,
    }


def oracle_sql() -> dict[str, str]:
    ink = f"LENGTH(REGEXP_REPLACE(COALESCE(text,''), '{WS}', '', 'g'))"
    dens = f"(100.0 * {ink} / GREATEST(LENGTH(COALESCE(text,'')), 1))"
    return {
        "q01_text_density": f"""
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   {dens} AS density,
                   ({dens} >= 1.0 AND {dens} <= 80.0) AS keep
            FROM documents
        """,
        "q02_token_count": f"""
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(COALESCE(text,'')), '{WS}+'),
                                        x -> x <> '')) AS BIGINT) AS n_tokens
            FROM documents
        """,
        "q03_fingerprint_dedup": f"""
            SELECT MD5(TRIM(REGEXP_REPLACE(LOWER(COALESCE(text,'')), '{WS}+', ' ', 'g'))) AS fp,
                   MIN(CAST(doc_id AS BIGINT)) AS keep_doc_id,
                   COUNT(*) AS n_dups
            FROM documents GROUP BY 1
        """,
        "q04_agg_modes": """
            SELECT l_returnflag, l_linestatus,
                   MIN(l_quantity) AS min_qty,
                   MAX(l_quantity) AS max_qty,
                   AVG(l_quantity) AS avg_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS sum_price,
                   COUNT(*) AS n_rows
            FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "q05_verdict_fold": f"""
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   (NOT (n_chars < 50) AND NOT (NOT ({dens} >= 1.0 AND {dens} <= 80.0))) AS accepted,
                   CASE WHEN n_chars < 50 THEN 'too short'
                        WHEN NOT ({dens} >= 1.0 AND {dens} <= 80.0) THEN 'density out of range'
                        WHEN lang <> 'en' THEN 'non-english'
                        ELSE '' END AS reasons
            FROM documents
        """,
        "q06_dedup_last_wins": """
            SELECT CAST(user_id AS BIGINT) AS user_id,
                   CAST(event_id AS BIGINT) AS last_event_id,
                   event_type AS last_type
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                               ORDER BY ts DESC, event_id DESC) AS rn
                  FROM events) WHERE rn = 1
        """,
        "q07_reassembly": """
            SELECT CAST(user_id AS BIGINT) AS user_id,
                   CAST(event_id AS BIGINT) AS event_id,
                   CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                           ORDER BY ts ASC, event_id ASC) - 1 AS INT) AS ord
            FROM events
        """,
        "q08_metrics_rollup": """
            SELECT event_type AS reason, COUNT(*) AS n
            FROM events GROUP BY 1 ORDER BY 1
        """,
    }
