"""Bucketed span tables: shuffle-free extraction (SURVEY §4.2 / SCALE.md §2).

At production scale the spans table lives in Iceberg with a
``bucket(doc_id, N)`` partition transform; the Spark-managed-table analog is
``bucketBy(N, "doc_id")``. A bucketed scan reports HashPartitioning(doc_id),
which the extraction plan's per-document aggregation accepts directly —
the LAST exchange disappears and the whole pipeline is scan → explode →
broadcast-join → aggregate with **zero** all-to-all movement
(tests/test_bucketed.py asserts the plan has no hashpartitioning Exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed_spans(
    df: DataFrame, table: str, n_buckets: int = 32, sort_by: str | None = None
) -> None:
    """Persist a spans DataFrame as a doc_id-bucketed managed table."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a previous session may have left the managed location behind without
    # catalog metadata — clear it or saveAsTable refuses
    import shutil

    loc = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").removeprefix("file:")
    shutil.rmtree(f"{loc}/{table}", ignore_errors=True)
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, "doc_id")
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)


def read_bucketed_spans(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
