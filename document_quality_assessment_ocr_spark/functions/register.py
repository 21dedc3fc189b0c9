"""SQL-surface registration: expose the engine's vectorized kernels and text
functions to ``spark.sql`` users (the reference has no pluggable UDF surface
— SURVEY §2.11; here it is a first-class extension point)."""

from __future__ import annotations

from pyspark.sql import SparkSession

from .udfs import estimate_dpi_udf, score_media


def register_sql_functions(spark: SparkSession) -> None:
    """After this, plain SQL can score media payloads:

        SELECT media_ref, score_media(png, media_ref) AS ms FROM payloads

    Text helpers (density/tokens/fingerprint) are pure Column expressions
    already available in SQL via their builtin building blocks; the pandas
    UDFs are the pieces SQL cannot express natively.
    """
    spark.udf.register("score_media", score_media)
    spark.udf.register("estimate_dpi", estimate_dpi_udf)
