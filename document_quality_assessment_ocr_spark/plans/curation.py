"""Composite training-data curation plan over a documents table.

The canonical pre-training data flow, composed from this repo's operators:

    exact dedup (normalized-text fingerprint, keep min id)
      → density band (boilerplate strip)
      → quality threshold
      → language allowlist
      → MinHash-LSH near-dup demotion (keep the smallest id per LSH cluster)

Pure Column expressions + md5 hashing end-to-end → the whole composite has an
exact DuckDB oracle (q19). Shuffle profile: fingerprint groupBy, shingle
groupBy, LSH band self-join — each keyed and bounded; no cross join anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import fingerprint, text_density
from ..operators.dedup import minhash_lsh_pairs
from ..operators.textstats import lang_id, quality_score


def curate_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_density: float = 1.0,
    max_density: float = 80.0,
    min_quality: float = 0.5,
    languages: tuple[str, ...] = ("en",),
    lsh_hashes: int = 8,
    lsh_bands: int = 4,
) -> DataFrame:
    """documents → (doc_id, kept, drop_reason). Every doc appears once with
    its fate — auditable curation, not silent filtering."""
    d = docs.select(F.col(id_col), F.col(text_col))

    # 1. exact dedup: keep min id per fingerprint
    fp = d.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
    keepers = fp.groupBy("fp").agg(F.min(id_col).alias("keep_id"))
    d = (
        fp.join(keepers, "fp")
        .select(F.col(id_col), (F.col(id_col) == F.col("keep_id")).alias("is_first"))
        .join(d, id_col)
    )

    dens = text_density(F.col(text_col))
    qual = quality_score(F.col(text_col))
    lang = lang_id(F.col(text_col))
    lang_ok = lang.isin(list(languages))

    # 2. near-dup demotion: within each LSH candidate cluster keep min id
    pairs = minhash_lsh_pairs(
        docs.select(F.col(id_col), F.col(text_col)),
        id_col=id_col,
        text_col=text_col,
        n_hashes=lsh_hashes,
        bands=lsh_bands,
    )
    demoted = pairs.select(F.col("id_b").alias(id_col)).distinct().withColumn(
        "near_dup", F.lit(True)
    )
    d = d.join(demoted, id_col, "left").withColumn(
        "near_dup", F.coalesce(F.col("near_dup"), F.lit(False))
    )

    reason = (
        F.when(~F.col("is_first"), F.lit("exact_duplicate"))
        .when((dens < F.lit(min_density)) | (dens > F.lit(max_density)), F.lit("density"))
        .when(qual < F.lit(min_quality), F.lit("quality"))
        .when(~lang_ok, F.lit("language"))
        .when(F.col("near_dup"), F.lit("near_duplicate"))
        .otherwise(F.lit(""))
    )
    return d.select(
        F.col(id_col),
        (reason == F.lit("")).alias("kept"),
        reason.alias("drop_reason"),
    )
