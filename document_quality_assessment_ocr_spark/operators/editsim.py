"""Edit-distance verification of LSH near-duplicate candidates — the
BigCode/The-Stack-style fuzzy-dedup confirmation pass: MinHash bands
propose, Levenshtein disposes.

Candidates come from the banded-LSH self-join (dedup.minhash_lsh_pairs —
bucketed, never all-pairs); each surviving pair is verified with an exact
Levenshtein distance over a fixed text prefix. The prefix cap is the
scale contract: edit distance is O(len²) per pair, so verification cost
is bounded at ``prefix_chars²`` per candidate regardless of document
size — the standard trade (verify the head, not the body) for web-scale
fuzzy dedup where near-dups diverge early if they diverge at all.

Similarity is surfaced in integer milli-units —
``1000 - (1000·dist) DIV max(len_a, len_b)`` — so both engines agree
bit-for-bit (Spark ``levenshtein`` and DuckDB ``levenshtein`` compute the
same classic DP; the division is the non-negative integer DIV both
engines share).

Plan: candidate pairs (two Zipf-bounded band-bucket self-joins) → two
equi-joins to re-attach the text prefixes (AQE broadcasts the candidate
side when small; at scale both joins shuffle only id+prefix columns,
never full documents) → map-side Levenshtein. No window, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import minhash_lsh_pairs


def edit_verified_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    ngram: int = 5,
    shingle: str = "word",
    prefix_chars: int = 200,
    keep_sim_milli: int = 800,
) -> DataFrame:
    """LSH candidates re-scored by exact prefix Levenshtein.

    Output: (id_a, id_b, dist, sim_milli, is_dup); sim_milli is the
    integer milli-similarity over the longer prefix, is_dup its
    ``>= keep_sim_milli`` verdict.
    """
    cand = minhash_lsh_pairs(
        docs, id_col, text_col, n_hashes=n_hashes, bands=bands,
        ngram=ngram, shingle=shingle,
    )
    pref = docs.select(
        F.col(id_col),
        F.substring(F.coalesce(F.col(text_col), F.lit("")), 1, int(prefix_chars))
        .alias("_pref"),
    )
    joined = (
        cand.join(
            pref.select(F.col(id_col).alias("id_a"), F.col("_pref").alias("_pa")),
            "id_a",
        )
        .join(
            pref.select(F.col(id_col).alias("id_b"), F.col("_pref").alias("_pb")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.levenshtein("_pa", "_pb").cast("long").alias("dist"),
            F.greatest(F.length("_pa"), F.length("_pb"))
            .cast("long")
            .alias("_mx"),
        )
    )
    sim = F.expr("1000L - (1000L * dist) DIV GREATEST(_mx, 1L)")
    return joined.select(
        "id_a",
        "id_b",
        "dist",
        sim.cast("long").alias("sim_milli"),
        (sim >= F.lit(int(keep_sim_milli))).alias("is_dup"),
    )
