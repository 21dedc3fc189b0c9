"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003,
"Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
algorithm) and the fingerprint-bucketed overlap-pair detector on top.

Winnowing guarantees: any shared token run of at least ``k + w - 1``
tokens between two documents produces at least one SHARED selected
fingerprint (the local-min selection is position-independent), while the
selected density is ~``2/(w+1)`` of all k-grams — a bounded-size sketch
with a recall guarantee, which is what q15's global-min "winnowing lite"
and fixed-stride chunk hashing both lack (insertions shift every
downstream fixed window; winnowing re-synchronizes immediately).

Spark shape:

- fingerprint selection is ARRAY-LOCAL (one projection: tokens → k-gram
  md5s → per-window ``array_min`` over a length-``w`` slice → distinct) —
  zero shuffle, O(w) per position with w small (default 4).
- overlap pairs explode the selected fingerprints and self-join ON the
  fingerprint value — bucketed by construction, never all-pairs, the same
  discipline as LSH bands. Boilerplate fingerprints shared by more than
  ``max_df`` documents are dropped BEFORE the self-join (the classic
  posting-list cap): a fingerprint in d docs emits d·(d−1)/2 pairs, so one
  viral footer would otherwise dominate the join; dropping it costs only
  matches that other, rarer fingerprints still witness.

Cross-engine: md5 over space-joined token k-grams (JVM intrinsic, the
measured-fastest window-key form — see BENCH.md round 3 on the rejected
rolling alternative); lexicographic min over hex strings is identical in
Spark and DuckDB. The oracle twin (`__spark_entry__._winnow_sql`) mirrors
the exact slice arithmetic with LIST_TRANSFORM/LIST_MIN.

Reference parity note: the reference engine has no fingerprinting stage;
this extends the dedup family (SURVEY.md §2 LLM-pipeline additions)
alongside q15's stride sketch and q73's ExactSubstr.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import WS_CLASS


def _token_array(text):
    return F.filter(
        F.split(F.trim(F.lower(F.coalesce(text, F.lit("")))), WS_CLASS + "+"),
        lambda x: x != F.lit(""),
    )


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Exploded selected-fingerprint set: one row per distinct winnowed
    fingerprint per document — ``(id_col, fp)``.

    ``k`` = token-gram length, ``w`` = winnow window (guarantee threshold
    ``t = k + w - 1`` tokens). Documents with fewer than ``k + w - 1``
    tokens contribute the min over whatever grams they have (standard
    short-doc degeneration: < k tokens → no grams → no rows).
    """
    tk = _token_array(F.col(text_col))
    n_grams = F.greatest(F.size(tk) - F.lit(int(k) - 1), F.lit(0))
    grams = F.when(n_grams <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: F.md5(F.array_join(F.slice(tk, i, int(k)), " ")),
        )
    )
    n_wins = F.greatest(F.size(F.col("_g")) - F.lit(int(w) - 1), F.lit(1))
    sel = F.when(F.size(F.col("_g")) == 0, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n_wins),
                lambda j: F.array_min(F.slice(F.col("_g"), j, int(w))),
            )
        )
    )
    return (
        docs.select(F.col(id_col), grams.alias("_g"))
        .select(F.col(id_col), F.explode(sel).alias("fp"))
    )


def winnow_overlap_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 64,
) -> DataFrame:
    """Document pairs witnessed by ≥ ``min_shared`` shared winnowed
    fingerprints — ``(doc_a, doc_b, n_shared)`` with ``doc_a < doc_b``.

    Fingerprints in more than ``max_df`` documents are dropped before the
    self-join (posting cap; see module docstring). The join is
    fingerprint-bucketed: cost is Σ df·(df−1)/2 over KEPT fingerprints,
    bounded by ``max_df``·|postings| — never corpus-quadratic.
    """
    fps = winnow_fingerprints(docs, id_col, text_col, k, w)
    kept = (
        fps.groupBy("fp")
        .agg(F.collect_list(id_col).alias("ids"), F.count(F.lit(1)).alias("df"))
        .where((F.col("df") >= 2) & (F.col("df") <= int(max_df)))
    )
    # df ≤ max_df bounds the per-fingerprint pair fan-out, so the pair
    # explosion is array-local over a ≤max_df list — no skewed join.
    pairs = kept.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.array_sort("ids"),
                    lambda a, i: F.transform(
                        F.slice(
                            F.array_sort("ids"), i + 2, F.size("ids")
                        ),
                        lambda b: F.struct(a.alias("doc_a"), b.alias("doc_b")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b")
    return (
        pairs.groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= int(min_shared))
    )
