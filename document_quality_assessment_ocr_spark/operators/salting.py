"""Mega-document skew mitigation (north_rule; SURVEY.md §7.4-4).

A document's ``spans`` array is the unit of explode: a 10⁶-span document
otherwise lands on one task for the explode→gating→partial-agg stage.
:func:`split_oversized_docs` pre-splits oversized arrays into fixed-size
chunks across multiple rows; the extraction plan's per-document aggregation
treats the pieces as ordinary partial-aggregation input (n_spans and every
other doc metric are aggregates, not group keys), so results are identical —
verified by tests/test_parity_spark.py::test_split_mega_docs_identical.

Constraints (asserted in run_extraction usage):
  * requires ``assume_unique_doc_ids=True`` (dedup-by-max_by would pick one
    chunk); split AFTER any dedup.
  * incompatible with ``max_media_spans`` (the page budget needs the whole
    array in one row to know which media spans lead).

Use :func:`..plans.metrics.spans_length_histogram` to decide the threshold:
split when the top log₂ bucket rivals a task's row budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the SKEWED side gets a random-but-deterministic
    salt (``xxhash64`` of its whole row, mod ``n_salts``), the other side is
    replicated ``n_salts``× via an exploded literal range, and the join key
    becomes ``(key, salt)`` — a hot key's rows spread across ``n_salts``
    reducers instead of one straggler task.

    Results are identical to ``skewed.join(other, key, how)`` for inner and
    left joins (replication only multiplies MATCH OPPORTUNITIES, each
    skewed row still matches each other-side row exactly once since the
    other side carries every salt exactly once).

    Use when AQE's skew-join split can't help: e.g. the skew is in the
    JOIN output (one key × many matches), or the runtime stats arrive too
    late because the hot partition is produced by an upstream stage that
    must first finish. For broadcast-able ``other`` sides, prefer
    ``F.broadcast`` — salting is for two big tables with a hot key."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt = F.pmod(F.xxhash64(F.struct(*skewed.columns)), F.lit(n_salts)).cast("int")
    s = skewed.withColumn("_salt", salt)
    o = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    return s.join(o, [key, "_salt"], how).drop("_salt")


def split_oversized_docs(spans_df: DataFrame, max_spans_per_row: int = 10_000) -> DataFrame:
    """Rows whose spans array exceeds ``max_spans_per_row`` become ⌈n/max⌉
    rows with chunked arrays; small rows pass through untouched (cheap
    narrow transform, no shuffle)."""
    n = F.coalesce(F.size("spans"), F.lit(0))
    n_chunks = F.greatest(F.ceil(n / F.lit(max_spans_per_row)).cast("int"), F.lit(1))
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(F.col("spans"), i * max_spans_per_row + 1, max_spans_per_row),
    )
    other = [c for c in spans_df.columns if c != "spans"]
    return spans_df.select(*other, F.explode(chunks).alias("spans"))
