"""Bloom-filter pruning — engine-portable, bit-exact, mergeable.

Spark's native ``bloom_filter_agg`` / ``might_contain`` (and the runtime
row-group Bloom pushdown) hash with JVM-private xxhash seeds no external
oracle can reproduce, so this module builds the filter from **md5-derived
bit positions**: the DuckDB twin computes the identical bitmap and the
identical membership verdicts, letting the driver's value-hash gate cover a
probabilistic operator end-to-end (same design rationale as
``sketches.hll_distinct``).

Layout: ``m = 32·n_words`` bits stored as ``n_words`` BIGINT words of 32
used bits each — a set bit's mask is ``1 << (pos % 32) < 2^32``, so the
shift never touches the sign bit on either engine (DuckDB's ``<<`` on
BIGINT is checked arithmetic; a 2^63 mask would raise).

Position ``i`` of an item (``i < k ≤ 4``) is 8 independent md5 hex chars:
``conv(substr(md5(item), 1+8i, 8), 16, 10) % m``.

Scale shape (100 TB):

* **build** is one ``bit_or`` hash aggregate — algebraic, so map-side
  partial combine reduces every partition to ≤ ``n_words`` rows before the
  (single, tiny) shuffle. Filters built on different days / partitions
  merge by OR-ing words — the same mergeability as the HLL registers.
* **probe** broadcasts the ≤ ``n_words``-row bitmap; the corpus scan probes
  it with a broadcast hash join and never shuffles. This is the classic
  pre-join pruning step for decontamination: the Bloom pass drops the
  overwhelming non-candidate mass cheaply, and only survivors pay for the
  exact shingle join.

Reference repo has no analog — training-data addition per the task brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(item: Column, n_words: int, k: int) -> list[Column]:
    """k bit positions in [0, 32·n_words) from disjoint md5 hex slices."""
    if not 1 <= k <= 4:
        raise ValueError("k must be in 1..4 (md5 yields four 32-bit slices)")
    m = 32 * n_words
    h = F.md5(item.cast("string"))
    return [
        F.pmod(
            F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("long"), F.lit(m)
        )
        for i in range(k)
    ]


#: word index / 32-bit mask of an exploded ``pos`` column (shiftleft's shift
#: operand must be an expression, not a python int, hence F.expr)
_WORD = "cast(floor(pos / 32) as int)"
_MASK = "shiftleft(cast(1 as bigint), cast(pmod(pos, 32) as int))"


def bloom_build(
    items: DataFrame, item_col: str, n_words: int = 64, k: int = 3
) -> DataFrame:
    """Bloom bitmap of ``items[item_col]`` → (word_idx:int, bits:long) rows,
    only words with at least one set bit present (absent ⇒ 0)."""
    pos = _positions(F.col(item_col), n_words, k)
    return (
        items.select(F.explode(F.array(*pos)).alias("pos"))
        .select(F.expr(_WORD).alias("word_idx"), F.expr(_MASK).alias("mask"))
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(
    probes: DataFrame, item_col: str, bloom: DataFrame, n_words: int = 64, k: int = 3
) -> DataFrame:
    """Adds ``bloom_maybe`` to ``probes``: true iff every one of the item's
    ``k`` bits is set (definite no ⇔ false; true may be a false positive).

    The bitmap is broadcast; the probe side is never shuffled — the one
    aggregation groups by the probe row's own key set, which retains the
    upstream partitioning of distinct (id, item) rows."""
    pos = _positions(F.col(item_col), n_words, k)
    others = [c for c in probes.columns]
    exploded = probes.select(
        *others, F.explode(F.array(*pos)).alias("pos")
    ).select(*others, F.expr(_WORD).alias("word_idx"), F.expr(_MASK).alias("mask"))
    joined = exploded.join(F.broadcast(bloom), "word_idx", "left")
    hit = (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask")) != 0).cast("int")
    return (
        joined.groupBy(*others)
        .agg(F.sum(hit).alias("_nhit"))
        .withColumn("bloom_maybe", F.col("_nhit") == k)
        .drop("_nhit")
    )


def bloom_prefilter_contamination(
    train: DataFrame,
    eval_set: DataFrame,
    n: int = 5,
    n_words: int = 64,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Decontamination with Bloom pruning, instrumented: per training doc,
    the shingle count, how many shingles the Bloom filter lets through, and
    how many are exact matches — the gap is the measured false-positive
    cost the filter trades for never shuffling the corpus.

    Output: (doc_id, n_shingles, bloom_candidates, exact_matches)."""
    from .decontam import shingle_hashes

    train_sh = shingle_hashes(train, n, id_col, text_col)
    eval_sh = shingle_hashes(eval_set, n, id_col, text_col).select("shingle").distinct()
    bloom = bloom_build(eval_sh, "shingle", n_words, k)
    probed = bloom_probe(train_sh, "shingle", bloom, n_words, k)
    exact = probed.join(
        F.broadcast(eval_sh.withColumn("_hit", F.lit(1))), "shingle", "left"
    )
    return exact.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.col("bloom_maybe").cast("int")).alias("bloom_candidates"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("exact_matches"),
    )
