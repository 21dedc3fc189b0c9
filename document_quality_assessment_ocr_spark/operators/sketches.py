"""Distinct-count sketch (HyperLogLog) with engine-portable determinism.

Spark ships ``approx_count_distinct`` (HLL++), but its register hashing is
JVM-private — no external oracle can reproduce it. This module implements
the textbook HLL (Flajolet et al. 2007) from **md5-derived registers**, so
the DuckDB oracle computes the *identical* sketch bit-for-bit, and the
driver's value-hash gate applies to a probabilistic operator:

* register index = first two md5 hex nibbles (m = 256, p = 8),
* rho = 1 + leading-zero count of the next 32 hash bits (0 → 33),
* registers merge with ``max`` — a classic algebraic aggregate, so the
  100 TB path is two hash aggregations with map-side partial combine:
  ``groupBy(key, register).max(rho)`` then ``groupBy(key)`` fold. The
  shuffle carries ≤ m rows per key regardless of input size — this is why
  sketches exist at scale.
* the harmonic sum Σ 2^(−max_rho) is a sum of powers of two spanning
  2^0 … 2^−33 < 53 bits of precision, so IEEE-754 addition is **exact in
  any order** — engine and oracle agree on the estimate to the last bit
  without any float-ordering ceremony.

``raw_estimate`` is the uncorrected α·m²/Σ form; the small-range
(linear-counting) correction needs ``ln``, whose last-bit rounding differs
between libm implementations, so it is left to the caller as a driver-side
scalar — ``n_zero_registers`` (its only input besides m) is emitted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

M = 256  # registers (p = 8)
ALPHA_M = 0.7213 / (1.0 + 1.079 / M)  # Flajolet et al. 2007, fig. 3


def hll_register_rho(item: Column) -> tuple[Column, Column]:
    """(register index, rho) for one item — md5-based, see module doc."""
    h = F.md5(item.cast("string"))
    reg = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    v = F.conv(F.substring(h, 3, 8), 16, 10).cast("long")
    # leading zeros of the 32-bit word: bin() renders without leading
    # zeros, so lzc = 32 − len(bin(v)); ltrim guards padded renderings
    rho = F.when(v == 0, F.lit(33)).otherwise(
        F.lit(33) - F.length(F.ltrim(F.bin(v), F.lit("0")))
    )
    return reg, rho.cast("int")


def hll_distinct(
    df: DataFrame, key_col: str, item_col: str, with_exact: bool = False
) -> DataFrame:
    """Per-key HLL distinct-count estimate of ``item_col``.

    Output: key, n_hit_registers, n_zero_registers, harmonic_sum,
    raw_estimate — and, with ``with_exact=True`` (audit mode, used by the
    oracle-gated query so sketch accuracy is itself checked), the exact
    distinct count. Audit mode keeps per-register item sets in the
    aggregation state — the exact thing the sketch exists to avoid — so it
    is opt-in and for validation scale only; the default plan's state is a
    fixed 256 ints per key."""
    reg, rho = hll_register_rho(F.col(item_col))
    base = df.select(
        F.col(key_col), reg.alias("reg"), rho.alias("rho"), F.col(item_col).alias("item")
    )
    if with_exact:
        per_reg = base.groupBy(key_col, "reg").agg(
            F.max("rho").alias("max_rho"), F.size(F.collect_set("item")).alias("n_items")
        )
        extra = [F.sum("n_items").cast("long").alias("exact_distinct")]
    else:
        per_reg = base.groupBy(key_col, "reg").agg(F.max("rho").alias("max_rho"))
        extra = []
    folded = per_reg.groupBy(key_col).agg(
        F.count("reg").alias("n_hit"),
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("hit_sum"),
        *extra,
    )
    n_zero = (F.lit(M) - F.col("n_hit")).cast("int")
    harmonic = F.col("hit_sum") + n_zero.cast("double")
    out = [
        F.col(key_col),
        F.col("n_hit").cast("int").alias("n_hit_registers"),
        n_zero.alias("n_zero_registers"),
        harmonic.alias("harmonic_sum"),
        (F.lit(ALPHA_M * M * M) / harmonic).alias("raw_estimate"),
    ]
    if with_exact:
        out.append(F.col("exact_distinct"))
    return folded.select(*out)


def histogram_bin(v, lo: int, hi: int, n_bins: int):
    """Clamped fixed-grid bin index of a value column — the SHARED bin
    arithmetic of :func:`histogram_quantiles` and the streaming histogram
    maintainer (``streaming/sketches.stream_histogram``): both sides must
    bin identically or their merge contract breaks. Integer division via
    floor over exact small-int float division (|operands| ≪ 2^53 so the
    double quotient floors exactly; Column has no native ``//``)."""
    v = v.cast("long")
    return F.least(
        F.greatest(
            F.floor((v - F.lit(lo)) * n_bins / F.lit(hi - lo)).cast("long"),
            F.lit(0),
        ),
        F.lit(n_bins - 1),
    )


def histogram_quantiles(
    df: DataFrame,
    key_col: str,
    value_col: str,
    lo: int,
    hi: int,
    n_bins: int,
    percents: list[int],
) -> DataFrame:
    """Mergeable fixed-grid histogram quantile sketch (per-key percentiles).

    Spark's ``percentile_approx`` (KLL/GK-style) has JVM-private internals
    no external oracle can reproduce; this sketch is the engine-portable
    counterpart for monitoring score/length distributions at corpus scale
    (the checkpoint manifests' blur/skew/noise distributions use the same
    shape). Everything is INTEGER arithmetic — bin index by integer
    multiply/divide, the quantile threshold via ``100·cum ≥ n·p`` instead
    of ``ceil`` — so the estimate is bit-identical across engines.

    Estimate: the lower/upper edge of the first bin where the cumulative
    count reaches ``ceil(n·p/100)`` — i.e. a true quantile with error
    bounded by one grid cell. ``(hi − lo)`` should divide by ``n_bins`` to
    keep the emitted edges integral.

    Scale shape (100 TB): one hash aggregate collapses the corpus to
    ≤ ``n_bins`` rows per key (count is algebraic — map-side combine does
    most of the work), then a second aggregate folds those ≤ ``n_bins``
    rows with ``sort_array`` + ``aggregate`` — JVM higher-order functions
    over a bounded array, no window, no second full shuffle of data rows.
    Histograms merge by adding counts, so partial sketches from separate
    runs/partitions combine losslessly (the checkpoint-resume property).
    """
    width = (hi - lo) // n_bins
    bin_idx = histogram_bin(F.col(value_col), lo, hi, n_bins)
    hist = (
        df.select(F.col(key_col), bin_idx.alias("bin"))
        .groupBy(key_col, "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    folded = hist.groupBy(key_col).agg(
        F.sum("c").alias("n"),
        F.sort_array(F.collect_list(F.struct("bin", "c"))).alias("bins"),
    )
    qs = F.explode(F.array(*[F.lit(int(p)) for p in percents])).alias("p")
    with_p = folded.select(key_col, "n", "bins", qs)
    # first bin whose cumulative count reaches ceil(n·p/100):
    # fold (cum, found) over the sorted bins; integer comparison only
    est = F.aggregate(
        F.col("bins"),
        F.struct(F.lit(0).cast("long").alias("cum"), F.lit(-1).cast("long").alias("bin")),
        lambda acc, x: F.struct(
            (acc["cum"] + x["c"]).alias("cum"),
            F.when(acc["bin"] >= 0, acc["bin"])
            .otherwise(
                F.when(
                    (acc["cum"] + x["c"]) * 100 >= F.col("n") * F.col("p"),
                    x["bin"].cast("long"),
                ).otherwise(F.lit(-1).cast("long"))
            )
            .alias("bin"),
        ),
    )["bin"]
    return with_p.select(
        key_col,
        F.col("p"),
        F.col("n"),
        est.alias("est_bin"),
        (F.lit(lo) + est * width).alias("est_lo"),
        (F.lit(lo) + (est + 1) * width).alias("est_hi"),
    )


def count_min_estimate(
    df: DataFrame,
    item_col: str,
    probes: list[str],
    width: int = 256,
    depth: int = 4,
    with_exact: bool = False,
) -> DataFrame:
    """Count–Min sketch (Cormode & Muthukrishnan 2005) frequency estimates
    for ``probes`` — engine-portable like the HLL/Bloom siblings: cell
    positions are md5 hex slices (``depth ≤ 4``), the sketch is pure
    integer COUNTs, and the estimate is an integer MIN, so the DuckDB twin
    is bit-identical and the driver's value-hash gate covers the sketch.

    Guarantee: ``est ≥ exact`` always (hash collisions only ever ADD);
    ``est ≤ exact + εN`` w.h.p. for ε = e/width. ``with_exact=True`` (audit
    mode for the oracle-gated query) carries the true count alongside so
    sketch accuracy is itself driver-checked.

    Scale shape (100 TB): the sketch build is ONE hash aggregate whose
    result is ≤ ``depth·width`` rows regardless of corpus size (count is
    algebraic — map-side combine does the heavy lifting); probing joins the
    broadcast sketch to a literal probe list. Daily/partition sketches
    merge by cell-wise addition — the checkpoint-resume property shared by
    all sketches in this module.
    """
    if not 1 <= depth <= 4:
        raise ValueError("depth must be in 1..4 (md5 yields four 32-bit slices)")
    spark = df.sparkSession
    item = F.col(item_col).cast("string")
    h = F.md5(item)
    cells = df.select(
        F.posexplode(
            F.array(
                *[
                    F.pmod(
                        F.conv(F.substring(h, 1 + 8 * j, 8), 16, 10).cast("long"),
                        F.lit(width),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("j", "pos")
    )
    cms = cells.groupBy("j", "pos").agg(F.count(F.lit(1)).alias("c"))
    probe_df = spark.createDataFrame([(p,) for p in probes], "term string")
    ph = F.md5(F.col("term"))
    ppos = probe_df.select(
        "term",
        F.posexplode(
            F.array(
                *[
                    F.pmod(
                        F.conv(F.substring(ph, 1 + 8 * j, 8), 16, 10).cast("long"),
                        F.lit(width),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("j", "pos"),
    )
    est = (
        ppos.join(F.broadcast(cms), ["j", "pos"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("est"))
    )
    if not with_exact:
        return est
    exact = (
        df.select(item.alias("term"))
        .where(F.col("term").isin(probes))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("exact"))
    )
    return est.join(exact, "term", "left").select(
        "term", "est", F.coalesce("exact", F.lit(0)).alias("exact")
    )


def heavy_hitters_verified(
    df: DataFrame,
    item_col: str,
    threshold: int,
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Heavy hitters by CMS-propose / exact-verify (the Misra-Gries-era
    two-pass recipe in sketch form): pass 1 builds the Count-Min sketch
    (ONE hash aggregate, ≤ depth·width rows); the sketch then rides back
    as a LITERAL lookup map so pass 2 filters occurrences MAP-SIDE to
    those whose estimate clears ``threshold`` — no false negatives, since
    CMS only over-counts — and the exact verify aggregate shuffles ONLY
    heavy-candidate occurrences (map-side combine shrinks them to one row
    per candidate per task).

    This is the pattern that makes exact heavy-hitter counting viable
    when the full item cardinality can't be aggregated: the shuffle is
    bounded by candidates, not by distinct items. The driver collect is
    sketch-bounded (≤ depth·width cells, independent of corpus size) —
    the same justification as the k-means sample panels.

    Output: (term, est, exact, is_true_heavy) for every term whose
    ESTIMATE clears threshold; ``is_true_heavy`` is the exact verdict,
    and ``est >= exact`` always.
    """
    if not 1 <= depth <= 4:
        raise ValueError("depth must be in 1..4 (md5 yields four 32-bit slices)")
    term = F.col(item_col).cast("string")
    toks = df.select(term.alias("term"))

    def _cells(col: Column) -> list[Column]:
        h = F.md5(col)
        return [
            F.pmod(
                F.conv(F.substring(h, 1 + 8 * j, 8), 16, 10).cast("long"),
                F.lit(width),
            )
            for j in range(depth)
        ]

    cells = toks.select(F.posexplode(F.array(*_cells(F.col("term")))).alias("j", "pos"))
    cms = cells.groupBy("j", "pos").agg(F.count(F.lit(1)).alias("c"))
    # sketch-bounded collect: ≤ depth·width rows no matter the corpus
    lut = {
        int(r["j"]) * width + int(r["pos"]): int(r["c"]) for r in cms.collect()
    }
    mexpr = F.create_map(
        *[F.lit(x) for kv in sorted(lut.items()) for x in kv]
    )

    def _est(col: Column) -> Column:
        ests = [
            F.coalesce(
                F.element_at(mexpr, (F.lit(j * width) + c).cast("int")),
                F.lit(0),
            )
            for j, c in enumerate(_cells(col))
        ]
        # F.least requires >= 2 columns; depth=1 is the single-cell estimate
        return (ests[0] if len(ests) == 1 else F.least(*ests)).cast("long")

    heavy_occ = toks.where(_est(F.col("term")) >= F.lit(int(threshold)))
    return (
        heavy_occ.groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("exact"))
        .select(
            "term",
            _est(F.col("term")).alias("est"),
            "exact",
            (F.col("exact") >= F.lit(int(threshold))).alias("is_true_heavy"),
        )
    )


def hll_overlap(
    df: DataFrame,
    side_col: str,
    item_col: str,
    a_label: str,
    b_label: str,
    with_exact: bool = False,
) -> DataFrame:
    """Corpus-overlap estimate between two item sets from ONE pass of HLL
    registers — inclusion–exclusion over the mergeable sketch:
    ``|A∩B| ≈ est(A) + est(B) − est(A∪B)``, where the union sketch is the
    register-wise MAX of the two sides (the defining algebraic property
    of HLL). The corpus-vs-corpus contamination / shared-vocabulary audit
    ("how much of shard B's vocabulary is already in corpus A?") at a
    cost of 2·m register rows, however large either side is.

    Same md5 register/rho arithmetic as :func:`hll_distinct` (m=256,
    engine-portable, exact-in-any-order harmonic sums — see module doc),
    so the DuckDB oracle reproduces every derived double bit-for-bit.

    ``with_exact`` (audit mode, validation scale only) adds the true
    distinct counts and true intersection via a per-item two-flag
    aggregate — the corpus-scale pass the sketch exists to avoid.

    Output: one row — n_hit_a/b/union (int), harmonic_a/b/union,
    est_a/b/union, overlap_est (double); audit adds exact_a, exact_b,
    exact_overlap (bigint).
    """
    reg, rho = hll_register_rho(F.col(item_col))
    side = F.col(side_col)
    base = df.where(side.isin(a_label, b_label)).select(
        side.alias("_s"), reg.alias("reg"), rho.alias("rho"),
        F.col(item_col).alias("item"),
    )
    per_reg = base.groupBy("reg").agg(
        F.max(F.when(F.col("_s") == a_label, F.col("rho"))).alias("ra"),
        F.max(F.when(F.col("_s") == b_label, F.col("rho"))).alias("rb"),
    )
    hs = lambda c: F.sum(F.when(c.isNotNull(), F.pow(F.lit(2.0), -c)))
    nh = lambda c: F.count(c)
    folded = per_reg.agg(
        nh(F.col("ra")).cast("int").alias("n_hit_a"),
        nh(F.col("rb")).cast("int").alias("n_hit_b"),
        nh(F.greatest("ra", "rb")).cast("int").alias("n_hit_union"),
        hs(F.col("ra")).alias("ha"),
        hs(F.col("rb")).alias("hb"),
        hs(F.greatest("ra", "rb")).alias("hu"),
    )
    est = lambda h, n: F.lit(ALPHA_M * M * M) / (
        F.coalesce(h, F.lit(0.0)) + (F.lit(M) - n).cast("double")
    )
    out = folded.select(
        "n_hit_a",
        "n_hit_b",
        "n_hit_union",
        (F.coalesce("ha", F.lit(0.0))
         + (F.lit(M) - F.col("n_hit_a")).cast("double")).alias("harmonic_a"),
        (F.coalesce("hb", F.lit(0.0))
         + (F.lit(M) - F.col("n_hit_b")).cast("double")).alias("harmonic_b"),
        (F.coalesce("hu", F.lit(0.0))
         + (F.lit(M) - F.col("n_hit_union")).cast("double")).alias(
            "harmonic_union"),
        est(F.col("ha"), F.col("n_hit_a")).alias("est_a"),
        est(F.col("hb"), F.col("n_hit_b")).alias("est_b"),
        est(F.col("hu"), F.col("n_hit_union")).alias("est_union"),
    ).withColumn(
        "overlap_est",
        F.col("est_a") + F.col("est_b") - F.col("est_union"),
    )
    if not with_exact:
        return out
    flags = df.where(side.isin(a_label, b_label)).groupBy(
        F.col(item_col).alias("item")
    ).agg(
        F.max(F.when(side == a_label, 1).otherwise(0)).alias("ia"),
        F.max(F.when(side == b_label, 1).otherwise(0)).alias("ib"),
    )
    exact = flags.agg(
        F.sum("ia").cast("long").alias("exact_a"),
        F.sum("ib").cast("long").alias("exact_b"),
        F.sum(F.col("ia") * F.col("ib")).cast("long").alias("exact_overlap"),
    )
    return out.crossJoin(exact)
