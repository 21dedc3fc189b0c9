"""Experiment (A/B) measurement over corpus or pipeline units.

A data-pipeline change (new dedup threshold, new quality gate, new
extractor version) ships behind a deterministic unit-level split; this
module turns (unit, variant, metric) rows into the per-variant report a
launch review reads: sample sizes, metric sums, exact means, and lift
against the control arm.

Cross-engine contract (the q67 mean / q194 kappa discipline): counts and
sums stay BIGINT end-to-end; each mean is ONE exact double division of
two BIGINTs; lift is computed in the SAME float operation order on both
engines (``mean / control_mean - 1.0``) so results hash-match — no
averaging of floats, no order-dependent accumulation.

At 100 TB: one hash aggregate on the variant key (map-side combine
collapses each partition to |variants| partials), then a broadcast of
the single control row — the report is |variants| rows regardless of
corpus size.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Cumulative Poisson(lambda=1) CDF thresholds in micro units (floor of
#: P(X <= k) * 1e6 for k = 0..7).  A Poisson-bootstrap replicate weight is
#: the count of thresholds <= the md5-uniform micro draw (capped at 8;
#: P(X >= 8) < 1.1e-5).  SHARED constant: the engine expression and the
#: DuckDB oracle SQL both interpolate these exact integers — never fork.
POISSON1_CDF_MICRO = (367879, 735758, 919698, 981011, 996340, 999405, 999916, 999989)


def ab_lift_report(
    units: DataFrame,
    variant_col: str = "variant",
    metric_col: str = "metric",
    control: Optional[str] = None,
) -> DataFrame:
    """Per-variant experiment report with lift vs the control arm.

    ``control`` names the baseline variant; when None the
    lexicographically smallest variant label is the control (stable,
    engine-independent). ``lift_vs_control`` = ``mean / control_mean −
    1.0`` — NULL when the control mean is exactly 0 (division would
    produce ±inf, which no launch review wants to read). ``mean`` is the
    exact double ``metric_sum / n`` (n ≥ 1 per group by construction).

    Output: (variant_col, n, metric_sum, mean, is_control,
    lift_vs_control) ordered by variant.
    """
    v = F.coalesce(F.col(variant_col).cast("string"), F.lit("")).alias("v")
    m = F.col(metric_col).cast("long")
    agg = units.select(v, m.alias("m")).groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("m").cast("long").alias("metric_sum"),
    )
    if control is None:
        ctrl = agg.orderBy("v").limit(1)
    else:
        ctrl = agg.where(F.col("v") == F.lit(control))
    ctrl = ctrl.select(
        F.col("v").alias("_cv"),
        F.col("n").alias("_cn"),
        F.col("metric_sum").alias("_cs"),
    )
    mean = F.col("metric_sum").cast("double") / F.col("n").cast("double")
    cmean = F.col("_cs").cast("double") / F.col("_cn").cast("double")
    return (
        agg.crossJoin(F.broadcast(ctrl))
        .select(
            F.col("v").alias(variant_col),
            "n",
            "metric_sum",
            mean.alias("mean"),
            (F.col("v") == F.col("_cv")).alias("is_control"),
            F.when(F.col("_cs") != 0, mean / cmean - F.lit(1.0)).alias(
                "lift_vs_control"
            ),
        )
        .orderBy(variant_col)
    )


def ks_drift(
    df: DataFrame,
    left_side: Column,
    value_col: str,
    bucket_width: int = 64,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic between the value
    distributions of two corpus sides, computed EXACTLY in integers.

    ``left_side`` is a boolean column splitting rows into the left /
    right samples; ``value_col`` must be a NON-NEGATIVE integer metric
    (lengths, token counts, integer quality scores — the fixed-point
    family contract).  Values collapse to ``value DIV bucket_width``
    buckets first, so the working relation is the bucket GRID (value
    domain / width), never the corpus: the ECDF cumsum window and the
    final max run over grid rows only — the q197/q202 grid-bounded
    family, NOT a global window over documents.

    Exactness: with per-bucket counts ``ca``/``cb`` and totals
    ``n_a``/``n_b``, the KS distance at bucket t is
    ``|cum_a(t)·n_b − cum_b(t)·n_a| / (n_a·n_b)`` — the numerator stays
    BIGINT, the argmax tie-breaks on the smallest bucket, and ``ks`` is
    ONE exact double division of two BIGINTs (the q194 kappa
    discipline), so both engines hash-match bit-for-bit.

    Output: ONE row (n_left, n_right, at_bucket, d_num, ks_micro, ks).

    At 100 TB: one hash aggregate on the bucket key (map-side combine
    collapses each partition to |buckets| partials); the window + max
    run over the bounded grid on a single reducer carrying only grid
    rows.  Requires n_left ≥ 1 and n_right ≥ 1 (returns the trivial 0
    statistic when either side is empty).
    """
    if bucket_width < 1:
        raise ValueError("bucket_width must be >= 1")
    b = F.expr(
        f"CAST(greatest(CAST({value_col} AS LONG), 0L) DIV {int(bucket_width)} "
        "AS LONG)"
    )
    grid = (
        df.select(left_side.alias("_l"), b.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("_l"), 1).otherwise(0)).cast("long").alias("ca"),
            F.sum(F.when(~F.col("_l"), 1).otherwise(0)).cast("long").alias("cb"),
        )
    )
    return ks_from_grid(grid)


def ks_from_grid(grid: DataFrame) -> DataFrame:
    """The grid→statistic stage of :func:`ks_drift`, SHARED with the
    streaming twin (``streaming/drift.read_ks``): per-bucket (ca, cb)
    counts are an ALGEBRAIC aggregate (they add across batches), so the
    same exact ECDF/argmax runs over a batch-built or an incrementally
    merged grid — stream == batch row-for-row."""
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = grid.select(
        "bucket",
        F.sum("ca").over(w).cast("long").alias("cum_a"),
        F.sum("cb").over(w).cast("long").alias("cum_b"),
    )
    tot = Window.partitionBy()
    scored = cum.select(
        "bucket",
        "cum_a",
        "cum_b",
        F.max("cum_a").over(tot).cast("long").alias("n_left"),
        F.max("cum_b").over(tot).cast("long").alias("n_right"),
    ).select(
        "bucket",
        "n_left",
        "n_right",
        F.abs(
            F.col("cum_a") * F.col("n_right") - F.col("cum_b") * F.col("n_left")
        )
        .cast("long")
        .alias("d_num"),
    )
    best = scored.groupBy("n_left", "n_right").agg(
        F.min(
            F.struct(
                (-F.col("d_num")).alias("neg"), F.col("bucket").alias("at_bucket")
            )
        ).alias("_w")
    )
    denom = F.greatest(F.col("n_left") * F.col("n_right"), F.lit(1)).cast("long")
    return best.select(
        "n_left",
        "n_right",
        F.col("_w.at_bucket").cast("long").alias("at_bucket"),
        (-F.col("_w.neg")).cast("long").alias("d_num"),
        F.expr("(1000000 * -(_w.neg)) DIV greatest(n_left * n_right, 1)")
        .cast("long")
        .alias("ks_micro"),
        ((-F.col("_w.neg")).cast("double") / denom.cast("double")).alias("ks"),
    )


def _poisson_weight(u_micro: Column) -> Column:
    """Poisson(1) bootstrap weight from an md5-uniform micro draw: the
    count of POISSON1_CDF_MICRO thresholds <= u (0..8).  Pure integer
    comparison chain — the DuckDB oracle interpolates the SAME
    thresholds."""
    w = F.lit(0)
    for t in POISSON1_CDF_MICRO:
        w = w + F.when(u_micro >= F.lit(int(t)), 1).otherwise(0)
    return w.cast("long")


def poisson_bootstrap_ci(
    df: DataFrame,
    group_col: str = "source",
    metric_col: str = "metric",
    id_col: str = "doc_id",
    n_reps: int = 32,
) -> DataFrame:
    """Poisson-bootstrap confidence interval for the per-group metric
    mean — THE resampling scheme that distributes (each row draws an
    independent Poisson(1) weight per replicate, so no global sample
    indices exist and one pass computes every replicate).

    Determinism: replicate r's weight for a row is
    ``poisson_weight(md5(id || '|boot' || r) mod 1e6)`` — the md5-uniform
    inverse-CDF trick with the shared POISSON1_CDF_MICRO thresholds, so
    results are replay-stable and byte-identical on both engines.
    ``metric_col`` must be a non-negative integer (the fixed-point
    contract): each replicate mean is ``(Σ w·x · 1e6) DIV Σw`` — all
    BIGINT, non-negative `DIV` == DuckDB `//`.

    The CI is rank-based and trimmed: replicate means are sorted per
    group (a bounded ``n_reps``-element array, collect_list over the
    group×replicate GRID, never documents) and the 2nd-smallest /
    2nd-largest survive as (boot_lo_micro, boot_hi_micro) — a ~94%
    interval at n_reps=32, NULL when fewer than 4 replicates produced a
    non-empty resample.

    Output per group: (group_col, n, point_micro, n_reps_valid,
    boot_lo_micro, boot_hi_micro) ordered by group.

    At 100 TB: the explode is ×n_reps on a two-column projection
    (group, metric) — map-side combine collapses each partition to
    |groups|·n_reps partials; everything after the first aggregate is
    grid-sized.  Precision bound: the ×1e6 micro scaling caps per-group
    weighted metric mass at ~9.2e12 in BIGINT; beyond that, drop to
    milli units or a DECIMAL(38) accumulator.
    """
    if n_reps < 4:
        raise ValueError("n_reps must be >= 4 (the trimmed CI needs 4 means)")
    g = F.coalesce(F.col(group_col).cast("string"), F.lit("")).alias("g")
    x = F.greatest(F.col(metric_col).cast("long"), F.lit(0)).alias("x")
    base = df.select(g, x, F.col(id_col).cast("string").alias("_id"))
    point = base.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("(1000000 * sum(x)) DIV count(1)").cast("long").alias("point_micro"),
    )
    rep = base.select(
        "g",
        "x",
        "_id",
        F.explode(F.sequence(F.lit(0), F.lit(int(n_reps) - 1))).alias("r"),
    )
    u = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("_id"), F.lit("|boot"), F.col("r").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long"),
        F.lit(1_000_000),
    )
    grid = (
        rep.select("g", "r", "x", _poisson_weight(u).alias("w"))
        .groupBy("g", "r")
        .agg(
            F.sum("w").cast("long").alias("wn"),
            F.sum(F.col("w") * F.col("x")).cast("long").alias("ws"),
        )
        .select(
            "g",
            F.when(
                F.col("wn") > 0, F.expr("(1000000 * ws) DIV wn").cast("long")
            ).alias("mean_micro"),
        )
    )
    ci = grid.groupBy("g").agg(
        F.sort_array(F.collect_list("mean_micro")).alias("ms")
    )
    m = F.size(F.col("ms"))
    return (
        point.join(ci, "g")
        .select(
            F.col("g").alias(group_col),
            "n",
            "point_micro",
            m.cast("long").alias("n_reps_valid"),
            F.when(m >= 4, F.element_at(F.col("ms"), 2)).cast("long").alias(
                "boot_lo_micro"
            ),
            F.when(m >= 4, F.expr("element_at(ms, size(ms) - 1)"))
            .cast("long")
            .alias("boot_hi_micro"),
        )
        .orderBy(group_col)
    )


def cuped_lift(
    units: DataFrame,
    variant_col: str = "variant",
    metric_col: str = "metric",
    covariate_col: str = "covariate",
    control: Optional[str] = None,
) -> DataFrame:
    """CUPED variance-reduced experiment report (Deng et al. 2013):
    adjust each arm's metric mean by the pre-experiment covariate before
    computing lift — ``adj_mean = ȳ − θ·(x̄ − x̄_pool)`` with the pooled
    OLS slope ``θ = (N·Σxy − Σx·Σy) / (N·Σx² − (Σx)²)``.

    Exactness: the sufficient statistics (per-arm n/Σy/Σx and pooled
    N/Σx/Σy/Σxy/Σx²) are BIGINTs; θ is ONE double division of two
    BIGINT determinants (0.0 when the covariate is constant — no
    adjustment), and every downstream double follows the fixed op order
    ``sy/n − θ·(sx/n − sxp/N)``. ``lift_adj`` = ``adj/adj_control − 1.0``,
    NULL when the control's adjusted mean is exactly 0.0 (both engines
    compute bit-identical doubles, so the guard agrees). Overflow:
    Σ(x·y) bounds the corpus at ~9.2e18 total covariate·metric mass —
    drop both to milli units past that (the q202/q203 cap class).

    Scale shape: ONE map-side-combined variant aggregate (|arms| rows) +
    ONE 1-row pooled aggregate broadcast over it; lift joins the 1-row
    control arm back broadcast — the corpus is scanned once, nothing but
    grids shuffle.

    Output: (variant_col, n, metric_sum, cov_sum, mean, theta, adj_mean,
    is_control, lift_adj) ordered by variant.
    """
    v = F.coalesce(F.col(variant_col).cast("string"), F.lit("")).alias("v")
    base = units.select(
        v,
        F.col(metric_col).cast("long").alias("y"),
        F.col(covariate_col).cast("long").alias("x"),
    )
    g = base.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("sy"),
        F.sum("x").cast("long").alias("sx"),
    )
    pool = base.agg(
        F.count(F.lit(1)).cast("long").alias("_nn"),
        F.sum("x").cast("long").alias("_sxp"),
        F.sum("y").cast("long").alias("_syp"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("_sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("_sxx"),
    )
    den = F.col("_nn") * F.col("_sxx") - F.col("_sxp") * F.col("_sxp")
    num = F.col("_nn") * F.col("_sxy") - F.col("_sxp") * F.col("_syp")
    theta = F.when(
        den != 0, num.cast("double") / den.cast("double")
    ).otherwise(F.lit(0.0))
    mean = F.col("sy").cast("double") / F.col("n").cast("double")
    xmean = F.col("sx").cast("double") / F.col("n").cast("double")
    xpool = F.col("_sxp").cast("double") / F.col("_nn").cast("double")
    r = g.crossJoin(F.broadcast(pool)).select(
        "v",
        "n",
        F.col("sy").alias("metric_sum"),
        F.col("sx").alias("cov_sum"),
        mean.alias("mean"),
        theta.alias("theta"),
        (mean - theta * (xmean - xpool)).alias("adj_mean"),
    )
    if control is None:
        ctrl = r.orderBy("v").limit(1)
    else:
        ctrl = r.where(F.col("v") == F.lit(control))
    ctrl = ctrl.select(
        F.col("v").alias("_cv"), F.col("adj_mean").alias("_cadj")
    )
    return (
        r.crossJoin(F.broadcast(ctrl))
        .select(
            F.col("v").alias(variant_col),
            "n",
            "metric_sum",
            "cov_sum",
            "mean",
            "theta",
            "adj_mean",
            (F.col("v") == F.col("_cv")).alias("is_control"),
            F.when(
                F.col("_cadj") != 0.0,
                F.col("adj_mean") / F.col("_cadj") - F.lit(1.0),
            ).alias("lift_adj"),
        )
        .orderBy(variant_col)
    )


def quantile_harmonize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    ref_group: str,
    bucket_width: int = 64,
) -> DataFrame:
    """Quantile (ECDF) harmonization of a per-document score across
    sources: map every source's score buckets onto a REFERENCE source's
    bucket grid so heterogeneous quality scores become comparable before
    mixing (the classic quantile-normalization step of multi-source
    corpus curation; see e.g. the CCNet per-shard perplexity buckets).

    For source bucket b with cumulative count ``cum`` out of ``tot``
    rows, the mapped bucket is the LARGEST reference bucket whose
    cumulative fraction is <= cum/tot — compared exactly by
    cross-multiplication (``ref_cum·tot <= cum·ref_tot``), so the whole
    operator is BIGINT-exact (no float ECDFs).  Sources with an ECDF
    everywhere below the reference's first bucket fall back to the
    reference's minimum bucket.  The reference maps to itself
    (identity), which is the built-in sanity check.

    Overflow: ``cum·ref_tot`` caps the corpus at ~3e9 rows per group
    pair (sqrt of BIGINT range); past that, pre-divide counts by a
    common factor (the q202/q203 cap-note class).

    Scale shape: ONE hash aggregate to the (group, bucket) grid; both
    cumulative sums are windows ON THE GRID (|groups|x|buckets| rows,
    never the corpus — the grid-window rule); the mapping join is
    grid x ref-grid, broadcast on the reference side.  Negative values
    are excluded (DIV-vs-floor portability).

    Output: (group_col, bucket, n, cum_n, total_n, mapped_ref_bucket)
    ordered by (group, bucket).
    """
    bw = int(bucket_width)
    base = df.select(
        F.coalesce(F.col(group_col).cast("string"), F.lit("")).alias("g"),
        F.col(value_col).cast("long").alias("v"),
    ).where(F.col("v") >= 0)
    grid = base.groupBy(
        "g", F.expr(f"v DIV {bw}L").cast("long").alias("bucket")
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    wcum = (
        Window.partitionBy("g")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("g")
    cum = grid.select(
        "g",
        "bucket",
        "n",
        F.sum("n").over(wcum).cast("long").alias("cum_n"),
        F.sum("n").over(wtot).cast("long").alias("total_n"),
    )
    ref = cum.where(F.col("g") == F.lit(ref_group)).select(
        F.col("bucket").alias("_rb"),
        F.col("cum_n").alias("_rcum"),
        F.col("total_n").alias("_rtot"),
    )
    refmin = ref.agg(F.min("_rb").alias("_rmin"))
    mapped = (
        cum.join(
            F.broadcast(ref),
            F.col("_rcum") * F.col("total_n")
            <= F.col("cum_n") * F.col("_rtot"),
            "left",
        )
        .groupBy("g", "bucket", "n", "cum_n", "total_n")
        .agg(F.max("_rb").alias("_mb"))
    )
    return (
        mapped.crossJoin(F.broadcast(refmin))
        .select(
            F.col("g").alias(group_col),
            "bucket",
            "n",
            "cum_n",
            "total_n",
            F.coalesce("_mb", "_rmin").cast("long").alias("mapped_ref_bucket"),
        )
        .orderBy(group_col, "bucket")
    )


def rank_concordance(
    df: DataFrame,
    x_col: str,
    y_col: str,
    x_width: int = 32,
    y_width: int = 8,
    n_buckets: int = 16,
) -> DataFrame:
    """Bucketed rank concordance (Goodman-Kruskal-style) between two
    non-negative integer document metrics — does metric X order the
    corpus the same way metric Y does?  The monotone-association audit
    that validates a cheap proxy score against an expensive one before
    the proxy drives curation.

    Pairs are NEVER enumerated: both metrics bucket onto a fixed
    <= n_buckets grid (``LEAST(v DIV width, B-1)``, deterministic,
    corpus-independent), and concordant/discordant pair counts fall out
    of the 2-D cumulative grid — for a cell (i,j) holding n rows,
    ``concordant += n * T(i-1, j-1)`` and ``discordant += n *
    (T(i-1, B-1) - T(i-1, j))`` where T is the inclusive 2-D cumsum.
    Pairs tied in either bucket are excluded (tau-b style), which is
    exactly what bucketing makes well-defined; the statistic is the
    EXACT concordance of the bucketed metrics on both engines.

    ``concordance_micro = P * 10^6 DIV (P + Q)`` is non-negative by
    construction.  Overflow cap (q202/q203 class): P <= n^2/2, and the
    10^6 scale needs P+Q <= 9.2e12 — i.e. n <= ~4e6 rows; past that,
    pre-divide P and Q by a shared power of two before the ratio (same
    rule on both engines, ranking-preserving).

    Scale shape: ONE hash aggregate to the sparse grid (map-side
    combined; the only corpus-sized exchange), densified against the
    B^2 literal grid, two GRID windows for the 2-D cumsum, three
    broadcast grid self-joins for the shifted lookups, 1-row output.

    Output: one row (n_rows, concordant, discordant,
    concordance_micro).
    """
    B = int(n_buckets)
    base = df.select(
        F.least(
            F.expr(f"CAST({x_col} AS LONG) DIV {int(x_width)}L"),
            F.lit(B - 1).cast("long"),
        ).alias("bx"),
        F.least(
            F.expr(f"CAST({y_col} AS LONG) DIV {int(y_width)}L"),
            F.lit(B - 1).cast("long"),
        ).alias("by"),
    ).where((F.col("bx") >= 0) & (F.col("by") >= 0))
    sparse = base.groupBy("bx", "by").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    dense = (
        df.sparkSession.range(1)
        .select(
            F.explode(F.sequence(F.lit(0), F.lit(B - 1))).alias("bx")
        )
        .select(
            F.col("bx").cast("long").alias("bx"),
            F.explode(F.sequence(F.lit(0), F.lit(B - 1))).alias("by_i"),
        )
        .select("bx", F.col("by_i").cast("long").alias("by"))
        .join(sparse, ["bx", "by"], "left")
        .select(
            "bx",
            "by",
            F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("n"),
        )
    )
    wy = (
        Window.partitionBy("bx")
        .orderBy("by")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rowcum = dense.select(
        "bx", "by", "n", F.sum("n").over(wy).cast("long").alias("cy")
    )
    wx = (
        Window.partitionBy("by")
        .orderBy("bx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = rowcum.select(
        "bx", "by", "n", F.sum("cy").over(wx).cast("long").alias("t")
    )
    tll = t.select(
        (F.col("bx") + 1).alias("bx"),
        (F.col("by") + 1).alias("by"),
        F.col("t").alias("t_ll"),
    )
    tl = t.select(
        (F.col("bx") + 1).alias("bx"),
        F.col("by").alias("by"),
        F.col("t").alias("t_l"),
    )
    tul = t.where(F.col("by") == B - 1).select(
        (F.col("bx") + 1).alias("bx"), F.col("t").alias("t_ul")
    )
    cells = (
        t.where(F.col("n") > 0)
        .join(F.broadcast(tll), ["bx", "by"], "left")
        .join(F.broadcast(tl), ["bx", "by"], "left")
        .join(F.broadcast(tul), ["bx"], "left")
        .select(
            "n",
            F.coalesce(F.col("t_ll"), F.lit(0).cast("long")).alias("ll"),
            F.coalesce(F.col("t_l"), F.lit(0).cast("long")).alias("l"),
            F.coalesce(F.col("t_ul"), F.lit(0).cast("long")).alias("ul"),
        )
    )
    agg = cells.agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.sum(F.col("n") * F.col("ll")).cast("long").alias("concordant"),
        F.sum(F.col("n") * (F.col("ul") - F.col("l")))
        .cast("long")
        .alias("discordant"),
    )
    return agg.select(
        "n_rows",
        "concordant",
        "discordant",
        F.expr(
            "(concordant * 1000000L)"
            " DIV greatest(concordant + discordant, 1L)"
        )
        .cast("long")
        .alias("concordance_micro"),
    )


def auc_by_group(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    group_col: str = "g",
) -> DataFrame:
    """Mann-Whitney AUC of an integer score predicting a binary label,
    per group — THE threshold-free ranking audit for a quality
    classifier (does the cheap score actually rank kept documents above
    rejected ones?), complementing the calibration audit (q174) and the
    PR threshold sweep.

    INTEGER-exact via the VALUE-GRID rank trick (the q230 Gini
    contract): rows never get individual ranks.  Aggregate to the
    (group, score) grid with per-cell positive/negative counts; a cell
    whose predecessors hold ``neg_below`` negatives contributes
    ``pos * (2*neg_below + neg)`` to twice the tie-corrected U
    statistic (ties count half — the classic mid-rank correction), so
    ``auc_micro = U2 * 500000 DIV (n_pos * n_neg)`` is exact BIGINT
    arithmetic on both engines.

    Overflow cap (q230 class): U2 <= 2*n_pos*n_neg and the 5e5 scale
    needs n_pos*n_neg <= ~9.2e12 — i.e. ~6e6 rows per group at a
    balanced split.  Past that, pre-bucket the score (``v DIV 2^k``,
    same rule both engines) — AUC of the bucketed score is the
    documented estimator.

    Scale shape: ONE map-side projection for the label, ONE hash
    aggregate to the (group, score) grid, ONE grid-partitioned
    cumulative window (value-domain-bounded), ONE rollup to groups.
    Documents never shuffle past the grid.

    Output: (group_col, n_pos, n_neg, auc_micro) ordered by group.
    """
    return auc_from_grid(
        auc_grid(df, score_col, label_col, group_col), group_col
    )


def auc_grid(
    df: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
    group_col: str = "g",
) -> DataFrame:
    """The (g, v, pos, neg) sufficient-statistic grid of
    :func:`auc_by_group` — ALGEBRAIC (pos/neg add across shards /
    micro-batches), so it doubles as the streaming twin's partial
    (``streaming/drift.stream_auc``)."""
    base = df.select(
        F.coalesce(F.col(group_col).cast("string"), F.lit("")).alias("g"),
        F.col(score_col).cast("long").alias("v"),
        F.col(label_col).cast("long").alias("y"),
    ).where(F.col("v") >= 0)
    return base.groupBy("g", "v").agg(
        F.sum("y").cast("long").alias("pos"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("neg"),
    )


def auc_from_grid(grid: DataFrame, group_col: str = "g") -> DataFrame:
    """The grid→statistic stage of :func:`auc_by_group`, SHARED with the
    streaming twin (the isotropy_from_grid contract): one grid-bounded
    cumulative window + one rollup over a batch-built or incrementally
    merged (g, v, pos, neg) grid — stream == batch row-for-row."""
    woff = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cells = grid.select(
        "g",
        "pos",
        "neg",
        (F.sum("neg").over(woff) - F.col("neg")).cast("long").alias(
            "neg_below"
        ),
    )
    agg = cells.groupBy("g").agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("neg").cast("long").alias("n_neg"),
        F.sum(
            F.col("pos")
            * (F.lit(2).cast("long") * F.col("neg_below") + F.col("neg"))
        )
        .cast("long")
        .alias("u2"),
    )
    return agg.select(
        F.col("g").alias(group_col),
        "n_pos",
        "n_neg",
        F.expr("(u2 * 500000L) DIV greatest(n_pos * n_neg, 1L)")
        .cast("long")
        .alias("auc_micro"),
    ).orderBy(group_col)


def pr_threshold_sweep(
    df: DataFrame,
    thresholds: list[int],
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """Precision/recall/F1 sweep of a ``score >= t`` classifier over a
    FIXED literal threshold grid — the operating-point picker that turns
    the q238 AUC's "ranks well" into "gate at THIS threshold".

    The corpus is scanned ONCE: aggregate to the (score value) grid
    with per-cell positive/negative counts, fan the literal thresholds
    by explode ON THE GRID (the q158 zone-map idiom — a |grid|×|T|
    intermediate, never a re-scan or a join per threshold), and roll up
    per threshold.  All counts BIGINT; precision/recall/F1 are micro
    ratios via non-negative DIV; F1 folds as ``2*p*r DIV (p+r)`` in
    micro space (exact to 1 micro, same rule both engines).

    Scale shape: ONE hash aggregate to the value grid (the only
    corpus-sized exchange), one explode fan bounded by |grid|·|T|, one
    |T|-row rollup.

    Output: (threshold, tp, fp, fn, precision_micro, recall_micro,
    f1_micro) ordered by threshold.
    """
    ts = sorted(int(t) for t in thresholds)
    if not ts:
        raise ValueError("thresholds must be non-empty")
    base = df.select(
        F.col(score_col).cast("long").alias("v"),
        F.col(label_col).cast("long").alias("y"),
    ).where(F.col("v") >= 0)
    grid = base.groupBy("v").agg(
        F.sum("y").cast("long").alias("pos"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("neg"),
    )
    tarr = F.array(*[F.lit(t).cast("long") for t in ts])
    fanned = grid.select(
        "v", "pos", "neg", F.explode(tarr).alias("t")
    )
    agg = fanned.groupBy("t").agg(
        F.sum(F.when(F.col("v") >= F.col("t"), F.col("pos")).otherwise(0))
        .cast("long")
        .alias("tp"),
        F.sum(F.when(F.col("v") >= F.col("t"), F.col("neg")).otherwise(0))
        .cast("long")
        .alias("fp"),
        F.sum(F.when(F.col("v") < F.col("t"), F.col("pos")).otherwise(0))
        .cast("long")
        .alias("fn"),
    )
    return (
        agg.select(
            F.col("t").cast("long").alias("threshold"),
            "tp",
            "fp",
            "fn",
            F.expr("(tp * 1000000L) DIV greatest(tp + fp, 1L)")
            .cast("long")
            .alias("precision_micro"),
            F.expr("(tp * 1000000L) DIV greatest(tp + fn, 1L)")
            .cast("long")
            .alias("recall_micro"),
        )
        .select(
            "threshold",
            "tp",
            "fp",
            "fn",
            "precision_micro",
            "recall_micro",
            F.expr(
                "(2L * precision_micro * recall_micro)"
                " DIV greatest(precision_micro + recall_micro, 1L)"
            )
            .cast("long")
            .alias("f1_micro"),
        )
        .orderBy("threshold")
    )


def effective_sample_size(
    weights: DataFrame,
    weight_col: str = "weight_nano",
    group_col: str = "source",
    prescale_div: int = 1_000_000,
) -> DataFrame:
    """Kish effective sample size and design effect of a weighted corpus
    per group — the diagnostic that tells a mixture designer how much
    statistical mass SoftDeDup down-weighting (q100) or mixture
    reweighting actually left in each source: ``ESS = (Σw)² / Σw²``,
    ``deff = n·Σw² / (Σw)²``.

    ESS is scale-invariant in w, so weights are FIRST down-scaled by
    ``w DIV prescale_div`` (default 1e6: nano → milli, w <= 1000 for
    SoftDeDup's ``1e9 DIV size`` weights) — Σw² of raw nano weights
    would overflow BIGINT at n >= 10, and the truncating DIV is the
    documented, engine-identical estimator (cluster sizes <= 1000 lose
    nothing; beyond, milli granularity).

    Cross-engine contract (q241 class): Σw and Σw² are EXACT BIGINT
    aggregates (order-free); the two surfaced ratios are ONE double
    expression each in the identical operation order
    (``sw·sw / sw2``, ``n·sw2 / (sw·sw)``), rounded to 6 dp with the
    +0.0 IEEE guard.  CAST(BIGINT AS DOUBLE) is exact below 2^53, so
    determinism needs Σw² < 2^53 — milli weights cap n at ~9e9 per
    group; past that, raise ``prescale_div`` (same rule both engines).

    Scale shape: ONE hash aggregate (map-side combined) to |groups|
    rows; nothing else moves.

    Output: (group_col, n_rows, sum_w, sum_w2, ess, deff) by group.
    """
    ps = int(prescale_div)
    if ps <= 0:
        raise ValueError("prescale_div must be positive")
    base = weights.select(
        F.coalesce(F.col(group_col).cast("string"), F.lit("")).alias("g"),
        F.expr(f"CAST({weight_col} AS LONG) DIV {ps}L").alias("w"),
    ).where(F.col("w") >= 0)
    agg = base.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("w").cast("long").alias("sum_w"),
        F.sum(F.col("w") * F.col("w")).cast("long").alias("sum_w2"),
    )
    return agg.select(
        F.col("g").alias(group_col),
        "n_rows",
        "sum_w",
        "sum_w2",
        (
            F.round(
                F.col("sum_w").cast("double")
                * F.col("sum_w").cast("double")
                / F.greatest(F.col("sum_w2"), F.lit(1).cast("long")).cast(
                    "double"
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("ess"),
        (
            F.round(
                F.col("n_rows").cast("double")
                * F.col("sum_w2").cast("double")
                / (
                    F.greatest(F.col("sum_w"), F.lit(1).cast("long")).cast(
                        "double"
                    )
                    * F.greatest(F.col("sum_w"), F.lit(1).cast("long")).cast(
                        "double"
                    )
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("deff"),
    ).orderBy(group_col)


def cohens_d_expr() -> str:
    """The Cohen's-d expression TEXT over exact BIGINT moment columns
    ``n1/n0/s1/s0/q1/q0`` — the morton16 string-is-the-twin class: the
    SAME string is passed to Spark ``F.expr`` and interpolated into the
    DuckDB oracle, so the float operation order is identical by
    construction (Pearson-class contract: exact integer moments in, ONE
    fixed-order double expression out).  Zero-variance / degenerate
    groups (n<2 per side, pooled SS <= 0) collapse to ``0e0`` on both
    engines; the ``+ 0e0`` guard normalizes any -0.0."""
    m1 = "(CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))"
    m0 = "(CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))"
    ss = (
        f"((CAST(q1 AS DOUBLE) - {m1} * CAST(s1 AS DOUBLE))"
        f" + (CAST(q0 AS DOUBLE) - {m0} * CAST(s0 AS DOUBLE)))"
    )
    return (
        f"CASE WHEN n1 >= 2 AND n0 >= 2 AND {ss} > 0e0"
        f" THEN ROUND(({m1} - {m0})"
        f" / SQRT({ss} / CAST(n1 + n0 - 2 AS DOUBLE)), 6) + 0e0"
        f" ELSE 0e0 END"
    )


def cohens_d_by_group(
    df: DataFrame,
    value_col: str = "v",
    label_col: str = "label",
    group_col: str = "g",
) -> DataFrame:
    """Per-group standardized mean difference (pooled-SD Cohen's d) of a
    numeric column between a binary label's two sides — the effect-size
    companion to :func:`auc_by_group`: AUC says whether the metric RANKS
    the classes apart, d says by how many pooled standard deviations the
    means sit apart (the number a filter-design review quotes).

    Exact BIGINT sufficient statistics per group (n, Σv, Σv² per side —
    one map-side-combined hash aggregate, conditional sums so no pivot
    shuffle), then the shared :func:`cohens_d_expr` text — identical
    float op order on both engines.  No integer division anywhere, so
    negative values are safe (d's sign is the label-1 direction).

    Overflow cap: Σv² needs ``n·max(v)² < 2^63`` (~9e18); past that,
    pre-scale ``v DIV 2^k`` on both engines.

    Output: (group_col, n_pos, n_neg, cohens_d) ordered by group.
    """
    base = df.select(
        F.coalesce(F.col(group_col).cast("string"), F.lit("")).alias("g"),
        F.col(value_col).cast("long").alias("v"),
        F.col(label_col).cast("long").alias("y"),
    )
    sv = F.sum("v").cast("long")
    svy = F.sum(F.col("v") * F.col("y")).cast("long")
    sq = F.sum(F.col("v") * F.col("v")).cast("long")
    sqy = F.sum(F.col("v") * F.col("v") * F.col("y")).cast("long")
    agg = base.groupBy("g").agg(
        F.sum("y").cast("long").alias("n1"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("n0"),
        svy.alias("s1"),
        (sv - svy).cast("long").alias("s0"),
        sqy.alias("q1"),
        (sq - sqy).cast("long").alias("q0"),
    )
    return (
        agg.select(
            F.col("g").alias(group_col),
            F.col("n1").alias("n_pos"),
            F.col("n0").alias("n_neg"),
            F.expr(cohens_d_expr()).alias("cohens_d"),
        )
        .orderBy(group_col)
    )


def mcnemar_expr() -> str:
    """McNemar chi-square expression TEXT over the discordant BIGINT
    cells ``n01/n10`` — shared verbatim by Spark ``F.expr`` and the
    DuckDB oracle (the cohens_d_expr contract): exact integers in, ONE
    fixed-order double division out, 0e0 when no discordant pairs."""
    return (
        "CASE WHEN (n01 + n10) > 0"
        " THEN ROUND(CAST((n01 - n10) * (n01 - n10) AS DOUBLE)"
        " / CAST(n01 + n10 AS DOUBLE), 6) + 0e0"
        " ELSE 0e0 END"
    )


def mcnemar_filters(
    df: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    group_col: str = "g",
) -> DataFrame:
    """Paired comparison of two keep/drop gates evaluated on the SAME
    documents — the right test when deciding whether to swap filter A
    for filter B, because the pairing removes the shared corpus
    variance an unpaired rate comparison ignores.  Per group: the full
    2×2 agreement table (n11 both-keep, n10 A-only, n01 B-only, n00
    both-drop), ``agreement_micro``, and the McNemar statistic
    ``(n01 − n10)² / (n01 + n10)`` over the discordant cells only
    (large ⇒ the gates disagree ASYMMETRICALLY — one is systematically
    stricter, not just noisy).

    Exact BIGINT contingency counts from ONE conditional hash
    aggregate (labels in {0,1}; no pivot shuffle), then the shared
    :func:`mcnemar_expr` text.  ``agreement_micro`` is non-negative
    ``DIV`` only.

    Output: (group_col, n11, n10, n01, n00, agreement_micro,
    mcnemar_chi2) ordered by group.
    """
    base = df.select(
        F.coalesce(F.col(group_col).cast("string"), F.lit("")).alias("g"),
        F.col(a_col).cast("long").alias("a"),
        F.col(b_col).cast("long").alias("b"),
    )
    agg = base.groupBy("g").agg(
        F.sum(F.col("a") * F.col("b")).cast("long").alias("n11"),
        F.sum(F.col("a") * (F.lit(1) - F.col("b"))).cast("long").alias(
            "n10"
        ),
        F.sum((F.lit(1) - F.col("a")) * F.col("b")).cast("long").alias(
            "n01"
        ),
        F.sum((F.lit(1) - F.col("a")) * (F.lit(1) - F.col("b")))
        .cast("long")
        .alias("n00"),
    )
    return (
        agg.select(
            F.col("g").alias(group_col),
            "n11",
            "n10",
            "n01",
            "n00",
            F.expr(
                "((n00 + n11) * 1000000L)"
                " DIV greatest(n00 + n01 + n10 + n11, 1L)"
            )
            .cast("long")
            .alias("agreement_micro"),
            F.expr(mcnemar_expr()).alias("mcnemar_chi2"),
        )
        .orderBy(group_col)
    )


def psi_drift(
    df: DataFrame,
    value_col: str = "n_chars",
    id_col: str = "doc_id",
    tag: str = "psi",
) -> DataFrame:
    """Whole-bit Population Stability Index between two md5-split corpus
    halves over a value column — the industry-standard "has this
    feature's distribution moved" score, here with the floor-log2
    estimator (the pmi_bits deviation class, documented): true PSI's
    ``ln(p/q)`` becomes ``bits(p_micro) − bits(q_micro)``, so every
    quantity is exact BIGINT and the per-bucket contribution
    ``(p − q)·(bits_p − bits_q)`` is non-negative BY MONOTONICITY
    (p > q ⇒ bits(p) ≥ bits(q)) — within a factor of ln2 plus ±1-bit
    flooring of the natural-log PSI, monotone enough for a drift alarm.

    Buckets are whole-bit value magnitudes (``bits(v+1)`` — fixed,
    corpus-independent; never quantiles).  Zero cells need no epsilon:
    bits(0) = bits(1) = 0 on both engines (BIN gives '0'/'1').

    Scale shape: ONE conditional hash aggregate to the ≤64-cell bucket
    grid; totals and psi_total ride grid-bounded unpartitioned windows
    (the zone-map-audit class).

    Output: (bucket, n_a, n_b, p_micro, q_micro, psi_term,
    psi_total) ordered by bucket — psi_term/psi_total in micro·bits.
    """
    from .augment import _md5_mod

    half = _md5_mod(F.col(id_col), tag, F.lit(2)).cast("long")
    base = df.select(
        half.alias("h"),
        (
            F.length(F.bin(F.greatest(F.col(value_col).cast("long"), F.lit(0).cast("long")) + F.lit(1)))
            - F.lit(1)
        )
        .cast("long")
        .alias("bucket"),
    )
    grid = base.groupBy("bucket").agg(
        F.sum((F.col("h") == 0).cast("long")).cast("long").alias("n_a"),
        F.sum((F.col("h") == 1).cast("long")).cast("long").alias("n_b"),
    )
    bits = lambda c: (F.length(F.bin(c)) - F.lit(1)).cast("long")  # noqa: E731
    withp = grid.select(
        "bucket",
        "n_a",
        "n_b",
        F.expr(
            "(n_a * 1000000L) DIV greatest(sum(n_a) over (), 1L)"
        )
        .cast("long")
        .alias("p_micro"),
        F.expr(
            "(n_b * 1000000L) DIV greatest(sum(n_b) over (), 1L)"
        )
        .cast("long")
        .alias("q_micro"),
    )
    terms = withp.select(
        "bucket",
        "n_a",
        "n_b",
        "p_micro",
        "q_micro",
        (
            (F.col("p_micro") - F.col("q_micro"))
            * (bits(F.col("p_micro")) - bits(F.col("q_micro")))
        )
        .cast("long")
        .alias("psi_term"),
    )
    return terms.select(
        "*",
        F.sum("psi_term")
        .over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .cast("long")
        .alias("psi_total"),
    ).orderBy("bucket")
