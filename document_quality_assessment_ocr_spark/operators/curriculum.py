"""Curriculum ordering: a GLOBAL rank over a quality score, computed
without a global window — the data-ordering step of curriculum learning
(Bengio et al. 2009) at corpus scale, where `ROW_NUMBER() OVER (ORDER BY
score)` is the single-reducer anti-pattern (the whole corpus through one
task; cf. the q49 oracle's deliberate modeling of it).

The trick is that a FIXED-POINT score has a bounded domain: bucket the
score by a constant width, count per bucket (one tiny aggregate, at most
``domain/width`` rows — a constant, not a function of corpus size),
prefix-sum the bucket counts on the driver, and rank within each bucket
with a window PARTITIONED BY BUCKET (each task sees one bucket's rows).
Global rank = bucket offset + within-bucket row_number. Same result as
the global window, none of the funneling.

Epochs interleave by ``rank % n_epochs`` — the stride ordering that
gives every epoch the same difficulty profile instead of feeding epoch
0 all the easy documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _check_bucket_ids(counts: dict) -> None:
    """The literal-map lookup casts the bucket id to int32 — ids outside
    [0, 2^31) would silently miss the map. Fail loudly instead."""
    for k in counts:
        if not 0 <= k < 2**31:
            raise ValueError(
                f"bucket id {k} outside int32 range — score_col must be a "
                "non-negative fixed-point integer (clamp/scale first)"
            )


def curriculum_order(
    scored: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    n_epochs: int = 4,
    bucket_width: int = 1000,
) -> DataFrame:
    """Global (score DESC, id ASC) rank + interleaved epoch assignment.

    ``score_col`` must be a NON-NEGATIVE integer (fixed-point milli
    score; negative values would hit the Spark-DIV-vs-DuckDB-floor
    divergence and unbound the bucket domain — clamp first).

    ``scored`` must be DETERMINISTIC across jobs: bucket counts are
    collected in one job and the window pass recomputes the input in a
    second — a non-deterministic upstream (an unpersisted sample, a
    rand() column) would make the offsets inconsistent with the ranks.
    Persist such inputs first (same contract as the literal-map queries,
    q124/q126).

    Output: (id_col, score_col, rank, epoch); rank is 0-based and dense
    across the corpus, epoch = rank % n_epochs.
    """
    b = F.expr(f"{score_col} DIV {int(bucket_width)}L").cast("long")
    d = scored.select(F.col(id_col), F.col(score_col), b.alias("_b"))
    # bounded collect: <= score_domain / bucket_width rows by construction
    counts = {
        int(r["_b"]): int(r["c"])
        for r in d.groupBy("_b").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    _check_bucket_ids(counts)
    offset, acc = {}, 0
    for k in sorted(counts, reverse=True):  # higher score bucket ranks first
        offset[k] = acc
        acc += counts[k]
    omap = F.create_map(
        *[F.lit(x) for kv in sorted(offset.items()) for x in kv]
    )
    w = Window.partitionBy("_b").orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    rank = (
        F.element_at(omap, F.col("_b").cast("int")).cast("long")
        + F.row_number().over(w).cast("long")
        - 1
    )
    return d.select(
        F.col(id_col),
        F.col(score_col),
        rank.alias("rank"),
        F.pmod(rank, F.lit(int(n_epochs))).cast("long").alias("epoch"),
    )


def budget_select(
    scored: DataFrame,
    token_budget: int,
    score_col: str,
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    bucket_width: int = 1000,
) -> DataFrame:
    """Token-budget corpus selection: walk the corpus in global
    (``score_col`` DESC, ``id_col`` ASC) order and keep documents while
    the running token total stays within ``token_budget`` — the "best
    data first, stop at N tokens" step every pretraining mix ends with.

    A doc is kept iff its INCLUSIVE prefix token sum <= budget (greedy
    whole-document selection; no partial documents).

    Same two-level shape as :func:`curriculum_order` — the global prefix
    sum is bucket token offsets (bounded collect, <= score_domain /
    bucket_width rows) + a bucket-partitioned running SUM window — never
    a global ORDER BY window. ``score_col`` and ``tokens_col`` must be
    non-negative integers, and ``scored`` deterministic across jobs
    (see :func:`curriculum_order`).

    Output: (id_col, score_col, tokens_col, cum_tokens, kept);
    cum_tokens is the inclusive global prefix sum in selection order.
    """
    b = F.expr(f"{score_col} DIV {int(bucket_width)}L").cast("long")
    d = scored.select(
        F.col(id_col),
        F.col(score_col),
        F.col(tokens_col).cast("long").alias(tokens_col),
        b.alias("_b"),
    )
    # bounded collect: <= score_domain / bucket_width rows by construction
    totals = {
        int(r["_b"]): int(r["t"])
        for r in d.groupBy("_b").agg(F.sum(tokens_col).alias("t")).collect()
    }
    _check_bucket_ids(totals)
    offset, acc = {}, 0
    for k in sorted(totals, reverse=True):  # higher score bucket first
        offset[k] = acc
        acc += totals[k]
    omap = F.create_map(
        *[F.lit(x) for kv in sorted(offset.items()) for x in kv]
    )
    w = (
        Window.partitionBy("_b")
        .orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        F.element_at(omap, F.col("_b").cast("int")).cast("long")
        + F.sum(F.col(tokens_col)).over(w).cast("long")
    )
    return d.select(
        F.col(id_col),
        F.col(score_col),
        F.col(tokens_col),
        cum.alias("cum_tokens"),
        (cum <= F.lit(int(token_budget))).alias("kept"),
    )


def borda_fuse(
    scored: DataFrame,
    signal_cols: list,
    id_col: str = "doc_id",
    bucket_width: int = 1000,
    tier_width: int = 1000,
) -> DataFrame:
    """Borda rank fusion of several quality signals (de Borda 1781; the
    rank-fusion alternative to z-score ensembling used when signals live
    on incommensurable scales): each signal gets a GLOBAL 0-based rank
    (signal DESC, id ASC — rank 0 is best), the Borda score is the SUM
    of ranks (lower = better on every judge), and documents land in
    fixed-width tiers ``borda DIV tier_width`` for downstream mixing.

    Rank fusion instead of z-scores is what keeps this bit-exact across
    engines: ranks are integers, while a z-score needs an IEEE mean/std
    whose corpus sum is order-dependent (the same reason the graph ops
    are fixed-point).

    Every signal must be a NON-NEGATIVE bounded integer (clamp first),
    and ``scored`` deterministic across jobs — each signal's rank is the
    :func:`curriculum_order` bounded-bucket construction (a <=
    domain/bucket_width offset collect + a bucket-partitioned window),
    never a global ORDER BY window, so the plan is one bounded exchange
    per signal and nothing funnels through a single task.

    Output: (id_col, *signal_cols, r_<signal>..., borda, tier) — all
    BIGINT.
    """
    out = scored.select(F.col(id_col), *[F.col(c) for c in signal_cols])
    for sc in signal_cols:
        b = F.expr(f"{sc} DIV {int(bucket_width)}L").cast("long")
        d = out.withColumn("_b", b)
        # bounded collect: <= signal_domain / bucket_width rows
        counts = {
            int(r["_b"]): int(r["c"])
            for r in d.groupBy("_b").agg(F.count(F.lit(1)).alias("c")).collect()
        }
        _check_bucket_ids(counts)
        offset, acc = {}, 0
        for k in sorted(counts, reverse=True):  # higher bucket ranks first
            offset[k] = acc
            acc += counts[k]
        omap = F.create_map(
            *[F.lit(x) for kv in sorted(offset.items()) for x in kv]
        )
        w = Window.partitionBy("_b").orderBy(
            F.col(sc).desc(), F.col(id_col).asc()
        )
        rank = (
            F.element_at(omap, F.col("_b").cast("int")).cast("long")
            + F.row_number().over(w).cast("long")
            - 1
        )
        out = d.withColumn(f"r_{sc}", rank).drop("_b")
    borda = None
    for sc in signal_cols:
        r = F.col(f"r_{sc}")
        borda = r if borda is None else borda + r
    return out.withColumn("borda", borda.cast("long")).withColumn(
        "tier", F.expr(f"borda DIV {int(tier_width)}L").cast("long")
    )


def group_percentile(
    scored: DataFrame,
    score_col: str,
    group_col: str,
    id_col: str = "doc_id",
    bucket_width: int = 1000,
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-group score calibration: each row's 0-based rank and
    percentile (micro-units, ``(rank·scale) DIV max(n_group-1, 1)``)
    within its group, ascending by (score, id) — the per-source/
    per-domain normalization step that makes quality scores comparable
    across sources whose raw scales differ (CCNet buckets its perplexity
    per language the same way).

    A group can be most of the corpus, so ``ROW_NUMBER() OVER
    (PARTITION BY group ORDER BY score)`` is still the single-reducer
    anti-pattern — one task per giant group. Same cure as
    :func:`curriculum_order`, keyed by (group, bucket): counts per
    (group, score-bucket) collect driver-side (bounded by n_groups ·
    score_domain/bucket_width — group count and score domain are both
    corpus-size-independent), offsets prefix-sum per group ASCENDING,
    and the window partitions by (group, bucket) so no task ever sees
    more than one bucket of one group. ``score_col`` must be a
    non-negative bounded integer and ``scored`` deterministic across
    jobs (the shared contract of this module).

    Output: (id_col, group_col, score_col, rank_in_group, n_group,
    pctl_micro) — all rank/count columns BIGINT.
    """
    b = F.expr(f"{score_col} DIV {int(bucket_width)}L").cast("long")
    d = scored.select(
        F.col(id_col), F.col(group_col), F.col(score_col), b.alias("_b")
    )
    # bounded collect: <= n_groups * score_domain / bucket_width rows
    counts = {}
    for r in (
        d.groupBy(group_col, "_b").agg(F.count(F.lit(1)).alias("c")).collect()
    ):
        counts[(r[group_col], int(r["_b"]))] = int(r["c"])
    _check_bucket_ids({b for _, b in counts})
    offset, totals = {}, {}
    for g, bk in sorted(counts, key=lambda x: (str(x[0]), x[1])):
        offset[(g, bk)] = totals.get(g, 0)
        totals[g] = totals.get(g, 0) + counts[(g, bk)]
    okey = F.concat_ws(
        "|", F.col(group_col).cast("string"), F.col("_b").cast("string")
    )
    omap = F.create_map(
        *[
            F.lit(x)
            for (g, bk), off in sorted(
                offset.items(), key=lambda x: (str(x[0][0]), x[0][1])
            )
            for x in (f"{g}|{bk}", off)
        ]
    )
    nmap = F.create_map(
        *[
            F.lit(x)
            for g, n in sorted(totals.items(), key=lambda x: str(x[0]))
            for x in (str(g), n)
        ]
    )
    w = Window.partitionBy(group_col, "_b").orderBy(
        F.col(score_col).asc(), F.col(id_col).asc()
    )
    rank = (
        F.element_at(omap, okey).cast("long")
        + F.row_number().over(w).cast("long")
        - 1
    )
    n = F.element_at(nmap, F.col(group_col).cast("string")).cast("long")
    return (
        d.withColumn("rank_in_group", rank)
        .withColumn("n_group", n)
        .select(
            F.col(id_col),
            F.col(group_col),
            F.col(score_col),
            "rank_in_group",
            "n_group",
            F.expr(
                f"(rank_in_group * {int(scale)}L)"
                " DIV greatest(n_group - 1L, 1L)"
            ).alias("pctl_micro"),
        )
    )


def pareto_frontier_cells(
    scored: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Bucketed Pareto frontier over two quality axes — the selection
    planner's trade-off curve ("longest documents at every diversity
    level") that a scalar blend hides: a cell is ON the frontier iff no
    cell beats it on BOTH axes strictly.

    Inputs are already-bucketed non-negative integer axes (the module's
    fixed-point score contract — callers bucket with DIV like
    curriculum_order does); the operator aggregates the corpus ONCE to
    the (x, y) cell grid and decides WEAK dominance (≥ on both axes,
    > on at least one — the definition that yields the true staircase:
    one surviving y per x column) with two grid-bounded windows:
    sorting cells by x DESC, ``MAX(y) OVER (RANGE 1 PRECEDING)`` under
    the DESC ordering is "the best y among cells with STRICTLY greater
    x" (integer RANGE frame — identical semantics both engines), and
    ``MAX(y) OVER (PARTITION BY x)`` covers the same-x column, so
    ``dominated = max_y_right ≥ y OR max_y_same_x > y``. Emitting ALL
    cells with the flag (not just survivors) keeps the output a full
    selection map.

    Scale shape: one map-side-combined aggregate to the ≤ |x-buckets|·
    |y-buckets| grid, one UNPARTITIONED window ON THE GRID (the q218
    grid-window rule — fine on a bounded grid, an anti-pattern on the
    corpus).

    Output: (x_bucket, y_bucket, cnt, on_frontier) ordered by
    (x_bucket, y_bucket).
    """
    grid = (
        scored.select(
            F.col(x_col).cast("long").alias("x_bucket"),
            F.col(y_col).cast("long").alias("y_bucket"),
        )
        .groupBy("x_bucket", "y_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w_right = (
        Window.partitionBy()
        .orderBy(F.col("x_bucket").desc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same = Window.partitionBy("x_bucket")
    return (
        grid.select(
            "x_bucket",
            "y_bucket",
            "cnt",
            F.max("y_bucket").over(w_right).alias("_maxy_right"),
            F.max("y_bucket").over(w_same).alias("_maxy_same"),
        )
        .select(
            "x_bucket",
            "y_bucket",
            "cnt",
            (
                ~(
                    F.coalesce(
                        F.col("_maxy_right") >= F.col("y_bucket"), F.lit(False)
                    )
                    | (F.col("_maxy_same") > F.col("y_bucket"))
                )
            ).alias("on_frontier"),
        )
        .orderBy("x_bucket", "y_bucket")
    )
