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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
