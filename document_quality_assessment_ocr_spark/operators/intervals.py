"""Interval (range-containment) join via bucketing — point events assigned
to the keyed interval that contains them (purchases → sessions, log lines →
deploy windows, spans → page budgets).

Spark has no native interval join; the naive `a.key = b.key AND a.ts
BETWEEN b.lo AND b.hi` executes as an equi-join on the key with the range
as a post-filter — fine when per-key interval counts are small, quadratic
per key when they are not. The classic fix implemented here: every
interval EXPLODES into the fixed-width buckets it covers, every point maps
to its single bucket, and the join runs on ``(key, bucket)`` — match
candidates per probe drop from |intervals-per-key| to |intervals touching
one bucket|. The exact containment predicate still applies after the
bucket join, so results are identical to the naive form (asserted in
tests); intervals that span many buckets replicate proportionally, so pick
``bucket_width`` near the median interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_bucket_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int = 3_600_000_000,  # 1 hour in µs
) -> DataFrame:
    """Inner-join each point row to the interval rows containing it
    (``start ≤ ts ≤ end``, same ``key``) through a bucketed equi-join.
    Timestamp columns are integer µs (cross-engine exact). Returns
    points ⋈ intervals columns (minus the helper bucket)."""
    # integer DIV — exact past 2^53 µs, floor for the non-negative epoch
    ip = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.expr(f"{start_col} DIV {bucket_width}"),
                F.expr(f"{end_col} DIV {bucket_width}"),
            )
        ),
    )
    pp = points.withColumn("_b", F.expr(f"{ts_col} DIV {bucket_width}"))
    return (
        pp.join(ip, [key, "_b"])
        .where((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col)))
        .drop("_b")
    )
