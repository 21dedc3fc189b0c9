"""As-of (most-recent-prior) join — the temporal join Spark has no native
operator for (DuckDB/kdb ``ASOF JOIN``; Flink temporal table join).

Semantics: each left row picks the single right row with the greatest
``time_col`` ≤ the left row's time, per key; no right row yet → NULLs.

Spark-first implementation — **union + ordered window carry-forward**, not
a range join: a theta-join on ``r.ts <= l.ts`` explodes quadratically per
key before taking max, while this plan is one shuffle on the key and a
linear pass per partition:

* tag right rows side=0, left rows side=1; union;
* ``last(right_payload, ignorenulls=True)`` over
  ``partitionBy(key).orderBy(ts, side)`` rows unbounded-preceding →
  current — at equal timestamps the right row sorts first, giving the
  inclusive ≤ semantics ASOF defines;
* keep side=1 rows, unpack the carried payload.

At scale the window state is one payload struct (constant memory, unlike
``collect_list`` windows), the single exchange is keyed by the join key,
and skewed keys degrade to a per-key linear scan — never quadratic.

The right side must be unique per (key, ts) — pre-aggregate ties
(``max_by``) first, exactly as the DuckDB oracle must, or the carried row
at a tied timestamp is plan-dependent.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    time_col: str,
    right_value_cols: List[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Left enriched with the most recent right row at-or-before its time.

    ``right_value_cols`` are carried from the right side and emitted as
    ``{prefix}{col}``; all left columns pass through unchanged."""
    left_cols = left.columns
    payload = F.struct(*[F.col(c) for c in right_value_cols])
    r = right.select(
        F.col(key_col),
        F.col(time_col),
        F.lit(0).alias("_side"),
        payload.alias("_rv"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in (key_col, time_col)],
    )
    l = left.select(
        F.col(key_col),
        F.col(time_col),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_rv"].dataType).alias("_rv"),
        *[F.col(c) for c in left_cols if c not in (key_col, time_col)],
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(time_col), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).withColumn("_carry", F.last("_rv", ignorenulls=True).over(w))
    return carried.where(F.col("_side") == 1).select(
        *[F.col(c) for c in left_cols],
        *[F.col(f"_carry.{c}").alias(f"{prefix}{c}") for c in right_value_cols],
    )
