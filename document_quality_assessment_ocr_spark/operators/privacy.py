"""Privacy transforms over document metadata.

k-anonymity by suppression (Sweeney 2002): every combination of
quasi-identifier columns shared by fewer than ``k`` rows is suppressed —
the quasi values are replaced by a redaction token so no released row's
quasi tuple isolates fewer than ``k`` individuals.  Complements
operators/scrub.py (content-level PII masking) with the dataset-level
guarantee.

At 100 TB: one hash aggregate over the PROJECTED quasi columns (map-side
combine shrinks it to the distinct-combination table, which is tiny —
languages × sources, not documents) broadcast back onto the fact table.
The document rows themselves never shuffle and text/payload bytes never
leave their partitions.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REDACTED = "<redacted>"


def k_anonymize(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int = 5,
    id_col: str = "doc_id",
    redact: str = REDACTED,
) -> DataFrame:
    """Suppress quasi-identifier combinations rarer than ``k``.

    NULL contract: quasi values are coalesced to '' BEFORE grouping, so a
    NULL and an empty string are the same (small, anonymity-safe merge)
    and the group join needs no null-safe equality on either engine.

    Output: (id_col, <quasi cols — original or ``redact``>, group_size,
    suppressed).  ``group_size`` is the true pre-suppression cohort size
    (safe to release: suppressed rows all report their real rarity merged
    under the redaction token is NOT done — auditors need the real k).
    """
    qs = [F.coalesce(F.col(c), F.lit("")).alias(c) for c in quasi_cols]
    base = df.select(F.col(id_col), *qs)
    sizes = base.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("group_size")
    )
    joined = base.join(F.broadcast(sizes), list(quasi_cols), "left")
    suppressed = F.col("group_size") < F.lit(int(k))
    out_cols = [
        F.when(suppressed, F.lit(redact)).otherwise(F.col(c)).alias(c)
        for c in quasi_cols
    ]
    return joined.select(
        F.col(id_col),
        *out_cols,
        F.col("group_size"),
        suppressed.alias("suppressed"),
    )


def l_diversity_audit(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    k: int = 5,
    l: int = 2,
) -> DataFrame:
    """l-diversity audit per quasi-identifier cohort — the companion
    metric :func:`k_anonymize` alone misses: a cohort can be large
    (k-anonymous) yet carry ONE sensitive value, so membership still
    discloses it (Machanavajjhala et al. 2007). ``l_distinct`` counts
    distinct sensitive values per cohort; a release needs both
    ``k_ok`` (size ≥ k) and ``l_ok`` (diversity ≥ l).

    Same NULL contract as k_anonymize: quasi AND sensitive values
    coalesce to '' before grouping (NULL == empty, anonymity-safe).

    Scale shape: one hash aggregate on the quasi key with an exact
    COUNT(DISTINCT sensitive) — per-cohort distinct cardinality is
    bounded by the sensitive domain, not the corpus; cohorts are the
    natural broadcast side for gating the release.

    Output: (<quasi cols>, group_size, l_distinct, k_ok, l_ok) ordered
    by the quasi columns.
    """
    qs = [F.coalesce(F.col(c), F.lit("")).alias(c) for c in quasi_cols]
    s = F.coalesce(F.col(sensitive_col).cast("string"), F.lit(""))
    base = df.select(*qs, s.alias("_s"))
    return (
        base.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("group_size"),
            F.countDistinct("_s").cast("long").alias("l_distinct"),
        )
        .select(
            *quasi_cols,
            "group_size",
            "l_distinct",
            (F.col("group_size") >= F.lit(int(k))).alias("k_ok"),
            (F.col("l_distinct") >= F.lit(int(l))).alias("l_ok"),
        )
        .orderBy(*quasi_cols)
    )


def randomized_response_estimate(
    reports: DataFrame,
    group_col: str = "source",
    bit_col: str = "reported",
    keep_num: int = 3,
    keep_den: int = 4,
) -> DataFrame:
    """Debiased per-group share estimate from Warner randomized-response
    reports (Warner 1965) — the privatized-collection counterpart to the
    suppression audits above: each unit reported its TRUE binary
    attribute with probability p = keep_num/keep_den and the complement
    otherwise, so the raw observed share is biased toward 1/2 and the
    debiased estimator is ``(obs − (1−p)) / (2p − 1)``.

    Exactness: counts stay BIGINT; ``obs_micro = (reported·1e6) DIV n``
    (non-negative DIV == DuckDB //); the debiased estimate is ONE exact
    double division of two BIGINTs (the q194 kappa discipline) —
    ``(obs_micro·den − (den−num)·1e6) / ((2num − den)·1e6)`` — because
    its numerator can be negative (sampling noise can push the observed
    share below the lie floor) and integer division diverges across
    engines on negatives.

    Requires 2·keep_num > keep_den (p > 1/2, else the design is
    uninvertible).  Output per group: (group_col, n, n_reported,
    obs_micro, est) ordered by group.

    At 100 TB: one hash aggregate on the group key, map-side combine to
    |groups| partials; nothing else touches the corpus.
    """
    num, den = int(keep_num), int(keep_den)
    if not (0 < num <= den) or 2 * num <= den:
        raise ValueError("need 0 < keep_num <= keep_den and 2*keep_num > keep_den")
    g = F.coalesce(F.col(group_col).cast("string"), F.lit("")).alias("g")
    bit = F.when(F.col(bit_col).cast("long") > 0, 1).otherwise(0)
    agg = reports.select(g, bit.alias("b")).groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("b").cast("long").alias("n_reported"),
    )
    obs_micro = F.expr("(1000000 * n_reported) DIV n").cast("long")
    return agg.select(
        F.col("g").alias(group_col),
        "n",
        "n_reported",
        obs_micro.alias("obs_micro"),
    ).select(
        group_col,
        "n",
        "n_reported",
        "obs_micro",
        (
            (
                F.col("obs_micro") * F.lit(den)
                - F.lit((den - num) * 1_000_000)
            ).cast("double")
            / F.lit(float((2 * num - den) * 1_000_000))
        ).alias("est"),
    ).orderBy(group_col)
