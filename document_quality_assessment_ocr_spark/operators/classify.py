"""Hashed linear text classification — the quality/toxicity FILTER stage of
LLM data pipelines (the fastText-classifier shape CCNet/LLaMA-class corpora
gate on), re-expressed as pure Column arithmetic.

Model: bag of hashed token uni+bigrams → one weight per feature bucket →
score = bias + Σ w[h(g) mod D].  The weight table is a seeded, driver-side
vector folded into LITERAL Column expressions (the oracle-literal technique
of similarity.random_projection), so scoring is a map-side projection —
zero shuffle, zero UDF, broadcast-free (the weights live in the plan).

Bit-exactness: weights are integer MILLI-units (int64) and the feature sum
is an integer left-to-right array fold, so engine and oracle agree exactly
(float gram sums are order-dependent and can never hash-match — the
operators/graph.pagerank_fixed lesson); the surfaced ``score`` divides by
1000 exactly once at the end.

At 100 TB: a real trained model swaps its quantized weights into the same
literal-vector seam (or, past ~10^5 buckets where literal plans get big, a
broadcast map-join on bucket id); per-doc cost stays O(tokens), and the
filter composes map-side with the curation chain (plans/curation.py) —
no new exchange anywhere.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import WS_CLASS

#: fixed-point scale of the weight units (milli-units)
SCALE = 1000


def classifier_weights(n_buckets: int = 64, seed: int = 7) -> list[int]:
    """Seeded integer weight vector (milli-units in [-2000, 2000]) — shared
    verbatim by the Spark operator AND the DuckDB oracle SQL builder."""
    rng = np.random.default_rng(seed)
    return [int(x) for x in rng.integers(-2 * SCALE, 2 * SCALE + 1, n_buckets)]


def _grams(tk: Column) -> Column:
    """Token array → uni+bigram string array (bigrams joined with '\\x01',
    a byte that survives both engines' string handling)."""
    bi = F.when(
        F.size(tk) >= 2,
        F.transform(
            F.slice(tk, 1, F.size(tk) - 1),
            lambda x, i: F.concat_ws("\x01", x, F.element_at(tk, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(tk, bi)


def _gram_milli_cols(
    n_buckets: int, seed: int, bias_milli: int
) -> tuple[Column, Column]:
    """(n_grams, integer milli-unit gram sum) Column pair over a token
    array column ``tk`` — the shared core of :func:`quality_score` and
    :func:`domain_quality_shrunk`."""
    w = classifier_weights(n_buckets, seed)
    grams = _grams(F.col("tk"))
    warr = F.array(*[F.lit(int(x)).cast("long") for x in w])
    # bucket = first 15 md5 hex chars mod D (engine-portable, see
    # dedup.shingle_hash_expr); weight lookup is an array index into the
    # literal vector — evaluated left-to-right in gram order (fold), so the
    # integer sum is order-deterministic on both engines
    gsum = F.aggregate(
        F.transform(
            grams,
            lambda g: F.element_at(
                warr,
                (
                    F.pmod(
                        F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long"),
                        F.lit(int(n_buckets)),
                    )
                    + 1
                ).cast("int"),
            ),
        ),
        F.lit(int(bias_milli)).cast("long"),
        lambda acc, x: acc + x,
    )
    ng = F.size(grams).cast("long")
    return ng, gsum


def _tokens_col(text_col: str) -> Column:
    return F.filter(
        F.split(
            F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), WS_CLASS + "+"
        ),
        lambda x: x != F.lit(""),
    )


def quality_score(
    docs: DataFrame,
    n_buckets: int = 64,
    seed: int = 7,
    bias_milli: int = 0,
    threshold: float = 0.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document with the hashed linear model; output
    ``(id_col, n_grams, score, keep)`` where ``score`` is the milli-unit
    sum / 1000 averaged over grams (empty docs score 0 and are kept only
    if ``threshold <= 0``).

    One projection — the plan is scan → codegen fold; nothing shuffles.
    """
    base = docs.select(F.col(id_col), _tokens_col(text_col).alias("tk"))
    ng, gsum = _gram_milli_cols(n_buckets, seed, bias_milli)
    score = F.when(ng > 0, gsum.cast("double") / ng / F.lit(float(SCALE))).otherwise(
        F.lit(0.0)
    )
    return base.select(
        F.col(id_col),
        ng.alias("n_grams"),
        F.round(score, 6).alias("score"),
        (F.round(score, 6) >= F.lit(float(threshold))).alias("keep"),
    )


#: shift making per-gram milli sums non-negative (|weight| bound), so every
#: fixed-point division below is a NON-NEGATIVE DIV — the only integer
#: division that is exact across Spark ``DIV`` and DuckDB ``//``
OFFSET_MILLI = 2 * SCALE
PRIOR_NANO = OFFSET_MILLI * 1_000_000  # shifted nano-score of a raw 0.0


def domain_quality_shrunk(
    docs: DataFrame,
    n_buckets: int = 64,
    seed: int = 7,
    prior_docs: int = 20,
    threshold: float = 0.0,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Domain-level quality with empirical-Bayes (additive) shrinkage — the
    "judge the domain, not the page" signal web-curation pipelines gate on
    (a domain with 3 pages and a perfect mean should NOT outrank one with
    30k pages and a good mean): the per-domain mean classifier score is
    pulled toward the prior (raw 0.0) by ``prior_docs`` pseudo-documents.

    Fixed-point contract: per-doc mean score in SHIFTED nano-units
    ``((gsum + OFFSET_MILLI·ng) · 1e6) DIV ng`` (the +2000-milli shift
    makes every operand non-negative, where Spark ``DIV`` == DuckDB ``//``
    exactly); domain shrinkage is
    ``(Σ shifted + prior_docs·PRIOR_NANO) DIV (n_docs + prior_docs)``.
    The surfaced double divides the integer result exactly once. int64
    headroom: shifted ≤ 4e9 nano per doc → safe to ~2.3e9 docs/domain.

    Scale shape: one codegen projection (the gram fold) + ONE map-side-
    combined aggregate keyed by domain — output is |domains| rows, the
    natural broadcast side for gating the corpus by its domain verdict.

    Output: (group_col, n_docs, shrunk_nano, shrunk_score, keep).
    """
    base = docs.select(
        F.coalesce(F.col(group_col), F.lit("")).alias(group_col),
        _tokens_col(text_col).alias("tk"),
    )
    ng, gsum = _gram_milli_cols(n_buckets, seed, 0)
    per_doc = base.select(
        group_col, ng.alias("_ng"), gsum.alias("_gs")
    ).select(
        group_col,
        F.expr(
            f"CASE WHEN _ng > 0 THEN ((_gs + {OFFSET_MILLI}L * _ng) * 1000000L)"
            f" DIV _ng ELSE {PRIOR_NANO}L END"
        ).cast("long").alias("_shifted_nano"),
    )
    agg = per_doc.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_shifted_nano").cast("long").alias("_sum_nano"),
    )
    shrunk = agg.select(
        group_col,
        "n_docs",
        F.expr(
            f"(_sum_nano + {int(prior_docs)}L * {PRIOR_NANO}L)"
            f" DIV (n_docs + {int(prior_docs)}L)"
        ).cast("long").alias("shrunk_nano"),
    )
    score = (F.col("shrunk_nano") - F.lit(PRIOR_NANO)).cast("double") / F.lit(1e9)
    return shrunk.select(
        group_col,
        "n_docs",
        "shrunk_nano",
        score.alias("shrunk_score"),
        (score >= F.lit(float(threshold))).alias("keep"),
    )


def calibration_audit(
    docs: DataFrame,
    n_buckets: int = 64,
    seed: int = 7,
    bucket_width_milli: int = 250,
    min_tokens: int = 80,
    text_col: str = "text",
) -> DataFrame:
    """Classifier calibration audit — before a 100 TB corpus is gated on
    the quality classifier, check that the score MEANS something: bucket
    the per-doc mean gram score and measure, per bucket, how often a
    cheap proxy label (doc has >= ``min_tokens`` tokens — the
    length-quality correlate Gopher/C4 both lean on) comes out positive.
    A calibrated score shows a monotone positive-rate ramp across
    buckets; a flat ramp means the threshold is noise.

    Fixed-point contract: per-doc mean milli score rides the SHIFTED
    form ``(gsum + OFFSET_MILLI·ng) DIV ng`` (non-negative by the weight
    bound, so Spark ``DIV`` == DuckDB ``//``); bucket ids and the
    per-bucket ``pos_rate_micro = n_pos·1e6 DIV n_docs`` are exact
    integers — nothing float crosses the oracle boundary. ``lo_milli``
    maps the bucket back to the UNSHIFTED score scale (may be negative:
    it is a product/difference, never a division operand).

    Scale shape: one codegen projection (the shared gram fold) + ONE
    map-side-combined aggregate on the bucket id — output is at most
    ``2·OFFSET_MILLI / bucket_width_milli + 1`` rows (a constant),
    the natural driver-side readout.

    Output: (bucket, lo_milli, n_docs, n_pos, pos_rate_micro) ordered
    by bucket.
    """
    if bucket_width_milli < 1:
        raise ValueError("bucket_width_milli must be >= 1")
    base = docs.select(_tokens_col(text_col).alias("tk"))
    ng, gsum = _gram_milli_cols(n_buckets, seed, 0)
    per_doc = base.select(
        ng.alias("_ng"),
        gsum.alias("_gs"),
        (F.size(F.col("tk")) >= F.lit(int(min_tokens))).alias("_pos"),
    ).select(
        F.expr(
            f"CASE WHEN _ng > 0 THEN ((_gs + {OFFSET_MILLI}L * _ng) DIV _ng)"
            f" DIV {int(bucket_width_milli)}L"
            f" ELSE {OFFSET_MILLI // int(bucket_width_milli)}L END"
        ).cast("long").alias("bucket"),
        "_pos",
    )
    return (
        per_doc.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col("_pos").cast("long")).cast("long").alias("n_pos"),
        )
        .select(
            "bucket",
            (
                F.col("bucket") * F.lit(int(bucket_width_milli))
                - F.lit(int(OFFSET_MILLI))
            ).cast("long").alias("lo_milli"),
            "n_docs",
            "n_pos",
            F.expr("(n_pos * 1000000L) DIV n_docs").cast("long").alias(
                "pos_rate_micro"
            ),
        )
        .orderBy("bucket")
    )


def quality_length_joint(
    docs: DataFrame,
    n_buckets: int = 64,
    seed: int = 7,
    bucket_width_milli: int = 500,
    text_col: str = "text",
) -> DataFrame:
    """Joint (length, quality) histogram — the 2-D drift dashboard read
    before retuning curation thresholds: token count in log2 buckets ×
    classifier score in shifted-milli buckets. A corpus shift that
    preserves both MARGINALS can still move the joint mass (e.g. long
    docs suddenly scoring low — boilerplate injection), which is exactly
    what the 1-D audits (q156 drift, q174 calibration) cannot see.

    Fixed-point contract: tok_bucket = ``LENGTH(BIN(n_tok)) - 1`` (0
    tokens lands in bucket 0 with the 1-token docs — the BIN(0) edge,
    documented at gap_histogram); q_bucket rides the shared shifted-
    milli form ``((gsum + OFFSET_MILLI·ng) DIV ng) DIV width`` (all
    operands non-negative). Output is a constant-bounded grid
    (≤ 64 × (2·OFFSET_MILLI/width + 1) cells).

    Scale shape: one codegen projection (the shared gram fold) + ONE
    map-side-combined aggregate on the cell id.

    Output: (tok_bucket, q_bucket, n_docs) ordered by (tok_bucket,
    q_bucket).
    """
    if bucket_width_milli < 1:
        raise ValueError("bucket_width_milli must be >= 1")
    base = docs.select(_tokens_col(text_col).alias("tk"))
    ng, gsum = _gram_milli_cols(n_buckets, seed, 0)
    per_doc = base.select(
        (F.length(F.bin(F.size(F.col("tk")).cast("long"))) - F.lit(1))
        .cast("long")
        .alias("tok_bucket"),
        ng.alias("_ng"),
        gsum.alias("_gs"),
    ).select(
        "tok_bucket",
        F.expr(
            f"CASE WHEN _ng > 0 THEN ((_gs + {OFFSET_MILLI}L * _ng) DIV _ng)"
            f" DIV {int(bucket_width_milli)}L"
            f" ELSE {OFFSET_MILLI // int(bucket_width_milli)}L END"
        ).cast("long").alias("q_bucket"),
    )
    return (
        per_doc.groupBy("tok_bucket", "q_bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("tok_bucket", "q_bucket")
    )


def annotator_agreement(
    labeled: DataFrame,
    a_col: str,
    b_col: str,
    group_col: str = "source",
) -> DataFrame:
    """Inter-annotator (or model-vs-model) agreement per group: observed
    agreement, chance agreement, and Cohen's kappa — the label-quality
    gate run before trusting ANY human- or LLM-labeled training split.
    High raw agreement with kappa near 0 means the labels are majority-
    class noise, not signal.

    Integer micros everywhere a division can happen more than once:
    ``po_micro = n_agree·1e6 DIV n``; ``pe_micro = Σ_k(na_k·nb_k)·1e6
    DIV (n·n)`` (all operands non-negative → Spark DIV == DuckDB ``//``;
    64-bit headroom: n²·1e6 < 2^63 → n ≤ ~3·10^6 rows per group — past
    that, pre-divide each marginal product by n). ``kappa`` itself is
    the ONE exact DOUBLE division of two BIGINTs (the q67 mean
    contract): ``(po_micro − pe_micro) / (1e6 − pe_micro)``, NULL when
    chance agreement is exactly 1 (degenerate single-class group).

    Plan: one base aggregate (n, n_agree), two class-marginal
    aggregates joined on (group, class) — every relation is
    group×class-bounded; no window, no collect.

    Output: (group_col, n, n_agree, po_micro, pe_micro, kappa) ordered
    by group.
    """
    g = F.coalesce(F.col(group_col).cast("string"), F.lit("")).alias("g")
    la = F.coalesce(F.col(a_col).cast("string"), F.lit("")).alias("la")
    lb = F.coalesce(F.col(b_col).cast("string"), F.lit("")).alias("lb")
    base = labeled.select(g, la, lb)
    tot = base.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("la") == F.col("lb")).cast("long"))
        .cast("long")
        .alias("n_agree"),
    )
    ma = base.groupBy("g", F.col("la").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("na")
    )
    mb = base.groupBy("g", F.col("lb").alias("k")).agg(
        F.count(F.lit(1)).cast("long").alias("nb")
    )
    pe = (
        ma.join(mb, ["g", "k"])
        .groupBy("g")
        .agg(F.sum(F.expr("na * nb")).cast("long").alias("pe_mass"))
    )
    return (
        tot.join(pe, "g", "left")
        .select(
            F.col("g").alias(group_col),
            "n",
            "n_agree",
            F.expr("(n_agree * 1000000L) DIV n").cast("long").alias("po_micro"),
            F.expr("(coalesce(pe_mass, 0L) * 1000000L) DIV (n * n)")
            .cast("long")
            .alias("pe_micro"),
        )
        .withColumn(
            "kappa",
            F.when(
                F.col("pe_micro") < F.lit(1000000),
                (F.col("po_micro") - F.col("pe_micro")).cast("double")
                / (F.lit(1000000) - F.col("pe_micro")).cast("double"),
            ),
        )
        .orderBy(group_col)
    )
