"""DSIR-style importance resampling (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling") — select raw documents that look
like a TARGET distribution using hashed n-gram features.

Two-pass shape, the canonical global-statistic → broadcast-literal pattern:

1. **Raw distribution** (one Spark job): hashed word-bigram bucket counts
   over the whole corpus — a partial-aggregating groupBy that shuffles at
   most ``n_buckets`` rows per map task, then a bounded ≤``n_buckets``-row
   collect (the same bounded-collect contract as similarity's k-means
   sample).
2. **Scoring** (zero shuffle): the driver combines raw counts with the
   target distribution into per-bucket FIXED-POINT log-likelihood ratios
   (nano-units, int64 — float sums are order-dependent and can never
   hash-match: the graph.pagerank_fixed lesson), folds them into a literal
   vector, and every document's importance score is an integer array fold
   over its bigrams — scan-stage codegen, no exchange, no UDF.

At 100 TB: pass 1 is one tiny-output aggregation (the classic "train the
importance model" job — its output is D integers regardless of corpus
size); pass 2 composes map-side with the curation chain. A real DSIR setup
swaps ``dsir_target_weights``'s seeded pseudo-counts for bucket counts
over an actual target corpus (Wikipedia/books) — same seam, same plan.

The selection rule here is the deterministic threshold form (keep docs
whose total log-ratio is positive, i.e. more target-like than raw-like);
the paper's Gumbel-top-k resampling layers a sampling stage on top — that
composes with operators/sampling.py's md5-uniform machinery.

Reference parity note: the reference engine has no importance-sampling
stage; this extends the curation family per the LLM-pipeline mandate.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import WS_CLASS
from .quality import ngrams_from_tokens

#: fixed-point scale for log-likelihood ratios (nano-units)
NANO = 1_000_000_000


def dsir_target_weights(n_buckets: int = 64, seed: int = 11) -> list[int]:
    """Seeded per-bucket pseudo-counts standing in for a hashed-bigram
    count table over a target corpus — shared verbatim by the Spark
    operator AND the DuckDB oracle builder."""
    rng = np.random.default_rng(seed)
    return [int(x) for x in rng.integers(1, 1000, n_buckets)]


def dsir_log_ratios_nano(
    raw_counts: list[int], target_counts: list[int]
) -> list[int]:
    """Per-bucket round(1e9·(log p_target − log p_raw)) with add-one
    smoothing, as int64 — ONE shared function so engine and oracle embed
    bit-identical literals (the oracle-literal technique)."""
    d = len(raw_counts)
    assert len(target_counts) == d
    tot_r = sum(raw_counts) + d
    tot_t = sum(target_counts) + d
    return [
        round(
            NANO
            * (
                math.log((target_counts[b] + 1) / tot_t)
                - math.log((raw_counts[b] + 1) / tot_r)
            )
        )
        for b in range(d)
    ]


def _tokens(text: Column) -> Column:
    return F.filter(
        F.split(F.trim(F.lower(F.coalesce(text, F.lit("")))), WS_CLASS + "+"),
        lambda x: x != F.lit(""),
    )


def _bucket(g: Column, n_buckets: int) -> Column:
    """First 15 md5 hex chars mod D, 1-based for element_at — the
    engine-portable bucket shared with classify/dedup (DuckDB twin:
    ('0x' || SUBSTR(MD5(g),1,15))::BIGINT % D + 1)."""
    return (
        F.pmod(
            F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long"),
            F.lit(int(n_buckets)),
        )
        + 1
    ).cast("int")


def dsir_raw_counts(
    docs: DataFrame,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> list[int]:
    """Pass 1: corpus-wide hashed word-bigram bucket counts (missing
    buckets 0). One partial-aggregating exchange of ≤``n_buckets`` rows
    per map task; the collect is bounded at ``n_buckets`` rows."""
    base = docs.select(_tokens(F.col(text_col)).alias("tk"))
    grams = base.select(
        F.explode(ngrams_from_tokens(F.col("tk"), 2)).alias("g")
    )
    rows = (
        grams.groupBy(_bucket(F.col("g"), n_buckets).alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    counts = [0] * n_buckets
    for r in rows:
        counts[r["b"] - 1] = int(r["c"])
    return counts


#: CCNet bucket thresholds — avg nano log-prob per bigram (Wenzek 2020
#: buckets head/middle/tail by LM perplexity; lower perplexity == higher
#: avg log-prob == "head"). Constants are module-level so the DuckDB
#: oracle builder interpolates the SAME values (the C4_* pattern);
#: production recomputes them per-snapshot from sketches.hist_quantiles.
CCNET_HEAD_NANO = -4_305_000_000
CCNET_TAIL_NANO = -4_403_000_000


def lm_logprobs_nano(counts: list[int]) -> list[int]:
    """Per-bucket round(1e9·log p) with add-one smoothing, int64 — the
    hashed-bigram LM standing in for CCNet's KenLM (shared verbatim by the
    Spark operator and the oracle builder; fixed-point because float sums
    are order-dependent and can never hash-match)."""
    d = len(counts)
    tot = sum(counts) + d
    return [round(NANO * math.log((c + 1) / tot)) for c in counts]


def ccnet_perplexity(
    docs: DataFrame,
    n_buckets: int = 64,
    seed: int = 11,
    head_nano: int = CCNET_HEAD_NANO,
    tail_nano: int = CCNET_TAIL_NANO,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style LM filtering (Wenzek 2020, "CCNet: Extracting High
    Quality Monolingual Datasets from Web Crawl Data"): score every
    document under a target-corpus language model and bucket into
    head/middle/tail.

    The LM here is the hashed-bigram table ``lm_logprobs_nano(
    dsir_target_weights(...))`` — at scale the seeded pseudo-counts are
    replaced by real bucket counts over the target corpus (one tiny-output
    agg, same seam as :func:`dsir_raw_counts`); scoring stays a
    zero-shuffle literal-array fold either way.

    Buckets compare the **average** nano log-prob per bigram against the
    thresholds without division (``lp_nano >= thr·n_grams`` — integer
    multiply keeps engine/oracle bit-identical and sidesteps the
    Spark-DIV-vs-DuckDB-``//``-for-negatives trap). Empty docs (<2
    tokens) land in ``tail``. Output ``(id_col, n_grams, lp_nano,
    bucket)``."""
    lp = lm_logprobs_nano(dsir_target_weights(n_buckets, seed))
    lp_arr = F.array(*[F.lit(int(x)).cast("long") for x in lp])
    base = docs.select(F.col(id_col), _tokens(F.col(text_col)).alias("tk"))
    grams = ngrams_from_tokens(F.col("tk"), 2)
    score = F.aggregate(
        F.transform(grams, lambda g: F.element_at(lp_arr, _bucket(g, n_buckets))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n, lp_c = F.col("n_grams"), F.col("lp_nano")
    bucket = (
        F.when(n == 0, F.lit("tail"))
        .when(lp_c >= F.lit(int(head_nano)).cast("long") * n, F.lit("head"))
        .when(lp_c >= F.lit(int(tail_nano)).cast("long") * n, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return base.select(
        F.col(id_col),
        F.size(grams).cast("long").alias("n_grams"),
        score.alias("lp_nano"),
    ).withColumn("bucket", bucket)


def dsir_resample(
    docs: DataFrame,
    n_buckets: int = 64,
    seed: int = 11,
    threshold_nano: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score every document by its summed hashed-bigram log-likelihood
    ratio (target vs THIS corpus) and keep the target-like ones.

    Output ``(id_col, n_grams, score_nano, keep)`` — ``score_nano`` is the
    exact int64 fold (empty/1-token docs score 0 and are kept only if
    ``threshold_nano < 0``); ``keep = score_nano > threshold_nano``.
    """
    raw = dsir_raw_counts(docs, n_buckets, id_col=id_col, text_col=text_col)
    lr = dsir_log_ratios_nano(raw, dsir_target_weights(n_buckets, seed))
    lr_arr = F.array(*[F.lit(int(x)).cast("long") for x in lr])
    base = docs.select(F.col(id_col), _tokens(F.col(text_col)).alias("tk"))
    grams = ngrams_from_tokens(F.col("tk"), 2)
    score = F.aggregate(
        F.transform(grams, lambda g: F.element_at(lr_arr, _bucket(g, n_buckets))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return base.select(
        F.col(id_col),
        F.size(grams).cast("long").alias("n_grams"),
        score.alias("score_nano"),
        (score > F.lit(int(threshold_nano)).cast("long")).alias("keep"),
    )
