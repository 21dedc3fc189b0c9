"""Deterministic sampling / capping operators for corpus curation.

Training-data pipelines re-balance corpora with two primitives:

* **stratified down-sampling** — per-stratum keep rates (e.g. English 30%,
  tail languages 100%), and
* **per-group caps** — at most k documents per host/source (the
  common-crawl spam-host guard).

Both must be **deterministic and reproducible across engines and re-runs**
(a training corpus is a versioned artifact), so the randomness is an
md5-derived uniform per row — identical arithmetic in Spark and the DuckDB
oracle, no ``rand()``, no seed-per-partition nondeterminism, stable under
retries/speculative execution (Spark's own ``sample`` is not, and its
XORShift stream has no SQL twin).

u(doc) = int(first 8 md5 hex chars of "{id}|{salt}") / 2^32  ∈ [0, 1)

Scale: the stratified filter is a pure codegen predicate on the scan — at
100 TB it pushes into the row filter with NO shuffle at all. The per-group
cap is the two-level top-k merge (bounded state per task) rather than a
per-group row_number window, so one spam host with 10^9 pages never lands
on a single reducer.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def md5_uniform(id_col: Column, salt: int = 0) -> Column:
    """Deterministic uniform in [0,1): first 32 md5 bits / 2^32 — division
    by a power of two is exact, so engine and oracle agree bitwise."""
    h = F.md5(F.concat(id_col.cast("string"), F.lit(f"|{salt}")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(4294967296.0)


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: Dict[str, float],
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: int = 0,
) -> DataFrame:
    """Keep each row iff u(id) < rate(stratum). Pure predicate — no
    shuffle, no state; rates are a tiny driver-side dict folded into a
    CASE expression (never a join)."""
    rate = F.lit(float(default_rate))
    for stratum in sorted(rates, reverse=True):
        rate = F.when(F.col(stratum_col) == F.lit(stratum), F.lit(float(rates[stratum]))).otherwise(rate)
    u = md5_uniform(F.col(id_col), salt)
    return df.where(u < rate).withColumn("sample_u", u)


def deterministic_shuffle(
    df: DataFrame,
    n_shards: int = 8,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Reproducible training-order shuffle: every row gets a (shard,
    pos_in_shard) coordinate from md5 arithmetic — the versioned-artifact
    answer to `ORDER BY rand()` (which is retry-unstable and, as a global
    sort, a scale anti-pattern).

    shard = first 32 md5 bits of "{id}|{seed}" mod n_shards; position =
    rank of (md5 key, id) WITHIN the shard. The only window partitions by
    shard (~1/n_shards of the data, n_shards tracks cluster size) — no
    global ordering anywhere, yet the result is a total order:
    (shard, pos_in_shard) enumerates the corpus in a fixed pseudo-random
    permutation any engine can reproduce."""
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"|{seed}")))
    key = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    from pyspark.sql import Window

    out = df.select(
        F.col(id_col), key.alias("_k"), F.pmod(key, F.lit(n_shards)).cast("int").alias("shard")
    )
    w = Window.partitionBy("shard").orderBy(F.col("_k").asc(), F.col(id_col).asc())
    return out.select(
        id_col,
        "shard",
        (F.row_number().over(w) - 1).cast("long").alias("pos_in_shard"),
    )


def per_group_cap(
    df: DataFrame,
    group_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: int = 0,
    fanout: int = 32,
) -> DataFrame:
    """At most ``k`` rows per group, chosen deterministically by
    (u(id), id) ascending — an unbiased without-replacement sample of k.

    Two-level merge: level 1 keeps each (group, hash-bucket)'s top-k, so
    per-task aggregation state is ≤ k rows per bucket; level 2 merges
    ≤ fanout·k survivors per group. Exact: the global k smallest are a
    subset of the per-bucket k smallest."""
    u = md5_uniform(F.col(id_col), salt)
    item = F.struct(u.alias("u"), F.col(id_col).alias("id"))
    topk = lambda c: F.slice(F.sort_array(F.collect_list(c)), 1, k)  # noqa: E731
    lvl1 = (
        df.select(F.col(group_col), item.alias("it"))
        .groupBy(group_col, F.pmod(F.hash(F.col(f"it.id")), F.lit(fanout)).alias("b"))
        .agg(topk(F.col("it")).alias("top"))
    )
    kept = (
        lvl1.select(group_col, F.explode("top").alias("it"))
        .groupBy(group_col)
        .agg(topk(F.col("it")).alias("top"))
        .select(group_col, F.explode("top").alias("it"))
        .select(group_col, F.col("it.id").alias(id_col), F.col("it.u").alias("sample_u"))
    )
    return kept


def mixture_rates(counts: Dict[str, int], weights: Dict[str, float]) -> Dict[str, float]:
    """Training-mixture arithmetic (pure python — shared by the engine's
    driver step AND the oracle generator, the oracle-literal technique):
    given actual per-stratum counts and target mixture weights, the
    largest feasible corpus keeps the binding stratum whole and
    down-samples the rest to the target proportions.

    p_s = w_s / Σw over strata that exist with positive weight;
    N* = min_s n_s / p_s; rate_s = p_s · N* / n_s (absent-or-zero-weight
    strata get 0). Requested strata with no rows renormalize away —
    a mixture cannot invent data."""
    present = {s: w for s, w in weights.items() if counts.get(s, 0) > 0 and w > 0}
    if not present:
        return {s: 0.0 for s in counts}
    tw = sum(present[s] for s in sorted(present))
    p = {s: present[s] / tw for s in present}
    nstar = min(counts[s] / p[s] for s in sorted(present))
    # clamp: p_s·N*/n_s can land marginally below 1.0 in float for the
    # binding stratum, which would drop its docs with u in [rate, 1) —
    # "binding stratum kept whole" must hold exactly, not up to rounding
    return {
        s: (min(1.0, p[s] * nstar / counts[s]) if s in present else 0.0)
        for s in counts
    }


def temper_weights(
    weights: Dict[str, float], temperature: float = 1.0
) -> Dict[str, float]:
    """Temperature-scale mixture weights: w_s^(1/T) (renormalization happens
    inside mixture_rates). T>1 flattens toward uniform (up-weights tail
    languages/domains — the multilingual-sampling knob of mBERT/XLM-R-class
    recipes); T=1 is identity; T<1 sharpens. Pure python, shared by the
    engine's driver step AND the oracle generator."""
    t = float(temperature)
    if t == 1.0:
        return dict(weights)
    return {s: float(w) ** (1.0 / t) for s, w in weights.items()}


def mixture_sample(
    df: DataFrame,
    stratum_col: str,
    weights: Dict[str, float],
    id_col: str = "doc_id",
    salt: int = 0,
    temperature: float = 1.0,
) -> DataFrame:
    """Down-sample the corpus to target mixture proportions (the data-mixing
    pass before training): one per-stratum count aggregate (bounded by the
    number of strata), driver-side rate arithmetic, then the deterministic
    md5-uniform accept predicate — retry-stable, and the accept pass adds
    no shuffle. Expected composition hits the targets; the binding stratum
    is kept whole. ``temperature`` flattens (T>1) or sharpens (T<1) the
    target proportions via the shared ``temper_weights`` arithmetic."""
    counts = {
        r[stratum_col]: int(r["n"])
        for r in df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n")).collect()
        if r[stratum_col] is not None
    }
    rates = mixture_rates(counts, temper_weights(weights, temperature))
    return stratified_sample(df, stratum_col, rates, id_col, 0.0, salt)


def assign_splits(
    df: DataFrame,
    boundaries: Sequence[Tuple[str, float]] = (("train", 0.9), ("val", 0.95)),
    default_split: str = "test",
    id_col: str = "doc_id",
    salt: int = 97,
) -> DataFrame:
    """Deterministic train/val/test assignment: split = first interval of
    [0,1) that u(id) falls in (``boundaries`` are ascending (name, upper)
    pairs; u >= the last upper -> ``default_split``).

    Hash-based assignment is the only split that survives a 100 TB
    pipeline: it needs NO global sort or count (zero shuffle, pure
    projection), it is stable under re-runs/retries/appended shards
    (a doc's split never changes when the corpus grows, unlike
    randomSplit), and expected proportions converge per-stratum
    automatically. The same md5 arithmetic as every sampler here, so the
    DuckDB oracle matches bitwise.
    """
    bounds = list(boundaries)
    assert all(b1[1] < b2[1] for b1, b2 in zip(bounds, bounds[1:]))
    u = md5_uniform(F.col(id_col), salt)
    expr = F.lit(default_split)
    for name, upper in reversed(bounds):
        expr = F.when(u < F.lit(float(upper)), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def unimax_budgets(
    token_counts: Dict[str, int], budget: int, max_epochs: int = 4
) -> Dict[str, int]:
    """UniMax language-budget allocation (Chung et al. 2023, "UniMax:
    Fairer and More Effective Language Sampling for Large-Scale
    Multilingual Pretraining"): walk languages in ASCENDING available-token
    order (ties by name), give each the uniform share of the remaining
    budget capped at ``max_epochs`` passes over its data; capped languages
    return their unused share to the pool for larger languages.

    Pure integer arithmetic (shares by floor division) — shared verbatim by
    the engine's driver step and the oracle generator, so the budgets are
    bit-exact across engines (the oracle-literal technique)."""
    langs = sorted(token_counts, key=lambda s: (int(token_counts[s]), s))
    out: Dict[str, int] = {}
    remaining = int(budget)
    for i, s in enumerate(langs):
        share = remaining // (len(langs) - i)
        b = min(share, int(token_counts[s]) * int(max_epochs))
        out[s] = b
        remaining -= b
    return out


def unimax_sample(
    df: DataFrame,
    budget_tokens: int,
    max_epochs: int = 4,
    id_col: str = "doc_id",
    lang_col: str = "lang",
    tokens_col: str = "n_tokens",
    salt: int = 7,
    token_counts: Dict[str, int] | None = None,
) -> DataFrame:
    """UniMax corpus sampling: allocate a global token budget across
    languages with :func:`unimax_budgets`, then keep each document with
    its language's rate via the md5-uniform predicate.

    Two-pass global-statistic shape: pass 1 is ONE per-language token-sum
    aggregate whose output is bounded by the number of languages (the same
    bounded-collect contract as mixture_rates); pass 2 is a pure codegen
    predicate — zero shuffle, composing map-side with the curation chain.

    ``weight_nano`` = 1e9 x (language budget / language tokens), floor
    integer division of non-negatives (exact on both engines): values
    above 1_000_000_000 mean the language repeats for multiple epochs
    (UniMax's whole point — the keep rate caps at 1.0, the weight records
    the epoch count for the data loader).

    Output (kept rows only): (id_col, lang_col, tokens_col, weight_nano,
    sample_u).
    """
    counts = (
        {s: int(c) for s, c in token_counts.items() if int(c) > 0}
        if token_counts is not None
        else {
            r[0]: int(r[1])
            for r in df.groupBy(lang_col).agg(F.sum(tokens_col)).collect()
            if r[0] is not None and r[1] is not None and int(r[1]) > 0
        }
    )
    budgets = unimax_budgets(counts, budget_tokens, max_epochs)
    w_nano = {s: (budgets[s] * 1_000_000_000) // counts[s] for s in counts}
    # rate literal: python double from the integer nano-weight — both
    # engines compare against the SAME repr-round-tripped literal
    rates = {s: min(1.0, w_nano[s] / 1e9) for s in counts}
    rate = F.lit(0.0)
    wn = F.lit(0).cast("long")
    for s in sorted(counts, reverse=True):
        rate = F.when(F.col(lang_col) == F.lit(s), F.lit(float(rates[s]))).otherwise(rate)
        wn = F.when(F.col(lang_col) == F.lit(s), F.lit(int(w_nano[s])).cast("long")).otherwise(wn)
    u = md5_uniform(F.col(id_col), salt)
    return (
        df.select(
            F.col(id_col),
            F.col(lang_col),
            F.col(tokens_col),
            wn.alias("weight_nano"),
            u.alias("sample_u"),
        )
        .where(F.col("sample_u") < rate)
    )


def exact_k_sample(
    docs: DataFrame,
    k: int,
    id_col: str = "doc_id",
    salt: str = "sample1",
    fanout: int = 32,
) -> DataFrame:
    """EXACTLY-k deterministic uniform sample: keep the k smallest
    ``md5(salt#id)`` draws — reservoir-sampling semantics (uniform
    without replacement, exact size) with none of the reservoir's
    sequential state, so it is retry/speculation-stable and replayable
    like every md5-uniform sampler in this module. Rate-based sampling
    (`stratified_sample`) gives k only in expectation; audits and
    fixed-budget eval sets need exactly k.

    Two-level top-k (the cosine_topk merge shape): level 1 keeps each of
    ``fanout`` hash buckets' k smallest draws — no task ever sorts the
    corpus — and level 2 merges ≤ fanout·k survivors in one bounded
    single-group aggregate. Exact by construction: the global k smallest
    is a subset of the per-bucket k smallest.

    Output: (id_col, sample_u, rank) — rank 1..k in draw order.
    """
    u = F.md5(
        F.concat_ws("#", F.lit(salt), F.col(id_col).cast("string"))
    )
    item = F.struct(u.alias("u"), F.col(id_col).alias("kid"))
    topk = lambda c: F.slice(F.sort_array(F.collect_list(c)), 1, int(k))
    lvl1 = docs.groupBy(
        F.pmod(F.hash(id_col), F.lit(int(fanout))).alias("_b")
    ).agg(topk(item).alias("top"))
    merged = lvl1.select(F.explode("top").alias("t")).agg(
        topk(F.col("t")).alias("top")
    )
    return merged.select(F.posexplode("top").alias("r", "t")).select(
        F.col("t.kid").alias(id_col),
        F.col("t.u").alias("sample_u"),
        (F.col("r") + 1).cast("int").alias("rank"),
    )


def weighted_priority_sample(
    docs: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wsample1",
    fanout: int = 32,
) -> DataFrame:
    """EXACTLY-k deterministic WEIGHTED sample — priority sampling
    (Duffield, Lund & Thorup 2007, "Priority sampling for estimation of
    arbitrary subset sums"): each row draws a uniform ``u`` and gets
    priority ``u / w``; the k smallest priorities win, so selection
    probability grows with weight and the chosen subset supports
    near-optimal subset-sum estimates. The token-weighted variant of
    :func:`exact_k_sample` for "sample documents proportional to their
    token mass" eval-set builds.

    Fixed-point cross-engine determinism: ``u`` is the first 15 md5 hex
    chars of ``salt#id`` (60 bits, < 2^63) and the priority is the
    integer ``u DIV max(w, 1)`` — non-negative integer division is exact
    on both engines, so the oracle's single-node ``ORDER BY priority, id
    LIMIT k`` reproduces the winner set bit-for-bit. Ties break on id via
    the struct sort order.

    Same two-level top-k merge as :func:`exact_k_sample`: no task ever
    sorts the corpus; level 2 folds ≤ fanout·k survivors.

    Output: (id_col, weight, priority, rank) — rank 1..k by priority.
    """
    u = F.conv(
        F.substring(
            F.md5(F.concat_ws("#", F.lit(salt), F.col(id_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    w = F.greatest(F.col(weight_col).cast("long"), F.lit(1).cast("long"))
    prio = F.expr("_u DIV _w")
    base = docs.select(
        F.col(id_col), u.alias("_u"), w.alias("_w")
    ).select(
        F.col(id_col),
        F.col("_w").alias("weight"),
        prio.alias("priority"),
    )
    it = F.struct(
        F.col("priority").alias("p"),
        F.col(id_col).alias("kid"),
        F.col("weight").alias("wt"),
    )
    topk = lambda c: F.slice(F.sort_array(F.collect_list(c)), 1, int(k))
    lvl1 = base.groupBy(
        F.pmod(F.hash(id_col), F.lit(int(fanout))).alias("_b")
    ).agg(topk(it).alias("top"))
    merged = lvl1.select(F.explode("top").alias("t")).agg(
        topk(F.col("t")).alias("top")
    )
    return merged.select(F.posexplode("top").alias("r", "t")).select(
        F.col("t.kid").alias(id_col),
        F.col("t.wt").alias("weight"),
        F.col("t.p").alias("priority"),
        (F.col("r") + 1).cast("int").alias("rank"),
    )


MW_SCALE = 1_000_000  # domain weights in micro-units


def mw_domain_weights(
    per_doc: DataFrame,
    group_col: str = "source",
    bits_col: str = "sum_bits",
    tokens_col: str = "n_tokens",
    iters: int = 3,
    eta_milli: int = 200,
) -> DataFrame:
    """Multiplicative-weights domain reweighting — the DoReMi-shaped
    allocator step (Xie 2023 "DoReMi" trains domain weights by excess
    loss; the update here is the classic linearized multiplicative-
    weights rule, Arora-Hazan-Kale 2012 §2): domains whose token-weighted
    mean LM loss EXCEEDS the best domain's get upweighted round by round,
    then weights renormalize to sum ~MW_SCALE.

    FIXED-POINT throughout, and the excess is measured against the
    MINIMUM domain mean rather than the corpus mean — both choices are
    the integer-safe formulation: IEEE exp/softmax cannot hash-match
    across engines, and Spark ``DIV`` (truncate) disagrees with DuckDB
    ``//`` (floor) on NEGATIVE operands, so every division here has a
    non-negative numerator by construction. One round is
    ``w ← (w · (SCALE + (eta_milli·excess) DIV 1000)) DIV SCALE`` then
    ``w ← (w·SCALE) DIV sum(w)``.

    Scale shape: ONE hash aggregate over the per-doc loss table collapses
    the corpus to n_domains rows; every round after that is arithmetic on
    that domain-cardinality table (a broadcast 1-row sum each round) —
    O(domains) per round, corpus touched once. ``per_doc`` rows carry
    integer loss numerators/denominators (the q67 fixed-point bits).

    Output: (group_col, m_micro, excess_micro, weight_micro) — BIGINTs;
    m_micro is the domain's token-weighted mean loss in micro-bits.
    """
    g = per_doc.groupBy(group_col).agg(
        F.sum(bits_col).cast("long").alias("_sb"),
        F.sum(tokens_col).cast("long").alias("_st"),
    ).select(
        F.col(group_col),
        F.expr(f"(_sb * {MW_SCALE}L) DIV greatest(_st, 1L)").alias("m_micro"),
    )
    gmin = g.agg(F.min("m_micro").alias("_mn"))
    base = (
        g.crossJoin(F.broadcast(gmin))
        .select(
            F.col(group_col),
            "m_micro",
            (F.col("m_micro") - F.col("_mn")).cast("long").alias(
                "excess_micro"
            ),
        )
        .localCheckpoint(eager=True)
    )
    w = base.select(
        F.col(group_col), F.lit(MW_SCALE).cast("long").alias("w")
    )
    factor = (
        f"(w * ({MW_SCALE}L + ({int(eta_milli)}L * excess_micro) DIV 1000L))"
        f" DIV {MW_SCALE}L"
    )
    for _ in range(int(iters)):
        wr = base.join(w, group_col).select(
            F.col(group_col), F.expr(factor).alias("wr")
        )
        tot = wr.agg(F.sum("wr").cast("long").alias("_tot"))
        w = wr.crossJoin(F.broadcast(tot)).select(
            F.col(group_col),
            F.expr(f"(wr * {MW_SCALE}L) DIV greatest(_tot, 1L)").alias("w"),
        )
    return base.join(w, group_col).select(
        F.col(group_col), "m_micro", "excess_micro",
        F.col("w").alias("weight_micro"),
    )


def quota_apportionment(
    docs: DataFrame,
    group_col: str = "source",
    budget: int = 1000,
    weight_col: str | None = None,
) -> DataFrame:
    """Hamilton (largest-remainder) apportionment of an integer sampling
    budget across groups: each group gets ``floor(budget·w/total)`` plus
    one of the ``budget − Σfloor`` leftover seats, awarded in remainder
    order — the exact integer answer to "split this 10M-doc sampling
    budget across sources proportionally", with Σalloc == budget always
    (proportional rounding never guarantees that; Hamilton does).

    Exactness: weights, quotas and remainders are BIGINTs; ``DIV``/``%``
    operands are non-negative by the ``budget >= 0`` guard (Spark DIV ==
    DuckDB ``//``); the seat award order ``(remainder DESC, group ASC)``
    is a deterministic total order on both engines. Overflow:
    ``budget·max_group_weight`` must stay under 2^63 (~9.2e18) — split
    the budget hierarchically past that.

    Scale shape: ONE map-side-combined aggregate to the |groups| grid,
    then two windows ON THE GRID (the q194 grid-bounded family — a
    single-partition window over |groups| rows, never the corpus).
    Output: (group_col, weight, quota_floor, remainder, alloc) ordered
    by group.
    """
    from pyspark.sql import Window

    if budget < 0:
        raise ValueError("budget must be >= 0")
    w = (
        F.sum(F.col(weight_col).cast("long"))
        if weight_col
        else F.count(F.lit(1))
    )
    grid = docs.groupBy(
        F.coalesce(F.col(group_col).cast("string"), F.lit("")).alias("grp")
    ).agg(w.cast("long").alias("weight"))
    all_w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    g2 = grid.select(
        "grp",
        "weight",
        F.sum("weight").over(all_w).cast("long").alias("_total"),
    ).select(
        "grp",
        "weight",
        F.expr(f"({int(budget)}L * weight) DIV greatest(_total, 1L)")
        .cast("long")
        .alias("quota_floor"),
        F.expr(f"({int(budget)}L * weight) % greatest(_total, 1L)")
        .cast("long")
        .alias("remainder"),
    )
    seat = Window.orderBy(F.col("remainder").desc(), F.col("grp").asc())
    g3 = g2.select(
        "grp",
        "weight",
        "quota_floor",
        "remainder",
        F.sum("quota_floor").over(all_w).cast("long").alias("_fsum"),
        F.row_number().over(seat).cast("long").alias("_rn"),
    )
    return (
        g3.select(
            F.col("grp").alias(group_col),
            "weight",
            "quota_floor",
            "remainder",
            (
                F.col("quota_floor")
                + F.when(
                    F.col("_rn") <= F.lit(int(budget)) - F.col("_fsum"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("alloc"),
        )
        .orderBy(group_col)
    )


def sqrt_mixture_weights(
    df: DataFrame,
    group_col: str = "lang",
) -> DataFrame:
    """EXACT fixed-point T=2 temperature-sampling mixture weights from
    corpus counts — the oracle-gated integer twin of the float
    :func:`temper_weights` helper (which serves arbitrary T driver-side):
    w_g ∝ share_g^(1/2), the single most common multilingual mixing
    temperature (mBERT/XLM-R-class recipes), is the ONE power that is
    exactly computable cross-engine, because
    ``FLOOR(SQRT(CAST(x AS DOUBLE)))`` equals the true integer sqrt for
    every x ≤ ~1e13 (x is exactly representable and IEEE sqrt is
    correctly rounded; the nearest-integer-boundary hazard needs
    sqrt(x) > ~6.7e7). Operand here is share_micro·10⁶ ≤ 10¹² — safely
    inside.

    All arithmetic BIGINT: ``share_micro = n_g·10⁶ DIV N``;
    ``w_raw = floor(sqrt(share_micro·10⁶))`` (micro-units of
    sqrt-share); ``weight_micro = w_raw·10⁶ DIV Σw_raw``.  T=2 flattens
    toward uniform — tail groups gain, the head pays.

    Scale shape: ONE hash aggregate to the group grid; the total and
    Σw_raw ride grid-bounded unpartitioned windows (zone-map-audit
    class).

    Output: (group_col, n_docs, share_micro, weight_micro) ordered by
    group.
    """
    base = df.select(
        F.coalesce(F.col(group_col).cast("string"), F.lit("")).alias("g")
    )
    grid = base.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    shares = grid.select(
        "g",
        "n_docs",
        F.expr(
            "(n_docs * 1000000L) DIV greatest(sum(n_docs) over (), 1L)"
        )
        .cast("long")
        .alias("share_micro"),
    )
    w = shares.select(
        "g",
        "n_docs",
        "share_micro",
        F.expr(
            "CAST(floor(sqrt(CAST(share_micro * 1000000L AS DOUBLE)))"
            " AS BIGINT)"
        ).alias("w_raw"),
    )
    return (
        w.select(
            F.col("g").alias(group_col),
            "n_docs",
            "share_micro",
            F.expr(
                "(w_raw * 1000000L) DIV greatest(sum(w_raw) over (), 1L)"
            )
            .cast("long")
            .alias("weight_micro"),
        )
        .orderBy(group_col)
    )
