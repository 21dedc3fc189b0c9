"""Sessionization (gaps-and-islands) over an event table — the behavioral
slicing op a training-data ingest pairs with the document pipeline (activity
windows, rate features, per-user curricula).

Shape: ONE exchange. The lag-gap flag and the running session counter are two
window functions over the same (user_id; ts, event_id) ordering — one
Exchange + one Sort — and the final per-session aggregate groups on
(user_id, session_idx), whose clustering HashPartitioning(user_id) already
satisfies, so no second shuffle.

Timestamps are compared in integer MICROSECONDS (``unix_micros`` /
DuckDB ``EPOCH_US``) — float epoch seconds round differently across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    milli_values: bool = False,
) -> DataFrame:
    """Events → one row per (user, session): a new session starts when the
    gap to the previous event exceeds ``gap_seconds``.

    ``milli_values=True`` swaps the float ``sum_value`` for an
    order-free BIGINT ``value_milli`` (per-event ``CAST(value*1000 AS
    LONG)`` truncation, the q168 portable path) — the surface the
    streaming twin's incremental merges can hit EXACTLY (float session
    sums re-associate across batch boundaries; integer sums don't)."""
    gap_us = int(gap_seconds) * 1_000_000
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    # parquet naive timestamps arrive as TIMESTAMP_NTZ; the session runs UTC
    # (session.get_spark), so the cast is a pure reinterpretation and matches
    # DuckDB's EPOCH_US of the same naive value
    tus = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(tus).over(w)
    new_s = F.when(prev.isNull() | ((tus - prev) > F.lit(gap_us)), 1).otherwise(0)
    sid = F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val_agg = (
        F.sum(
            (F.col("value").cast("double") * F.lit(1000).cast("double"))
            .cast("long")
        )
        .cast("long")
        .alias("value_milli")
        if milli_values
        else F.round(F.sum("value"), 6).alias("sum_value")
    )
    return (
        events.select(
            F.col(user_col).cast("long").alias("user_id"),
            tus.alias("tus"),
            sid.alias("sid"),
            F.col(value_col).alias("value"),
        )
        .groupBy("user_id", F.col("sid").cast("int").alias("session_idx"))
        .agg(
            F.min("tus").alias("session_start_us"),
            F.max("tus").alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
            val_agg,
        )
    )


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel analysis — the product-analytics staple (Amplitude/
    Mixpanel "did signup → view → click → purchase IN ORDER"): a user
    counts at step i only with an event of type steps[i] STRICTLY AFTER
    their step-(i−1) time; each level takes the EARLIEST qualifying event
    (the unique deterministic choice, and the one that maximizes later
    conversion — earliest leaves the most room for strictly-later
    events, so it is order-optimal, not just canonical).

    Timestamps compare in integer MICROSECONDS (``unix_micros`` /
    ``EPOCH_US``); conversion ratios are fixed-point
    ``n·10⁶ DIV n_prev`` on non-negative counts.

    Shape: len(steps) passes, each a type-filtered scan + a
    user-co-partitioned join against the previous level's (user, t)
    aggregate + a per-user min — every intermediate is ≤|users| rows, so
    after the first aggregate all joins are small-side broadcastable.
    The final step table is |steps| rows (a parameter, not data), so its
    LAG/FIRST windows are grid-bounded, the zone-map-audit class. The
    lazy level chain re-derives each prefix per level (≤ steps²/2
    type-filtered scans — fine for small step lists); persist() the
    filtered event projection first when steps is long.

    Output: one row per step — (step, event_type, n_users,
    conv_from_first_micro, conv_from_prev_micro), step 1-indexed.
    """
    tus = F.unix_micros(F.col(ts_col).cast("timestamp"))
    levels = []
    cur = None
    for i, st in enumerate(steps):
        ev = events.where(F.col(type_col) == F.lit(st)).select(
            F.col(user_col).alias("u"), tus.alias("t")
        )
        if cur is None:
            cur = ev.groupBy("u").agg(F.min("t").alias("t"))
        else:
            cur = (
                ev.join(cur.select("u", F.col("t").alias("tp")), "u")
                .where(F.col("t") > F.col("tp"))
                .groupBy("u")
                .agg(F.min("t").alias("t"))
            )
        levels.append(
            cur.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
                F.lit(i + 1).cast("int").alias("step"),
                F.lit(st).alias("event_type"),
                "n_users",
            )
        )
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    w = Window.orderBy("step")
    wall = Window.orderBy("step").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return out.select(
        "step",
        "event_type",
        "n_users",
        F.expr("(n_users * 1000000L)").alias("_num"),
        F.first("n_users").over(wall).alias("_n1"),
        F.lag("n_users", 1).over(w).alias("_np"),
    ).select(
        "step",
        "event_type",
        "n_users",
        F.expr("_num DIV greatest(_n1, 1L)").cast("long").alias(
            "conv_from_first_micro"
        ),
        F.expr("_num DIV greatest(coalesce(_np, n_users), 1L)")
        .cast("long")
        .alias("conv_from_prev_micro"),
    )


def retention_cohorts(
    events: DataFrame,
    period_us: int = 604_800_000_000,  # one week
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention matrix — users bucketed by their FIRST-activity
    period (the cohort), then for each later period the fraction still
    active: the "week-N retention" triangle every growth dashboard draws,
    and for a corpus pipeline the contributor-churn view of a crawl.

    INTEGER-exact: periods are ``epoch_us DIV period_us`` (non-negative
    epochs — the DIV/floor trap never applies);
    ``retained_micro = n_active·10⁶ DIV cohort_size``.

    Shape: one per-user min aggregate (cohort assignment), one DISTINCT
    (user, period) activity projection, one user-keyed join (cohort table
    ≤|users| rows — broadcastable), then a (cohort, offset) rollup whose
    output is periods²-bounded. Offset 0 is the cohort itself
    (retained_micro = 10⁶ by construction — kept as the row that anchors
    each cohort's size).

    Output: (cohort_period, offset, cohort_size, n_active,
    retained_micro), offsets ≥ 0.
    """
    tus = F.unix_micros(F.col(ts_col).cast("timestamp"))
    pu = int(period_us)
    ev = events.select(F.col(user_col).alias("u"), tus.alias("t"))
    first = ev.groupBy("u").agg(
        F.expr(f"min(t) DIV {pu}").cast("long").alias("cohort")
    )
    sizes = first.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    active = ev.select(
        "u", F.expr(f"t DIV {pu}").cast("long").alias("period")
    ).distinct()
    return (
        active.join(first, "u")
        .groupBy("cohort", (F.col("period") - F.col("cohort")).alias("offset"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
        .join(sizes, "cohort")
        .select(
            F.col("cohort").alias("cohort_period"),
            F.col("offset").cast("long").alias("offset"),
            "cohort_size",
            "n_active",
            F.expr("(n_active * 1000000L) DIV greatest(cohort_size, 1L)")
            .cast("long")
            .alias("retained_micro"),
        )
    )


def gap_histogram(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Log2-bucketed inter-event gap distribution per user stream — the
    empirical basis for PICKING the sessionization threshold (the
    bimodal valley between within-session and between-session gaps),
    instead of cargo-culting 1800 s.

    Gaps are integer MICROSECONDS between consecutive events of the same
    user (the shared ``unix_micros`` / ``EPOCH_US`` contract; ordering
    ties break on ``id_col``); bucket = floor(log2(gap_us)) via the
    shared ``LENGTH(BIN(n)) - 1`` idiom. Bucket 0 holds gaps in [0, 2)
    µs — simultaneous duplicates land there (BIN(0) has length 1), which
    is exactly the duplicate-ingestion signal the histogram also serves.

    Scale shape: ONE per-user window (bounded by a user's event count —
    never global), one ≤64-row bucket rollup. Each user's first event
    produces no gap.

    Output: (bucket, lo_us, n_gaps, min_gap_us, max_gap_us) ordered by
    bucket.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    tus = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = (tus - F.lag(tus).over(w)).cast("long")
    gaps = events.select(gap.alias("gap_us")).where(F.col("gap_us").isNotNull())
    bucket = (F.length(F.bin(F.col("gap_us"))) - F.lit(1)).cast("long")
    return (
        gaps.select(bucket.alias("bucket"), "gap_us")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.min("gap_us").cast("long").alias("min_gap_us"),
            F.max("gap_us").cast("long").alias("max_gap_us"),
        )
        .select(
            "bucket",
            F.expr("SHIFTLEFT(1L, CAST(bucket AS INT))").alias("lo_us"),
            "n_gaps",
            "min_gap_us",
            "max_gap_us",
        )
        .orderBy("bucket")
    )


def event_bursts(
    events: DataFrame,
    threshold_ms: int = 1000,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Duplicate-burst detector per event type — the ingestion-health
    audit that catches client retry storms and at-least-once replays
    (the same user firing the same event type again within
    ``threshold_ms``), which inflate every downstream funnel and
    retention number if not caught here.

    An event is a BURST if it has a predecessor in its user's stream
    (any type) within strictly less than ``threshold_ms`` AND that
    predecessor has the same event type. Timestamps compare in the
    shared integer-microsecond contract; ordering ties break on
    ``id_col``.

    Scale shape: ONE per-user window (the q177 gap window — bounded by
    a user's event count), one rollup keyed by event type. Rates in
    integer micro over the events that HAVE a predecessor.

    Output: (event_type, n_events, n_with_prev, n_bursts, burst_micro)
    ordered by event_type.
    """
    if threshold_ms < 1:
        raise ValueError("threshold_ms must be >= 1")
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    tus = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_t = F.lag(tus).over(w)
    prev_ty = F.lag(F.col(type_col)).over(w)
    thr_us = int(threshold_ms) * 1000
    base = events.select(
        F.coalesce(F.col(type_col), F.lit("")).alias("event_type"),
        prev_t.isNotNull().alias("_has_prev"),
        (
            prev_t.isNotNull()
            & ((tus - prev_t) < F.lit(thr_us))
            & (F.coalesce(prev_ty, F.lit("")) == F.coalesce(F.col(type_col), F.lit("")))
        ).alias("_burst"),
    )
    return (
        base.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("_has_prev").cast("long")).cast("long").alias("n_with_prev"),
            F.sum(F.col("_burst").cast("long")).cast("long").alias("n_bursts"),
        )
        .select(
            "event_type",
            "n_events",
            "n_with_prev",
            "n_bursts",
            F.expr("(n_bursts * 1000000L) DIV greatest(n_with_prev, 1L)")
            .cast("long")
            .alias("burst_micro"),
        )
        .orderBy("event_type")
    )


def props_stats(
    events: DataFrame,
    key: str = "k",
    type_col: str = "event_type",
    props_col: str = "props",
) -> DataFrame:
    """Semi-structured property extraction + rollup — pull one integer
    key out of the JSON ``props`` payload and profile it per event type
    (the "is the client still sending the field, and is its range
    sane" schema-drift check for loosely-typed event pipelines).

    Extraction is the engine-native JSON path on both sides —
    ``get_json_object(props, '$.key')`` (Spark) / ``JSON_EXTRACT_STRING``
    (DuckDB) — then a NULL-on-failure integer cast (Spark CAST ==
    DuckDB TRY_CAST), so malformed payloads and missing keys count in
    ``n_missing`` instead of poisoning the rollup. Integer min/max/sum
    are exact cross-engine; no float crosses the oracle boundary.

    Scale shape: one map-side projection (JSON path evaluation never
    shuffles) + ONE aggregate keyed by event type.

    Output: (event_type, n_events, n_missing, sum_v, min_v, max_v)
    ordered by event_type.
    """
    # try_cast, not cast: ANSI mode (Spark 4 default) makes a plain cast
    # THROW on a non-integer value — NULL-on-failure is this operator's
    # whole contract (it mirrors the oracle's TRY_CAST)
    v = F.get_json_object(
        F.coalesce(F.col(props_col), F.lit("")), f"$.{key}"
    ).try_cast("long")
    base = events.select(
        F.coalesce(F.col(type_col), F.lit("")).alias("event_type"),
        v.alias("_v"),
    )
    return (
        base.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("_v").isNull().cast("long")).cast("long").alias("n_missing"),
            F.coalesce(F.sum("_v"), F.lit(0)).cast("long").alias("sum_v"),
            # coalesce to 0 so an all-missing type stays int64 end-to-end
            # (a NULL would float64-ify the pandas column — the q41 dtype
            # lesson); n_missing == n_events disambiguates the sentinel
            F.coalesce(F.min("_v"), F.lit(0)).cast("long").alias("min_v"),
            F.coalesce(F.max("_v"), F.lit(0)).cast("long").alias("max_v"),
        )
        .orderBy("event_type")
    )


def transition_matrix(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams
    — the product-analytics "what happens after X" table and the input
    to funnel design, bot detection (near-deterministic rows), and
    session-model simulators.

    Each user's events order by (ts, id) — the module's shared
    deterministic ordering contract (q183) — and every consecutive pair
    (prev_type, next_type) counts once; a user's first event has no
    predecessor and contributes nothing. ``prob_micro`` is row-
    normalized over the prev type's outgoing mass (non-negative DIV ==
    DuckDB ``//``).

    Scale shape: ONE per-user window (bounded by a user's own event
    count — the q27/q177/q183 exchange, reusable across all session
    audits), then ONE aggregate on the ≤ |types|² transition grid; the
    row-normalizer joins on the |types|-row marginal, never a window
    over the corpus.

    Output: (prev_type, next_type, n, prob_micro) ordered by
    (prev_type, next_type) — grid-bounded, driver-readable.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    ty = F.coalesce(F.col(type_col), F.lit(""))
    pairs = (
        events.select(
            F.lag(ty).over(w).alias("prev_type"), ty.alias("next_type")
        )
        .where(F.col("prev_type").isNotNull())
    )
    grid = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    marg = grid.groupBy("prev_type").agg(
        F.sum("n").cast("long").alias("out_mass")
    )
    return (
        grid.join(marg, "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            F.expr("(n * 1000000L) DIV out_mass").cast("long").alias(
                "prob_micro"
            ),
        )
        .orderBy("prev_type", "next_type")
    )


def transition_matrix2(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """SECOND-order Markov transitions over per-user event streams — the
    path-level sibling of :func:`transition_matrix`: given the last TWO
    event types, what comes next? This is the table a journey simulator
    or bot screen needs when first-order memory is too blunt (view→click
    means something different after search than after purchase).

    Each user's events order by (ts, id) — the module's shared
    deterministic ordering contract — via TWO lags over the SAME window
    (one Exchange, one Sort); a user's first two events contribute
    nothing. ``prob_micro`` row-normalizes over the (prev2, prev1)
    context's outgoing mass (non-negative ``DIV`` == DuckDB ``//``).

    Scale shape: the one per-user window, then an aggregate on the
    ≤ |types|³ path grid; the normalizer joins the |types|²-row marginal
    built FROM the grid — never a second pass over the corpus.

    Output: (prev2_type, prev_type, next_type, n, prob_micro) ordered by
    the three types — grid-bounded, driver-readable.
    """
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    ty = F.coalesce(F.col(type_col), F.lit(""))
    paths = (
        events.select(
            F.lag(ty, 2).over(w).alias("prev2_type"),
            F.lag(ty, 1).over(w).alias("prev_type"),
            ty.alias("next_type"),
        )
        .where(F.col("prev2_type").isNotNull())
    )
    grid = paths.groupBy("prev2_type", "prev_type", "next_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    marg = grid.groupBy("prev2_type", "prev_type").agg(
        F.sum("n").cast("long").alias("out_mass")
    )
    return (
        grid.join(marg, ["prev2_type", "prev_type"])
        .select(
            "prev2_type",
            "prev_type",
            "next_type",
            "n",
            F.expr("(n * 1000000L) DIV out_mass").cast("long").alias(
                "prob_micro"
            ),
        )
        .orderBy("prev2_type", "prev_type", "next_type")
    )


def rfm_segments(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """RFM (recency / frequency / monetary) segmentation grid over an
    event stream — the standard behavioral cut an activity-weighted
    sampling policy starts from (which user segments produce the
    high-value interaction logs worth keeping?).

    Bucket rules are FIXED (deterministic, corpus-independent — never
    per-corpus quantiles, which would need a corpus-sized rank window):
    recency buckets the day gap to the corpus max event time at
    0/1/7/30-day edges; frequency is floor-log2 of the event count (the
    shared LENGTH(BIN(n))-1 idiom); monetary is floor-log2 of the
    accumulated MILLI-value (per-event ``CAST(value*1000 AS LONG)`` —
    truncation toward zero, the q168 portable float->int path; sums of
    longs are exact and order-free).

    Scale shape: ONE hash aggregate to users (map-side combined), the
    1-row corpus max broadcast back (never a corpus window), ONE rollup
    to the <= 5x64x64 segment grid.

    Output: (r_bucket, f_bucket, m_bucket, n_users, sum_events,
    sum_value_milli) ordered by the three buckets.
    """
    return rfm_from_state(
        rfm_user_state(events, user_col, ts_col, value_col)
    )


def rfm_user_state(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """The per-user (u, last_us, n_events, value_milli) sufficient
    statistics of :func:`rfm_segments` — ALGEBRAIC per user (max / sum /
    sum merge across shards and micro-batches), so it doubles as the
    streaming twin's partial (``streaming/sessions.stream_rfm``)."""
    tus = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return events.groupBy(F.col(user_col).alias("u")).agg(
        F.max(tus).cast("long").alias("last_us"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(
            (
                F.col(value_col).cast("double")
                * F.lit(1000).cast("double")
            ).cast("long")
        )
        .cast("long")
        .alias("value_milli"),
    )


def rfm_from_state(per_user: DataFrame) -> DataFrame:
    """The state→grid stage of :func:`rfm_segments`, SHARED with the
    streaming twin (the isotropy_from_grid contract): fixed bucket
    rules applied to a batch-built or incrementally merged per-user
    state table — stream == batch row-for-row."""
    ref = per_user.agg(F.max("last_us").cast("long").alias("ref_us"))
    day_us = 86_400_000_000
    seg = (
        per_user.crossJoin(F.broadcast(ref))
        .select(
            F.expr(f"(ref_us - last_us) DIV {day_us}L")
            .cast("long")
            .alias("r_days"),
            "n_events",
            F.greatest(F.col("value_milli"), F.lit(0).cast("long")).alias(
                "vm"
            ),
        )
        .select(
            F.when(F.col("r_days") <= 0, F.lit(0))
            .when(F.col("r_days") <= 1, F.lit(1))
            .when(F.col("r_days") <= 7, F.lit(2))
            .when(F.col("r_days") <= 30, F.lit(3))
            .otherwise(F.lit(4))
            .cast("long")
            .alias("r_bucket"),
            (F.length(F.bin(F.col("n_events"))) - 1)
            .cast("long")
            .alias("f_bucket"),
            (F.length(F.bin(F.col("vm"))) - 1).cast("long").alias("m_bucket"),
            "n_events",
            "vm",
        )
    )
    return (
        seg.groupBy("r_bucket", "f_bucket", "m_bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("n_events").cast("long").alias("sum_events"),
            F.sum("vm").cast("long").alias("sum_value_milli"),
        )
        .orderBy("r_bucket", "f_bucket", "m_bucket")
    )


def stickiness(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_days: int = 30,
) -> DataFrame:
    """DAU/MAU stickiness per period — the engagement-depth ratio
    (average daily actives over period actives) that separates a corpus
    of habitual users from drive-by traffic before activity-weighted
    sampling trusts per-user signals.

    INTEGER-exact: ``day = epoch_us DIV day_us`` and ``period = day DIV
    period_days`` (non-negative epochs, DIV == //); ``stickiness_micro
    = sum_dau * 10^6 DIV (n_active_days * pau)`` where sum_dau counts
    distinct (day, user) pairs in the period — so the ratio is the
    exact mean DAU over ACTIVE days against period actives.

    Scale shape: ONE distinct aggregate to the (period, day, user)
    grain (the only corpus-sized exchange), then two grid rollups from
    it — per-(period,day) counts and per-period distinct users — joined
    on the tiny period grid (broadcast).

    Output: (period, n_active_days, sum_dau, pau, stickiness_micro)
    ordered by period.
    """
    day_us = 86_400_000_000
    triple = events.select(
        F.expr(
            f"unix_micros(CAST({ts_col} AS TIMESTAMP)) DIV {day_us}L"
        )
        .cast("long")
        .alias("day"),
        F.col(user_col).alias("u"),
    ).distinct()
    triple = triple.select(
        F.expr(f"day DIV {int(period_days)}L").cast("long").alias("period"),
        "day",
        "u",
    )
    daily = triple.groupBy("period", "day").agg(
        F.count(F.lit(1)).cast("long").alias("dau")
    )
    per_period = daily.groupBy("period").agg(
        F.count(F.lit(1)).cast("long").alias("n_active_days"),
        F.sum("dau").cast("long").alias("sum_dau"),
    )
    pau = triple.groupBy("period").agg(
        F.count_distinct(F.col("u")).cast("long").alias("pau")
    )
    return (
        per_period.join(F.broadcast(pau), "period")
        .select(
            "period",
            "n_active_days",
            "sum_dau",
            "pau",
            F.expr(
                "(sum_dau * 1000000L) DIV greatest(n_active_days * pau, 1L)"
            )
            .cast("long")
            .alias("stickiness_micro"),
        )
        .orderBy("period")
    )


def daily_autocorr(
    events: DataFrame, max_lag: int = 7, ts_col: str = "ts"
) -> DataFrame:
    """Lag-k autocorrelation of the daily event count series — the
    seasonality / trend-persistence probe on an event stream (is
    yesterday's volume predictive of today's? is there a weekly cycle?)
    that complements the burst detector (q183: local anomalies) and the
    gap histogram (q177: inter-arrival micro-structure).

    Cross-engine contract: the daily series and all five pair moments
    (n, Σx, Σy, Σx², Σy², Σxy) are EXACT BIGINT aggregates over the
    lag-joined day grid; Pearson r is then ONE fixed-order double
    expression — ``num / (sqrt(vx) · sqrt(vy))`` with num = n·Σxy−Σx·Σy
    (may be negative: surfaced, never DIV'd) and vx, vy >= 0 by
    Cauchy-Schwarz.  IEEE sqrt / * / / are correctly rounded, so
    identical BIGINT inputs give bit-identical doubles on both engines
    (the q241 contract this op names); ROUND(·,6) + the +0.0 guard.

    Overflow: n_days·Σx² <= (n_days·cmax)², so n_days·cmax must stay
    <= ~3e9 (e.g. 10 years × 8e5 events/day).  Past that, pre-scale
    counts ``c DIV 2^k`` on both engines — the bucketed series is the
    documented estimator.

    Scale shape: ONE hash aggregate events→days (map-side combined; the
    only corpus-sized exchange), a ×max_lag explode fan ON THE DAY GRID,
    one grid self-join on day+lag, one |lags|-row rollup.

    Output: (lag, n_pairs, r) ordered by lag; r NULL when either side
    is constant (zero variance).
    """
    return daily_autocorr_from_grid(
        daily_counts(events, ts_col), max_lag
    )


def daily_counts(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    '''The (day, c) daily event-count grid shared by
    :func:`daily_autocorr` and :func:`mann_kendall_daily` - ALGEBRAIC
    (counts add across shards / micro-batches), so it doubles as the
    streaming twin partial (``streaming/sessions.stream_daily``).'''
    return (
        events.select(
            F.expr(
                f"unix_micros(CAST({ts_col} AS TIMESTAMP)) DIV 86400000000"
            ).alias("day")
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def daily_autocorr_from_grid(
    daily: DataFrame, max_lag: int = 7
) -> DataFrame:
    '''The grid-to-statistic stage of :func:`daily_autocorr`, SHARED
    with the streaming twin (the isotropy_from_grid contract).'''
    if int(max_lag) < 1:
        raise ValueError("max_lag must be >= 1")
    fan = daily.select(
        "day",
        F.col("c").alias("x"),
        F.explode(
            F.sequence(F.lit(1).cast("long"), F.lit(int(max_lag)).cast("long"))
        ).alias("lag"),
    )
    j = fan.join(
        daily.select(
            F.col("day").alias("day_y"), F.col("c").alias("y")
        ),
        fan["day"] + fan["lag"] == F.col("day_y"),
    )
    agg = j.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    num = (
        F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")
    ).cast("long")
    vx = (F.col("n_pairs") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "long"
    )
    vy = (F.col("n_pairs") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "long"
    )
    r = F.when(
        (vx > 0) & (vy > 0),
        F.round(
            num.cast("double")
            / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))),
            6,
        )
        + F.lit(0.0),
    )
    return agg.select(
        F.col("lag").cast("long").alias("lag"), "n_pairs", r.alias("r")
    ).orderBy("lag")


def event_assoc_rules(
    events: DataFrame,
    min_support: int = 2,
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Market-basket association rules over per-user event-type sets —
    support / confidence / lift for every directed type pair, the
    behavioral co-occurrence mining that complements the Markov
    transition matrix (q197: sequence order) with set co-presence
    (which behaviors live in the same users regardless of order?).

    All EXACT BIGINT: ``confidence_micro = n_both·10^6 DIV n_ante``,
    ``lift_milli = n_both·n_users·1000 DIV (n_ante·n_conseq)`` — every
    operand non-negative.  Overflow: n_both·n_users·1000 <=
    n_users²·1000 caps users at ~3e7; n_ante·n_conseq <= n_users² the
    same — past that, pre-scale all four counts by a shared 2^k
    (lift is ratio-invariant; documented estimator, same rule both
    engines).

    Scale shape: ONE distinct to the (user, type) grain (the only
    corpus-sized exchange), a per-user type self-join whose fan-out is
    bounded by |types|² per user (type domains are small and fixed —
    the grid-bounded family), one |types|²-row pair aggregate, two
    |types|-row grid joins, one 1-row user-count broadcast.

    Output: (ante, conseq, n_both, n_ante, n_conseq, n_users,
    confidence_micro, lift_milli) for pairs with n_both >=
    min_support, ordered by (ante, conseq).
    """
    ut = (
        events.select(
            F.col(user_col).alias("u"),
            F.col(type_col).cast("string").alias("t"),
        )
        .where(F.col("t").isNotNull())
        .distinct()
    )
    n = ut.agg(
        F.countDistinct("u").cast("long").alias("n_users")
    )
    s = ut.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("st"))
    pairs = (
        ut.alias("a")
        .join(ut.alias("b"), "u")
        .where(F.col("a.t") != F.col("b.t"))
        .groupBy(
            F.col("a.t").alias("ante"), F.col("b.t").alias("conseq")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
        .where(F.col("n_both") >= int(min_support))
    )
    out = (
        pairs.join(
            F.broadcast(s.select(F.col("t").alias("ante"), F.col("st").alias("n_ante"))),
            "ante",
        )
        .join(
            F.broadcast(
                s.select(F.col("t").alias("conseq"), F.col("st").alias("n_conseq"))
            ),
            "conseq",
        )
        .crossJoin(F.broadcast(n))
    )
    return out.select(
        "ante",
        "conseq",
        "n_both",
        "n_ante",
        "n_conseq",
        "n_users",
        F.expr("(n_both * 1000000L) DIV greatest(n_ante, 1L)")
        .cast("long")
        .alias("confidence_micro"),
        F.expr(
            "(n_both * n_users * 1000L)"
            " DIV greatest(n_ante * n_conseq, 1L)"
        )
        .cast("long")
        .alias("lift_milli"),
    ).orderBy("ante", "conseq")


def kaplan_meier_fold(
    cells: list[tuple[int, int, int]],
) -> list[tuple[int, int, int, int, int]]:
    """The sequential Kaplan-Meier product fold over the (dur, d_events,
    c_censored) duration grid — SHARED by the engine (applied to the
    collected grid) and the q252 oracle builder (interpolated as
    literals), the wav_frame_rms_values contract: one Python function is
    the single source of the fixed-point arithmetic.

    ``s_micro`` starts at 10^6 and steps ``s = s·(n_risk − d) DIV
    n_risk`` at each duration with d > 0 (ascending; all quantities
    non-negative, so DIV == // cross-engine by construction).  Returns
    [(dur, n_risk, d, c, s_micro_after)] ascending."""
    total = sum(d + c for _, d, c in cells)
    out = []
    s = 1_000_000
    at_risk = total
    for t, d, c in sorted(cells):
        if d > 0:
            s = s * (at_risk - d) // at_risk
        out.append((t, at_risk, d, c, s))
        at_risk -= d + c
    return out


def kaplan_meier(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    horizon_days: int = 64,
) -> DataFrame:
    """Kaplan-Meier survival curve of user lifetimes with right
    censoring — the churn statistic (q198) done properly: a user whose
    last event falls on the corpus's final observed day has NOT been
    seen to churn, so they leave the at-risk pool (censored) instead of
    counting as a death, and S(t) stays unbiased near the observation
    edge.

    Lifetime ``dur = min(last_day − first_day, horizon_days)`` (whole
    days via ``epoch_us DIV day`` — non-negative, DIV == //); event
    indicator = last_day < corpus max day.  The duration GRID (≤
    horizon_days+1 cells — domain-bounded, corpus-independent) is
    collected once and the shared :func:`kaplan_meier_fold` supplies
    ``s_micro`` as a literal map applied to the recomputed grid (the
    curriculum-offsets two-job shape; parquet min/max/count upstream is
    deterministic, satisfying the documented deterministic-input
    contract).  ``n_risk`` re-derives distributed via the grid-bounded
    cumulative window — the fold's at-risk arithmetic and the window
    agree by construction.

    Scale shape: ONE user-keyed hash aggregate (the only corpus-sized
    exchange), a 1-row max broadcast, ONE rollup to the duration grid,
    a grid-bounded window + literal-map projection.

    Output: (dur_days, n_risk, n_events, n_censored, s_micro) ordered
    by dur_days.
    """
    day_us = 86_400_000_000
    tus = F.unix_micros(F.col(ts_col).cast("timestamp"))
    per_user = events.groupBy(F.col(user_col).alias("u")).agg(
        F.min(tus).cast("long").alias("first_us"),
        F.max(tus).cast("long").alias("last_us"),
    )
    ref = per_user.agg(
        F.expr(f"max(last_us DIV {day_us}L)").cast("long").alias("m_day")
    )
    durs = per_user.crossJoin(F.broadcast(ref)).select(
        F.least(
            F.expr(f"last_us DIV {day_us}L - first_us DIV {day_us}L"),
            F.lit(int(horizon_days)).cast("long"),
        ).alias("dur"),
        (F.expr(f"last_us DIV {day_us}L") < F.col("m_day"))
        .cast("long")
        .alias("ev"),
    )
    grid = durs.groupBy("dur").agg(
        F.sum("ev").cast("long").alias("n_events"),
        (F.count(F.lit(1)) - F.sum("ev")).cast("long").alias("n_censored"),
    )
    cells = [
        (r["dur"], r["n_events"], r["n_censored"]) for r in grid.collect()
    ]
    folded = kaplan_meier_fold(cells)
    smap = F.create_map(
        *[
            x
            for t, _, _, _, s in folded
            for x in (F.lit(int(t)).cast("long"), F.lit(int(s)).cast("long"))
        ]
    )
    wrisk = (
        Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    )
    tot = sum(d + c for _, d, c in cells)
    return (
        grid.select(
            F.col("dur").alias("dur_days"),
            (
                F.lit(int(tot)).cast("long")
                - F.coalesce(
                    F.sum(
                        (F.col("n_events") + F.col("n_censored"))
                    ).over(wrisk),
                    F.lit(0).cast("long"),
                )
            ).alias("n_risk"),
            "n_events",
            "n_censored",
            smap[F.col("dur")].cast("long").alias("s_micro"),
        )
        .orderBy("dur_days")
    )


def mann_kendall_expr() -> str:
    """Mann-Kendall z expression TEXT over (s_stat, var18) BIGINTs —
    shared verbatim by Spark ``F.expr`` and the DuckDB oracle (the
    cohens_d_expr contract).  var18 = 18·Var(S) stays integer (the /18
    moves into the one double expression); the ∓1 continuity correction
    follows S's sign; degenerate grids (var18 <= 0) read 0e0."""
    z = (
        "SQRT(CAST(var18 AS DOUBLE) / CAST(18 AS DOUBLE))"
    )
    return (
        f"CASE WHEN var18 > 0 AND s_stat > 0"
        f" THEN ROUND(CAST(s_stat - 1 AS DOUBLE) / {z}, 6) + 0e0"
        f" WHEN var18 > 0 AND s_stat < 0"
        f" THEN ROUND(CAST(s_stat + 1 AS DOUBLE) / {z}, 6) + 0e0"
        f" ELSE 0e0 END"
    )


def mann_kendall_daily(
    events: DataFrame,
    ts_col: str = "ts",
) -> DataFrame:
    """Mann-Kendall non-parametric trend test on the daily event-count
    series — the robust companion to the OLS-flavored statistics
    (q241's autocorrelation family): S counts concordant minus
    discordant day pairs, so a single spike day can't fake a trend the
    way it drags a least-squares slope.

    EXACT BIGINT throughout the statistic: the pair sum runs on the
    day GRID's self-join (days² pairs — day-domain-bounded, the
    q194/q197 grid-bounded family, never a corpus self-join); the tie
    correction Σt(t−1)(2t+5) groups the grid by equal counts; var18 =
    n(n−1)(2n+5) − tie_sum keeps 18·Var(S) integer.  S may be negative
    — it is surfaced and double-divided only (shared
    :func:`mann_kendall_expr` text, continuity-corrected z).

    Output: ONE row — (n_days, s_stat, var18, z_mk).
    """
    return mann_kendall_from_grid(daily_counts(events, ts_col))


def mann_kendall_from_grid(daily: DataFrame) -> DataFrame:
    '''The grid-to-statistic stage of :func:`mann_kendall_daily` over
    a (day, c) grid, SHARED with the streaming twin.'''
    daily = daily.select(F.col("day").alias("d"), "c")
    a = daily.select(F.col("d").alias("d1"), F.col("c").alias("c1"))
    b = daily.select(F.col("d").alias("d2"), F.col("c").alias("c2"))
    s = (
        a.join(b, F.col("d1") < F.col("d2"))
        .agg(
            F.sum(
                F.when(F.col("c2") > F.col("c1"), F.lit(1))
                .when(F.col("c2") < F.col("c1"), F.lit(-1))
                .otherwise(F.lit(0))
            )
            .cast("long")
            .alias("s_stat")
        )
        .select(F.coalesce("s_stat", F.lit(0).cast("long")).alias("s_stat"))
    )
    ties = daily.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("tt"))
    t = ties.agg(
        F.sum("tt").cast("long").alias("n"),
        F.coalesce(
            F.sum(
                F.col("tt")
                * (F.col("tt") - F.lit(1))
                * (F.lit(2) * F.col("tt") + F.lit(5))
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("tie_sum"),
    ).select("n", "tie_sum")
    return (
        s.crossJoin(t)
        .select(
            F.col("n").alias("n_days"),
            "s_stat",
            (
                F.col("n")
                * (F.col("n") - F.lit(1))
                * (F.lit(2) * F.col("n") + F.lit(5))
                - F.col("tie_sum")
            )
            .cast("long")
            .alias("var18"),
        )
        .select(
            "n_days",
            "s_stat",
            "var18",
            F.expr(mann_kendall_expr()).alias("z_mk"),
        )
    )
