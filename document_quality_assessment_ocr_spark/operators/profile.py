"""Column-level table profiling — the data-quality monitor a lakehouse
runs on every ingested partition (null rates, distinct counts, extrema,
value lengths).

One pass, one row out per column: every statistic is computed in a SINGLE
`agg()` over the scan, then unpivoted to the long (column, stat...) form.
With ``approx_distinct=True`` every aggregate is algebraic/sketchable, so
the only data movement is the final single-row combine — no shuffle of
table rows at all; the exact-distinct default adds Spark's Expand-based
multi-distinct rewrite (one exchange of distinct values — audit-scale
only). The output feeds the checkpoint manifests as lineage metadata.

`approx_distinct=True` swaps exact `count_distinct` (a per-column shuffle
of distinct values) for HyperLogLog `approx_count_distinct` — at corpus
scale the exact form is only for audit runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    approx_distinct: bool = False,
) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df``.

    Output: one row per column — (column, n_rows, n_nulls, null_frac,
    n_distinct, min_str, max_str, avg_len) where min/max/len are computed
    on the string form so every column type profiles uniformly."""
    cols = columns or df.columns
    distinct = (
        F.approx_count_distinct if approx_distinct else F.count_distinct
    )
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        s = F.col(c).cast("string")
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(s).alias(f"{c}__min"),
            F.max(s).alias(f"{c}__max"),
            F.avg(F.length(s)).alias(f"{c}__avglen"),
        ]
    wide = df.agg(*aggs)
    entries = []
    for c in cols:
        entries.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                (
                    F.when(F.col("n_rows") == 0, F.lit(0.0)).otherwise(
                        F.col(f"{c}__nulls").cast("double")
                        / F.col("n_rows").cast("double")
                    )
                ).alias("null_frac"),
                F.col(f"{c}__distinct").cast("long").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_str"),
                F.col(f"{c}__max").alias("max_str"),
                F.col(f"{c}__avglen").alias("avg_len"),
            )
        )
    return wide.select(F.explode(F.array(*entries)).alias("p")).select("p.*")


def shard_checksums(
    docs: DataFrame,
    shard_width: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-shard content checksums — the data-integrity manifest an
    ingest publishes so any re-read, replica, or migration can verify a
    shard without comparing rows: shard = ``id DIV shard_width``,
    checksum = md5 of the shard's per-doc content digests concatenated
    in ``id_col`` order (ORDER-SENSITIVE by design: a reordered or
    substituted row changes the digest).

    Scale contract: the only per-shard state is the collect_list of
    32-char digests — bounded by ``shard_width``, the designer's knob
    (ONE md5 per doc rides the exchange, never document bytes). One
    hash aggregate, no window, no driver collect.

    Output: (shard, n_docs, checksum).
    """
    h = F.md5(F.coalesce(F.col(text_col), F.lit("")))
    item = F.struct(F.col(id_col).alias("i"), h.alias("h"))
    per = docs.groupBy(
        F.expr(f"{id_col} DIV {int(shard_width)}L").cast("long").alias("shard")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.md5(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(item)), lambda s: s["h"]
                ),
                "",
            )
        ).alias("checksum"),
    )
    return per.select("shard", "n_docs", "checksum")


def zone_map_audit(
    df: DataFrame,
    value_col: str,
    thresholds: list[int],
    id_col: str = "doc_id",
    bucket_size: int = 16,
) -> DataFrame:
    """Zone-map / file-skipping audit — the scan-planning statistic an
    Iceberg/parquet lakehouse evaluates from manifest column bounds: for
    each candidate predicate ``value_col >= T``, how many id-range buckets
    (stand-ins for files/row-groups in an id-clustered write) could be
    SKIPPED outright (``max < T``), and how many are FULLY selected
    (``min >= T`` — scanned without per-row filter evaluation). Quantifies
    whether the current layout serves the predicate class, before anyone
    pays for a re-cluster (`compaction.py` is the rewrite planner this
    feeds).

    INTEGER-exact throughout: bucket = ``id DIV bucket_size`` (ids
    non-negative — the DIV/floor cross-engine trap never applies),
    ``skip_micro = rows_skipped·10⁶ DIV rows_total``.

    Scale shape: ONE pass computes per-bucket (min, max, count) — the
    bucket key is monotone in the id, so a range-partitioned layout makes
    the aggregate effectively map-side; everything after lives on the
    bucket dimension (rows/bucket_size), fanned out over the threshold
    grid by an explode, never a join. Output: one row per threshold —
    (threshold, n_buckets, n_pruned, n_full, rows_total, rows_skipped,
    skip_micro), ordered by threshold.
    """
    stats = zone_map_grid(df, value_col, id_col, bucket_size)
    return zone_map_from_grid(stats, thresholds)


def zone_map_grid(
    df: DataFrame,
    value_col: str,
    id_col: str = "doc_id",
    bucket_size: int = 16,
) -> DataFrame:
    """The per-bucket (bucket, vmin, vmax, n) manifest statistics of
    :func:`zone_map_audit` — ALGEBRAIC (min/max/sum merge across shards
    and micro-batches), so it doubles as the streaming twin's partial
    (``streaming/drift.stream_zone_map``): exactly what an Iceberg
    writer accumulates into its manifest as data files land."""
    return (
        df.select(
            F.expr(f"{id_col} DIV {int(bucket_size)}").alias("bucket"),
            F.col(value_col).cast("long").alias("v"),
        )
        .groupBy("bucket")
        .agg(
            F.min("v").alias("vmin"),
            F.max("v").alias("vmax"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )


def zone_map_from_grid(
    stats: DataFrame, thresholds: list[int]
) -> DataFrame:
    """The grid→audit stage of :func:`zone_map_audit`, SHARED with the
    streaming twin (the isotropy_from_grid contract): threshold
    explode-fan + one rollup over a batch-built or incrementally merged
    bucket-stats grid — stream == batch row-for-row."""
    fanned = stats.withColumn(
        "threshold",
        F.explode(F.array(*[F.lit(int(t)).cast("long") for t in thresholds])),
    )
    return (
        fanned.groupBy("threshold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.sum((F.col("vmax") < F.col("threshold")).cast("long"))
            .cast("long")
            .alias("n_pruned"),
            F.sum((F.col("vmin") >= F.col("threshold")).cast("long"))
            .cast("long")
            .alias("n_full"),
            F.sum("n").cast("long").alias("rows_total"),
            F.sum(
                F.when(F.col("vmax") < F.col("threshold"), F.col("n")).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("rows_skipped"),
        )
        .withColumn(
            "skip_micro",
            F.expr("(rows_skipped * 1000000L) DIV greatest(rows_total, 1L)"),
        )
        .orderBy("threshold")
    )


def partition_skew_audit(
    df: DataFrame,
    key_col: str,
    partition_grid: tuple[int, ...] = (8, 32, 128),
) -> DataFrame:
    """Shuffle-skew audit for a candidate partitioning key — the
    pre-flight check before keying a 100 TB join/agg on a column: at each
    candidate partition count P, how unevenly would rows land? Surfaces
    the max-partition-over-ideal-mean ratio (the straggler multiplier:
    skew_micro = 2·10⁶ means the slowest task carries 2× its fair share),
    the empty-partition count (wasted parallelism when |keys| << P), and
    the single heaviest key's share (the part no repartitioning fixes —
    the signal that says "salt this key", feeding `salting.py`).

    Partition assignment is md5-nibble arithmetic (15 hex chars → 60-bit
    int, mod P) — NOT F.hash, so the DuckDB oracle reproduces placement
    byte-for-byte (the derive.py registry discipline). That also matches
    how a production run would bucket by a stable external hash rather
    than Spark's internal murmur (which varies by type and version).

    FIXED-POINT: ``skew_micro = (max_rows·P·10⁶) DIV rows_total``,
    ``top_key_micro = top_key_rows·10⁶ DIV rows_total`` — all operands
    non-negative int64.

    Scale shape: ONE groupBy(key) pass over the data (map-side combine
    shrinks to |keys| rows); everything after lives on the key dimension
    — the P-grid fans by explode (never a join), per-(P, pid) rollups and
    the final per-P aggregate are |keys|·|grid|-bounded. Output: one row
    per grid value — (p, n_keys, n_nonempty, rows_total, max_rows,
    top_key_rows, skew_micro, top_key_micro).
    """
    keys = (
        df.select(F.coalesce(F.col(key_col).cast("string"), F.lit("")).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    h60 = F.conv(F.substring(F.md5(F.col("k")), 1, 15), 16, 10).cast("long")
    fanned = keys.select(
        "k",
        "n",
        h60.alias("h"),
        F.explode(
            F.array(*[F.lit(int(p)).cast("long") for p in partition_grid])
        ).alias("p"),
    ).select("p", F.pmod(F.col("h"), F.col("p")).alias("pid"), "k", "n")
    parts = fanned.groupBy("p", "pid").agg(
        F.sum("n").cast("long").alias("rows"),
        F.count(F.lit(1)).cast("long").alias("nk"),
        F.max("n").cast("long").alias("mk"),
    )
    return (
        parts.groupBy("p")
        .agg(
            F.sum("nk").cast("long").alias("n_keys"),
            F.count(F.lit(1)).cast("long").alias("n_nonempty"),
            F.sum("rows").cast("long").alias("rows_total"),
            F.max("rows").cast("long").alias("max_rows"),
            F.max("mk").cast("long").alias("top_key_rows"),
        )
        .select(
            "p",
            "n_keys",
            "n_nonempty",
            "rows_total",
            "max_rows",
            "top_key_rows",
            F.expr("(max_rows * p * 1000000L) DIV greatest(rows_total, 1L)")
            .cast("long")
            .alias("skew_micro"),
            F.expr("(top_key_rows * 1000000L) DIV greatest(rows_total, 1L)")
            .cast("long")
            .alias("top_key_micro"),
        )
    )


def join_cardinality_audit(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    k: int = 20,
    fanout: int = 32,
) -> DataFrame:
    """Join-explosion pre-flight — the companion to
    :func:`partition_skew_audit`: BEFORE paying for a 100 TB equi-join,
    estimate its output cardinality exactly from per-key counts
    (|A ⋈ B| = Σ_key ca·cb) and name the keys that dominate it. A join
    whose est_total is 100× max(|A|, |B|) is an accidental
    many-to-many; the top contributing keys are the ones to pre-aggregate
    or salt.

    FIXED-POINT: ``amp_micro = est_total·10⁶ DIV max(|A|, |B|)`` and
    per-key ``share_micro = prod·10⁶ DIV est_total`` — all operands
    non-negative int64 (prod ≤ 10⁹·10⁹ keeps inside int64 for
    per-key counts under ~3·10⁹ each).

    Shape: one groupBy(key) per side (map-side combine → |keys| rows), a
    key-dimension full-outer merge, three broadcast 1-row totals, then
    the q13 two-level top-k merge for the heavy-key panel — no task ever
    sorts the whole key dimension, and the fact tables themselves never
    shuffle (only their count tables do).

    Output: top-k rows by (prod DESC, key ASC) — (key, ca, cb, prod,
    est_total, amp_micro, share_micro, rank). Keys on one side only
    (prod = 0) rank last and are usually truncated away by k.
    """
    ca = (
        left.select(F.coalesce(F.col(key_col).cast("string"), F.lit("")).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("ca"))
    )
    cb = (
        right.select(F.coalesce(F.col(key_col).cast("string"), F.lit("")).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("cb"))
    )
    m = (
        ca.join(cb, "k", "full_outer")
        .select(
            "k",
            F.coalesce("ca", F.lit(0)).cast("long").alias("ca"),
            F.coalesce("cb", F.lit(0)).cast("long").alias("cb"),
        )
        .withColumn("prod", (F.col("ca") * F.col("cb")).cast("long"))
    )
    tot = m.agg(
        F.sum("prod").cast("long").alias("est_total"),
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
    )
    item = F.struct(
        (-F.col("prod")).alias("np"),
        F.col("k").alias("k"),
        F.col("ca").alias("ca"),
        F.col("cb").alias("cb"),
        F.col("prod").alias("prod"),
    )
    topk = lambda c: F.slice(F.sort_array(F.collect_list(c)), 1, int(k))  # noqa: E731
    lvl1 = m.groupBy(
        F.pmod(F.hash("k"), F.lit(int(fanout))).alias("b")
    ).agg(topk(item).alias("top"))
    merged = (
        lvl1.select(F.explode("top").alias("t"))
        .groupBy()
        .agg(topk(F.col("t")).alias("top"))
        .select(F.posexplode("top").alias("i", "t"))
    )
    return merged.crossJoin(F.broadcast(tot)).select(
        F.col("t.k").alias("key"),
        F.col("t.ca").alias("ca"),
        F.col("t.cb").alias("cb"),
        F.col("t.prod").alias("prod"),
        "est_total",
        F.expr("(est_total * 1000000L) DIV greatest(greatest(na, nb), 1L)")
        .cast("long")
        .alias("amp_micro"),
        F.expr("(t.prod * 1000000L) DIV greatest(est_total, 1L)")
        .cast("long")
        .alias("share_micro"),
        (F.col("i") + 1).cast("int").alias("rank"),
    )


def encoding_advisor(
    df: DataFrame,
    cols: list[str],
) -> DataFrame:
    """Column-encoding planner — the write-path twin of
    :func:`zone_map_audit`: for each candidate column, estimate plain vs
    dictionary encoding size from one pass of value statistics and call
    the winner, the decision a parquet/Iceberg writer makes per
    column-chunk (`compaction.py` plans the file rewrite this informs).

    Estimates (integer bytes, character-length proxy for byte length —
    documented, exact for the ASCII metadata columns this audits):
    plain = Σ len(v); dict = Σ_distinct len(v) + (n·code_bits + 7) DIV 8
    with ``code_bits = ⌊log2(max(nd − 1, 1))⌋ + 1`` (the whole-bit BIN
    idiom — 1 bit for 2 values, 2 for 3-4, ...).

    Shape: per column ONE groupBy(value) count (Zipf-shrunk,
    map-side combined) + one 1-row rollup over the distinct-value
    table; the per-column rows union to a |cols|-row report. NULLs
    count as empty strings (the dictionary would hold the null marker).

    Output: one row per column — (column, n, n_distinct, plain_bytes,
    dict_bytes, winner, save_micro = saved·10⁶ DIV plain when dict wins,
    else 0).
    """
    reports = []
    for c in cols:
        vals = df.select(
            F.coalesce(F.col(c).cast("string"), F.lit("")).alias("v")
        ).groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        rep = vals.agg(
            F.sum("cnt").cast("long").alias("n"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.sum(F.length("v") * F.col("cnt")).cast("long").alias("plain_bytes"),
            F.sum(F.length("v")).cast("long").alias("dict_values_bytes"),
        ).select(
            F.lit(c).alias("column"),
            "n",
            "n_distinct",
            "plain_bytes",
            (
                F.col("dict_values_bytes")
                + F.expr(
                    "(n * (length(bin(greatest(n_distinct - 1, 1L))) - 1 + 1)"
                    " + 7) DIV 8"
                )
            )
            .cast("long")
            .alias("dict_bytes"),
        )
        reports.append(rep)
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.select(
        "column",
        "n",
        "n_distinct",
        "plain_bytes",
        "dict_bytes",
        F.when(F.col("dict_bytes") < F.col("plain_bytes"), F.lit("dict"))
        .otherwise(F.lit("plain"))
        .alias("winner"),
        F.expr(
            "CASE WHEN dict_bytes < plain_bytes THEN "
            "((plain_bytes - dict_bytes) * 1000000L) DIV greatest(plain_bytes, 1L) "
            "ELSE 0L END"
        )
        .cast("long")
        .alias("save_micro"),
    )


def field_consistency_audit(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    len_col: str = "n_chars",
) -> DataFrame:
    """Cross-field ingestion validator — does the denormalized length
    column still equal ``LENGTH(text)``? A mismatch means the upstream
    writer truncated text after computing metadata (or vice versa): the
    single most common silent corruption in multi-writer pipelines, and
    invisible to every content-level audit because each field looks
    plausible alone.

    NULL contract: NULL text counts in ``n_null_text`` and compares as
    length 0; a NULL length column is a mismatch unless the text is also
    NULL-ish (COALESCE(-1) forces it to disagree with any real length).

    Scale shape: one map-side projection + ONE aggregate keyed by
    source; micro rate after the sums.

    Output: (source, n_docs, n_null_text, n_mismatch, mismatch_micro)
    ordered by source.
    """
    t = F.col(text_col)
    tlen = F.length(F.coalesce(t, F.lit(""))).cast("long")
    mism = F.coalesce(F.col(len_col).cast("long"), F.lit(-1)) != tlen
    base = docs.select(
        F.coalesce(F.col(group_col), F.lit("")).alias("source"),
        t.isNull().cast("long").alias("_null_text"),
        mism.cast("long").alias("_mism"),
    )
    return (
        base.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_null_text").cast("long").alias("n_null_text"),
            F.sum("_mism").cast("long").alias("n_mismatch"),
        )
        .select(
            "source",
            "n_docs",
            "n_null_text",
            "n_mismatch",
            F.expr("(n_mismatch * 1000000L) DIV greatest(n_docs, 1L)")
            .cast("long")
            .alias("mismatch_micro"),
        )
        .orderBy("source")
    )


def span_integrity_audit(
    spans: DataFrame,
    doc_col: str = "doc_id",
    idx_col: str = "span_idx",
    off_col: str = "offset",
    len_col: str = "length",
) -> DataFrame:
    """Span-sequence integrity audit over an interleaved-document span
    table (the engine's own input shape — reference ``models.py`` span
    records): per document, how many consecutive span pairs start out of
    order, overlap the previous span's byte range, or leave a gap — the
    ingest validator that catches extractor bugs (double-emitted spans,
    unsorted writers, truncated offsets) BEFORE they become silent text
    corruption downstream.

    Per-pair flags against the previous span in ``idx_col`` order:
    ``out_of_order`` (offset moved backwards), ``overlap`` (starts before
    the previous span ends), ``gap`` (starts after it ends). A doc's
    single span contributes nothing. ``coverage_micro`` =
    ``span_mass·1e6 DIV max(extent, 1)`` — > 1e6 reads as overlap mass,
    < 1e6 as holes (non-negative DIV == DuckDB ``//``).

    Scale shape: ONE per-doc window ordered by span index (bounded by a
    doc's own span count — mega-docs are the operators/salting case) and
    ONE aggregate on the SAME key, so the window's exchange is reused by
    the aggregate; payload text never enters the plan. Per-doc output.

    Output: (doc_col, n_spans, n_out_of_order, n_overlaps, n_gaps,
    span_mass, extent, coverage_micro).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(doc_col).orderBy(F.col(idx_col).asc())
    off = F.col(off_col).cast("long")
    ln = F.col(len_col).cast("long")
    flagged = spans.select(
        F.col(doc_col),
        off.alias("_off"),
        ln.alias("_len"),
        F.lag(off).over(w).alias("_poff"),
        F.lag(off + ln).over(w).alias("_pend"),
    )
    return (
        flagged.groupBy(doc_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum((F.col("_off") < F.col("_poff")).cast("long"))
            .cast("long")
            .alias("n_out_of_order"),
            F.sum((F.col("_off") < F.col("_pend")).cast("long"))
            .cast("long")
            .alias("n_overlaps"),
            F.sum((F.col("_off") > F.col("_pend")).cast("long"))
            .cast("long")
            .alias("n_gaps"),
            F.sum("_len").cast("long").alias("span_mass"),
            (
                F.max(F.col("_off") + F.col("_len")) - F.min("_off")
            ).cast("long").alias("extent"),
        )
        .select(
            doc_col,
            "n_spans",
            F.coalesce("n_out_of_order", F.lit(0)).cast("long").alias(
                "n_out_of_order"
            ),
            F.coalesce("n_overlaps", F.lit(0)).cast("long").alias("n_overlaps"),
            F.coalesce("n_gaps", F.lit(0)).cast("long").alias("n_gaps"),
            "span_mass",
            "extent",
            F.expr(
                "(span_mass * 1000000L) DIV greatest(extent, 1L)"
            ).cast("long").alias("coverage_micro"),
        )
        .orderBy(doc_col)
    )


def concentration_profile(
    df: DataFrame,
    group_col: str = "lang",
    sub_col: str = "source",
) -> DataFrame:
    """Herfindahl–Hirschman concentration of each group's sub-population
    — the corpus-diversity audit that flags a language served by one
    dominant crawl source (a poisoning / monoculture risk a mixture
    design must see before weighting).

    Fixed-point contract: per-sub shares are ``(cnt·1e6) DIV n`` and the
    index is ``Σ share_micro² DIV 1e6`` — HHI *as defined here* on both
    engines (exact integers end-to-end; per-term DIV keeps every product
    ≤ 1e12 so a 10^12-row group never overflows BIGINT, unlike the naive
    ``Σcnt²·1e6 / n²`` form which overflows past ~3e6 rows).

    Output: (group_col, n_rows, n_subs, hhi_micro, top_sub,
    top_share_micro) ordered by group — hhi_micro 1e6 = monopoly,
    1e6/n_subs = uniform.

    At 100 TB: one hash aggregate to the |groups|×|subs| grid (map-side
    combine), then a grid-sized rollup — the q194/q197 family.
    """
    g = F.coalesce(F.col(group_col).cast("string"), F.lit("")).alias("g")
    s = F.coalesce(F.col(sub_col).cast("string"), F.lit("")).alias("s")
    grid = df.select(g, s).groupBy("g", "s").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    tot = grid.groupBy("g").agg(F.sum("cnt").cast("long").alias("n_rows"))
    shares = grid.join(tot, "g").select(
        "g",
        "s",
        "cnt",
        "n_rows",
        F.expr("(1000000 * cnt) DIV greatest(n_rows, 1)")
        .cast("long")
        .alias("share_micro"),
    )
    return (
        shares.groupBy("g", "n_rows")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_subs"),
            F.sum(F.expr("(share_micro * share_micro) DIV 1000000"))
            .cast("long")
            .alias("hhi_micro"),
            F.min(
                F.struct(
                    (-F.col("cnt")).alias("negc"),
                    F.col("s").alias("s"),
                    F.col("share_micro").alias("sm"),
                )
            ).alias("_w"),
        )
        .select(
            F.col("g").alias(group_col),
            "n_rows",
            "n_subs",
            "hhi_micro",
            F.col("_w.s").alias("top_sub"),
            F.col("_w.sm").cast("long").alias("top_share_micro"),
        )
        .orderBy(group_col)
    )


#: floor-rounded Benford first-digit expectations in micro units
#: (int(round(log10(1+1/d)·10⁶)) for d=1..9) — a SHARED data constant
#: interpolated into the q219 oracle SQL; never recompute per-engine.
BENFORD_MICRO = (301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757)


def benford_audit(
    df,
    value_col: str = "n_chars",
    group_col: str = "source",
):
    """Benford first-digit conformance audit of a positive numeric field
    per group — the classic fabricated/junk-data detector for scraped
    numeric columns (a source whose sizes/prices/counts are synthetic or
    truncated drifts from the log-uniform first-digit law).

    Every group emits ALL nine digit rows (zero-filled), each carrying
    the group's total ``n`` and the group-level total-variation distance
    ``tvd_micro = Σ_d |cnt_d·10⁶ − exp_d·n| DIV (2n)`` — integer-exact:
    the abs makes the numerator non-negative, n > 0 by the group filter,
    so Spark ``DIV`` == DuckDB ``//``. The expectations are the shared
    :data:`BENFORD_MICRO` literals. Overflow: ``cnt·10⁶`` caps any one
    digit cell at ~9.2e12 values — widen to milli past that.

    Leading digit = first character of the decimal rendering (values
    < 1 are excluded with the non-positives; identical CAST-to-string
    semantics for positive BIGINTs on both engines).

    Scale shape: ONE map-side-combined aggregate to the |groups|×9 grid,
    zero-fill via a |groups|×9 literal-range cross join ON THE GRID,
    tvd via a grid-partitioned window (q194 family). Output: (group_col,
    digit, cnt, share_micro, exp_micro, n, tvd_micro) ordered by
    (group, digit).
    """
    from pyspark.sql import Window

    v = F.col(value_col).cast("long")
    counted = (
        df.where(v >= 1)
        .select(
            F.coalesce(F.col(group_col).cast("string"), F.lit("")).alias("grp"),
            F.substring(v.cast("string"), 1, 1).cast("long").alias("digit"),
        )
        .groupBy("grp", "digit")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    groups = counted.select("grp").distinct()
    digits = F.explode(F.sequence(F.lit(1), F.lit(9))).alias("digit")
    full = groups.select("grp", digits).select(
        "grp", F.col("digit").cast("long").alias("digit")
    )
    grid = full.join(counted, ["grp", "digit"], "left").select(
        "grp", "digit", F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt")
    )
    exp_map = F.create_map(
        *[
            c
            for d, e in enumerate(BENFORD_MICRO, start=1)
            for c in (F.lit(d), F.lit(int(e)))
        ]
    )
    w = Window.partitionBy("grp")
    g2 = grid.select(
        "grp",
        "digit",
        "cnt",
        exp_map[F.col("digit").cast("int")].cast("long").alias("exp_micro"),
        F.sum("cnt").over(w).cast("long").alias("n"),
    )
    return (
        g2.select(
            F.col("grp").alias(group_col),
            "digit",
            "cnt",
            F.expr("(cnt * 1000000L) DIV n").cast("long").alias("share_micro"),
            "exp_micro",
            "n",
            F.sum(F.abs(F.col("cnt") * F.lit(1000000) - F.col("exp_micro") * F.col("n")))
            .over(w)
            .cast("long")
            .alias("_dev"),
        )
        .select(
            group_col,
            "digit",
            "cnt",
            "share_micro",
            "exp_micro",
            "n",
            F.expr("_dev DIV (2L * n)").cast("long").alias("tvd_micro"),
        )
        .orderBy(group_col, "digit")
    )


def zipf_fit(
    docs: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Zipf/power-law fit of the corpus token-frequency distribution —
    the one-look sanity check that a scraped corpus has natural-language
    frequency structure (boilerplate floods and template spam bend the
    log-log line; OCR noise fattens the hapax tail).

    Integer-exact cross-engine: token frequencies aggregate to a
    floor-log2 frequency-bucket histogram (``bucket = LENGTH(BIN(freq))
    − 1``, the shared q67/q176 idiom), ``log2_terms`` likewise buckets
    the per-bucket distinct-term count, and the least-squares slope over
    the ≤ ~40 (bucket, log2_terms) grid points is computed with BIGINT
    sums only: ``slope_milli = sign·(|k·Σxy − Σx·Σy|·1000 DIV (k·Σx² −
    (Σx)²))`` — sign split keeps every division non-negative (the
    DIV-vs-floor invariant; a healthy Zipf corpus has slope ≈ −1000
    milli per log2 bucket).

    Scale shape: one token-frequency aggregate (map-side combined), one
    rollup to the log2 grid, then GRID-bounded unpartitioned windows for
    the regression sums (the q218 grid-window rule: single-partition
    windows are fine on a ≤ 64-row grid, never on the corpus).

    Output: (bucket, n_terms, log2_terms, slope_milli) ordered by
    bucket; slope_milli repeats on every row (grid-bounded,
    driver-readable).
    """
    from pyspark.sql import Window

    from ..functions.text import WS_CLASS

    toks = docs.select(
        F.explode(
            F.filter(
                F.split(
                    F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))),
                    WS_CLASS + "+",
                ),
                lambda x: x != "",
            )
        ).alias("term")
    )
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("freq"))
    grid = (
        freq.select(
            (F.length(F.bin(F.col("freq"))) - 1).cast("long").alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_terms"))
        .select(
            "bucket",
            "n_terms",
            (F.length(F.bin(F.col("n_terms"))) - 1).cast("long").alias("log2_terms"),
        )
    )
    w = Window.partitionBy()
    g = grid.select(
        "bucket",
        "n_terms",
        "log2_terms",
        F.count(F.lit(1)).over(w).cast("long").alias("k"),
        F.sum("bucket").over(w).cast("long").alias("sx"),
        F.sum("log2_terms").over(w).cast("long").alias("sy"),
        F.sum(F.col("bucket") * F.col("log2_terms")).over(w).cast("long").alias("sxy"),
        F.sum(F.col("bucket") * F.col("bucket")).over(w).cast("long").alias("sxx"),
    )
    num = F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    mag = F.expr("(abs(k * sxy - sx * sy) * 1000L) DIV greatest(k * sxx - sx * sx, 1L)")
    return (
        g.select(
            "bucket",
            "n_terms",
            "log2_terms",
            F.when(num < 0, -mag).otherwise(mag).cast("long").alias("slope_milli"),
        )
        .orderBy("bucket")
    )


def chisq_independence(
    docs: DataFrame,
    row_col: str = "source",
    col_col: str = "lang",
) -> DataFrame:
    """Chi-square independence grid between two categorical columns —
    the mix monitor that catches a crawl whose language mix silently
    shifted per source (each cell's contribution pinpoints WHICH
    source×lang pair drives the drift; the statistic is their sum).

    Determinism: observed/marginal counts are exact BIGINTs; the one
    float step per cell is ``diff²/(r·c·n)`` with a FIXED op order —
    ``diff = o·n − r·c`` stays integer-exact (|diff| < 2^53 for corpora
    under ~9e6 rows per the o·n bound; docstring cap, widen to a
    two-stage split past it), the denominator ``(r·c)·n`` is computed as
    one exact BIGINT then cast, and the surfaced ``chi2_micro`` is
    TRUNCATED (CAST AS LONG == DuckDB CAST(TRUNC(·) AS BIGINT) — the
    q168 portable float→int path; the contribution is non-negative so
    truncation is well-defined).

    Scale shape: ONE map-side-combined aggregate to the |rows|×|cols|
    grid; marginals and the total are grid-partitioned windows (q194
    family — never a corpus window).

    Output: (row_col, col_col, o, r_total, c_total, n, expected_micro,
    chi2_micro) ordered by (row, col).
    """
    from pyspark.sql import Window

    r = F.coalesce(F.col(row_col).cast("string"), F.lit("")).alias("rv")
    c = F.coalesce(F.col(col_col).cast("string"), F.lit("")).alias("cv")
    grid = docs.select(r, c).groupBy("rv", "cv").agg(
        F.count(F.lit(1)).cast("long").alias("o")
    )
    g = grid.select(
        "rv",
        "cv",
        "o",
        F.sum("o").over(Window.partitionBy("rv")).cast("long").alias("r_total"),
        F.sum("o").over(Window.partitionBy("cv")).cast("long").alias("c_total"),
        F.sum("o").over(Window.partitionBy()).cast("long").alias("n"),
    )
    return (
        g.select(
            F.col("rv").alias(row_col),
            F.col("cv").alias(col_col),
            "o",
            "r_total",
            "c_total",
            "n",
            F.expr("(r_total * c_total * 1000000L) DIV n").cast("long").alias(
                "expected_micro"
            ),
            F.expr(
                "cast((cast(o * n - r_total * c_total as double)"
                " * cast(o * n - r_total * c_total as double))"
                " / cast(r_total * c_total * n as double)"
                " * cast(1000000 as double) as long)"
            ).alias("chi2_micro"),
        )
        .orderBy(row_col, col_col)
    )


def mad_outlier_audit(
    docs: DataFrame,
    value_col: str = "n_chars",
    group_col: str = "source",
    bin_width: int = 32,
    k_mad: int = 3,
) -> DataFrame:
    """Robust per-group outlier audit: binned median + MAD (median
    absolute deviation) over a numeric column, then the count of mass
    beyond ``median ± k·MAD`` — the screen that catches a source whose
    length distribution grew a second mode (truncation bugs, pasted
    boilerplate) without the mean/stddev fragility on heavy tails.

    Bin-resolution contract: median and MAD are reported in BIN units
    (``bin = value DIV bin_width``, non-negative values only — DIV ==
    ``//``), i.e. exact medians of the BINNED distribution: the smallest
    bin b with 2·cum(b) ≥ n (integer comparison, no float, no
    interpolation — deterministic cross-engine, unlike percentile
    functions whose interpolation rules differ).

    Scale shape: ONE aggregate to the |groups|×|bins| grid, a
    grid-partitioned cumulative window for the median, a grid
    re-aggregate keyed by |bin − median| for the MAD, and a final grid
    rollup — the corpus is touched exactly once.

    Output: (group_col, n, median_bin, mad_bin, n_outliers) ordered by
    group.
    """
    from pyspark.sql import Window

    v = F.col(value_col).cast("long")
    grid = (
        docs.where(v >= 0)
        .select(
            F.coalesce(F.col(group_col).cast("string"), F.lit("")).alias("grp"),
            F.expr(f"cast({value_col} as long) DIV {int(bin_width)}L").alias("bin"),
        )
        .groupBy("grp", "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    wg = Window.partitionBy("grp")
    wcum = wg.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    med = (
        grid.select(
            "grp",
            "bin",
            "cnt",
            F.sum("cnt").over(wg).cast("long").alias("n"),
            F.sum("cnt").over(wcum).cast("long").alias("cum"),
        )
        .where(F.expr("2L * cum >= n"))
        .groupBy("grp")
        .agg(F.min("bin").cast("long").alias("median_bin"), F.max("n").alias("n"))
    )
    dev = (
        grid.join(med, "grp")
        .select("grp", "n", F.abs(F.col("bin") - F.col("median_bin")).alias("dev"), "cnt")
        .groupBy("grp", "n", "dev")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    wdcum = wg.orderBy("dev").rowsBetween(Window.unboundedPreceding, 0)
    mad = (
        dev.select(
            "grp", "n", "dev", "cnt",
            F.sum("cnt").over(wdcum).cast("long").alias("cum"),
        )
        .where(F.expr("2L * cum >= n"))
        .groupBy("grp")
        .agg(F.min("dev").cast("long").alias("mad_bin"))
    )
    thr = med.join(mad, "grp")
    out = (
        grid.join(thr, "grp")
        .where(
            F.abs(F.col("bin") - F.col("median_bin"))
            > F.lit(int(k_mad)) * F.col("mad_bin")
        )
        .groupBy("grp")
        .agg(F.sum("cnt").cast("long").alias("n_outliers"))
    )
    return (
        thr.join(out, "grp", "left")
        .select(
            F.col("grp").alias(group_col),
            "n",
            "median_bin",
            "mad_bin",
            F.coalesce(F.col("n_outliers"), F.lit(0)).cast("long").alias("n_outliers"),
        )
        .orderBy(group_col)
    )


# Shared engine/oracle constant (Java regex ∩ RE2, the scrub.py contract):
# 4-digit years 1900-2099 on word boundaries; non-capturing group so both
# engines' "group 0 = full match" extraction sees the whole year.
YEAR_RE = r"\b(?:19|20)[0-9]{2}\b"


def year_coverage(
    docs: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Temporal coverage profile: extract every 4-digit year mention
    (1900–2099, word-bounded) from document text and roll up mentions
    per (group, year) with a within-group share — the recency audit a
    training-data curator reads before weighting sources (a corpus whose
    mass sits in 2009 teaches yesterday's world).

    The regex is the shared :data:`YEAR_RE` constant (interpolated into
    the oracle SQL — the scrub.py cross-engine contract: Java∩RE2
    syntax only). Every match counts, including repeats within one
    document (mention mass, not document coverage — pair with a
    DISTINCT doc variant when presence is the question).

    Scale shape: extract+explode is map-side; ONE aggregate to the
    |groups|×|years| grid (years bound at 200 by the pattern), share via
    a grid-partitioned window (q194 family).

    Output: (group_col, year, cnt, group_total, share_micro) ordered by
    (group, year).
    """
    from pyspark.sql import Window

    g = F.coalesce(F.col(group_col).cast("string"), F.lit("")).alias("grp")
    years = docs.select(
        g,
        F.explode(
            F.regexp_extract_all(
                F.coalesce(F.col(text_col), F.lit("")), F.lit(YEAR_RE), F.lit(0)
            )
        ).alias("ystr"),
    )
    grid = (
        years.select("grp", F.col("ystr").cast("long").alias("year"))
        .groupBy("grp", "year")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    w = Window.partitionBy("grp")
    return (
        grid.select(
            F.col("grp").alias(group_col),
            "year",
            "cnt",
            F.sum("cnt").over(w).cast("long").alias("group_total"),
        )
        .withColumn(
            "share_micro",
            F.expr("(cnt * 1000000L) DIV group_total").cast("long"),
        )
        .orderBy(group_col, "year")
    )


def gini_by_group(
    df: DataFrame,
    value_col: str = "n_chars",
    group_col: str = "source",
) -> DataFrame:
    """Gini concentration coefficient of a non-negative integer mass per
    group — the inequality lens on a corpus (is one source's token mass
    dominated by a handful of mega-documents?) that complements the HHI
    share view (q211) and the Pareto frontier (q224).

    INTEGER-exact via the VALUE-GRID rank trick: documents never get
    individual ranks.  Aggregate to the (group, value) grid first; a
    value cell with count ``c`` whose predecessors hold ``off`` rows
    contributes the consecutive ranks off+1..off+c, whose sum is
    ``c*off + c*(c+1)/2`` (always even product — exact DIV 2 on both
    engines).  Then ``gini_micro = (2*S1 - (n+1)*S0) * 10^6 DIV
    (n*S0)`` with S1 = sum(value*ranksum), S0 = sum(value*c) — the
    ascending-rank numerator is non-negative by the rearrangement
    inequality, keeping the DIV-vs-floor invariant.

    Overflow cap (q215/q202 class): S1 <= n^2 * vmax, and the surfaced
    product S1*2 plus the 10^6 scale needs n^2*vmax <= ~4.6e12 — with
    vmax ~ 1e6 chars that is n <= ~2e3 docs per group... so the micro
    scale is applied AFTER the division algebra: numerator
    (2*S1 - (n+1)*S0) <= n*S0 <= n^2*vmax, times 10^6 caps the per-group
    corpus at n*sqrt(vmax) ~ 9.2e12/1e6 => n^2*vmax <= 9.2e12, i.e.
    n <= 3e3 at vmax=1e6 or n <= 3e5 at vmax=1e2.  Past that, pre-scale
    values (value DIV 2^k) — Gini is scale-invariant, the bucketed
    statistic is the documented estimator (same rule both engines).

    Scale shape: ONE hash aggregate to the (group, value) grid
    (map-side combined), ONE grid-partitioned cumulative window
    (value-domain-bounded, never the corpus), ONE rollup to groups.

    Output: (group, n_docs, total_mass, gini_micro) ordered by group.
    """
    return gini_from_grid(value_grid(df, value_col, group_col), group_col)


def value_grid(
    df: DataFrame,
    value_col: str = "n_chars",
    group_col: str = "source",
) -> DataFrame:
    """The (g, v, c) value-count grid both inequality indices derive from
    — ALGEBRAIC (counts add across shards/batches), so it doubles as the
    streaming twin's state (``streaming/inequality.stream_value_grid``,
    the stream_daily one-state-many-reads shape)."""
    return (
        df.select(
            F.coalesce(F.col(group_col).cast("string"), F.lit("")).alias("g"),
            F.col(value_col).cast("long").alias("v"),
        )
        .where(F.col("v") >= 0)
        .groupBy("g", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def gini_from_grid(grid: DataFrame, group_col: str = "source") -> DataFrame:
    """:func:`gini_by_group`'s statistic stage over an existing (g, v, c)
    grid — the shared read for the batch operator AND the streaming
    state."""
    from pyspark.sql import Window

    woff = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cells = grid.select(
        "g",
        "v",
        "c",
        (F.sum("c").over(woff) - F.col("c")).cast("long").alias("off"),
    ).select(
        "g",
        "v",
        "c",
        F.expr("c * off + (c * (c + 1L)) DIV 2L").cast("long").alias(
            "ranksum"
        ),
    )
    agg = cells.groupBy("g").agg(
        F.sum("c").cast("long").alias("n_docs"),
        F.sum(F.col("v") * F.col("c")).cast("long").alias("total_mass"),
        F.sum(F.col("v") * F.col("ranksum")).cast("long").alias("s1"),
    )
    return agg.select(
        F.col("g").alias(group_col),
        "n_docs",
        "total_mass",
        F.expr(
            "((2L * s1 - (n_docs + 1L) * total_mass) * 1000000L)"
            " DIV greatest(n_docs * total_mass, 1L)"
        )
        .cast("long")
        .alias("gini_micro"),
    ).orderBy(group_col)


def winsorized_mean(
    df: DataFrame,
    value_col: str = "n_chars",
    group_col: str = "source",
    lo_pct: int = 10,
    hi_pct: int = 90,
) -> DataFrame:
    """Winsorized mean of a non-negative integer metric per group — the
    outlier-robust center that complements the MAD outlier flags (q223):
    clamp every value into the [p_lo, p_hi] band before averaging, so a
    handful of mega-documents can't drag a source's length profile.

    INTEGER-exact: thresholds come off the (group, value) grid cumsum —
    the percentile rank is ``r = (n*p + 99) // 100`` (ceil of n*p/100,
    non-negative) and the threshold is the smallest value whose
    cumulative count reaches r (a deterministic, engine-portable
    order statistic); the clamped mean is ``sum(clamp(v)·c) * 10^6 DIV
    n``.  Same overflow class as the Gini op: n·vmax·10^6 within BIGINT.

    Scale shape: ONE hash aggregate to the (group, value) grid, ONE
    grid-partitioned cumulative window, a |groups|-row threshold
    aggregate broadcast back onto the grid, ONE rollup.  Documents
    never shuffle past the grid.

    Output: (group, n_docs, lo, hi, winsorized_mass,
    winsorized_mean_micro) ordered by group.
    """
    from pyspark.sql import Window

    base = df.select(
        F.coalesce(F.col(group_col).cast("string"), F.lit("")).alias("g"),
        F.col(value_col).cast("long").alias("v"),
    ).where(F.col("v") >= 0)
    grid = base.groupBy("g", "v").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    wcum = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("g")
    cum = grid.select(
        "g",
        "v",
        "c",
        F.sum("c").over(wcum).cast("long").alias("cum_c"),
        F.sum("c").over(wtot).cast("long").alias("n"),
    )
    thr = cum.groupBy("g").agg(
        F.min(
            F.when(
                F.col("cum_c")
                >= F.expr(f"(n * {int(lo_pct)}L + 99L) DIV 100L"),
                F.col("v"),
            )
        )
        .cast("long")
        .alias("lo"),
        F.min(
            F.when(
                F.col("cum_c")
                >= F.expr(f"(n * {int(hi_pct)}L + 99L) DIV 100L"),
                F.col("v"),
            )
        )
        .cast("long")
        .alias("hi"),
    )
    clamped = cum.join(F.broadcast(thr), "g").select(
        "g",
        "n",
        (
            F.least(F.greatest(F.col("v"), F.col("lo")), F.col("hi"))
            * F.col("c")
        ).alias("wm"),
        "lo",
        "hi",
    )
    return (
        clamped.groupBy("g")
        .agg(
            F.max("n").cast("long").alias("n_docs"),
            F.max("lo").cast("long").alias("lo"),
            F.max("hi").cast("long").alias("hi"),
            F.sum("wm").cast("long").alias("winsorized_mass"),
        )
        .select(
            F.col("g").alias(group_col),
            "n_docs",
            "lo",
            "hi",
            "winsorized_mass",
            F.expr(
                "(winsorized_mass * 1000000L) DIV greatest(n_docs, 1L)"
            )
            .cast("long")
            .alias("winsorized_mean_micro"),
        )
        .orderBy(group_col)
    )


def hoover_by_group(
    df: DataFrame,
    value_col: str = "n_chars",
    group_col: str = "source",
) -> DataFrame:
    """Hoover (Robin Hood) index of a non-negative integer mass per group
    — the share of total mass that would have to move to equalize the
    distribution: ``H = Σ|x_i − μ| / (2·Σx_i)``. The log-free, fully
    INTEGER inequality companion to :func:`gini_by_group` (round 5):
    where Gini needs the value-grid RANK trick, Hoover needs only the
    grid itself — ``Σ|x−μ| = Σ_v c_v·|v·n − S| / n``, so

        hoover_micro = (Σ_v c_v·|v·n − S|) · 10⁶ DIV (2·n·S)

    with every term BIGINT, the numerator non-negative by construction
    (ABS — the DIV-vs-floor invariant holds), and no window at all: one
    hash aggregate to the (group, value) grid, a grid-keyed join of the
    per-group totals back onto the grid, one rollup. Overflow is the
    q230 cap class: c·|v·n − S| ≤ n²·vmax and the 10⁶ scale needs
    n²·vmax ≤ ~9.2e12 — pre-scale values (DIV 2^k; Hoover is
    scale-invariant) past that, same rule both engines.

    Output: (group, n_docs, total_mass, hoover_micro) ordered by group.
    """
    return hoover_from_grid(value_grid(df, value_col, group_col), group_col)


def hoover_from_grid(grid: DataFrame, group_col: str = "source") -> DataFrame:
    """:func:`hoover_by_group`'s statistic stage over an existing
    (g, v, c) grid — shared by batch and streaming state reads."""
    tot = grid.groupBy("g").agg(
        F.sum("c").cast("long").alias("n_docs"),
        F.sum(F.col("v") * F.col("c")).cast("long").alias("total_mass"),
    )
    j = grid.join(tot, "g")
    agg = j.groupBy("g").agg(
        F.first("n_docs").alias("n_docs"),
        F.first("total_mass").alias("total_mass"),
        F.sum(
            F.col("c")
            * F.abs(F.col("v") * F.col("n_docs") - F.col("total_mass"))
        ).cast("long").alias("t"),
    )
    return agg.select(
        F.col("g").alias(group_col),
        "n_docs",
        "total_mass",
        F.expr("(t * 1000000L) DIV GREATEST(2L * n_docs * total_mass, 1L)")
        .cast("long")
        .alias("hoover_micro"),
    ).orderBy(group_col)
