"""Streaming sketch maintenance — the incremental twin of
``operators/sketches``: every sketch in that module (HLL registers,
Count-Min cells, Bloom words) is an ALGEBRAIC aggregate (cell-wise
add / bitwise max / bit_or), so a continuously-ingesting corpus keeps
them fresh by MERGING each micro-batch's partial sketch into a persisted
state — never by recomputing over history.

``foreachBatch`` is the right tool (not a stateful operator): the state
is a tiny fixed-size table (≤ depth·width cells), each micro-batch's
contribution is one hash aggregate over just that batch, and the merge
is a unioned re-aggregate of two sketch-sized tables — versioned like
``plans/checkpoint`` snapshots so a crashed ingest resumes from the last
committed sketch. At 10¹²-doc scale the per-batch cost is the batch's
own token scan; history costs nothing.

The equality contract (proved by tests/test_streaming.py): after
consuming the whole input as a stream, the persisted sketch is
CELL-FOR-CELL equal to the batch operator's sketch over the same data —
the mergeability property the batch module claims, exercised end to end.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_STREAM_SCHEMA = "doc_id long, ts timestamp, text string"


def _versions(sketch_dir: str) -> list[int]:
    if not os.path.isdir(sketch_dir):
        return []
    return sorted(
        int(d[1:]) for d in os.listdir(sketch_dir)
        if d.startswith("v") and d[1:].isdigit()
    )


def _stream_tokens(batch: DataFrame, text_col: str) -> DataFrame:
    """Whitespace token stream of one micro-batch — shared by the CMS and
    HLL partials (same tokenization as operators/sketches' callers)."""
    return batch.select(
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))),
                        "[ \\t\\n\\r\\f\\x0b]+"),
                lambda x: x != F.lit(""),
            )
        ).alias("term")
    )


def _cms_partial(batch: DataFrame, text_col: str, width: int, depth: int) -> DataFrame:
    """One micro-batch's Count-Min contribution: (j, pos, c) cells from
    the whitespace token stream — the same md5-slice cells as
    operators/sketches.count_min_estimate."""
    toks = _stream_tokens(batch, text_col)
    h = F.md5(F.col("term"))
    cells = toks.select(
        F.posexplode(
            F.array(
                *[
                    F.pmod(
                        F.conv(F.substring(h, 1 + 8 * j, 8), 16, 10).cast("long"),
                        F.lit(width),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("j", "pos")
    )
    return cells.groupBy("j", "pos").agg(F.count(F.lit(1)).alias("c"))


def stream_count_min(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    sketch_dir: str,
    text_col: str = "text",
    width: int = 256,
    depth: int = 4,
):
    """readStream (doc_id, ts, text) → per-batch CMS partial → cell-wise
    merge into the persisted sketch at ``sketch_dir`` (versioned
    ``v{n}`` directories; highest version is current). availableNow;
    returns the StreamingQuery."""
    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def merge(batch: DataFrame, batch_id: int) -> None:
        # version = batch_id + 1, NOT "latest dir + 1" (the streaming/cdc
        # idempotence rule): batch ids are monotone from the checkpoint
        # and REUSED on replay, so a crashed-then-replayed batch merges
        # the same base (v{batch_id}) and overwrites the same target —
        # a latest-dir counter would double-count the replayed batch.
        vs = _versions(sketch_dir)
        ahead = [v for v in vs if v > batch_id + 1]
        if ahead:
            raise RuntimeError(
                f"sketch_dir {sketch_dir!r} already holds versions "
                f"{ahead} beyond v{batch_id + 1}: fresh checkpoint "
                "against old sketch history — reset checkpoint_dir and "
                "sketch_dir together (paired unit)."
            )
        part = _cms_partial(batch, text_col, width, depth)
        if batch_id > 0:
            prev = batch.sparkSession.read.parquet(
                os.path.join(sketch_dir, f"v{batch_id}")
            )
            part = (
                prev.unionByName(part)
                .groupBy("j", "pos")
                .agg(F.sum("c").cast("long").alias("c"))
            )
        part.write.mode("overwrite").parquet(
            os.path.join(sketch_dir, f"v{batch_id + 1}")
        )

    q = (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_hll(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    sketch_dir: str,
    text_col: str = "text",
):
    """Incremental HLL distinct-token maintenance: readStream → per-batch
    (reg, max_rho) partial over the whitespace token stream — the same
    md5 registers as operators/sketches.hll_register_rho — merged into
    the persisted registers with bitwise-max (HLL's defining algebraic
    merge). State is ≤ 256 rows regardless of history; versioning and
    replay idempotence follow stream_count_min exactly."""
    from ..operators.sketches import hll_register_rho

    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def merge(batch: DataFrame, batch_id: int) -> None:
        vs = _versions(sketch_dir)
        ahead = [v for v in vs if v > batch_id + 1]
        if ahead:
            raise RuntimeError(
                f"sketch_dir {sketch_dir!r} already holds versions "
                f"{ahead} beyond v{batch_id + 1}: fresh checkpoint "
                "against old sketch history — reset checkpoint_dir and "
                "sketch_dir together (paired unit)."
            )
        reg, rho = hll_register_rho(F.col("term"))
        part = (
            _stream_tokens(batch, text_col)
            .select(reg.alias("reg"), rho.alias("rho"))
            .groupBy("reg")
            .agg(F.max("rho").alias("max_rho"))
        )
        if batch_id > 0:
            prev = batch.sparkSession.read.parquet(
                os.path.join(sketch_dir, f"v{batch_id}")
            )
            part = (
                prev.unionByName(part)
                .groupBy("reg")
                .agg(F.max("max_rho").alias("max_rho"))
            )
        part.write.mode("overwrite").parquet(
            os.path.join(sketch_dir, f"v{batch_id + 1}")
        )

    q = (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_bloom(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    sketch_dir: str,
    text_col: str = "text",
    n_words: int = 64,
    k: int = 3,
):
    """Incremental Bloom-filter maintenance: per-batch word bitmap over the
    whitespace token stream — the same md5 bit positions as
    operators/bloom.bloom_build — merged into the persisted filter with
    bit_or (Bloom's defining algebraic merge). State is ≤ ``n_words``
    rows regardless of history; versioning and replay idempotence follow
    stream_count_min exactly. Completes the module contract: every sketch
    in operators/sketches+bloom (CMS cells, HLL registers, Bloom words)
    has an incremental twin."""
    from ..operators.bloom import bloom_build

    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def merge(batch: DataFrame, batch_id: int) -> None:
        vs = _versions(sketch_dir)
        ahead = [v for v in vs if v > batch_id + 1]
        if ahead:
            raise RuntimeError(
                f"sketch_dir {sketch_dir!r} already holds versions "
                f"{ahead} beyond v{batch_id + 1}: fresh checkpoint "
                "against old sketch history — reset checkpoint_dir and "
                "sketch_dir together (paired unit)."
            )
        part = bloom_build(
            _stream_tokens(batch, text_col), "term", n_words=n_words, k=k
        )
        if batch_id > 0:
            prev = batch.sparkSession.read.parquet(
                os.path.join(sketch_dir, f"v{batch_id}")
            )
            part = (
                prev.unionByName(part)
                .groupBy("word_idx")
                .agg(F.bit_or("bits").alias("bits"))
            )
        part.write.mode("overwrite").parquet(
            os.path.join(sketch_dir, f"v{batch_id + 1}")
        )

    q = (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def read_sketch(spark: SparkSession, sketch_dir: str) -> DataFrame:
    """Current (highest-version) persisted sketch."""
    vs = _versions(sketch_dir)
    if not vs:
        raise FileNotFoundError(f"no sketch versions in {sketch_dir}")
    return spark.read.parquet(os.path.join(sketch_dir, f"v{vs[-1]}"))


def _hist_partial(
    batch: DataFrame, value_expr: str, key_expr: str,
    lo: int, hi: int, n_bins: int,
) -> DataFrame:
    """One micro-batch's histogram contribution: (k, bin, c) cells binned
    by the SAME shared arithmetic as operators/sketches.histogram_quantiles
    (sketches.histogram_bin — the merge contract requires identical
    binning on every producer)."""
    from ..operators.sketches import histogram_bin

    return (
        batch.select(
            F.expr(key_expr).alias("k"),
            histogram_bin(F.expr(value_expr), lo, hi, n_bins).alias("bin"),
        )
        .groupBy("k", "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def stream_histogram(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    sketch_dir: str,
    value_expr: str = "length(text)",
    key_expr: str = "'doc_len'",
    lo: int = 0,
    hi: int = 4096,
    n_bins: int = 64,
):
    """Incremental fixed-grid histogram maintenance — the fourth algebraic
    sketch in the module, same foreachBatch merge shape as
    ``stream_count_min``: per-batch (k, bin, c) partial summed cell-wise
    into the persisted state (histograms merge by ADDING counts — the
    mergeability ``operators/sketches.histogram_quantiles`` claims,
    exercised incrementally). State is ≤ ``keys·n_bins`` rows regardless
    of history; quantile estimates read the persisted histogram at any
    time (the sketch IS the distribution monitor a curation run watches).
    Versioning and replay idempotence follow stream_count_min exactly."""
    stream = (
        spark.readStream.schema(DOC_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def merge(batch: DataFrame, batch_id: int) -> None:
        vs = _versions(sketch_dir)
        ahead = [v for v in vs if v > batch_id + 1]
        if ahead:
            raise RuntimeError(
                f"sketch_dir {sketch_dir!r} already holds versions "
                f"{ahead} beyond v{batch_id + 1}: fresh checkpoint "
                "against old sketch history — reset checkpoint_dir and "
                "sketch_dir together (paired unit)."
            )
        part = _hist_partial(batch, value_expr, key_expr, lo, hi, n_bins)
        if batch_id > 0:
            prev = batch.sparkSession.read.parquet(
                os.path.join(sketch_dir, f"v{batch_id}")
            )
            part = (
                prev.unionByName(part)
                .groupBy("k", "bin")
                .agg(F.sum("c").cast("long").alias("c"))
            )
        part.write.mode("overwrite").parquet(
            os.path.join(sketch_dir, f"v{batch_id + 1}")
        )

    q = (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
