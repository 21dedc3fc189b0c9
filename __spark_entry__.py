"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship extraction pipeline over a spans corpus derived
deterministically from /root/testdata/sf0.001/documents.parquet plus the
seeded payload catalog.

``queries()`` / ``oracle_sql()`` — SQL-expressible operators from SURVEY.md §2
run side-by-side against DuckDB on the sf_dir parquet views. Every aggregate /
computed column is aliased identically on both sides; float expressions use
the same operation order so IEEE results are bit-identical; money sums go
through decimal(18,2) to stay order-independent.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))  # cwd-independent

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"

# ASCII whitespace class — pinned on both engines (functions/text.py)
WS = "[ \\t\\n\\r\\f\\x0b]"


def _par(df: DataFrame) -> DataFrame:
    """Split an unsplittable scan: the sf tables are ONE parquet file with
    ONE row group, so the scan yields a single non-empty task and every
    heavy first-stage map (shingles/tokens/regex/vector math) runs on one
    core regardless of cluster size (guide §2.5 input skew). A round-robin
    repartition of the few-MB table immediately after the read unlocks full
    parallelism; scale-adaptive (defaultParallelism, never a constant) and
    skipped when the scan is already split at least that wide (real
    multi-file inputs). Width is judged by the leaf files' ROW-GROUP
    count (tables.effective_scan_parallelism) — the nominal split count
    over-reports on 1-row-group files whenever maxPartitionBytes or
    minPartitionNum carve empty splits (the driver bench conf does)."""
    from document_quality_assessment_ocr_spark.sources.tables import (
        effective_scan_parallelism,
    )

    n = df.sparkSession.sparkContext.defaultParallelism
    if effective_scan_parallelism(df) >= n:
        return df
    return df.repartition(n)


def _doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _par(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def _ensure_shipped(spark: SparkSession) -> None:
    """Make the package importable in THIS session's python workers even when
    the session was created elsewhere with a foreign cwd (driver smoke runs):
    ship the package zip via addPyFile — the runtime --py-files analog."""
    try:
        from document_quality_assessment_ocr_spark.session import _package_zip

        spark.sparkContext.addPyFile(_package_zip())
    except Exception:
        pass  # already added in this session, or running from the repo root


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: main-content extraction over interleaved text+media spans."""
    _ensure_shipped(spark)
    from document_quality_assessment_ocr_spark.plans.pipeline import run_extraction
    from document_quality_assessment_ocr_spark.sources.derive import (
        payloads_df,
        spans_from_documents,
    )

    from document_quality_assessment_ocr_spark.sources.fixtures import payload_names

    pay = payloads_df(spark)
    spans = spans_from_documents(_doc(spark, SF0001), sorted(payload_names()))
    return run_extraction(spans, pay, assume_unique_doc_ids=True)


# ---------------------------------------------------------------------------
# driver-checked queries (Spark impl + DuckDB oracle SQL)
# ---------------------------------------------------------------------------


def _q_text_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_quality_assessment_ocr_spark.functions.text import text_density, text_keep

    d = _doc(spark, sf_dir)
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        text_density(F.col("text")).alias("density"),
        text_keep(F.col("text")).alias("keep"),
    )


def _q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_quality_assessment_ocr_spark.functions.text import token_count

    d = _doc(spark, sf_dir)
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        token_count(F.col("text")).alias("n_tokens"),
    )


def _q_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_quality_assessment_ocr_spark.functions.text import fingerprint

    d = _doc(spark, sf_dir)
    return (
        d.select(fingerprint(F.col("text")).alias("fp"), F.col("doc_id").cast("long").alias("doc_id"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def _q_agg_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
            F.avg("l_quantity").alias("avg_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("decimal(28,2)").alias("sum_price"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def _q_verdict_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 verdict fold on SQL-computable per-doc scores: criteria in order
    (length required, density required, lang recommended) with required
    short-circuit (reference criteria.py:316-325)."""
    from document_quality_assessment_ocr_spark.functions.text import text_density

    d = _doc(spark, sf_dir)
    dens = text_density(F.col("text"))
    c0_fail = F.col("n_chars") < F.lit(50)
    c1_fail = ~((dens >= F.lit(1.0)) & (dens <= F.lit(80.0)))
    c2_fail = F.col("lang") != F.lit("en")  # recommended tier
    accepted = ~c0_fail & ~c1_fail
    reasons = F.when(c0_fail, F.array(F.lit("too short"))).otherwise(
        F.when(
            c1_fail,
            F.array(F.lit("density out of range")),
        ).otherwise(
            F.when(c2_fail, F.array(F.lit("non-english"))).otherwise(
                F.array().cast("array<string>")
            )
        )
    )
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        accepted.alias("accepted"),
        F.array_join(reasons, "|").alias("reasons"),
    )


def _q_dedup_last_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("event_id").cast("long").alias("last_event_id"),
            F.col("event_type").alias("last_type"),
        )
    )


def _q_reassembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 ordered reassembly, exploded form: rank of each event within its
    user stream (span order = offset rank analog)."""
    from pyspark.sql.window import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return ev.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        (F.row_number().over(w) - 1).alias("ord"),
    )


def _q_metrics_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 run-metrics rollup analog: counts per rejection reason."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(F.col("event_type").alias("reason"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("reason")
    )


def _q_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_quality_assessment_ocr_spark.operators.dedup import minhash_signatures

    return minhash_signatures(
        _doc(spark, sf_dir).select(F.col("doc_id").cast("long").alias("doc_id"), "text"),
        n_hashes=8,
    )


def _q_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_quality_assessment_ocr_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _doc(spark, sf_dir).select(F.col("doc_id").cast("long").alias("doc_id"), "text"),
        n_hashes=8,
        bands=4,
    )


def _q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_quality_assessment_ocr_spark.operators.dedup import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(
        _doc(spark, sf_dir).select(F.col("doc_id").cast("long").alias("doc_id"), "text"),
        ngram=5,
        threshold=0.05,
    )
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def _q_lsh_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale path for near-dup ranking: MinHash-LSH candidates → exact
    jaccard on those pairs only (no shingle self-join).

    Production tuning (round-3): WORD 5-gram shingles (~5-10× fewer md5s
    than char shingles — the family's dominant cost), 16 perms in 4 bands
    of 4 rows (s-curve midpoint ≈0.71, ≈88% recall at jaccard 0.8), and a
    0.8 verify threshold — the near-dup band RefinedWeb-class pipelines
    act on, instead of the r02 char/0.3 form whose candidate volume was a
    corpus property, not an operator cost."""
    from document_quality_assessment_ocr_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
    )

    d = _doc(spark, sf_dir).select(F.col("doc_id").cast("long").alias("doc_id"), "text")
    # one fused python pass: signatures + distinct shingle sets (r6)
    fused = minhash_signatures(
        d, n_hashes=16, shingle="word", with_gram_sets=True
    ).localCheckpoint()
    cand = minhash_lsh_pairs(
        d, n_hashes=16, bands=4, shingle="word", _sig=fused.drop("gs")
    )
    out = ngram_jaccard_pairs(
        d, ngram=5, threshold=0.8, candidates=cand, shingle="word",
        _sets=fused.select("doc_id", "gs"),
    )
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_quality_assessment_ocr_spark.operators.dedup import simhash64

    return simhash64(
        _doc(spark, sf_dir).select(F.col("doc_id").cast("long").alias("doc_id"), "text"),
        bits=32,
    )


def _q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_quality_assessment_ocr_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )

    emb = _par(spark.read.parquet(f"{sf_dir}/embeddings.parquet")).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    return cosine_topk_bruteforce(emb, probe_ids=[0, 1, 2, 3, 4], k=5)


def _q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_quality_assessment_ocr_spark.operators.textstats import doc_stats

    return doc_stats(
        _doc(spark, sf_dir).select(F.col("doc_id").cast("long").alias("doc_id"), "text")
    )


def _q_rolling_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_quality_assessment_ocr_spark.operators.textstats import (
        rolling_fingerprints,
    )

    return rolling_fingerprints(
        _doc(spark, sf_dir).select(F.col("doc_id").cast("long").alias("doc_id"), "text")
    )


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _par(spark.read.parquet(f"{sf_dir}/embeddings.parquet")).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )


def _q_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_quality_assessment_ocr_spark.operators.similarity import cosine_topk_lsh

    return cosine_topk_lsh(_emb(spark, sf_dir), probe_ids=[0, 1, 2], dim=64, k=5, n_planes=6)


def _q_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-ranking family beyond row_number: ntile(4) buckets and
    percent_rank of event values within each event_type (total order via the
    unique event_id tie-break, so both engines agree exactly)."""
    from pyspark.sql.window import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    return ev.select(
        F.col("event_id").cast("long").alias("event_id"),
        "event_type",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
    )


def _q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate clusters: connected components over LSH pairs via
    iterative min-label propagation (driver convergence loop) — the oracle
    recomputes components with a recursive CTE."""
    from document_quality_assessment_ocr_spark.operators.dedup import duplicate_clusters

    return duplicate_clusters(
        _doc(spark, sf_dir).select(F.col("doc_id").cast("long").alias("doc_id"), "text"),
        n_hashes=8,
        bands=4,
    )


def _q_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH top-k: each probe also searches the Hamming-1 buckets
    of its first 2 plane bits (recall lever without more planes)."""
    from document_quality_assessment_ocr_spark.operators.similarity import cosine_topk_lsh

    return cosine_topk_lsh(
        _emb(spark, sf_dir), probe_ids=[0, 1, 2], dim=64, k=5, n_planes=6,
        multiprobe_bits=2,
    )


def _q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_quality_assessment_ocr_spark.operators.similarity import ivf_topk

    return ivf_topk(_emb(spark, sf_dir), probe_ids=[0, 1, 2], dim=64, k=5, n_centroids=8)


def _q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (asymmetric-distance scan over m=4 byte
    codes, ks=16 centroids per subspace): the memory-bounded scale path —
    corpus compressed ~64×, per-probe lookup tables broadcast, two-level
    top-k merge."""
    from document_quality_assessment_ocr_spark.operators.similarity import pq_topk

    return pq_topk(
        _emb(spark, sf_dir), probe_ids=[0, 1, 2], dim=64, k=5, m=4, ks=16
    )


def _q_extract_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship pipeline at sf_dir (rows-only driver check: image kernels are
    not SQL-expressible). Output flattened to scalar columns for hashing."""
    _ensure_shipped(spark)
    from document_quality_assessment_ocr_spark.plans.pipeline import run_extraction
    from document_quality_assessment_ocr_spark.sources.derive import (
        payloads_df,
        spans_from_documents,
    )

    from document_quality_assessment_ocr_spark.sources.fixtures import payload_names

    pay = payloads_df(spark)
    spans = spans_from_documents(_doc(spark, sf_dir), sorted(payload_names()))
    res = run_extraction(spans, pay, assume_unique_doc_ids=True)
    return res.select(
        "doc_id",
        "accepted",
        F.array_join("reasons", "|").alias("reasons"),
        F.size("spans").alias("n_kept"),
    )


def _q_extract_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_shipped(spark)
    from document_quality_assessment_ocr_spark.plans.metrics import rejection_summary
    from document_quality_assessment_ocr_spark.plans.pipeline import run_extraction
    from document_quality_assessment_ocr_spark.sources.derive import (
        payloads_df,
        spans_from_documents,
    )

    from document_quality_assessment_ocr_spark.sources.fixtures import payload_names

    pay = payloads_df(spark)
    spans = spans_from_documents(_doc(spark, sf_dir), sorted(payload_names()))
    return rejection_summary(run_extraction(spans, pay, assume_unique_doc_ids=True))


def _q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_quality_assessment_ocr_spark.operators.similarity import (
        embedding_near_dups,
    )

    return embedding_near_dups(_emb(spark, sf_dir), dim=64, threshold=0.2)


def _q_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_quality_assessment_ocr_spark.plans.curation import curate_documents

    return curate_documents(
        _doc(spark, sf_dir).select(F.col("doc_id").cast("long").alias("doc_id"), "text")
    )


def _q_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_quality_assessment_ocr_spark.streaming.windows import (
        tumbling_counts_batch,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = tumbling_counts_batch(ev, "1 hour")
    return out.select(
        F.unix_timestamp("window_start").alias("hour_epoch"),
        "event_type",
        "n",
        "sum_value",
    )


def _q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (lang, source): per-group, per-lang, and grand totals."""
    d = _doc(spark, sf_dir)
    return (
        d.rollup("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.avg("n_chars").alias("avg_chars"),
        )
        .select(
            F.coalesce(F.col("lang"), F.lit("ALL")).alias("lang"),
            F.coalesce(F.col("source"), F.lit("ALL")).alias("source"),
            "n_docs",
            "total_chars",
            "avg_chars",
        )
    )


def _q_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-flavored: customer ⨝ orders ⨝ lineitem, revenue per order,
    top 20. Small dims broadcast; decimal revenue for engine-exact sums."""
    cu = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rev = (F.col("l_extendedprice").cast("decimal(18,2)") * (F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)"))).cast("decimal(28,4)")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(cu), o["o_custkey"] == cu["c_custkey"])
        .groupBy(F.col("l_orderkey").alias("orderkey"), F.col("c_mktsegment").alias("mktsegment"))
        # sum in decimal (order-independent), surface as DOUBLE: DuckDB
        # decimals materialize as float64 in the driver's compare, so a
        # Decimal-typed Spark column would hash-mismatch on representation
        .agg(F.sum(rev).cast("decimal(28,4)").cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("orderkey").asc())
        .limit(20)
    )


def _q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS: customers having at least one order above threshold."""
    cu = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    big = o.filter(F.col("o_totalprice") > 200000).select("o_custkey")
    return (
        cu.join(big, cu["c_custkey"] == big["o_custkey"], "left_semi")
        .select(F.col("c_custkey").cast("long").alias("c_custkey"), "c_mktsegment")
    )


def _q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS: parts never shipped in bulk (quantity > 45)."""
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    bulk = li.filter(F.col("l_quantity") > 45).select("l_partkey")
    return (
        p.join(bulk, p["p_partkey"] == bulk["l_partkey"], "left_anti")
        .select(F.col("p_partkey").cast("long").alias("p_partkey"), "p_brand")
    )


def _q_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish pre-tokenizer counts (task brief: 'token counting (whitespace
    + a BPE-ish regex)') — the regex half; q02 is the whitespace half."""
    from document_quality_assessment_ocr_spark.functions.text import token_count_bpe

    d = _doc(spark, sf_dir)
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        token_count_bpe(F.col("text")).alias("n_bpe_tokens"),
    )


def _q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets family beyond q24's ROLLUP: full CUBE over (lang,
    source) — adds the source-only marginal the rollup lacks."""
    d = _doc(spark, sf_dir)
    return (
        d.cube("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg("n_chars").alias("avg_chars"),
        )
        .select(
            F.coalesce(F.col("lang"), F.lit("ALL")).alias("lang"),
            F.coalesce(F.col("source"), F.lit("ALL")).alias("source"),
            "n_docs",
            "avg_chars",
        )
    )


def _q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from document_quality_assessment_ocr_spark.operators.sessions import sessionize

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return sessionize(ev, gap_seconds=1800)


def _q_batch_reattach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch skeleton fan-back-out (reference evaluator.py:132-139): every
    document appears in TWO batches (buckets doc_id%50 and (doc_id+1)%50), so
    duplicate documentIDs across batches must echo the SAME shared result,
    in input order. Exploded back to scalars for hashing."""
    from document_quality_assessment_ocr_spark.functions.text import text_density
    from document_quality_assessment_ocr_spark.sources.json_batches import (
        reattach_results,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("did"), "text", "n_chars"
    )
    m = d.select((F.col("did") % 50).alias("b"), F.lit(0).alias("role"), "did").unionAll(
        d.select(((F.col("did") + 1) % 50).alias("b"), F.lit(1).alias("role"), "did")
    )
    docs_arr = F.transform(
        F.sort_array(F.collect_list(F.struct(F.col("role"), F.col("did")))),
        lambda x: F.struct(x["did"].cast("string").alias("documentID")),
    )
    batches = m.groupBy("b").agg(docs_arr.alias("documents")).select(
        F.concat(F.lit("c"), F.col("b").cast("string")).alias("customerID"),
        F.concat(F.lit("t"), F.col("b").cast("string")).alias("transactionID"),
        "documents",
    )
    dens = text_density(F.col("text"))
    c0 = F.col("n_chars") < F.lit(50)
    c1 = ~((dens >= F.lit(1.0)) & (dens <= F.lit(80.0)))
    res = d.select(
        F.col("did").cast("string").alias("doc_id"),
        (~c0 & ~c1).alias("accepted"),
        F.when(c0, F.array(F.lit("too short")))
        .otherwise(
            F.when(c1, F.array(F.lit("density out of range"))).otherwise(
                F.array().cast("array<string>")
            )
        )
        .alias("reasons"),
        F.array().cast("array<string>").alias("warnings"),
    )
    out = reattach_results(batches, res)
    ex = out.select(
        "customerID", "transactionID", F.posexplode("documents").alias("pos", "d")
    )
    return ex.select(
        "customerID",
        "transactionID",
        "pos",
        F.col("d.documentID").alias("documentID"),
        F.col("d.isAccepted").alias("accepted"),
        F.array_join("d.reasons", "|").alias("reasons"),
    )


def _q_main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_shipped(spark)
    from document_quality_assessment_ocr_spark.plans.pipeline import (
        assemble_main_content,
        run_extraction,
    )
    from document_quality_assessment_ocr_spark.sources.derive import (
        payloads_df,
        spans_from_documents,
    )

    from document_quality_assessment_ocr_spark.sources.fixtures import payload_names

    pay = payloads_df(spark)
    spans = spans_from_documents(_doc(spark, sf_dir), sorted(payload_names()))
    return assemble_main_content(run_extraction(spans, pay, assume_unique_doc_ids=True))


def _q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: duplicate-line stats (columnar) +
    most-frequent word 2-gram + duplicated-gram char fraction."""
    from document_quality_assessment_ocr_spark.operators.quality import repetition_report

    return repetition_report(
        _doc(spark, sf_dir).select(F.col("doc_id").cast("long").alias("doc_id"), "text"),
        n=2,
    )


def _q_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs sharing a word 5-gram with
    the (deterministic doc_id % 89 == 0) eval slice; eval shingles broadcast."""
    from document_quality_assessment_ocr_spark.operators.decontam import (
        contamination_report,
    )

    docs = _doc(spark, sf_dir).select(F.col("doc_id").cast("long").alias("doc_id"), "text")
    eval_set = docs.where(F.col("doc_id") % 89 == 0)
    train = docs.where(F.col("doc_id") % 89 != 0)
    return contamination_report(train, eval_set, n=5)


def _q_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog (md5 registers, m=256) distinct users per
    event_type — audit mode carries the exact count so sketch accuracy is
    itself oracle-checked."""
    from document_quality_assessment_ocr_spark.operators.sketches import hll_distinct

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", F.col("user_id").cast("long").alias("user_id")
    )
    return hll_distinct(ev, "event_type", "user_id", with_exact=True)


def _q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click enriched with the user's most recent purchase
    at-or-before it (union + ordered carry-forward window, one exchange).
    Purchases pre-deduped per (user, ts) by max event_id so the tie row is
    well-defined on both engines (DuckDB oracle uses native ASOF JOIN)."""
    from document_quality_assessment_ocr_spark.operators.asof import asof_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(F.col("user_id").cast("long").alias("user_id"), "ts")
        .agg(
            F.max(F.col("event_id").cast("long")).alias("event_id"),
            F.max_by("value", F.col("event_id").cast("long")).alias("value"),
        )
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        "ts",
    )
    joined = asof_join(clicks, purchases, "user_id", "ts", ["event_id", "value", "ts"])
    # parquet naive timestamps are TIMESTAMP_NTZ; the session runs UTC so the
    # cast is a pure reinterpretation (same convention as operators/sessions)
    tus = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    return joined.select(
        "event_id",
        "user_id",
        tus("ts").alias("ts_us"),
        F.col("asof_event_id").alias("purchase_event_id"),
        F.col("asof_value").alias("purchase_value"),
        (tus("ts") - tus("asof_ts")).alias("gap_us"),
    )


def _q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified down-sampling by language (md5-uniform
    threshold — reproducible, engine-portable, retry-stable)."""
    from document_quality_assessment_ocr_spark.operators.sampling import stratified_sample

    docs = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang"
    )
    return stratified_sample(
        docs,
        "lang",
        rates={"en": 0.5, "de": 0.75, "fr": 0.25, "es": 0.125, "zh": 1.0},
        default_rate=0.0625,
    )


def _q_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap (spam-host guard): ≤ 5 docs per source chosen
    by the deterministic md5-uniform — two-level top-k merge, no per-group
    window."""
    from document_quality_assessment_ocr_spark.operators.sampling import per_group_cap

    docs = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "source"
    )
    return per_group_cap(docs, "source", k=5)


def _q_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF-style top-3 terms per document (integer (tf desc, df asc,
    term) ranking — bit-exact cross-engine, no libm log)."""
    from document_quality_assessment_ocr_spark.operators.textstats import top_terms

    return top_terms(
        _doc(spark, sf_dir).select(F.col("doc_id").cast("long").alias("doc_id"), "text"),
        k=3,
    )


def _q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph/chunk-level exact dedup, first-occurrence-wins
    (RefinedWeb-style): 20-word chunks, winner per distinct chunk is an
    algebraic min-struct aggregate, survivors reassembled in doc order."""
    from document_quality_assessment_ocr_spark.operators.dedup import chunk_dedup

    return chunk_dedup(
        _doc(spark, sf_dir).select(F.col("doc_id").cast("long").alias("doc_id"), "text"),
        chunk_words=20,
    )


def _q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language n_chars percentiles from a mergeable fixed-grid
    histogram sketch (integer arithmetic only — bit-exact cross-engine)."""
    from document_quality_assessment_ocr_spark.operators.sketches import histogram_quantiles

    return histogram_quantiles(
        _doc(spark, sf_dir), "lang", "n_chars", lo=0, hi=1024, n_bins=64,
        percents=[50, 90, 99],
    )


def _q_bloom_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination with md5-Bloom pruning (m=2048 bits, k=3),
    instrumented per training doc: total shingles, Bloom candidates, exact
    matches — false-positive cost is (bloom_candidates − exact_matches).
    The bitmap (≤64 rows) broadcasts; the corpus side never shuffles."""
    from document_quality_assessment_ocr_spark.operators.bloom import (
        bloom_prefilter_contamination,
    )

    docs = _doc(spark, sf_dir).select(F.col("doc_id").cast("long").alias("doc_id"), "text")
    return bloom_prefilter_contamination(
        docs.where(F.col("doc_id") % 89 != 0),
        docs.where(F.col("doc_id") % 89 == 0),
        n=5, n_words=64, k=3,
    )


def _q_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count–Min sketch term-frequency estimates (width 256 × depth 4) for
    a fixed probe vocabulary, audit mode: exact counts ride along so the
    overestimate-only guarantee is itself oracle-checked."""
    from document_quality_assessment_ocr_spark.operators.quality import _words
    from document_quality_assessment_ocr_spark.operators.sketches import (
        count_min_estimate,
    )

    toks = _doc(spark, sf_dir).select(
        F.explode(_words(F.col("text"))).alias("term")
    )
    return count_min_estimate(
        toks, "term", probes=["table", "spark", "vector", "the", "zzz_absent"],
        width=256, depth=4, with_exact=True,
    )


def _q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-longest curation policy over the q31 near-dup clusters: one
    representative per cluster by (n_chars desc, doc_id asc) — algebraic
    min-struct argmax, no window."""
    from document_quality_assessment_ocr_spark.operators.dedup import (
        dedup_keep_best,
        duplicate_clusters,
    )

    docs = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "text",
        F.col("n_chars").cast("long").alias("n_chars"),
    )
    clusters = duplicate_clusters(docs.select("doc_id", "text"), n_hashes=8, bands=4)
    return dedup_keep_best(docs, clusters, score_col="n_chars")


def _q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss projection 64 → 8 dims: seeded Gaussian matrix
    as literal codegen expressions — zero shuffle, 8× memory/shuffle cut for
    downstream embedding ops."""
    from document_quality_assessment_ocr_spark.operators.similarity import (
        random_projection,
    )

    return random_projection(_emb(spark, sf_dir), dim=64, out_dim=8)


def _q_sq_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization audit: per-vector scale, deterministic
    floor(x/s+0.5) rounding, exact L2 reconstruction error."""
    from document_quality_assessment_ocr_spark.operators.similarity import sq_int8

    return sq_int8(_emb(spark, sf_dir))


def _q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing offsets: whitespace token counts →
    distributed two-level prefix sum (range buckets + bounded per-bucket
    window) → 512-token sequence assignment. The oracle's single global
    SUM OVER is exactly what the operator refuses to run at scale."""
    from document_quality_assessment_ocr_spark.functions.text import token_count
    from document_quality_assessment_ocr_spark.operators.packing import pack_offsets

    docs = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        token_count(F.col("text")).alias("n_tokens"),
    )
    return pack_offsets(docs, seq_len=512, n_buckets=16)


def _q_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped five-table join: region ⋈ nation ⋈ customer ⋈ orders
    ⋈ lineitem, revenue per nation. The dimension chain (region→nation) is
    explicitly broadcast; money goes through decimal(18,2) products so the
    sum is order-independent, surfaced as DOUBLE (q20 lesson)."""
    r = spark.read.parquet(f"{sf_dir}/region.parquet").where(
        F.col("r_name").isin("ASIA", "EUROPE")
    )
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)"))
    )
    dims = F.broadcast(
        n.join(r, n["n_regionkey"] == r["r_regionkey"]).select(
            "n_nationkey", "n_name", "r_name"
        )
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(dims, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(rev).cast("decimal(28,4)").cast("double").alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


def _q_pq_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase ANN: PQ ADC shortlist (k·4 from compressed codes) → exact
    cosine re-rank of the shortlist only — the corpus is read once through
    the code scan; raw vectors are fetched for O(k) rows per probe."""
    from document_quality_assessment_ocr_spark.operators.similarity import (
        pq_topk_refined,
    )

    return pq_topk_refined(
        _emb(spark, sf_dir), probe_ids=[0, 1, 2], dim=64, k=5,
        refine_factor=4, m=4, ks=16,
    )


def _q_tokenize_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary (top-500 by count, two-level merge — no global
    sort) + tokenize-to-ids against the broadcast vocab; one row per token
    position, OOV → -1."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        build_vocab,
        tokenize_to_ids,
    )

    docs = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return tokenize_to_ids(docs, build_vocab(docs, vocab_size=500))


def _q_length_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-efficient batching: 64-token length buckets, 16-doc batches
    in deterministic id order — pure integer arithmetic, bounded windows."""
    from document_quality_assessment_ocr_spark.functions.text import token_count
    from document_quality_assessment_ocr_spark.operators.packing import (
        length_bucketed_batches,
    )

    docs = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        token_count(F.col("text")).alias("n_tokens"),
    )
    return length_bucketed_batches(docs, batch_size=16, bucket_width=64)


def _q_deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible training-order shuffle: md5-keyed (shard, pos) — the
    retry-stable, windows-bounded replacement for ORDER BY rand()."""
    from document_quality_assessment_ocr_spark.operators.sampling import (
        deterministic_shuffle,
    )

    return deterministic_shuffle(
        _doc(spark, sf_dir).select(F.col("doc_id").cast("long").alias("doc_id")),
        n_shards=8,
    )


def _q_session_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-containment join: purchases attributed to the click-session
    whose [start, end] contains them — bucketed interval join (hour
    buckets), exact predicate re-applied after the bucket equi-join."""
    from document_quality_assessment_ocr_spark.operators.intervals import (
        interval_bucket_join,
    )
    from document_quality_assessment_ocr_spark.operators.sessions import sessionize

    pad = 7_200_000_000  # ±2 h attribution window around session activity
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sessions = sessionize(ev.where(F.col("event_type") == "click")).select(
        "user_id",
        "session_idx",
        (F.col("session_start_us") - pad).alias("w_start_us"),
        (F.col("session_end_us") + pad).alias("w_end_us"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    return interval_bucket_join(
        purchases, sessions, "user_id", "ts_us", "w_start_us", "w_end_us"
    ).select("event_id", "user_id", "ts_us", "session_idx", "w_start_us")


def _q_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered vector search: exact top-5 among vectors sharing
    the probe's label — pre-filter join, never post-filter (which can
    return < k)."""
    from document_quality_assessment_ocr_spark.operators.similarity import (
        cosine_topk_filtered,
    )

    emb = _par(spark.read.parquet(f"{sf_dir}/embeddings.parquet")).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        F.col("label").cast("int").alias("label"),
    )
    return cosine_topk_filtered(emb, probe_ids=[0, 1, 2], filter_col="label", k=5)


def _q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank (3 iterations, nano-rank integers) over the
    undirected LSH near-duplicate graph — an iterative numeric algorithm
    whose integer arithmetic makes it bit-exact oracle-checkable (float
    PR sums are order-dependent and could never hash-match)."""
    from document_quality_assessment_ocr_spark.operators.dedup import minhash_lsh_pairs
    from document_quality_assessment_ocr_spark.operators.graph import pagerank_fixed

    docs = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    pairs = minhash_lsh_pairs(docs, n_hashes=8, bands=4)
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    nodes = docs.select(F.col("doc_id").alias("id"))
    return pagerank_fixed(nodes, edges, iters=3).select(
        F.col("id").alias("doc_id"), "pr"
    )


def _q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed linear quality classifier (fastText-filter shape): seeded
    integer milli-unit weights folded into literal Columns, bucket = md5
    mod D, integer left-to-right gram fold — map-side only, zero shuffle.
    Oracle interpolates the SAME classifier_weights() vector."""
    from document_quality_assessment_ocr_spark.operators.classify import quality_score

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return quality_score(d, n_buckets=64, seed=7)


def _quality_classifier_sql() -> str:
    """DuckDB twin of operators/classify.quality_score — shared weight
    vector (classifier_weights) and gram/bucket arithmetic; integer fold
    keeps the sum order-independent-exact, division order (sum → /n →
    /1000) matches the engine."""
    from document_quality_assessment_ocr_spark.operators.classify import (
        classifier_weights,
    )

    w = classifier_weights(64, 7)
    wl = "[" + ", ".join(str(x) for x in w) + "]::BIGINT[]"
    bucket = f"CAST(CAST(('0x' || SUBSTR(MD5(g), 1, 15)) AS BIGINT) % 64 AS INT) + 1"
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                       TRIM(LOWER(COALESCE(text,''))), '{WS}+'),
                       x -> x <> '') AS tk
            FROM documents
        ), gr AS (
            SELECT doc_id,
                   tk || CASE WHEN LEN(tk) >= 2
                         THEN LIST_TRANSFORM(RANGE(1, LEN(tk)),
                              i -> tk[CAST(i AS INT)] || CHR(1)
                                   || tk[CAST(i AS INT) + 1])
                         ELSE []::VARCHAR[] END AS grams
            FROM d
        ), sc AS (
            SELECT doc_id, CAST(LEN(grams) AS BIGINT) AS n_grams,
                   CASE WHEN LEN(grams) > 0
                        THEN ROUND(CAST(0 + LIST_SUM(LIST_TRANSFORM(grams,
                                 g -> ({wl})[{bucket}])) AS DOUBLE)
                             / LEN(grams) / 1000.0, 6)
                        ELSE 0.0 END AS score
            FROM gr
        )
        SELECT doc_id, n_grams, score, score >= 0.0 AS keep FROM sc
    """


def _q_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visual near-duplicate pairs: REAL image work (PNG decode → 8×8
    average-hash) over the payload catalog via mapInPandas, joined to the
    derived per-document media picks; documents sharing a perceptual hash
    pair up (id_a < id_b). Undecodable payloads are error rows, excluded.
    The oracle embeds the same ahash64() values as literals (q90
    technique) — the multimodal decode path itself sits under the gate."""
    from document_quality_assessment_ocr_spark.operators.multimodal import image_ahash
    from document_quality_assessment_ocr_spark.sources.derive import (
        _md5_pick_index,
        payloads_df,
    )
    from document_quality_assessment_ocr_spark.sources.fixtures import payload_names

    names = sorted(payload_names())
    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|1"))).alias("_h1"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|2"))).alias("_h2"),
    )
    arr = F.array(*[F.lit(x) for x in names])
    picks = d.select(
        "doc_id",
        F.explode(
            F.array(
                F.element_at(arr, _md5_pick_index("_h1", len(names)) + 1),
                F.element_at(arr, _md5_pick_index("_h2", len(names)) + 1),
            )
        ).alias("media_ref"),
    )
    ph = image_ahash(payloads_df(spark)).where(F.col("phash").isNotNull())
    dp = (
        picks.join(F.broadcast(ph.select("media_ref", "phash")), "media_ref")
        .select("doc_id", "phash")
        .distinct()
    )
    a, b = dp.alias("a"), dp.alias("b")
    return a.join(
        b,
        (F.col("a.phash") == F.col("b.phash"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        F.col("a.phash").alias("phash"),
    )


def _q_audio_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame audio RMS over derived media picks: REAL stdlib-``wave``
    PCM decode (operators/multimodal.decode_audio — no codec library
    needed for WAV) over the seeded audio catalog via mapInPandas, joined
    to md5-nibble per-document picks (the q57 shape). Undecodable
    payloads emit no frames, so documents that picked the corrupt
    container contribute no rows for that pick. The oracle embeds
    per-frame RMS literals computed by the SAME wav_frame_rms_values the
    engine's UDF calls (q57 aHash-literal technique)."""
    from document_quality_assessment_ocr_spark.operators.multimodal import (
        audio_frame_rms,
    )
    from document_quality_assessment_ocr_spark.sources.derive import _md5_pick_index
    from document_quality_assessment_ocr_spark.sources.fixtures import (
        build_wav_payloads,
        wav_payload_names,
    )

    names = sorted(wav_payload_names())
    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|1"))).alias("_h1"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|2"))).alias("_h2"),
    )
    arr = F.array(*[F.lit(x) for x in names])
    picks = d.select(
        "doc_id",
        F.explode(
            F.array(
                F.element_at(arr, _md5_pick_index("_h1", len(names)) + 1),
                F.element_at(arr, _md5_pick_index("_h2", len(names)) + 1),
            )
        ).alias("media_ref"),
    ).distinct()
    cat = build_wav_payloads()
    pay = spark.createDataFrame(
        [(n, bytearray(cat[n])) for n in names], "media_ref string, png binary"
    )
    fr = audio_frame_rms(pay, frame=512, use_fake_decoder=False)
    return picks.join(F.broadcast(fr), "media_ref").select(
        "doc_id", "media_ref", "frame_idx", "rms"
    )


def _q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stride-sampled video frame stats over derived media picks: REAL Y4M
    (YUV4MPEG2) raw-planar decode (operators/multimodal.decode_video_frames
    — no codec library needed) over the seeded video catalog via
    mapInPandas, joined to md5-nibble per-document picks (salts 3/4; the
    q137 shape). The operator surfaces decoder failures as errors-as-data
    rows (tests/test_multimodal.py); the QUERY keeps the q137 convention —
    undecodable payloads contribute no rows, so numeric columns stay
    NULL-free (int-with-NULL materializes as float64 in BOTH pandas
    bridges, a dtype trap the driver compare flags). The oracle embeds
    per-frame (idx, w, h, mean_gray) literals computed by the SAME
    video_frame_stats_values the engine's UDF calls."""
    from document_quality_assessment_ocr_spark.operators.multimodal import (
        video_frame_sample,
    )
    from document_quality_assessment_ocr_spark.sources.derive import _md5_pick_index
    from document_quality_assessment_ocr_spark.sources.fixtures import (
        build_y4m_payloads,
        y4m_payload_names,
    )

    names = sorted(y4m_payload_names())
    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|3"))).alias("_h1"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|4"))).alias("_h2"),
    )
    arr = F.array(*[F.lit(x) for x in names])
    picks = d.select(
        "doc_id",
        F.explode(
            F.array(
                F.element_at(arr, _md5_pick_index("_h1", len(names)) + 1),
                F.element_at(arr, _md5_pick_index("_h2", len(names)) + 1),
            )
        ).alias("media_ref"),
    ).distinct()
    cat = build_y4m_payloads()
    pay = spark.createDataFrame(
        [(n, bytearray(cat[n])) for n in names], "media_ref string, png binary"
    )
    fr = video_frame_sample(
        pay, every_k=5, max_frames=8, use_container_double=False
    ).where(F.col("error").isNull())
    return picks.join(F.broadcast(fr), "media_ref").select(
        "doc_id", "media_ref", "frame_idx", "width", "height", "mean_gray"
    )


def _q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level profile of the documents table (nulls, distincts,
    extrema, lengths) — ONE aggregation pass, no row shuffle; the standard
    per-partition data-quality monitor."""
    from document_quality_assessment_ocr_spark.operators.profile import profile_table

    return profile_table(
        _doc(spark, sf_dir).select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "text", "lang", "source",
            F.col("n_chars").cast("long").alias("n_chars"),
        )
    )


def _q_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode/whitespace hygiene with audit counts. Zero-width + control
    characters are PLANTED deterministically (doc_id % 11) so the scrub has
    real work on the synthetic corpus; both engines plant identically."""
    from document_quality_assessment_ocr_spark.operators.scrub import normalize_text

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    planted = d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(F.coalesce("text", F.lit("")), F.lit(" x\u200b\x01y  tail")),
        ).otherwise(F.coalesce("text", F.lit(""))),
    )
    return normalize_text(planted)


def _q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction with per-kind counts. Emails/IPs/phones are PLANTED
    deterministically (doc_id % 7, id-derived values) on both engines."""
    from document_quality_assessment_ocr_spark.operators.scrub import scrub_pii

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    sid = F.col("doc_id").cast("string")
    planted = d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.coalesce("text", F.lit("")),
                F.lit(" contact u"), sid, F.lit("@example.com or +1415"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                F.lit(" at 10.0."), (F.col("doc_id") % 256).cast("string"),
                F.lit(".1"),
            ),
        ).otherwise(F.coalesce("text", F.lit(""))),
    )
    return scrub_pii(planted)


def _q_curation_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation composite v2 — operators chained over INTERMEDIATE outputs:
    chunk-level boilerplate strip → repetition filter on the cleaned text →
    Bloom-prefiltered decontamination of the cleaned text vs the eval slice.
    First matching reason wins (boilerplate → contaminated → repetition)."""
    from document_quality_assessment_ocr_spark.plans.curation import curate_documents_v2

    docs = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return curate_documents_v2(
        docs.where(F.col("doc_id") % 89 != 0),
        docs.where(F.col("doc_id") % 89 == 0),
    )


def _synth_html(d: DataFrame) -> DataFrame:
    """Deterministic HTML wrapping of documents.text — nav/footer chrome,
    a heading, paragraphs split on the literal ' data ', and (doc_id%4==0)
    a link-only promo block. The DuckDB oracle builds the IDENTICAL string
    (`_html_sqls`), so the block decomposition + classification is
    hash-gated end-to-end on real per-doc variety."""
    t = F.coalesce(F.col("text"), F.lit(""))
    promo = F.when(
        F.col("doc_id") % 4 == 0,
        F.concat(
            F.lit('<div><a href="/x">'), F.substring(t, 1, 40), F.lit("</a></div>")
        ),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</title><style>p{margin:0}</style><script>var x=1;</script></head><body>"),
        F.lit('<div class="nav"><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></div>'),
        F.lit("<h2>"),
        F.substring(t, 1, 30),
        F.lit(" &amp; more</h2><p>"),
        F.replace(t, F.lit(" data "), F.lit("</p><p>")),
        F.lit("</p>"),
        promo,
        F.lit('<p>See <a href="http://Ref'),
        (F.col("doc_id") % 3 + 1).cast("string"),
        F.lit(".example.net/r/"),
        (F.col("doc_id") % 20).cast("string"),
        F.lit('/">ref '),
        (F.col("doc_id") % 20).cast("string"),
        F.lit("</a></p>"),
        F.lit('<div class="footer">Copyright <a href="/p">Privacy</a> <a href="/t">Terms</a></div></body></html>'),
    )
    return d.select(F.col("doc_id").cast("long").alias("doc_id"), html.alias("html"))


def _q_html_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML boilerplate strip / DOM heuristics (north rule): block
    decomposition + jusText-style classification over synthesized HTML."""
    from document_quality_assessment_ocr_spark.operators.html import (
        classify_blocks,
        html_blocks,
    )

    return classify_blocks(html_blocks(_synth_html(_doc(spark, sf_dir))))


def _q_html_main(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Main-content assembly from classified HTML blocks."""
    from document_quality_assessment_ocr_spark.operators.html import extract_main_html

    return extract_main_html(_synth_html(_doc(spark, sf_dir)))


def _q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg table_changes analog (apply_changes' inverse): diff two
    derived snapshot versions — v_old = documents, v_new with a deleted
    slice (%7==0), an updated slice (%5==0, lang→'xx'), and an inserted
    slice (doc_id+10^6 clones of %11==0). ONE full-outer equi-join;
    unchanged rows drop. Oracle mirrors the derivation in SQL."""
    from document_quality_assessment_ocr_spark.operators.cdc import snapshot_diff

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang", "source"
    )
    did = F.col("doc_id")
    old = d
    kept = d.where(did % 7 != 0).select(
        did,
        F.when(did % 5 == 0, F.lit("xx")).otherwise(F.col("lang")).alias("lang"),
        "source",
    )
    ins = d.where(did % 11 == 0).select(
        (did + 1000000).alias("doc_id"), "lang", F.lit("clone").alias("source")
    )
    new = kept.unionByName(ins)
    return snapshot_diff(old, new)


def _q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc exact line dedup over a derived multi-line text (the sf
    documents are single-line, so lines are synthesized by splitting on
    sentence periods — deterministic, mirrored in the oracle)."""
    from document_quality_assessment_ocr_spark.operators.quality import (
        dedup_lines_within_doc,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.replace(
            F.coalesce(F.col("text"), F.lit("")), F.lit(". "), F.lit(".\n")
        ).alias("text"),
    )
    return dedup_lines_within_doc(d)


def _q_c4_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line rules over the same derived multi-line text."""
    from document_quality_assessment_ocr_spark.operators.quality import (
        c4_line_filter,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.replace(
            F.coalesce(F.col("text"), F.lit("")), F.lit(". "), F.lit(".\n")
        ).alias("text"),
    )
    return c4_line_filter(d)


def _q_gopher_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText document quality rules (Rae 2021 Table A1) over
    the documents table — one map-side projection, shared constants with
    the oracle."""
    from document_quality_assessment_ocr_spark.operators.quality import (
        gopher_quality_filter,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return gopher_quality_filter(d)


# q93 synthesis-twin constants: the sf documents are stopword-poor word
# salad (everything dies at the Gopher gate), so the v4 wrapper plants one
# branch per fate on doc_id%7 — template strings shared by the engine
# expression (_v4_synth) and the SQL CTE (_v4_synth_sql) so both engines
# build byte-identical text.
_V4_P0 = "the data of run "
_V4_P1 = " would have to be good and that is why we keep it number "
_V4_WORDS = ("one", "two", "three")
_V4_PII_A = " contact u"
_V4_PII_B = "@example.com or +14155550123 at 10.0.0.1 now."
_V4_C4 = " and the config is {x} ok."
_V4_ES_A = "el valor "
_V4_ES_B = " de los datos es una tabla y la fila es un grupo por que los datos son buenos."


def _v4_synth(ids) -> "Column":
    """Planted q93 text as a Column over ``doc_id`` (engine side of the
    synthesis twin — keep in lockstep with _v4_synth_sql)."""

    def good(idx):
        s = idx.cast("string")
        return F.concat_ws(
            " ",
            *[
                F.concat(F.lit(_V4_P0), s, F.lit(_V4_P1 + w + " here."))
                for w in _V4_WORDS
            ],
        )

    mod = ids % 7
    pii = F.concat(
        good(ids), F.lit(_V4_PII_A), ids.cast("string"), F.lit(_V4_PII_B)
    )
    es = F.concat(F.lit(_V4_ES_A), ids.cast("string"), F.lit(_V4_ES_B))
    return (
        F.when(mod == 1, good(ids))
        .when(mod == 2, good(ids - 1))
        .when(mod == 3, pii)
        .when(mod == 4, F.concat(good(ids), F.lit(_V4_C4)))
        .when(mod == 5, es)
        .otherwise(F.coalesce(F.col("text"), F.lit("")))
    )


def _v4_synth_sql() -> str:
    """DuckDB twin of _v4_synth (expression over ``documents``)."""

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    def good(idx: str) -> str:
        return " || ' ' || ".join(
            f"{q(_V4_P0)} || CAST({idx} AS VARCHAR) || {q(_V4_P1 + w + ' here.')}"
            for w in _V4_WORDS
        )

    i = "CAST(doc_id AS BIGINT)"
    return f"""CASE {i} % 7
            WHEN 1 THEN {good(i)}
            WHEN 2 THEN {good(i + " - 1")}
            WHEN 3 THEN {good(i)} || {q(_V4_PII_A)}
                 || CAST({i} AS VARCHAR) || {q(_V4_PII_B)}
            WHEN 4 THEN {good(i)} || {q(_V4_C4)}
            WHEN 5 THEN {q(_V4_ES_A)} || CAST({i} AS VARCHAR) || {q(_V4_ES_B)}
            ELSE COALESCE(text,'') END"""


def _q_curation_v4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation composite v4 — the FineWeb-shape recipe (language gate →
    Gopher rules → C4 line cleaning → MinHash word-shingle near-dup
    demotion of the clean text → PII scrub) over planted per-fate text
    (_v4_synth) with the q87/q88 multi-line derivation."""
    from document_quality_assessment_ocr_spark.plans.curation import (
        curate_documents_v4,
    )

    ids = F.col("doc_id").cast("long")
    d = _doc(spark, sf_dir).select(
        ids.alias("doc_id"),
        F.replace(_v4_synth(ids), F.lit(". "), F.lit(".\n")).alias("text"),
    )
    return curate_documents_v4(d)


def _q_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (Xie 2023): hashed word-bigram bucket
    counts over the corpus (one tiny-output agg) combine with seeded
    target pseudo-counts into fixed-point nano log-ratios, folded as a
    literal vector into a zero-shuffle integer scoring pass. The oracle
    computes the SAME raw counts in DuckDB at build time and embeds the
    SAME dsir_log_ratios_nano ints."""
    from document_quality_assessment_ocr_spark.operators.importance import (
        dsir_resample,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return dsir_resample(d, n_buckets=64, seed=11)


def _dsir_sql(n_buckets: int = 64, seed: int = 11, sf_dir: str | None = None) -> str:
    """DuckDB twin of operators/importance.dsir_resample — the raw bucket
    counts are computed HERE at SQL-build time with the same tokenize/
    bigram/bucket expressions the final query uses, then the shared
    dsir_log_ratios_nano/dsir_target_weights produce the literal int64
    vector both engines fold (oracle-literal technique)."""
    import duckdb

    from document_quality_assessment_ocr_spark.operators.importance import (
        dsir_log_ratios_nano,
        dsir_target_weights,
    )

    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    tk = (
        "LIST_FILTER(REGEXP_SPLIT_TO_ARRAY("
        f"TRIM(LOWER(COALESCE(text,''))), '{WS}+'), x -> x <> '')"
    )
    grams = (
        "CASE WHEN LEN(tk) >= 2 THEN LIST_TRANSFORM(RANGE(1, LEN(tk)), "
        "i -> tk[CAST(i AS INT)] || ' ' || tk[CAST(i AS INT) + 1]) "
        "ELSE []::VARCHAR[] END"
    )
    bucket0 = (
        f"CAST(CAST(('0x' || SUBSTR(MD5(g), 1, 15)) AS BIGINT) % {n_buckets} AS INT)"
    )
    con = duckdb.connect()
    rows = con.execute(
        f"""SELECT {bucket0} AS b, COUNT(*) AS c
            FROM (SELECT UNNEST(grams) AS g FROM
                  (SELECT {grams} AS grams FROM
                   (SELECT {tk} AS tk
                    FROM '{sf_dir}/documents.parquet')))
            GROUP BY 1"""
    ).fetchall()
    con.close()
    raw = [0] * n_buckets
    for b, c in rows:
        raw[int(b)] = int(c)
    lr = dsir_log_ratios_nano(raw, dsir_target_weights(n_buckets, seed))
    lrl = "[" + ", ".join(str(x) for x in lr) + "]::BIGINT[]"
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id, {tk} AS tk
            FROM documents
        ), gr AS (
            SELECT doc_id, {grams} AS grams FROM d
        ), sc AS (
            SELECT doc_id, CAST(LEN(grams) AS BIGINT) AS n_grams,
                   CAST(COALESCE(LIST_SUM(LIST_TRANSFORM(grams,
                        g -> ({lrl})[{bucket0} + 1])), 0) AS BIGINT)
                       AS score_nano
            FROM gr
        )
        SELECT doc_id, n_grams, score_nano, score_nano > 0 AS keep FROM sc
    """


def _q_ccnet_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet LM filter (Wenzek 2020): hashed-bigram LM log-probs (shared
    fixed-point literals) folded zero-shuffle per doc, then head/middle/
    tail buckets by threshold-times-count integer compare (no division —
    Spark DIV and DuckDB // disagree on negatives)."""
    from document_quality_assessment_ocr_spark.operators.importance import (
        ccnet_perplexity,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return ccnet_perplexity(d, n_buckets=64, seed=11)


def _ccnet_sql(n_buckets: int = 64, seed: int = 11) -> str:
    """DuckDB twin of operators/importance.ccnet_perplexity — the literal
    log-prob vector comes from the SAME lm_logprobs_nano/dsir_target_weights
    call the engine makes (oracle-literal technique); the bucket CASE uses
    the SAME module-level CCNET_*_NANO thresholds."""
    from document_quality_assessment_ocr_spark.operators.importance import (
        CCNET_HEAD_NANO,
        CCNET_TAIL_NANO,
        dsir_target_weights,
        lm_logprobs_nano,
    )

    lp = lm_logprobs_nano(dsir_target_weights(n_buckets, seed))
    lpl = "[" + ", ".join(str(x) for x in lp) + "]::BIGINT[]"
    tk = (
        "LIST_FILTER(REGEXP_SPLIT_TO_ARRAY("
        f"TRIM(LOWER(COALESCE(text,''))), '{WS}+'), x -> x <> '')"
    )
    grams = (
        "CASE WHEN LEN(tk) >= 2 THEN LIST_TRANSFORM(RANGE(1, LEN(tk)), "
        "i -> tk[CAST(i AS INT)] || ' ' || tk[CAST(i AS INT) + 1]) "
        "ELSE []::VARCHAR[] END"
    )
    bucket0 = (
        f"CAST(CAST(('0x' || SUBSTR(MD5(g), 1, 15)) AS BIGINT) % {n_buckets} AS INT)"
    )
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id, {tk} AS tk
            FROM documents
        ), gr AS (
            SELECT doc_id, {grams} AS grams FROM d
        ), sc AS (
            SELECT doc_id, CAST(LEN(grams) AS BIGINT) AS n_grams,
                   CAST(COALESCE(LIST_SUM(LIST_TRANSFORM(grams,
                        g -> ({lpl})[{bucket0} + 1])), 0) AS BIGINT)
                       AS lp_nano
            FROM gr
        )
        SELECT doc_id, n_grams, lp_nano,
               CASE WHEN n_grams = 0 THEN 'tail'
                    WHEN lp_nano >= {CCNET_HEAD_NANO} * n_grams THEN 'head'
                    WHEN lp_nano >= {CCNET_TAIL_NANO} * n_grams THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM sc
    """


def _q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/val/test split: zero-shuffle pure
    projection, stable under re-runs and corpus growth (unlike
    randomSplit); same md5-uniform arithmetic as every sampler."""
    from document_quality_assessment_ocr_spark.operators.sampling import (
        assign_splits,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang"
    )
    return assign_splits(d, (("train", 0.9), ("val", 0.95)), "test", salt=97)


def _split_assign_sql() -> str:
    u = _md5_uniform_sql("CAST(doc_id AS BIGINT)", 97)
    return f"""
        SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
               CASE WHEN {u} < 0.9 THEN 'train'
                    WHEN {u} < 0.95 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """


def _q_corpus_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) dataset-card rollup — one hash aggregate, all
    integer SUM/COUNT surfaces (float AVG is order-dependent; means are
    derived downstream from the sums)."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        corpus_card,
    )

    return corpus_card(_doc(spark, sf_dir))


def _corpus_card_sql() -> str:
    n = "LENGTH(COALESCE(text,''))"
    ntoks = (
        f"LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(COALESCE(text,'')), '{WS}+'),"
        " x -> x <> ''))"
    )
    return f"""
        SELECT COALESCE(lang, '') AS lang, COALESCE(source, '') AS source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM({n}) AS BIGINT) AS n_chars,
               CAST(SUM({ntoks}) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN {n} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
               CAST(SUM(CASE WHEN {n} > 0 AND {n} < 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
               CAST(SUM(CASE WHEN {n} > 10000 THEN 1 ELSE 0 END) AS BIGINT) AS n_long
        FROM documents
        GROUP BY 1, 2
    """


def _q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point BM25 top-10 per query over a deterministic 3×3-term
    panel (the 9 highest-df non-everywhere tokens, both engines derive the
    same panel from the same tokenization): RSJ milli-idf × exact
    integer-rational tf-norm in micro units; two-level top-k."""
    from document_quality_assessment_ocr_spark.operators.retrieval import (
        bm25_search,
        bm25_top_terms,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    terms = bm25_top_terms(d, 9)
    return bm25_search(
        d, {1: terms[0:3], 2: terms[3:6], 3: terms[6:9]}, k=10
    )


def _bm25_sql(sf_dir: str | None = None) -> str:
    """DuckDB twin of operators/retrieval.bm25_search — the query panel is
    re-derived HERE at build time with the SAME (df DESC, token ASC)
    total order; the integer-rational BM25 constants are interpolated from
    the shared module constants (never forked)."""
    import duckdb

    from document_quality_assessment_ocr_spark.operators.retrieval import (
        BM25_DEN_DL,
        BM25_DEN_TF,
        BM25_DEN_TOTAL,
        BM25_NUM_C,
        IDF_MILLI,
        MICRO,
    )

    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    terms = _bm25_panel_terms(sf_dir)
    ltoks = (
        "LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(COALESCE(text,''))),"
        f" '{WS}+'), x -> x <> '')"
    )
    panel = ", ".join(
        f"({q + 1}, '{t}')" for q in range(3) for t in terms[3 * q : 3 * q + 3]
    )
    in_list = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id, {ltoks} AS tk
            FROM documents
        ), dl AS (
            SELECT doc_id, CAST(LEN(tk) AS BIGINT) AS dl FROM d
        ), stats AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(dl) AS BIGINT) AS total FROM dl
        ), tf AS (
            SELECT token, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
            FROM (SELECT doc_id, UNNEST(tk) AS token FROM d)
            WHERE token IN ({in_list})
            GROUP BY 1, 2
        ), dfx AS (
            SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
        ), panel(query_id, token) AS (VALUES {panel}), sc AS (
            SELECT p.query_id, tf.doc_id,
                   (((n_docs - df) * {IDF_MILLI}) // df)
                   * (({BM25_NUM_C} * tf * total * {MICRO})
                      // ({BM25_DEN_TF} * tf * total + {BM25_DEN_TOTAL} * total
                          + {BM25_DEN_DL} * dl.dl * n_docs)) AS s
            FROM tf JOIN panel p USING (token) JOIN dfx USING (token)
                 JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats
        ), agg AS (
            SELECT query_id, doc_id, CAST(SUM(s) AS BIGINT) AS score_fx
            FROM sc GROUP BY 1, 2
        )
        SELECT CAST(query_id AS INT) AS query_id, doc_id, score_fx,
               CAST(rank AS INT) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY query_id
                  ORDER BY score_fx DESC, doc_id ASC) AS rank
              FROM agg)
        WHERE rank <= 10
    """


def _bm25_panel_terms(sf_dir: str | None = None) -> list:
    """The 3×3-term query panel, derived in DuckDB with the SAME
    tokenization, everywhere-term exclusion, and (df DESC, token ASC)
    total order as ``retrieval.bm25_top_terms`` — the shared seed for the
    q98 and q102 oracles."""
    import duckdb

    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    ltoks = (
        "LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(COALESCE(text,''))),"
        f" '{WS}+'), x -> x <> '')"
    )
    con = duckdb.connect()
    terms = [
        r[0]
        for r in con.execute(
            f"""SELECT t FROM (
                    SELECT UNNEST(LIST_DISTINCT({ltoks})) AS t
                    FROM '{sf_dir}/documents.parquet')
                GROUP BY t
                HAVING COUNT(*) < (
                    SELECT COUNT(*) FROM '{sf_dir}/documents.parquet')
                ORDER BY COUNT(*) DESC, t ASC LIMIT 9"""
        ).fetchall()
    ]
    con.close()
    return terms


def _q_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: RRF fusion (Cormack & Clarke 2009, k=60, micro
    fixed-point) of BM25 top-20 and feature-hash integer-dot top-20 for
    the same q98 query panel."""
    from document_quality_assessment_ocr_spark.operators.retrieval import (
        bm25_search,
        bm25_top_terms,
        hash_dot_topk,
        rrf_fuse,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    terms = bm25_top_terms(d, 9)
    qs = {1: terms[0:3], 2: terms[3:6], 3: terms[6:9]}
    return rrf_fuse(
        [bm25_search(d, qs, k=20), hash_dot_topk(d, qs, dim=64, k=20)], k=10
    )


def _rrf_sql(sf_dir: str | None = None) -> str:
    """DuckDB twin of q102: the q98 BM25 CTE chain at k=20, the q81
    hash-embedding arithmetic dotted with the panel's own hashed vector at
    k=20, fused with ``1e6 // (60 + rank)`` integer contributions. All
    constants interpolated from operators/retrieval — never forked."""
    from document_quality_assessment_ocr_spark.operators.retrieval import (
        BM25_DEN_DL,
        BM25_DEN_TF,
        BM25_DEN_TOTAL,
        BM25_NUM_C,
        IDF_MILLI,
        MICRO,
        RRF_K,
    )

    terms = _bm25_panel_terms(sf_dir)
    ltoks = (
        "LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(COALESCE(text,''))),"
        f" '{WS}+'), x -> x <> '')"
    )
    panel = ", ".join(
        f"({q + 1}, '{t}')" for q in range(3) for t in terms[3 * q : 3 * q + 3]
    )
    in_list = ", ".join(f"'{t}'" for t in sorted(set(terms)))
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id, {ltoks} AS tk
            FROM documents
        ), dl AS (
            SELECT doc_id, CAST(LEN(tk) AS BIGINT) AS dl FROM d
        ), stats AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(dl) AS BIGINT) AS total FROM dl
        ), tf AS (
            SELECT token, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
            FROM (SELECT doc_id, UNNEST(tk) AS token FROM d)
            WHERE token IN ({in_list})
            GROUP BY 1, 2
        ), dfx AS (
            SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
        ), qp(query_id, token) AS (VALUES {panel}), bsc AS (
            SELECT p.query_id, tf.doc_id,
                   (((n_docs - df) * {IDF_MILLI}) // df)
                   * (({BM25_NUM_C} * tf * total * {MICRO})
                      // ({BM25_DEN_TF} * tf * total + {BM25_DEN_TOTAL} * total
                          + {BM25_DEN_DL} * dl.dl * n_docs)) AS s
            FROM tf JOIN qp p USING (token) JOIN dfx USING (token)
                 JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats
        ), brank AS (
            SELECT query_id, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY score_fx DESC, doc_id ASC) AS rank
            FROM (SELECT query_id, doc_id, CAST(SUM(s) AS BIGINT) AS score_fx
                  FROM bsc GROUP BY 1, 2)
            QUALIFY rank <= 20
        ), hx AS (
            SELECT doc_id, MD5(UNNEST(tk)) AS h FROM d
        ), dvec AS (
            SELECT doc_id,
                   CAST(CAST(('0x' || SUBSTR(h, 1, 4)) AS BIGINT) % 64
                        AS INT) AS dim_idx,
                   CAST(SUM(CASE WHEN CAST(('0x' || SUBSTR(h, 5, 1)) AS BIGINT)
                                      % 2 = 0 THEN 1 ELSE -1 END)
                        AS BIGINT) AS weight
            FROM hx GROUP BY 1, 2 HAVING weight <> 0
        ), qvec AS (
            SELECT query_id,
                   CAST(CAST(('0x' || SUBSTR(h, 1, 4)) AS BIGINT) % 64
                        AS INT) AS dim_idx,
                   CAST(SUM(CASE WHEN CAST(('0x' || SUBSTR(h, 5, 1)) AS BIGINT)
                                      % 2 = 0 THEN 1 ELSE -1 END)
                        AS BIGINT) AS qw
            FROM (SELECT query_id, MD5(token) AS h FROM qp)
            GROUP BY 1, 2 HAVING qw <> 0
        ), hrank AS (
            SELECT query_id, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY score_fx DESC, doc_id ASC) AS rank
            FROM (SELECT query_id, doc_id,
                         CAST(SUM(weight * qw) AS BIGINT) AS score_fx
                  FROM dvec JOIN qvec USING (dim_idx) GROUP BY 1, 2)
            QUALIFY rank <= 20
        ), u AS (
            SELECT query_id, doc_id, {MICRO} // ({RRF_K} + rank) AS c
            FROM brank
            UNION ALL
            SELECT query_id, doc_id, {MICRO} // ({RRF_K} + rank) AS c
            FROM hrank
        ), fused AS (
            SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS rrf_fx
            FROM u GROUP BY 1, 2
        )
        SELECT CAST(query_id AS INT) AS query_id, doc_id, rrf_fx,
               CAST(rank AS INT) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY rrf_fx DESC, doc_id ASC) AS rank
              FROM fused)
        WHERE rank <= 10
    """


def _q_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) overlap pairs: k=5 token grams, w=4 windows,
    posting cap max_df=64, >=2 shared selected fingerprints."""
    from document_quality_assessment_ocr_spark.operators.winnow import (
        winnow_overlap_pairs,
    )

    return winnow_overlap_pairs(
        _doc(spark, sf_dir).select(
            F.col("doc_id").cast("long").alias("doc_id"), "text"
        ),
        k=5,
        w=4,
        min_shared=2,
        max_df=64,
    )


def _winnow_sql() -> str:
    """DuckDB twin of operators/winnow.winnow_overlap_pairs: per-gram md5
    over token 5-grams, the w=4 local min via a bounded ROWS window (the
    engine's array slice expressed relationally), DISTINCT selection,
    df-capped fingerprint-bucketed self-join."""
    ltoks = (
        "LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(COALESCE(text,''))),"
        f" '{WS}+'), x -> x <> '')"
    )
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id, {ltoks} AS tk
            FROM documents
        ), g AS (
            SELECT doc_id, CAST(LEN(tk) AS BIGINT) - 4 AS n_grams,
                   UNNEST(RANGE(1, CAST(LEN(tk) AS BIGINT) - 3)) AS i, tk
            FROM d WHERE LEN(tk) >= 5
        ), gh AS (
            SELECT doc_id, n_grams, i,
                   MD5(ARRAY_TO_STRING(tk[i:i+4], ' ')) AS h
            FROM g
        ), wmin AS (
            SELECT doc_id, i, n_grams,
                   MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
            FROM gh
        ), f AS (
            SELECT DISTINCT doc_id, fp FROM wmin
            WHERE i <= GREATEST(n_grams - 3, 1)
        ), dfx AS (
            SELECT fp, COUNT(*) AS c FROM f GROUP BY fp
        ), kept AS (
            SELECT f.doc_id, f.fp FROM f JOIN dfx USING (fp)
            WHERE c BETWEEN 2 AND 64
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    """


def _q_chunk_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking duplication profile: token-granularity
    Gear-style cuts (md5-nibble % 16), chunk-hash occurrence stats for
    hashes seen >= 2 times."""
    from document_quality_assessment_ocr_spark.operators.chunking import (
        chunk_dup_profile,
    )

    return chunk_dup_profile(
        _doc(spark, sf_dir).select(
            F.col("doc_id").cast("long").alias("doc_id"), "text"
        )
    )


def _chunk_profile_sql() -> str:
    """DuckDB twin of operators/chunking.chunk_dup_profile: identical
    md5-nibble cut predicate (CDC_DIVISOR interpolated from the shared
    module constant), LEAD-based chunk extents, one aggregate."""
    from document_quality_assessment_ocr_spark.operators.chunking import (
        CDC_DIVISOR,
    )

    ltoks = (
        "LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(COALESCE(text,''))),"
        f" '{WS}+'), x -> x <> '')"
    )
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id, {ltoks} AS tk
            FROM documents WHERE LEN({ltoks}) > 0
        ), pos AS (
            SELECT doc_id, UNNEST(RANGE(2, CAST(LEN(tk) AS BIGINT) + 1)) AS i,
                   tk
            FROM d WHERE LEN(tk) >= 2
        ), cuts AS (
            SELECT doc_id, i FROM pos
            WHERE CAST(('0x' || SUBSTR(MD5(tk[i]), 1, 4)) AS BIGINT)
                  % {CDC_DIVISOR} = 0
        ), starts AS (
            SELECT doc_id, 1 AS s FROM d
            UNION ALL
            SELECT doc_id, i AS s FROM cuts
        ), o AS (
            SELECT doc_id, s,
                   LEAD(s) OVER (PARTITION BY doc_id ORDER BY s) AS nxt
            FROM starts
        ), c AS (
            SELECT o.doc_id,
                   CAST(COALESCE(o.nxt, LEN(d.tk) + 1) - o.s AS BIGINT)
                       AS n_tokens,
                   MD5(ARRAY_TO_STRING(
                       d.tk[o.s:COALESCE(o.nxt, LEN(d.tk) + 1) - 1], ' '))
                       AS chunk_hash
            FROM o JOIN d USING (doc_id)
        )
        SELECT chunk_hash, CAST(COUNT(*) AS BIGINT) AS n_occ,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(MAX(n_tokens) AS BIGINT) AS n_tokens
        FROM c GROUP BY 1 HAVING COUNT(*) >= 2
    """


def _q_chunk_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-writer manifest: every 512-token training sequence mapped to
    the document slices composing it (pack_offsets' two-level prefix sum +
    a guarded bounded explode)."""
    from document_quality_assessment_ocr_spark.functions.text import token_count
    from document_quality_assessment_ocr_spark.operators.packing import (
        chunk_manifest,
    )

    docs = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        token_count(F.col("text")).alias("n_tokens"),
    )
    return chunk_manifest(docs, seq_len=512, n_buckets=16)


def _chunk_manifest_sql() -> str:
    ntoks = (
        f"LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(COALESCE(text,'')), '{WS}+'),"
        " x -> x <> ''))"
    )
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST({ntoks} AS BIGINT) AS n_tokens
            FROM documents
        ), o AS (
            SELECT doc_id, n_tokens,
                   CAST(COALESCE(SUM(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS BIGINT) AS start_token
            FROM d
        ), f AS (
            SELECT doc_id, start_token,
                   start_token + n_tokens AS end_token,
                   start_token // 512 AS first_seq,
                   (start_token + n_tokens - 1) // 512 AS last_seq
            FROM o WHERE n_tokens > 0
        ), e AS (
            SELECT doc_id, start_token, end_token,
                   UNNEST(RANGE(first_seq, last_seq + 1)) AS seq_id
            FROM f
        )
        SELECT CAST(seq_id AS BIGINT) AS seq_id, doc_id,
               CAST(GREATEST(start_token, seq_id * 512) - start_token
                    AS BIGINT) AS doc_offset,
               CAST(GREATEST(start_token, seq_id * 512) - seq_id * 512
                    AS BIGINT) AS seq_offset,
               CAST(LEAST(end_token, (seq_id + 1) * 512)
                    - GREATEST(start_token, seq_id * 512)
                    AS BIGINT) AS n_slice
        FROM e
    """


def _q_soft_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SoftDeDup weighting: near-dup clusters (q31 parameters) down-weight
    members by 1e9 DIV |cluster| instead of dropping them."""
    from document_quality_assessment_ocr_spark.operators.dedup import (
        soft_dedup_weights,
    )

    return soft_dedup_weights(
        _doc(spark, sf_dir).select(
            F.col("doc_id").cast("long").alias("doc_id"), "text"
        ),
        n_hashes=8,
        bands=4,
    )


def _soft_dedup_sql() -> str:
    """DuckDB twin of operators/dedup.soft_dedup_weights: the q31 component
    chain (shared _clusters_comp_sql) + cluster sizes + ``1e9 // size`` —
    integer division of non-negative operands is identical on both engines
    (the CLAUDE.md DIV invariant), so weights hash-match bitwise."""
    return (
        _clusters_comp_sql()
        + """
            , mem AS (
                SELECT d.doc_id, COALESCE(comp.cid, d.doc_id) AS cluster_id
                FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents) d
                LEFT JOIN comp ON comp.did = d.doc_id
            ), sizes AS (
                SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
                FROM mem GROUP BY cluster_id
            )
            SELECT mem.doc_id, mem.cluster_id, sizes.cluster_size,
                   CAST(1000000000 // sizes.cluster_size AS BIGINT) AS weight_nano
            FROM mem JOIN sizes USING (cluster_id)
        """
    )


def _q_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE: apply a synthesized changelog (updates, inserts of the
    held-out doc_id%10==9 slice, deletes, and a second-seq change that must
    win) to the snapshot. Oracle builds the identical changelog."""
    from document_quality_assessment_ocr_spark.operators.cdc import apply_changes

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text", "lang"
    )
    did = F.col("doc_id")
    t = F.coalesce(F.col("text"), F.lit(""))
    base = d.where(did % 10 != 9)
    u = d.where((did % 7 == 0) & (did % 10 != 9)).select(
        did,
        F.lit(1).cast("long").alias("seq"),
        F.lit("U").alias("op"),
        F.concat(F.lit("updated "), F.substring(t, 1, 50)).alias("text"),
        "lang",
    )
    ins = d.where(did % 10 == 9).select(
        did, F.lit(1).cast("long").alias("seq"), F.lit("I").alias("op"),
        t.alias("text"), "lang",
    )
    dl = d.where((did % 13 == 0) & (did % 7 != 0) & (did % 10 != 9)).select(
        did, F.lit(1).cast("long").alias("seq"), F.lit("D").alias("op"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )
    u2 = d.where((did % 14 == 0) & (did % 10 != 9)).select(
        did, F.lit(2).cast("long").alias("seq"), F.lit("U").alias("op"),
        F.lit("updated twice").alias("text"), "lang",
    )
    return apply_changes(base, u.unionByName(ins).unionByName(dl).unionByName(u2))


def _synth_urls(d: DataFrame) -> DataFrame:
    """Deterministic URL column over documents (doc_id%5 shape mix: messy
    canonical-case + default port + tracking + fragment, default-port http,
    clean https with mixed params, an unparseable string, fbclid-only).
    The oracle builds the identical strings."""
    did = F.col("doc_id")
    sid = did.cast("string")
    url = (
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit("https://WWW.Example.COM:443/"), F.col("source"),
                F.lit("/"), (did % 100).cast("string"), F.lit("/?id="), sid,
                F.lit("&utm_source=feed&q="), F.col("lang"), F.lit("#top"),
            ),
        )
        .when(did % 5 == 1, F.concat(F.lit("http://cdn.example.org:80/assets/"), sid))
        .when(
            did % 5 == 2,
            F.concat(
                F.lit("https://news.site.net/a/"), (did % 50).cast("string"),
                F.lit("?ref=tw&z=1&a=2"),
            ),
        )
        .when(did % 5 == 3, F.concat(F.lit("not a url "), sid))
        .otherwise(
            F.concat(
                F.lit("https://example.com/"), F.col("source"),
                F.lit("?fbclid=xyz"), sid,
            )
        )
    )
    return d.select(F.col("doc_id").cast("long").alias("doc_id"), url.alias("url"))


def _q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parse + canonicalization (scheme/host/path/query split, www +
    default-port + tracking-param + fragment strip, param sort)."""
    from document_quality_assessment_ocr_spark.operators.urls import parse_urls

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang", "source"
    )
    return parse_urls(_synth_urls(d))


def _q_host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level rollup of canonical URLs (domain curation policy input)."""
    from document_quality_assessment_ocr_spark.operators.urls import (
        host_stats,
        parse_urls,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang", "source"
    )
    return host_stats(parse_urls(_synth_urls(d)))


def _q_prefix_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-prefix policy join (robots/blocklist): bounded prefix explode
    + equi-join, algebraic longest-match winner — no starts-with theta join."""
    from document_quality_assessment_ocr_spark.operators.urls import (
        parse_urls,
        prefix_block_join,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang", "source"
    )
    rules = spark.createDataFrame(
        _BLOCK_RULES, "host string, path_prefix string, action string"
    )
    return prefix_block_join(parse_urls(_synth_urls(d)), rules)


def _q_outlinks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-graph construction: per-document outlinks (href + normalized
    anchor text) from the synthesized HTML."""
    from document_quality_assessment_ocr_spark.operators.html import extract_links

    return extract_links(_synth_html(_doc(spark, sf_dir)))


def _q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index: (token, df, doc_id, tf) postings — retrieval /
    decontamination lookup structure, two co-partitioned aggregates."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        inverted_index,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return inverted_index(d, min_df=2)


def _q_host_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host fetch-policy report: the longest-prefix join's verdicts
    rolled up per host (crawl-budget planning input)."""
    j = _q_prefix_block(spark, sf_dir).where(F.col("host") != "")
    denied = F.count(F.when(F.col("action") == "deny", 1))
    return j.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_docs"),
        denied.alias("n_denied"),
        (denied.cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "denied_frac"
        ),
    )


def _q_robots_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt parsing: one synthesized robots file per source host
    (comment, a badbot group that must be ignored, the * group with
    disallow/allow/empty/trailing-slash cases) → the rule table
    prefix_block_join consumes."""
    from document_quality_assessment_ocr_spark.operators.urls import parse_robots

    s = _doc(spark, sf_dir).select("source").distinct()
    nl = F.lit("\n")
    txt = F.concat(
        F.lit("# robots for "), F.col("source"), nl,
        F.lit("User-agent: badbot"), nl, F.lit("Disallow: /"), nl,
        F.lit("User-agent: *"), nl,
        F.lit("Disallow: /private/"), F.col("source"), F.lit("/"), nl,
        F.lit("Allow: /private/"), F.col("source"), F.lit("/ok"), nl,
        F.lit("Disallow:"), nl,
        F.lit("Disallow: /tmp/"),
    )
    df = s.select(
        F.concat(F.col("source"), F.lit(".example.com")).alias("host"),
        txt.alias("robots_txt"),
    )
    return parse_robots(df)


def _q_hash_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing text vectors (hashing trick): md5 index + sign,
    signed integer counts → bit-exact sparse embeddings."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        hash_embedding,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return hash_embedding(d)


def _q_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility (subwords per word) by language — the metric
    that decides whether a trained tokenizer under-serves a language.
    Integer sums surface alongside an explicit exact-division ratio."""
    from document_quality_assessment_ocr_spark.operators.bpe import (
        apply_bpe,
        train_bpe,
        word_counts,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text", "lang"
    )
    mrows = (
        train_bpe(spark, word_counts(d), n_merges=8).orderBy("step").collect()
    )
    seg = apply_bpe(d, [(r["left"], r["right"]) for r in mrows])
    n_sub = F.size(F.split(F.col("seg_text"), " ")).cast("long")
    return (
        seg.withColumn("n_sub", n_sub)
        .join(d.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sub").cast("long").alias("n_subwords"),
        )
        .withColumn(
            "fertility",
            F.col("n_subwords").cast("double") / F.col("n_words").cast("double"),
        )
    )


def _q_curation_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation composite v3 — the full web pipeline over synthesized HTML:
    DOM main-content extraction → normalization → gates → first-wins dedup,
    one end-to-end SQL oracle."""
    from document_quality_assessment_ocr_spark.plans.curation import (
        curate_documents_v3,
    )

    return curate_documents_v3(_synth_html(_doc(spark, sf_dir)), min_tokens=40)


def _q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: k-means cells bound the pair scope; within a cell, rows
    with a lower-id neighbor at cosine ≥ 0.35 are dropped (keep-first;
    the threshold sits at the synthetic embedding space's top percentile —
    semantic-dedup taus are always space-calibrated). Cluster count tracks
    corpus size via the shared scaled_n_centroids rule (one metadata-cheap
    count job; the oracle builder applies the same rule to the same row
    count) — fixed k is quadratic in N, the round-4 sf1 lesson."""
    from document_quality_assessment_ocr_spark.operators.similarity import (
        scaled_n_centroids,
        scaled_sample_rows,
        semdedup,
    )

    emb = _emb(spark, sf_dir)
    k = scaled_n_centroids(emb.count())
    return semdedup(emb, tau=0.35, n_centroids=k, sample_rows=scaled_sample_rows(k))


_MIXTURE_WEIGHTS = {"en": 0.4, "de": 0.3, "fr": 0.2, "es": 0.05, "zh": 0.05}


def _q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing pass: down-sample each language to target mixture
    proportions (binding stratum kept whole). Oracle recomputes the
    identical rates via the shared mixture_rates() python arithmetic."""
    from document_quality_assessment_ocr_spark.operators.sampling import (
        mixture_sample,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang"
    )
    return mixture_sample(d, "lang", _MIXTURE_WEIGHTS)


def _q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q77 with temperature 2.0: weights flattened w^(1/T) before the
    mixture arithmetic — tail languages (es/zh at 5%) get up-weighted
    relative to en. Same shared-rate oracle technique."""
    from document_quality_assessment_ocr_spark.operators.sampling import (
        mixture_sample,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang"
    )
    return mixture_sample(d, "lang", _MIXTURE_WEIGHTS, temperature=2.0)


def _q_phash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-banded visual near-dup pairs over REAL perceptual hashes of
    the payload catalog AND its 128-px thumbnails (same imagery, different
    bytes/resolution — the genuine near-dup case: original↔thumbnail lands
    at hamming 4–6 for several pages). 8×8-bit band LSH → per-nibble
    popcount verify; recall is exact for hamming ≤ 7 < n_bands."""
    from document_quality_assessment_ocr_spark.operators.multimodal import (
        image_ahash,
        image_thumbnails,
        phash_near_dup_pairs,
    )
    from document_quality_assessment_ocr_spark.sources.derive import payloads_df

    pay = payloads_df(spark)
    orig = image_ahash(pay)
    thumb = image_ahash(
        image_thumbnails(pay)
        .where(F.col("thumb_png").isNotNull())
        .select(
            F.concat(F.col("media_ref"), F.lit(":t")).alias("media_ref"),
            F.col("thumb_png").alias("png"),
        )
    )
    return phash_near_dup_pairs(
        orig.unionByName(thumb), max_hamming=7, n_bands=8
    )


def _q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE-merge training: 8 rounds over the word-type table.
    Oracle recomputes the identical merge table in pure python
    (operators/bpe.bpe_python — shared tie-breaks) as VALUES literals."""
    from document_quality_assessment_ocr_spark.operators.bpe import (
        train_bpe,
        word_counts,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return train_bpe(spark, word_counts(d), n_merges=8)


def _q_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-then-apply BPE composite: the engine trains 8 merges and
    segments the corpus token stream with them (vocab segmented once,
    broadcast-joined back). Oracle replays both stages in pure python and
    joins a (word, seg_text) VALUES table to the SQL token stream."""
    from document_quality_assessment_ocr_spark.operators.bpe import (
        apply_bpe,
        train_bpe,
        word_counts,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    mrows = train_bpe(spark, word_counts(d), n_merges=8).orderBy("step").collect()
    return apply_bpe(d, [(r["left"], r["right"]) for r in mrows])


def _q_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr cross-document dedup (Lee et al. 2022) at an 8-token
    window (the soup corpus's duplication grain)."""
    from document_quality_assessment_ocr_spark.operators.dedup import (
        exact_substring_dedup,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return exact_substring_dedup(d, window=8)


def _q_link_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-graph composite: extract_links ∘ parse_urls → per-target-host
    rollup (relative hrefs parse to empty host and fall out — only the
    absolute cross-site references build graph edges)."""
    from document_quality_assessment_ocr_spark.operators.html import extract_links
    from document_quality_assessment_ocr_spark.operators.urls import parse_urls

    links = extract_links(_synth_html(_doc(spark, sf_dir)))
    parsed = parse_urls(links.select("doc_id", F.col("href").alias("url")))
    return (
        parsed.where(F.col("host") != "")
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


def _q_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan over a manifest derived from documents
    (file_id=doc_id, size=n_chars, 4 KiB target groups). The oracle is the
    naive global running-sum window — the spec the distributed two-level
    prefix sum must reproduce exactly."""
    from document_quality_assessment_ocr_spark.operators.compaction import (
        plan_compaction,
    )

    m = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("file_id"),
        F.col("n_chars").cast("long").alias("size_bytes"),
    )
    return plan_compaction(m, target_bytes=4096)


def _q_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-surprisal (KenLM-lite) quality filter — fixed-point whole-bit
    surprisal keeps both engines bit-identical."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        unigram_surprisal,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return unigram_surprisal(d)


def _q_corpus_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORPUS-level exact line dedup (CCNet shard-paragraph / RefinedWeb
    line-frequency shape): lines appearing in >= 3 distinct documents drop
    everywhere. Same derived multi-line text as q87 ('. ' -> '.\\n')."""
    from document_quality_assessment_ocr_spark.operators.dedup import (
        corpus_line_dedup,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.replace(
            F.coalesce(F.col("text"), F.lit("")), F.lit(". "), F.lit(".\n")
        ).alias("text"),
    )
    return corpus_line_dedup(d, min_docs=3)


def _corpus_line_dedup_sql(min_docs: int = 3) -> str:
    """DuckDB twin of operators/dedup.corpus_line_dedup over the q87
    multi-line derivation: boilerplate = md5(line) held by >= min_docs
    distinct docs (trimmed-non-empty lines only); kept lines reassemble
    ORDER BY position (ARRAY_TO_STRING-vs-'' COALESCE per the
    empty-STRING_AGG invariant)."""
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   REPLACE(COALESCE(text,''), '. ', '.' || CHR(10)) AS t
            FROM documents
        ), l AS (
            SELECT doc_id,
                   UNNEST(STR_SPLIT(t, CHR(10))) AS line,
                   UNNEST(RANGE(1, LEN(STR_SPLIT(t, CHR(10))) + 1)) AS ln
            FROM d
        ), boiler AS (
            SELECT MD5(line) AS lh
            FROM l WHERE TRIM(line) <> ''
            GROUP BY MD5(line)
            HAVING COUNT(DISTINCT doc_id) >= {int(min_docs)}
        )
        SELECT l.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(COUNT(*) FILTER (WHERE b.lh IS NOT NULL) AS BIGINT)
                   AS n_removed,
               COALESCE(STRING_AGG(CASE WHEN b.lh IS NULL THEN line END,
                                   CHR(10) ORDER BY ln), '') AS clean_text
        FROM l LEFT JOIN boiler b ON MD5(l.line) = b.lh
        GROUP BY l.doc_id
    """


def _q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-SimHash near-dup pairs: 48-bit signatures, 4 x 12-bit band
    slices (pigeonhole-exact recall for Hamming <= 3), integer popcount
    verify."""
    from document_quality_assessment_ocr_spark.operators.dedup import (
        simhash_near_dup_pairs,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return simhash_near_dup_pairs(d, bits=48, bands=4, max_hamming=3)


def _simhash_pairs_sql(bits: int = 48, bands: int = 4, max_hamming: int = 3) -> str:
    """DuckDB twin of operators/dedup.simhash_near_dup_pairs: the q12
    signature CTE (shared _simhash_sql) + literal (band, divisor) VALUES
    for the integer slice arithmetic (non-negative // and % match Spark
    DIV/%), BIT_COUNT(XOR()) for the Hamming verify."""
    band_bits = bits // bands
    divisors = ", ".join(f"({k}, {1 << (k * band_bits)})" for k in range(bands))
    return f"""
        WITH sig AS ({_simhash_sql(bits)}),
        bnd AS (
            SELECT doc_id, simhash, b.k AS band,
                   (simhash // b.d) % {1 << band_bits} AS bv
            FROM sig, (VALUES {divisors}) AS b(k, d)
        ), cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b,
                   a.simhash AS ha, b2.simhash AS hb
            FROM bnd a JOIN bnd b2
              ON a.band = b2.band AND a.bv = b2.bv AND a.doc_id < b2.doc_id
        )
        SELECT doc_a, doc_b,
               CAST(BIT_COUNT(XOR(ha, hb)) AS BIGINT) AS hamming
        FROM cand
        WHERE BIT_COUNT(XOR(ha, hb)) <= {int(max_hamming)}
    """


def _q_unimax_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax sampling (Chung 2023): budget = 3/2 of total corpus tokens at
    2-epoch cap — the four tail languages cap at 2 epochs (weight 2e9,
    kept whole) and the head language subsamples; both branches of the
    allocator exercised. One bounded per-language aggregate, then a pure
    predicate."""
    from document_quality_assessment_ocr_spark.functions.text import token_count
    from document_quality_assessment_ocr_spark.operators.sampling import (
        unimax_sample,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "lang",
        token_count(F.col("text")).alias("n_tokens"),
    )
    counts = {
        r[0]: int(r[1])
        for r in d.groupBy("lang").agg(F.sum("n_tokens")).collect()
        if r[0] is not None and r[1] is not None and int(r[1]) > 0
    }
    budget = (3 * sum(counts.values())) // 2
    return unimax_sample(
        d, budget, max_epochs=2, token_counts=counts
    )


def _unimax_sql(max_epochs: int = 2, salt: int = 7, sf_dir: str | None = None) -> str:
    """q106 oracle: per-language token sums read from the parquet with the
    SAME ntoks expression, budgets/weights/rates via the SAME
    unimax_budgets() integer arithmetic the engine runs (oracle-literal
    technique), md5-uniform acceptance."""
    import os

    import duckdb

    from document_quality_assessment_ocr_spark.operators.sampling import (
        unimax_budgets,
    )

    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    ntoks = (
        f"LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(COALESCE(text,'')), '{WS}+'),"
        " x -> x <> ''))"
    )
    con = duckdb.connect()
    raw = con.execute(
        f"SELECT lang, SUM({ntoks}) FROM '{sf_dir}/documents.parquet' "
        "WHERE lang IS NOT NULL GROUP BY lang"
    ).fetchall()
    con.close()
    counts = {s: int(c) for s, c in raw if c is not None and int(c) > 0}
    budget = (3 * sum(counts.values())) // 2
    budgets = unimax_budgets(counts, budget, max_epochs)
    w_nano = {s: (budgets[s] * 1_000_000_000) // counts[s] for s in counts}
    rates = {s: min(1.0, w_nano[s] / 1e9) for s in counts}
    wn_case = " ".join(f"WHEN '{s}' THEN {w_nano[s]}" for s in sorted(counts))
    rate_case = " ".join(f"WHEN '{s}' THEN {rates[s]!r}" for s in sorted(counts))
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
                   CAST({ntoks} AS BIGINT) AS n_tokens,
                   CAST(CASE lang {wn_case} ELSE 0 END AS BIGINT)
                       AS weight_nano,
                   {_md5_uniform_sql('CAST(doc_id AS BIGINT)', salt=salt)}
                       AS sample_u
            FROM documents
        )
        SELECT doc_id, lang, n_tokens, weight_nano, sample_u FROM d
        WHERE sample_u < CASE lang {rate_case} ELSE 0.0 END
    """


def _q_prototype_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSL-prototype pruning (Sorscher 2022): rank by cosine to the k-means
    cell prototype, keep the hardest 60% per cell (easy/prototypical mass
    drops). Same seeded centroids as q78; cluster count tracks corpus size
    (shared scaled_n_centroids rule, see q78)."""
    from document_quality_assessment_ocr_spark.operators.similarity import (
        prototype_prune,
        scaled_n_centroids,
        scaled_sample_rows,
    )

    emb = _emb(spark, sf_dir)
    k = scaled_n_centroids(emb.count())
    return prototype_prune(
        emb, keep_pct=60, n_centroids=k, sample_rows=scaled_sample_rows(k)
    )


def _prototype_prune_sql(
    sf_dir: str | None = None,
    keep_pct: int = 60,
    n_centroids: int | None = None,
    sample_rows: int | None = None,
    seed: int = 42,
) -> str:
    """q107 oracle: the SAME seeded centroids as literals (q17/q78
    technique); prototype lookup via a nested-list literal indexed by the
    argmin cell; ROW_NUMBER over (rounded cosine, id) per cell; integer
    keep count GREATEST(1, n*pct // 100)."""
    import numpy as np
    import pyarrow.parquet as pq

    from document_quality_assessment_ocr_spark.operators.similarity import (
        _kmeans_lite,
        scaled_n_centroids,
        scaled_sample_rows,
    )

    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.array(tbl.column("vec_id"))
    vecs = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    # shared corpus-size rule — must mirror the engine query (q78 note)
    n_centroids = n_centroids or scaled_n_centroids(len(ids))
    sample_rows = sample_rows or scaled_sample_rows(n_centroids)
    cents = _kmeans_lite(vecs[order[:sample_rows]], n_centroids, seed=seed)
    dists = ", ".join(
        "(-2.0 * LIST_DOT_PRODUCT(v, ["
        + ", ".join(repr(float(x)) for x in c)
        + f"]) + {float((c * c).sum())!r})"
        for c in cents
    )
    cell = f"(LIST_INDEXOF([{dists}], LIST_MIN([{dists}])) - 1)"
    protos = (
        "["
        + ", ".join(
            "[" + ", ".join(repr(float(x)) for x in c) + "]" for c in cents
        )
        + "]"
    )
    return f"""
        WITH e AS (
            SELECT CAST(vec_id AS BIGINT) AS vec_id,
                   CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ), assigned AS (
            SELECT vec_id, v, {cell} AS cell FROM e
        ), scored AS (
            SELECT vec_id, cell,
                   ROUND(LIST_DOT_PRODUCT(v, ({protos})[cell + 1])
                         / SQRT(LIST_DOT_PRODUCT(v, v)
                                * LIST_DOT_PRODUCT(({protos})[cell + 1],
                                                   ({protos})[cell + 1])), 6)
                       AS cos_proto
            FROM assigned
        ), ranked AS (
            SELECT vec_id, cell, cos_proto,
                   CAST(ROW_NUMBER() OVER (PARTITION BY cell
                                           ORDER BY cos_proto, vec_id)
                        AS BIGINT) AS rank,
                   COUNT(*) OVER (PARTITION BY cell) AS n
            FROM scored
        )
        SELECT vec_id, CAST(cell AS INT) AS cell, cos_proto, rank,
               rank <= GREATEST(1, (n * {int(keep_pct)}) // 100) AS kept
        FROM ranked
    """


def _q_domain_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes domain quality: per-source mean classifier score
    shrunk toward the prior by 20 pseudo-docs — all fixed-point nano
    arithmetic with a +2000-milli shift so every DIV is non-negative
    (the only cross-engine-exact integer division)."""
    from document_quality_assessment_ocr_spark.operators.classify import (
        domain_quality_shrunk,
    )

    d = _doc(spark, sf_dir).select("source", "text")
    return domain_quality_shrunk(d, prior_docs=20)


def _domain_quality_sql(prior_docs: int = 20) -> str:
    """q108 oracle: the q84 gram/bucket CTEs (shared classifier_weights)
    summed to integer milli, the SAME shifted-nano per-doc division and
    domain shrinkage via `//` on non-negative BIGINTs; the surfaced double
    is one exact division of the integer result (CAST-to-BIGINT on every
    SUM per the HUGEINT dtype invariant)."""
    from document_quality_assessment_ocr_spark.operators.classify import (
        OFFSET_MILLI,
        PRIOR_NANO,
        classifier_weights,
    )

    w = classifier_weights(64, 7)
    wl = "[" + ", ".join(str(x) for x in w) + "]::BIGINT[]"
    bucket = "CAST(CAST(('0x' || SUBSTR(MD5(g), 1, 15)) AS BIGINT) % 64 AS INT) + 1"
    return f"""
        WITH d AS (
            SELECT COALESCE(source, '') AS source,
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                       TRIM(LOWER(COALESCE(text,''))), '{WS}+'),
                       x -> x <> '') AS tk
            FROM documents
        ), gr AS (
            SELECT source,
                   tk || CASE WHEN LEN(tk) >= 2
                         THEN LIST_TRANSFORM(RANGE(1, LEN(tk)),
                              i -> tk[CAST(i AS INT)] || CHR(1)
                                   || tk[CAST(i AS INT) + 1])
                         ELSE []::VARCHAR[] END AS grams
            FROM d
        ), sc AS (
            SELECT source, CAST(LEN(grams) AS BIGINT) AS ng,
                   CAST(COALESCE(LIST_SUM(LIST_TRANSFORM(grams,
                        g -> ({wl})[{bucket}])), 0) AS BIGINT) AS gs
            FROM gr
        ), pd AS (
            SELECT source,
                   CASE WHEN ng > 0
                        THEN ((gs + {OFFSET_MILLI} * ng) * 1000000) // ng
                        ELSE {PRIOR_NANO} END AS shifted_nano
            FROM sc
        ), agg AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(shifted_nano) AS BIGINT) AS sum_nano
            FROM pd GROUP BY source
        )
        SELECT source, n_docs,
               CAST((sum_nano + {int(prior_docs)}::BIGINT * {PRIOR_NANO}::BIGINT)
                    // (n_docs + {int(prior_docs)}) AS BIGINT) AS shrunk_nano,
               CAST((sum_nano + {int(prior_docs)}::BIGINT * {PRIOR_NANO}::BIGINT)
                    // (n_docs + {int(prior_docs)}) - {PRIOR_NANO} AS BIGINT)
                   / 1e9 AS shrunk_score,
               CAST((sum_nano + {int(prior_docs)}::BIGINT * {PRIOR_NANO}::BIGINT)
                    // (n_docs + {int(prior_docs)}) - {PRIOR_NANO} AS BIGINT)
                   / 1e9 >= 0.0 AS keep
        FROM agg
    """


def _q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 3-gram novelty: fraction of distinct word trigrams that are
    corpus-unique (df=1) — the memorization-risk / residual-template
    profile. One gram-hash exchange (df agg + join co-partitioned), one
    doc rollup."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        ngram_novelty,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return ngram_novelty(d, n=3)


def _ngram_novelty_sql(n: int = 3) -> str:
    """q109 oracle: DISTINCT (doc, md5(gram)) pairs → df counts → per-doc
    unique fraction; the novelty double is one exact int64 division on
    both engines (counts CAST BIGINT per the HUGEINT invariant)."""
    gram = " || ' ' || ".join(f"a[CAST(i AS INT) + {j}]" for j in range(n))
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id, COALESCE(text,'') AS t
            FROM documents
        ), tk AS (
            SELECT doc_id,
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(t)), '{WS}+'),
                               x -> x <> '') AS a
            FROM d
        ), g AS (
            SELECT DISTINCT doc_id, MD5({gram}) AS gh
            FROM (SELECT doc_id, a,
                         UNNEST(RANGE(1, GREATEST(LEN(a) - {n - 1}, 0) + 1)) AS i
                  FROM tk)
        ), dfq AS (
            SELECT gh, COUNT(*) AS df FROM g GROUP BY gh
        ), per AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct,
                   CAST(COUNT(*) FILTER (WHERE df = 1) AS BIGINT) AS n_unique
            FROM g JOIN dfq USING (gh) GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(n_distinct, 0) AS n_distinct,
               COALESCE(n_unique, 0) AS n_unique,
               CASE WHEN COALESCE(n_distinct, 0) > 0
                    THEN CAST(n_unique AS DOUBLE) / n_distinct
                    ELSE 0.0 END AS novelty
        FROM d LEFT JOIN per USING (doc_id)
    """


def _q_fim_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIM splitting (Bavarian 2022): half the corpus (md5-uniform) is cut
    at two md5-derived token boundaries into (prefix, middle, suffix);
    pure codegen projection, zero shuffle."""
    from document_quality_assessment_ocr_spark.operators.augment import fim_split

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return fim_split(d, fim_rate=0.5, salt=13)


def _fim_split_sql(fim_rate: float = 0.5, salt: int = 13) -> str:
    """q110 oracle: same md5-uniform gate, same 60-bit md5 cut ints mod
    (n+1), DuckDB 1-based inclusive list slices; ARRAY_TO_STRING-vs-''
    COALESCE per the empty-list invariant."""
    cut = (
        lambda tag: "CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS BIGINT) || "
        f"'|fim{salt}|{tag}'), 1, 15)) AS BIGINT) % (LEN(a) + 1)"
    )
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                       TRIM(COALESCE(text,'')), '{WS}+'),
                       x -> x <> '') AS a
            FROM documents
        ), c AS (
            SELECT doc_id, a, CAST(LEN(a) AS BIGINT) AS n,
                   {_md5_uniform_sql('CAST(doc_id AS BIGINT)', salt=salt)} AS u,
                   LEAST({cut('a')}, {cut('b')}) AS lo,
                   GREATEST({cut('a')}, {cut('b')}) AS hi
            FROM d
        ), f AS (
            SELECT doc_id, a, n, lo, hi,
                   (u < {float(fim_rate)!r} AND n >= 2) AS fim
            FROM c
        )
        SELECT doc_id, fim, n AS n_tokens,
               COALESCE(ARRAY_TO_STRING(
                   CASE WHEN fim THEN a[1:CAST(lo AS INT)] ELSE a END, ' '), '')
                   AS prefix,
               COALESCE(ARRAY_TO_STRING(
                   CASE WHEN fim THEN a[CAST(lo AS INT)+1:CAST(hi AS INT)]
                        ELSE [] END, ' '), '') AS middle,
               COALESCE(ARRAY_TO_STRING(
                   CASE WHEN fim THEN a[CAST(hi AS INT)+1:CAST(n AS INT)]
                        ELSE [] END, ' '), '') AS suffix
        FROM f
    """


def _q_d4_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 (Tirumala 2023): SemDeDup at tau=0.35 (space-calibrated, as q78)
    then prototype-prune the survivors to the hardest 60% per cell — one
    shared clustering for both stages (documented deviation, see the
    operator docstring). Cluster count tracks corpus size (shared
    scaled_n_centroids rule, see q78) — the fixed-k form measured 41× wall
    at 10× rows in the round-4 sf1 probe; the scaled form is linear."""
    from document_quality_assessment_ocr_spark.operators.similarity import (
        d4_prune,
        scaled_n_centroids,
        scaled_sample_rows,
    )

    emb = _emb(spark, sf_dir)
    k = scaled_n_centroids(emb.count())
    return d4_prune(
        emb, tau=0.35, keep_pct=60, n_centroids=k, sample_rows=scaled_sample_rows(k)
    )


def _d4_prune_sql(
    sf_dir: str | None = None,
    tau: float = 0.35,
    keep_pct: int = 60,
    n_centroids: int | None = None,
    sample_rows: int | None = None,
    seed: int = 42,
) -> str:
    """q111 oracle: the q78 dup CTE (same centroid literals, same rounded
    cosine threshold) feeding the q107 per-cell ROW_NUMBER rank — but the
    rank and keep count run over stage-1 SURVIVORS only."""
    import numpy as np
    import pyarrow.parquet as pq

    from document_quality_assessment_ocr_spark.operators.similarity import (
        _kmeans_lite,
        scaled_n_centroids,
        scaled_sample_rows,
    )

    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.array(tbl.column("vec_id"))
    vecs = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    # shared corpus-size rule — must mirror the engine query (q78 note)
    n_centroids = n_centroids or scaled_n_centroids(len(ids))
    sample_rows = sample_rows or scaled_sample_rows(n_centroids)
    cents = _kmeans_lite(vecs[order[:sample_rows]], n_centroids, seed=seed)
    dists = ", ".join(
        "(-2.0 * LIST_DOT_PRODUCT(v, ["
        + ", ".join(repr(float(x)) for x in c)
        + f"]) + {float((c * c).sum())!r})"
        for c in cents
    )
    cell = f"(LIST_INDEXOF([{dists}], LIST_MIN([{dists}])) - 1)"
    protos = (
        "["
        + ", ".join(
            "[" + ", ".join(repr(float(x)) for x in c) + "]" for c in cents
        )
        + "]"
    )
    return f"""
        WITH e AS (
            SELECT CAST(vec_id AS BIGINT) AS vec_id,
                   CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ), assigned AS (
            SELECT vec_id, v, {cell} AS cell FROM e
        ), dup AS (
            SELECT DISTINCT x.vec_id
            FROM assigned x JOIN assigned y
              ON x.cell = y.cell AND y.vec_id < x.vec_id
            WHERE ROUND(LIST_DOT_PRODUCT(x.v, y.v)
                        / SQRT(LIST_DOT_PRODUCT(x.v, x.v)
                               * LIST_DOT_PRODUCT(y.v, y.v)), 6) >= {tau!r}
        ), survivors AS (
            SELECT a.vec_id, a.cell,
                   ROUND(LIST_DOT_PRODUCT(a.v, ({protos})[a.cell + 1])
                         / SQRT(LIST_DOT_PRODUCT(a.v, a.v)
                                * LIST_DOT_PRODUCT(({protos})[a.cell + 1],
                                                   ({protos})[a.cell + 1])), 6)
                       AS cos_proto
            FROM assigned a LEFT JOIN dup d ON a.vec_id = d.vec_id
            WHERE d.vec_id IS NULL
        ), ranked AS (
            SELECT vec_id, cell, cos_proto,
                   CAST(ROW_NUMBER() OVER (PARTITION BY cell
                                           ORDER BY cos_proto, vec_id)
                        AS BIGINT) AS rank,
                   COUNT(*) OVER (PARTITION BY cell) AS n
            FROM survivors
        )
        SELECT vec_id, CAST(cell AS INT) AS cell, cos_proto, rank,
               rank <= GREATEST(1, (n * {int(keep_pct)}) // 100) AS kept
        FROM ranked
    """


def _q_k_anonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity suppression (Sweeney 2002) on the (lang, source) quasi
    pair: cohorts smaller than 5 get both quasi values redacted. One hash
    agg on the projected quasi cols, broadcast back; rows never shuffle."""
    from document_quality_assessment_ocr_spark.operators.privacy import k_anonymize

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang", "source"
    )
    return k_anonymize(d, ["lang", "source"], k=5)


def _k_anon_sql(k: int = 5) -> str:
    """q112 oracle: COALESCE-to-'' before grouping (the operator's NULL
    contract), COUNT(*) cohorts, CASE suppression — COUNT stays BIGINT on
    both engines (no SUM/HUGEINT trap)."""
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   COALESCE(lang, '') AS lang,
                   COALESCE(source, '') AS source
            FROM documents
        ), g AS (
            SELECT lang, source, COUNT(*) AS group_size
            FROM d GROUP BY lang, source
        )
        SELECT d.doc_id,
               CASE WHEN g.group_size < {int(k)} THEN '<redacted>'
                    ELSE d.lang END AS lang,
               CASE WHEN g.group_size < {int(k)} THEN '<redacted>'
                    ELSE d.source END AS source,
               g.group_size,
               g.group_size < {int(k)} AS suppressed
        FROM d JOIN g USING (lang, source)
    """


def _q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (DPR/SimCSE practice): per anchor, the top-5
    highest-cosine DIFFERENT-label rows below the 0.99 mislabeled-dup
    guard; broadcast anchor panel + two-level top-k merge."""
    from document_quality_assessment_ocr_spark.operators.similarity import (
        hard_negative_mine,
    )

    emb = _par(spark.read.parquet(f"{sf_dir}/embeddings.parquet")).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        F.col("label").cast("int").alias("label"),
    )
    return hard_negative_mine(emb, anchor_ids=[0, 1, 2], k=5, dup_tau=0.99)


def _hard_negatives_sql(k: int = 5, dup_tau: float = 0.99) -> str:
    """q113 oracle: same rounded cosine, different-label predicate and
    dup-tau guard, ROW_NUMBER over (cos DESC, neighbor_id)."""
    return f"""
        WITH e AS (
            SELECT CAST(vec_id AS BIGINT) AS vec_id,
                   CAST(embedding AS DOUBLE[]) AS v,
                   CAST(label AS INT) AS label
            FROM embeddings
        ), a AS (
            SELECT vec_id AS anchor_id, v AS av, label AS al
            FROM e WHERE vec_id IN (0, 1, 2)
        ), s AS (
            SELECT a.anchor_id, e.vec_id AS neighbor_id,
                   e.label AS neg_label,
                   ROUND(LIST_DOT_PRODUCT(a.av, e.v)
                         / SQRT(LIST_DOT_PRODUCT(a.av, a.av)
                                * LIST_DOT_PRODUCT(e.v, e.v)), 6) AS cos
            FROM a JOIN e ON e.label <> a.al
        ), r AS (
            SELECT anchor_id, neighbor_id, neg_label, cos,
                   CAST(ROW_NUMBER() OVER (PARTITION BY anchor_id
                                           ORDER BY cos DESC, neighbor_id)
                        AS INT) AS rank
            FROM s WHERE cos < {float(dup_tau)!r}
        )
        SELECT anchor_id, neighbor_id, neg_label, cos, rank
        FROM r WHERE rank <= {int(k)}
    """


def _q_fuzzy_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy decontamination: MinHash-LSH near-match of training docs
    against the (doc_id % 89 == 0) eval slice — banded candidates, then
    signature-agreement Jaccard estimate >= 8/16; eval side broadcast."""
    from document_quality_assessment_ocr_spark.operators.decontam import (
        fuzzy_contamination_report,
    )

    docs = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    eval_set = docs.where(F.col("doc_id") % 89 == 0)
    train = docs.where(F.col("doc_id") % 89 != 0)
    return fuzzy_contamination_report(
        train, eval_set, n_hashes=16, bands=4, ngram=5, min_match=8
    )


def _fuzzy_decontam_sql(
    n_hashes: int = 16,
    bands: int = 4,
    ngram: int = 5,
    min_match: int = 8,
    seed: int = 1,
) -> str:
    """q114 oracle: ONE signature CTE over all documents (per-doc MinHash
    is row-local, so computing before the %89 split is identical), band
    keys via UNION ALL + MD5(CONCAT_WS) — BIGINT rendering matches
    Spark's concat_ws — then the same agreement count (CAST AS BIGINT,
    the additive form never becomes HUGEINT but be explicit) and the
    exact n/16 double estimate."""
    rows = n_hashes // bands
    band_sel = "\n            UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, MD5(CONCAT_WS('#', "
        + ", ".join(f"h{b * rows + r:02d}" for r in range(rows))
        + ")) AS key FROM sig"
        for b in range(bands)
    )
    agree = " + ".join(
        f"(CASE WHEN t.h{i:02d} = e.h{i:02d} THEN 1 ELSE 0 END)"
        for i in range(n_hashes)
    )
    return (
        _minhash_sql(n_hashes, ngram, seed, "word", "documents")
        + f""", bk AS (
            {band_sel}
        ), tb AS (
            SELECT doc_id, band, key FROM bk WHERE doc_id % 89 <> 0
        ), eb AS (
            SELECT doc_id AS eval_id, band, key FROM bk WHERE doc_id % 89 = 0
        ), cand AS (
            SELECT DISTINCT tb.doc_id, eb.eval_id
            FROM tb JOIN eb USING (band, key)
        ), agr AS (
            SELECT c.doc_id, c.eval_id, CAST({agree} AS BIGINT) AS n_match
            FROM cand c
            JOIN sig t ON t.doc_id = c.doc_id
            JOIN sig e ON e.doc_id = c.eval_id
        )
        SELECT doc_id, eval_id, n_match,
               CAST(n_match AS DOUBLE) / {float(n_hashes)!r} AS est_jaccard
        FROM agr WHERE n_match >= {int(min_match)}
    """
    )


def _q_cluster_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-holdout splits: hash the k-means CELL (not the row) into
    90/5/5 intervals so near-dups never straddle train and eval — the
    leakage-safe twin of q96's row-hash splits."""
    from document_quality_assessment_ocr_spark.operators.similarity import (
        cluster_holdout_split,
    )

    return cluster_holdout_split(_emb(spark, sf_dir), salt=101)


def _cluster_holdout_sql(
    sf_dir: str | None = None,
    n_centroids: int = 16,
    sample_rows: int = 512,
    seed: int = 42,
    salt: int = 101,
) -> str:
    """q115 oracle: the shared centroid literals (q17/q78/q107 technique)
    for the argmin cell, then the q96 md5-uniform CASE on the CELL id —
    BIGINT-vs-INT cell renders the same VARCHAR on both engines."""
    import numpy as np
    import pyarrow.parquet as pq

    from document_quality_assessment_ocr_spark.operators.similarity import _kmeans_lite

    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.array(tbl.column("vec_id"))
    vecs = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    cents = _kmeans_lite(vecs[order[:sample_rows]], n_centroids, seed=seed)
    dists = ", ".join(
        "(-2.0 * LIST_DOT_PRODUCT(v, ["
        + ", ".join(repr(float(x)) for x in c)
        + f"]) + {float((c * c).sum())!r})"
        for c in cents
    )
    cell = f"(LIST_INDEXOF([{dists}], LIST_MIN([{dists}])) - 1)"
    u = _md5_uniform_sql("cell", salt)
    return f"""
        WITH e AS (
            SELECT CAST(vec_id AS BIGINT) AS vec_id,
                   CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ), assigned AS (
            SELECT vec_id, {cell} AS cell FROM e
        )
        SELECT vec_id, CAST(cell AS INT) AS cell,
               CASE WHEN {u} < 0.9 THEN 'train'
                    WHEN {u} < 0.95 THEN 'val'
                    ELSE 'test' END AS split
        FROM assigned
    """


def _q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point Flesch reading-ease in milli units — every division a
    non-negative integer DIV so both engines agree bit-for-bit; one
    codegen projection, zero shuffle."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        flesch_readability,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return flesch_readability(d)


_READABILITY_SQL = f"""
    WITH d AS (
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               LOWER(COALESCE(text, '')) AS t
        FROM documents
    ), c AS (
        SELECT doc_id,
               CAST(LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(t), '{WS}+'),
                        x -> x <> '')) AS BIGINT) AS n_words,
               CAST(LEN(REGEXP_EXTRACT_ALL(t, '[.!?]+')) AS BIGINT) AS n_sents,
               CAST(LEN(REGEXP_EXTRACT_ALL(t, '[aeiouy]+')) AS BIGINT) AS n_syll
        FROM d
    )
    SELECT doc_id, n_words, n_sents, n_syll,
           206835 - ((1015 * GREATEST(n_words, 1)) // GREATEST(n_sents, 1))
                  - ((84600 * n_syll) // GREATEST(n_words, 1)) AS flesch_milli
    FROM c
"""


def _q_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup audit: cluster-size histogram over the q31 near-dup
    components — n_docs/n_removed as integer PRODUCTS of grouped counts,
    never a surfaced SUM."""
    from document_quality_assessment_ocr_spark.operators.dedup import dedup_report

    return dedup_report(
        _doc(spark, sf_dir).select(
            F.col("doc_id").cast("long").alias("doc_id"), "text"
        ),
        n_hashes=8,
        bands=4,
        ngram=5,
    )


def _dedup_report_sql() -> str:
    """q117 oracle: the q31 component CTE chain, the same cluster_id
    COALESCE, then the two stacked COUNT aggregates and integer products."""
    return (
        _clusters_comp_sql()
        + """
            , labeled AS (
                SELECT COALESCE(comp.cid, d.doc_id) AS cluster_id
                FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents) d
                LEFT JOIN comp ON comp.did = d.doc_id
            ), sizes AS (
                SELECT cluster_id, COUNT(*) AS cluster_size
                FROM labeled GROUP BY cluster_id
            )
            SELECT cluster_size, COUNT(*) AS n_clusters,
                   cluster_size * COUNT(*) AS n_docs,
                   (cluster_size - 1) * COUNT(*) AS n_removed
            FROM sizes GROUP BY cluster_size
        """
    )


def _q_window_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-stride sliding-window chunking (64-token windows, stride 48 —
    16 tokens of overlap): the long-doc context-training grid; integer
    chunk-count arithmetic, posexplode fan-out, zero shuffle."""
    from document_quality_assessment_ocr_spark.operators.chunking import window_chunks

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return window_chunks(d, window=64, stride=48)


def _window_chunks_sql(window: int = 64, stride: int = 48) -> str:
    """q118 oracle: same lowercase token array, same integer
    ``1 + (max(0, n−w) + s − 1) // s`` chunk count, DuckDB inclusive
    1-based list slices (end-clamped like the engine's F.slice)."""
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                       TRIM(LOWER(COALESCE(text, ''))), '{WS}+'),
                       x -> x <> '') AS tk
            FROM documents
        ), b AS (
            SELECT doc_id, tk, CAST(LEN(tk) AS BIGINT) AS n,
                   1 + (GREATEST(CAST(LEN(tk) AS BIGINT) - {int(window)}, 0)
                        + {int(stride)} - 1) // {int(stride)} AS n_chunks
            FROM d WHERE LEN(tk) >= 1
        ), f AS (
            SELECT doc_id, tk, n,
                   UNNEST(RANGE(0, n_chunks)) AS i
            FROM b
        )
        SELECT doc_id,
               CAST(i AS BIGINT) AS chunk_idx,
               CAST(i * {int(stride)} + 1 AS BIGINT) AS start_tok,
               CAST(LEN(tk[CAST(i * {int(stride)} + 1 AS INT)
                          :CAST(i * {int(stride)} + {int(window)} AS INT)])
                    AS BIGINT) AS n_chunk_tokens,
               COALESCE(ARRAY_TO_STRING(
                   tk[CAST(i * {int(stride)} + 1 AS INT)
                     :CAST(i * {int(stride)} + {int(window)} AS INT)], ' '), '')
                   AS chunk_text
        FROM f
    """


def _q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN recall audit: per-probe recall@5 of the q17 IVF index against
    the exact brute-force top-5 — the tuning metric for n_probe/centroid
    count; both aggregates are probe-panel-sized."""
    from document_quality_assessment_ocr_spark.operators.retrieval import recall_at_k
    from document_quality_assessment_ocr_spark.operators.similarity import (
        cosine_topk_bruteforce,
        ivf_topk,
    )

    emb = _emb(spark, sf_dir)
    approx = ivf_topk(emb, probe_ids=[0, 1, 2], dim=64, k=5, n_centroids=8)
    exact = cosine_topk_bruteforce(emb, probe_ids=[0, 1, 2], k=5)
    return recall_at_k(approx, exact, k=5)


def _ann_recall_sql(k: int = 5) -> str:
    """q119 oracle: the q17 IVF oracle nested as a CTE (same centroid
    literals) against an inline exact top-k on the same (0,1,2) panel,
    then the hit/denominator counts and one exact IEEE division."""
    return f"""
        WITH approx AS (
            {_ivf_sql()}
        ), e2 AS (
            SELECT CAST(vec_id AS BIGINT) AS vec_id,
                   CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ), p2 AS (
            SELECT vec_id AS probe_id, v AS pv FROM e2 WHERE vec_id IN (0, 1, 2)
        ), s2 AS (
            SELECT probe_id, e2.vec_id AS neighbor_id,
                   ROUND(LIST_DOT_PRODUCT(pv, v)
                         / SQRT(LIST_DOT_PRODUCT(pv, pv)
                                * LIST_DOT_PRODUCT(v, v)), 6) AS cos
            FROM p2, e2 WHERE e2.vec_id <> probe_id
        ), exact AS (
            SELECT probe_id, neighbor_id
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                               ORDER BY cos DESC, neighbor_id ASC)
                         AS rank
                  FROM s2)
            WHERE rank <= {int(k)}
        ), hit AS (
            SELECT a.probe_id, COUNT(*) AS n_hit
            FROM (SELECT probe_id, neighbor_id FROM approx
                  WHERE rank <= {int(k)}) a
            JOIN exact e ON a.probe_id = e.probe_id
                        AND a.neighbor_id = e.neighbor_id
            GROUP BY a.probe_id
        ), ex AS (
            SELECT probe_id, COUNT(*) AS n_exact FROM exact GROUP BY probe_id
        )
        SELECT ex.probe_id,
               CAST(COALESCE(hit.n_hit, 0) AS BIGINT) AS n_hit,
               CAST(ex.n_exact AS BIGINT) AS n_exact,
               CAST(COALESCE(hit.n_hit, 0) AS DOUBLE)
                   / CAST(ex.n_exact AS DOUBLE) AS recall
        FROM ex LEFT JOIN hit ON hit.probe_id = ex.probe_id
    """


_PHRASE = ["table", "table"]  # repeated term exercises the duplicate-slot path


def _q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase search: every document containing the exact
    token phrase, with match count and first 0-based position —
    map-side term filter, one hash exchange over phrase-term postings,
    adjacency by array arithmetic (never a postings self-join)."""
    from document_quality_assessment_ocr_spark.operators.phrase import phrase_search

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return phrase_search(d, _PHRASE)


def _phrase_sql(phrase: list[str]) -> str:
    """q120 oracle: same tokenizer, postings as (doc, pos, tok) rows,
    adjacency as pos-arithmetic self-joins (the classic formulation the
    engine deliberately avoids at scale — single-node DuckDB is fine)."""
    terms = [t.lower() for t in phrase]
    joins = "\n".join(
        f"            JOIN t t{i} ON t{i}.doc_id = t0.doc_id"
        f" AND t{i}.pos = t0.pos + {i} AND t{i}.tok = '{t}'"
        for i, t in enumerate(terms[1:], start=1)
    )
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                       TRIM(LOWER(COALESCE(text, ''))), '{WS}+'),
                       x -> x <> '') AS tk
            FROM documents
        ), t AS (
            SELECT doc_id, tk[CAST(i AS INT)] AS tok,
                   CAST(i - 1 AS BIGINT) AS pos
            FROM (SELECT doc_id, tk, UNNEST(RANGE(1, LEN(tk) + 1)) AS i
                  FROM d)
        ), m AS (
            SELECT t0.doc_id, t0.pos
            FROM t t0
{joins}
            WHERE t0.tok = '{terms[0]}'
        )
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches,
               CAST(MIN(pos) AS BIGINT) AS first_pos
        FROM m GROUP BY doc_id
    """


def _q_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram LM surprisal (Jelinek–Mercer, fixed-point
    micro-probs): train on the corpus itself, score every doc's mean
    whole-bit bigram surprisal — the KenLM/CCNet perplexity-filter shape
    one order up from q67's unigram."""
    from document_quality_assessment_ocr_spark.operators.lm import bigram_lm_bits

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return bigram_lm_bits(d, lam_milli=700, keep_lo_bits=3.0, keep_hi_bits=8.0)


def _bigram_lm_sql(
    lam_milli: int = 700, lo_bits: float = 3.0, hi_bits: float = 8.0
) -> str:
    """q121 oracle: same bigram stream, the same three integer-count
    aggregates, the same all-integer interpolation and binary-length
    log2 — every surfaced integer CAST to BIGINT (HUGEINT trap)."""
    lam = int(lam_milli)
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                       TRIM(LOWER(COALESCE(text, ''))), '{WS}+'),
                       x -> x <> '') AS tk
            FROM documents
        ), bg AS (
            SELECT doc_id,
                   tk[CAST(i AS INT)] || ' ' || tk[CAST(i AS INT) + 1] AS bg
            FROM (SELECT doc_id, tk,
                         UNNEST(RANGE(1, GREATEST(LEN(tk) - 1, 0) + 1)) AS i
                  FROM d)
        ), c12 AS (
            SELECT bg, CAST(COUNT(*) AS BIGINT) AS c12 FROM bg GROUP BY bg
        ), c1 AS (
            SELECT STR_SPLIT(bg, ' ')[1] AS w1,
                   CAST(SUM(c12) AS BIGINT) AS c1
            FROM c12 GROUP BY 1
        ), c2 AS (
            SELECT STR_SPLIT(bg, ' ')[2] AS w2,
                   CAST(SUM(c12) AS BIGINT) AS c2
            FROM c12 GROUP BY 1
        ), tot AS (
            SELECT CAST(SUM(c12) AS BIGINT) AS nb FROM c12
        ), model AS (
            SELECT c12.bg,
                   CAST(LENGTH(BIN(1000000 // GREATEST(
                       ({lam} * ((c12.c12 * 1000000) // c1.c1)
                        + {1000 - lam} * ((c2.c2 * 1000000) // tot.nb))
                       // 1000, 1))) - 1 AS BIGINT) AS bits
            FROM c12
            JOIN c1 ON c1.w1 = STR_SPLIT(c12.bg, ' ')[1]
            JOIN c2 ON c2.w2 = STR_SPLIT(c12.bg, ' ')[2]
            CROSS JOIN tot
        ), per_doc AS (
            SELECT bg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                   CAST(SUM(m.bits) AS BIGINT) AS sum_bits
            FROM bg JOIN model m ON m.bg = bg.bg
            GROUP BY bg.doc_id
        ), pd AS (
            SELECT doc_id, n_bigrams, sum_bits,
                   CAST(sum_bits AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
                       AS avg_bits
            FROM per_doc
        )
        SELECT dd.doc_id,
               CAST(COALESCE(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
               CAST(COALESCE(p.sum_bits, 0) AS BIGINT) AS sum_bits,
               p.avg_bits,
               COALESCE(p.avg_bits BETWEEN CAST({lo_bits!r} AS DOUBLE)
                                       AND CAST({hi_bits!r} AS DOUBLE),
                        FALSE) AS keep
        FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents) dd
        LEFT JOIN pd p ON p.doc_id = dd.doc_id
    """


def _q_edit_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-candidate fuzzy-dup pairs verified by exact prefix
    Levenshtein (BigCode-style propose-then-confirm): integer
    milli-similarity over the longer prefix, bucketed candidates only."""
    from document_quality_assessment_ocr_spark.operators.editsim import (
        edit_verified_pairs,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return edit_verified_pairs(
        d, n_hashes=16, bands=4, ngram=5, shingle="word",
        prefix_chars=200, keep_sim_milli=800,
    )


def _edit_pairs_sql(prefix_chars: int = 200, keep_sim_milli: int = 800) -> str:
    """q122 oracle: the q25 candidate chain (16 word-shingle perms, 4×4
    bands) + DuckDB's LEVENSHTEIN (same classic DP as Spark's) and the
    shared non-negative integer DIV milli-similarity."""
    return _minhash_sql(16, shingle="word") + f"""
            , bands AS (
                SELECT doc_id, 0 AS band,
                       MD5(CONCAT_WS('#', h00, h01, h02, h03)) AS key FROM sig
                UNION ALL SELECT doc_id, 1,
                       MD5(CONCAT_WS('#', h04, h05, h06, h07)) FROM sig
                UNION ALL SELECT doc_id, 2,
                       MD5(CONCAT_WS('#', h08, h09, h10, h11)) FROM sig
                UNION ALL SELECT doc_id, 3,
                       MD5(CONCAT_WS('#', h12, h13, h14, h15)) FROM sig
            ), cand AS (
                SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.key = b.key
                 AND a.doc_id < b.doc_id
            ), tx AS (
                SELECT CAST(doc_id AS BIGINT) AS doc_id,
                       SUBSTR(COALESCE(text, ''), 1, {int(prefix_chars)})
                           AS pref
                FROM documents
            ), scored AS (
                SELECT c.id_a, c.id_b,
                       CAST(LEVENSHTEIN(a.pref, b.pref) AS BIGINT) AS dist,
                       CAST(GREATEST(GREATEST(LENGTH(a.pref),
                                              LENGTH(b.pref)), 1)
                            AS BIGINT) AS mx
                FROM cand c
                JOIN tx a ON a.doc_id = c.id_a
                JOIN tx b ON b.doc_id = c.id_b
            )
            SELECT id_a, id_b, dist,
                   CAST(1000 - (1000 * dist) // mx AS BIGINT) AS sim_milli,
                   (1000 - (1000 * dist) // mx) >= {int(keep_sim_milli)}
                       AS is_dup
            FROM scored
    """


def _q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup: the doc_id%5==0 slice plays the NEW
    shard, the rest the EXISTING corpus — banded-LSH candidates,
    signature-agreement verify, min-struct argmax to one verdict row per
    new doc (the CCNet/Dolma new-shard-vs-index shape)."""
    from document_quality_assessment_ocr_spark.operators.dedup import (
        incremental_dedup_flags,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return incremental_dedup_flags(
        d.where(F.col("doc_id") % 5 == 0),
        d.where(F.col("doc_id") % 5 != 0),
        n_hashes=16, bands=4, ngram=5, min_match=12,
    )


def _incremental_dedup_sql(
    n_hashes: int = 16, bands: int = 4, ngram: int = 5,
    min_match: int = 12, seed: int = 1,
) -> str:
    """q123 oracle: ONE signature CTE (per-doc MinHash is row-local, so
    pre-split computation is identical), the q114 band/agreement chain
    split by %5, then the q44-style min-struct argmax ((w).field access)
    and a LEFT JOIN so candidate-less new docs row out with zeros."""
    rows = n_hashes // bands
    band_sel = "\n            UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, MD5(CONCAT_WS('#', "
        + ", ".join(f"h{b * rows + r:02d}" for r in range(rows))
        + ")) AS key FROM sig"
        for b in range(bands)
    )
    agree = " + ".join(
        f"(CASE WHEN t.h{i:02d} = e.h{i:02d} THEN 1 ELSE 0 END)"
        for i in range(n_hashes)
    )
    thr = (1000 * int(min_match)) // int(n_hashes)
    return (
        _minhash_sql(n_hashes, ngram, seed, "word", "documents")
        + f""", bk AS (
            {band_sel}
        ), nb AS (
            SELECT doc_id AS new_id, band, key FROM bk WHERE doc_id % 5 = 0
        ), bb AS (
            SELECT doc_id AS base_id, band, key FROM bk WHERE doc_id % 5 <> 0
        ), cand AS (
            SELECT DISTINCT nb.new_id, bb.base_id
            FROM nb JOIN bb USING (band, key)
        ), agr AS (
            SELECT c.new_id, c.base_id,
                   (1000 * CAST({agree} AS BIGINT)) // {int(n_hashes)}
                       AS agree_milli
            FROM cand c
            JOIN sig t ON t.doc_id = c.new_id
            JOIN sig e ON e.doc_id = c.base_id
        ), best AS (
            SELECT new_id, CAST(COUNT(*) AS BIGINT) AS n_candidates,
                   MIN({{'nega': -agree_milli, 'bid': base_id}}) AS w
            FROM agr GROUP BY new_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(b.n_candidates, 0) AS BIGINT) AS n_candidates,
               CAST((b.w).bid AS BIGINT) AS best_match_id,
               CAST(-(b.w).nega AS BIGINT) AS best_agree_milli,
               COALESCE(-(b.w).nega >= {thr}, FALSE) AS is_dup
        FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents
              WHERE doc_id % 5 = 0) d
        LEFT JOIN best b ON b.new_id = d.doc_id
    """
    )


def _q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CMS-propose / exact-verify heavy hitters over the token stream:
    the sketch rides back as a literal map so the candidate filter is
    map-side and the exact aggregate shuffles only heavy candidates —
    est >= exact always (CMS never undercounts)."""
    from document_quality_assessment_ocr_spark.operators.sketches import (
        heavy_hitters_verified,
    )

    toks = _doc(spark, sf_dir).select(
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.coalesce(F.col("text"), F.lit("")))),
                        WS + "+"),
                lambda x: x != F.lit(""),
            )
        ).alias("term")
    )
    return heavy_hitters_verified(toks, "term", threshold=700)


def _heavy_hitters_sql(threshold: int = 700, width: int = 256, depth: int = 4) -> str:
    """q124 oracle: the q43 cell expression, per-DISTINCT-term min over
    sketch cells (single-node formulation of the engine's map-side
    literal lookup — identical integers), exact counts joined back,
    candidates filtered on the ESTIMATE."""
    toks = (
        f"LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(COALESCE(text,''))), '{WS}+'),"
        " x -> x <> '')"
    )
    js = ", ".join(str(j) for j in range(depth))
    pos = f"CAST('0x' || SUBSTR(MD5(term), 1 + 8 * j, 8) AS BIGINT) % {width}"
    pos_jj = f"CAST('0x' || SUBSTR(MD5(t.term), 1 + 8 * jj.j, 8) AS BIGINT) % {width}"
    return f"""
        WITH tok AS (
            SELECT UNNEST({toks}) AS term FROM documents
        ), cells AS (
            SELECT j, {pos} AS pos FROM tok, (SELECT UNNEST([{js}]) AS j)
        ), cms AS (
            SELECT j, pos, COUNT(*) AS c FROM cells GROUP BY 1, 2
        ), est AS (
            SELECT t.term, CAST(MIN(COALESCE(c, 0)) AS BIGINT) AS est
            FROM (SELECT DISTINCT term FROM tok) t
            CROSS JOIN (SELECT UNNEST([{js}]) AS j) jj
            LEFT JOIN cms ON cms.j = jj.j AND cms.pos = ({pos_jj})
            GROUP BY t.term
        ), exact AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS exact
            FROM tok GROUP BY 1
        )
        SELECT e.term, e.est, x.exact, (x.exact >= {int(threshold)}) AS is_true_heavy
        FROM est e JOIN exact x USING (term)
        WHERE e.est >= {int(threshold)}
    """


def _q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth profile: new token types per
    equal-width doc_id slice + running vocab size — one min-aggregate
    (first occurrence per type), bucket counts, driver prefix over a
    FIXED n_buckets relation."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        vocab_growth,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return vocab_growth(d, n_buckets=10, ngram=3)


def _vocab_growth_sql(n_buckets: int = 10, ngram: int = 3) -> str:
    """q125 oracle: same first-occurrence min over word-{ngram}-gram
    types (LIST_SLICE grams — the _minhash_sql word-mode twin of
    quality.ngrams_from_tokens), same integer span arithmetic from
    MIN/MAX bounds, cumulative via window SUM (the single-node
    formulation) CAST back to BIGINT."""
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                       TRIM(LOWER(COALESCE(text, ''))), '{WS}+'),
                       x -> x <> '') AS tk
            FROM documents
        ), bounds AS (
            SELECT MIN(doc_id) AS lo,
                   (MAX(doc_id) - MIN(doc_id)) // {int(n_buckets)} + 1 AS span
            FROM d
        ), t AS (
            SELECT doc_id,
                   ARRAY_TO_STRING(LIST_SLICE(tk, CAST(i AS INT),
                       CAST(i AS INT) + {int(ngram) - 1}), ' ') AS tok
            FROM (SELECT doc_id, tk,
                         UNNEST(RANGE(1, GREATEST(LEN(tk) - {int(ngram) - 1}, 0)
                                         + 1)) AS i
                  FROM d)
        ), f AS (
            SELECT tok, CAST(MIN(doc_id) AS BIGINT) AS fd FROM t GROUP BY tok
        ), per AS (
            SELECT CAST((f.fd - b.lo) // b.span AS BIGINT) AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS new_types
            FROM f, bounds b GROUP BY 1
        )
        SELECT bucket, new_types,
               CAST(SUM(new_types) OVER (ORDER BY bucket) AS BIGINT)
                   AS cum_types
        FROM per
    """


def _q_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering: global (clamped-Flesch DESC, doc_id ASC)
    rank WITHOUT a global window — bounded score-bucket offsets + a
    bucket-partitioned row_number — then rank%4 stride epochs."""
    from document_quality_assessment_ocr_spark.operators.curriculum import (
        curriculum_order,
    )
    from document_quality_assessment_ocr_spark.operators.textstats import (
        flesch_readability,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    scored = flesch_readability(d).select(
        "doc_id",
        F.expr("LEAST(GREATEST(flesch_milli, 0L), 206835L)").alias("cscore"),
    )
    return curriculum_order(scored, "cscore", n_epochs=4, bucket_width=1000)


def _curriculum_sql(n_epochs: int = 4) -> str:
    """q126 oracle: the q116 readability SQL nested as a subquery,
    clamped to the conventional non-negative scale, then the
    single-reducer ROW_NUMBER the engine deliberately avoids."""
    return f"""
        SELECT doc_id, cscore,
               CAST(ROW_NUMBER() OVER (ORDER BY cscore DESC, doc_id ASC) - 1
                    AS BIGINT) AS rank,
               CAST((ROW_NUMBER() OVER (ORDER BY cscore DESC, doc_id ASC) - 1)
                    % {int(n_epochs)} AS BIGINT) AS epoch
        FROM (
            SELECT doc_id,
                   LEAST(GREATEST(flesch_milli, 0), 206835) AS cscore
            FROM ({_READABILITY_SQL}) r
        )
    """


def _q_anchor_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text index: top-3 anchor texts per target host — the
    link-based topicality signal; outlinks → URL parse (anchor_text
    passed through) → one (host, anchor) aggregate → Zipf-bounded
    per-host rank."""
    from document_quality_assessment_ocr_spark.operators.html import (
        anchor_index,
        extract_links,
    )
    from document_quality_assessment_ocr_spark.operators.urls import parse_urls

    links = extract_links(_synth_html(_doc(spark, sf_dir)))
    parsed = parse_urls(
        links.select("doc_id", F.col("href").alias("url"), "anchor_text"),
        keep=("anchor_text",),
    )
    return anchor_index(parsed, k=3)


def _anchor_index_sql(k: int = 3) -> str:
    """q127 oracle: the q72 chain with anchor_text threaded through the
    parse CTEs (extra param — the twin of parse_urls' keep), then the
    same (host, anchor) count and (n DESC, anchor ASC) ROW_NUMBER."""
    from document_quality_assessment_ocr_spark.operators.html import ANCHOR_HREF

    g2 = f"REGEXP_EXTRACT(ms[CAST(i AS INT)], '{ANCHOR_HREF}', 2)"
    return _HTML_SYNTH_CTE + f""", mt AS (
            SELECT doc_id,
                   REGEXP_EXTRACT_ALL(COALESCE(html,''), '{ANCHOR_HREF}') AS ms
            FROM d
        ), ex AS (
            SELECT doc_id, ms, UNNEST(RANGE(1, LEN(ms) + 1)) AS i FROM mt
        ), lk AS (
            SELECT doc_id,
                   REGEXP_EXTRACT(ms[CAST(i AS INT)], '{ANCHOR_HREF}', 1) AS url,
                   {_vis_sql(g2)} AS anchor_text
            FROM ex
        ), {_url_parse_ctes('lk', extra=', anchor_text')}, cnt AS (
            SELECT host, anchor_text, CAST(COUNT(*) AS BIGINT) AS n_links
            FROM parsed WHERE host <> '' AND anchor_text <> ''
            GROUP BY host, anchor_text
        )
        SELECT host, anchor_text, n_links, CAST(rn AS INT) AS rank
        FROM (SELECT host, anchor_text, n_links,
                     ROW_NUMBER() OVER (PARTITION BY host
                                        ORDER BY n_links DESC,
                                                 anchor_text ASC) AS rn
              FROM cnt)
        WHERE rn <= {int(k)}
    """


def _q_exact_k_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k deterministic uniform sample: the 25 smallest
    md5(salt#id) draws via the two-level top-k merge — reservoir
    semantics, no reservoir state, retry-stable."""
    from document_quality_assessment_ocr_spark.operators.sampling import (
        exact_k_sample,
    )

    d = _doc(spark, sf_dir).select(F.col("doc_id").cast("long").alias("doc_id"))
    return exact_k_sample(d, k=25)


def _exact_k_sample_sql(k: int = 25, salt: str = "sample1") -> str:
    """q128 oracle: the single-node ORDER BY md5 LIMIT k formulation the
    two-level merge must reproduce exactly (tie-break (u, doc_id) —
    the engine's struct order)."""
    return f"""
        WITH u AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   MD5('{salt}#' || CAST(CAST(doc_id AS BIGINT) AS VARCHAR))
                       AS sample_u
            FROM documents
        )
        SELECT doc_id, sample_u, CAST(rn AS INT) AS rank
        FROM (SELECT doc_id, sample_u,
                     ROW_NUMBER() OVER (ORDER BY sample_u ASC, doc_id ASC)
                         AS rn
              FROM u)
        WHERE rn <= {int(k)}
    """


def _q_shard_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard order-sensitive content checksums (100-doc shards):
    the ingest-integrity manifest — one hash aggregate, per-shard state
    bounded by shard_width digests."""
    from document_quality_assessment_ocr_spark.operators.profile import (
        shard_checksums,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return shard_checksums(d, shard_width=100)


def _shard_checksums_sql(shard_width: int = 100) -> str:
    """q129 oracle: STRING_AGG(h, '' ORDER BY doc_id) — DuckDB's ordered
    aggregate is the single-node twin of sort_array(collect_list)."""
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   MD5(COALESCE(text, '')) AS h
            FROM documents
        )
        SELECT doc_id // {int(shard_width)} AS shard,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               MD5(STRING_AGG(h, '' ORDER BY doc_id)) AS checksum
        FROM d GROUP BY 1
    """


def _q_stopgram_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate trigram blocklist: grams in >= 1% of documents — the
    stop-shingle list builder feeding ngram-jaccard's max_doc_freq cap
    and boilerplate strippers."""
    from document_quality_assessment_ocr_spark.operators.quality import (
        stopgram_blocklist,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return stopgram_blocklist(d, n=3, min_df_permille=10)


def _stopgram_sql(n: int = 3, min_df_permille: int = 10) -> str:
    """q130 oracle: per-doc DISTINCT LIST_SLICE grams, one df aggregate,
    integer permille via //, every surfaced count CAST to BIGINT."""
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                       TRIM(LOWER(COALESCE(text, ''))), '{WS}+'),
                       x -> x <> '') AS tk
            FROM documents
        ), g AS (
            SELECT DISTINCT doc_id,
                   ARRAY_TO_STRING(LIST_SLICE(tk, CAST(i AS INT),
                       CAST(i AS INT) + {int(n) - 1}), ' ') AS gram
            FROM (SELECT doc_id, tk,
                         UNNEST(RANGE(1, GREATEST(LEN(tk) - {int(n) - 1}, 0)
                                         + 1)) AS i
                  FROM d)
        ), df AS (
            SELECT gram, CAST(COUNT(*) AS BIGINT) AS df FROM g GROUP BY gram
        ), tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
        )
        SELECT gram, df, (1000 * df) // n_docs AS df_permille
        FROM df, tot
        WHERE (1000 * df) // n_docs >= {int(min_df_permille)}
    """


def _host_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host→host link edges shared by q131 (PageRank) and q149 (HITS):
    doc's own host → outlink target host, self-loops dropped,
    multiplicity kept as weight."""
    from document_quality_assessment_ocr_spark.operators.html import extract_links
    from document_quality_assessment_ocr_spark.operators.urls import parse_urls

    d = _doc(spark, sf_dir)
    src = (
        parse_urls(_synth_urls(d))
        .where(F.col("host") != "")
        .select("doc_id", F.col("host").alias("src"))
    )
    dst = (
        parse_urls(
            extract_links(_synth_html(d)).select(
                "doc_id", F.col("href").alias("url")
            )
        )
        .where(F.col("host") != "")
        .select("doc_id", F.col("host").alias("dst"))
    )
    return (
        src.join(dst, "doc_id")
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
    )


def _q_host_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-graph PageRank — domain-level authority for quality
    weighting: edges (doc's own host → outlink target host, self-loops
    dropped, multiplicity = weight), ranks via the shared fixed-point
    integer PageRank (bit-exact iterative numerics)."""
    from document_quality_assessment_ocr_spark.operators.graph import pagerank_fixed

    edges = _host_edges(spark, sf_dir)
    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    return (
        pagerank_fixed(nodes, edges, iters=3)
        .select(F.col("id").alias("host"), "pr")
    )


def _host_graph_ctes() -> str:
    """Shared q131/q149 oracle prefix: TWO url-parse chains in one query
    (prefix s/t — the parse twin's prefix param), host→host edges with
    self-loops dropped, through the `nodes` CTE."""
    from document_quality_assessment_ocr_spark.operators.html import ANCHOR_HREF

    # single-source the URL synthesis: lift the exact `u AS (...)` text out
    # of the shared q65/q66/q68 prefix (the byte-identical _synth_urls twin)
    # and point it at `du` (this query's `d` is the HTML-synth CTE)
    synth = _url_sqls()[0]
    u_cte = synth[synth.index("u AS (") : synth.index("), p0 AS")] + ")"
    u_cte = u_cte.replace("FROM d\n", "FROM du\n")
    return _HTML_SYNTH_CTE + f""", du AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, source
            FROM documents
        ), {u_cte}, {_url_parse_ctes('u', prefix='s')}, mt AS (
            SELECT doc_id,
                   REGEXP_EXTRACT_ALL(COALESCE(html,''), '{ANCHOR_HREF}') AS ms
            FROM d
        ), ex AS (
            SELECT doc_id, ms, UNNEST(RANGE(1, LEN(ms) + 1)) AS i FROM mt
        ), lk AS (
            SELECT doc_id,
                   REGEXP_EXTRACT(ms[CAST(i AS INT)], '{ANCHOR_HREF}', 1) AS url
            FROM ex
        ), {_url_parse_ctes('lk', prefix='t')}, edges AS (
            SELECT s.host AS src, t.host AS dst
            FROM sparsed s JOIN tparsed t USING (doc_id)
            WHERE s.host <> '' AND t.host <> '' AND s.host <> t.host
        ), nodes AS (
            SELECT DISTINCT src AS id FROM edges
            UNION SELECT DISTINCT dst FROM edges
        )"""


def _host_pagerank_sql(iters: int = 3) -> str:
    """q131 oracle: the shared host-graph prefix, then the q56 fixed-point
    PageRank unroll."""
    its, prev = _pr_unrolled_ctes(iters)
    return _host_graph_ctes() + f""", deg AS (
            SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY 1
        ), r0 AS (
            SELECT id, CAST(1000000000 AS BIGINT) AS pr FROM nodes
        ), {", ".join(its)}
        SELECT id AS host, pr FROM {prev}
    """


def _q_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus selection: keep the best-scored documents
    (clamped Flesch milli, the q126 score) while the running token total
    stays within budget — global prefix sum WITHOUT a global window
    (score-bucket token offsets + bucket-partitioned running SUM)."""
    from document_quality_assessment_ocr_spark.operators.curriculum import (
        budget_select,
    )
    from document_quality_assessment_ocr_spark.operators.textstats import (
        flesch_readability,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    scored = flesch_readability(d).select(
        "doc_id",
        F.expr("LEAST(GREATEST(flesch_milli, 0L), 206835L)").alias("cscore"),
        "n_words",
    )
    return budget_select(
        scored, token_budget=15_000, score_col="cscore", tokens_col="n_words"
    )


def _budget_select_sql(token_budget: int = 15_000) -> str:
    """q132 oracle: the q126 clamped-readability score + the
    single-reducer running-SUM window the engine deliberately avoids;
    CAST AS BIGINT on the windowed SUM (HUGEINT trap)."""
    return f"""
        SELECT doc_id, cscore, n_words,
               CAST(SUM(n_words) OVER w AS BIGINT) AS cum_tokens,
               CAST(SUM(n_words) OVER w AS BIGINT)
                   <= {int(token_budget)} AS kept
        FROM (
            SELECT doc_id,
                   LEAST(GREATEST(flesch_milli, 0), 206835) AS cscore,
                   n_words
            FROM ({_READABILITY_SQL}) r
        )
        WINDOW w AS (ORDER BY cscore DESC, doc_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """


def _q_chat_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT chat-template render + loss-mask spans: alternating
    user/assistant turns synthesized as 10-word groups of the document
    text (the sf docs are single-line word streams), one row per
    assistant turn with the 0-based char span of its content in the
    rendered string plus the md5 of the full render."""
    from document_quality_assessment_ocr_spark.functions.text import WS_CLASS
    from document_quality_assessment_ocr_spark.operators.sft import (
        chat_render_spans,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.filter(
            F.split(
                F.trim(F.coalesce(F.col("text"), F.lit(""))), WS_CLASS + "+"
            ),
            lambda x: x != F.lit(""),
        ).alias("tk"),
    ).where(F.size("tk") > 0)
    # F.sequence counts DOWN when the bound is < 1 — the size guard above
    # keeps (size+9) DIV 10 >= 1
    turns = d.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(1, CAST((size(tk) + 9) DIV 10 AS INT)),"
                " t1 -> array_join(slice(tk, (t1 - 1) * 10 + 1, 10), ' '))"
            )
        ).alias("p", "content"),
    ).select(
        "doc_id",
        (F.col("p") + 1).cast("long").alias("turn"),
        F.when(F.pmod(F.col("p") + 1, F.lit(2)) == 1, F.lit("user"))
        .otherwise(F.lit("assistant"))
        .alias("role"),
        "content",
    )
    return chat_render_spans(turns)


_CHAT_SPANS_SQL = f"""
    WITH d AS (
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                   TRIM(COALESCE(text,'')), '{WS}+'), x -> x <> '') AS a
        FROM documents
    ), ex AS (
        SELECT doc_id, a,
               UNNEST(RANGE(1, (LEN(a) + 9) // 10 + 1)) AS i
        FROM d WHERE LEN(a) > 0
    ), tn AS (
        SELECT doc_id, CAST(i AS BIGINT) AS turn,
               ARRAY_TO_STRING(
                   a[CAST((i - 1) * 10 + 1 AS INT) : CAST(i * 10 AS INT)],
                   ' ') AS content
        FROM ex
    ), ch AS (
        SELECT doc_id, turn,
               CASE WHEN turn % 2 = 1 THEN 'user' ELSE 'assistant' END AS role,
               content,
               '<|' || CASE WHEN turn % 2 = 1
                            THEN 'user' ELSE 'assistant' END
                    || '|>' || content || '<|end|>' || CHR(10) AS chunk
        FROM tn
    ), cs AS (
        SELECT doc_id, turn, role, content, chunk,
               CAST(SUM(LENGTH(chunk)) OVER (
                    PARTITION BY doc_id ORDER BY turn
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum
        FROM ch
    ), r AS (
        SELECT doc_id, MD5(STRING_AGG(chunk, '' ORDER BY turn)) AS render_md5
        FROM ch GROUP BY doc_id
    )
    SELECT cs.doc_id, turn,
           cum - LENGTH(chunk) + LENGTH('<|assistant|>') AS span_start,
           cum - LENGTH(chunk) + LENGTH('<|assistant|>') + LENGTH(content)
               AS span_end,
           render_md5
    FROM cs JOIN r ON cs.doc_id = r.doc_id
    WHERE role = 'assistant'
"""


def _q_preference_pairs(
    spark: SparkSession, sf_dir: str, clustered: DataFrame | None = None
) -> DataFrame:
    """DPO-style preference pairs from near-dup clusters: within each
    q31 component of ≥2 docs, chosen = best clamped-Flesch member,
    rejected = worst (deterministic tie-breaks); equal-score clusters
    emit nothing.

    ``clustered`` lets a caller supply a persisted q31 cluster assignment
    (same n_hashes=8/bands=4 contract) so composites don't re-pay the
    iterative CC loop — bench.py times the loop once as its own line and
    passes the artifact here; a real deployment persists the assignment
    table the same way. Default (None) recomputes — identical values."""
    from document_quality_assessment_ocr_spark.operators.dedup import (
        duplicate_clusters,
    )
    from document_quality_assessment_ocr_spark.operators.sft import (
        preference_pairs,
    )
    from document_quality_assessment_ocr_spark.operators.textstats import (
        flesch_readability,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    if clustered is None:
        clustered = duplicate_clusters(d, n_hashes=8, bands=4)
    scored = flesch_readability(d).select(
        "doc_id",
        F.expr("LEAST(GREATEST(flesch_milli, 0L), 206835L)").alias("cscore"),
    )
    return preference_pairs(clustered, scored, score_col="cscore")


def _preference_pairs_sql() -> str:
    """q134 oracle: the shared q31 recursive-CTE components + the q126
    clamped readability score, best/worst member per cluster via the
    two ROW_NUMBER orderings the engine's min/max-struct replaces."""
    return (
        _clusters_comp_sql()
        + f"""
            , alldoc AS (
                SELECT CAST(doc_id AS BIGINT) AS did FROM documents
            ), asg AS (
                SELECT d.did, COALESCE(comp.cid, d.did) AS cid
                FROM alldoc d LEFT JOIN comp ON comp.did = d.did
            ), sc AS (
                SELECT doc_id,
                       LEAST(GREATEST(flesch_milli, 0), 206835) AS cscore
                FROM ({_READABILITY_SQL}) r
            ), jj AS (
                SELECT asg.cid, asg.did, sc.cscore
                FROM asg JOIN sc ON sc.doc_id = asg.did
            ), rk AS (
                SELECT cid, did, cscore,
                       ROW_NUMBER() OVER (PARTITION BY cid
                           ORDER BY cscore DESC, did ASC) AS rb,
                       ROW_NUMBER() OVER (PARTITION BY cid
                           ORDER BY cscore ASC, did DESC) AS rw,
                       COUNT(*) OVER (PARTITION BY cid) AS n
                FROM jj
            )
            SELECT b.cid AS cluster_id, CAST(b.n AS BIGINT) AS n_docs,
                   b.did AS chosen_id, b.cscore AS chosen_score,
                   w.did AS rejected_id, w.cscore AS rejected_score
            FROM (SELECT * FROM rk WHERE rb = 1) b
            JOIN (SELECT * FROM rk WHERE rw = 1) w ON b.cid = w.cid
            WHERE b.n >= 2 AND b.cscore > w.cscore
        """
    )


def _q_trim_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc self-repetition trim: non-first 3-token windows removed
    token-wise, cleaned text witnessed by md5."""
    from document_quality_assessment_ocr_spark.operators.quality import (
        trim_repeated_windows,
    )

    return trim_repeated_windows(
        _doc(spark, sf_dir).select(
            F.col("doc_id").cast("long").alias("doc_id"), "text"
        ),
        w=3,
    )


def _trim_repeats_sql(w: int = 3) -> str:
    """q135 oracle: same window hashing / first-occurrence / cover-test
    spec in DuckDB list lambdas (distinct lambda var names per nesting
    level; ARRAY_TO_STRING([]) is NULL — COALESCE per the invariant)."""
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                       TRIM(COALESCE(text,'')), '{WS}+'), x -> x <> '') AS tk
            FROM documents
        ), g AS (
            SELECT doc_id, tk,
                   UNNEST(RANGE(1, GREATEST(LEN(tk) - {w} + 1, 0) + 1)) AS i
            FROM d
        ), gh AS (
            SELECT doc_id, CAST(i AS BIGINT) AS i,
                   MD5(ARRAY_TO_STRING(
                       tk[CAST(i AS INT) : CAST(i + {w} - 1 AS INT)],
                       ' ')) AS h
            FROM g
        ), fi AS (
            SELECT doc_id, h, MIN(i) AS f, LIST(i) AS ii
            FROM gh GROUP BY doc_id, h
        ), rep AS (
            SELECT doc_id, UNNEST(LIST_FILTER(ii, r1 -> r1 > f)) AS r
            FROM fi
        ), rs AS (
            SELECT doc_id, LIST_SORT(LIST(r)) AS rr FROM rep GROUP BY doc_id
        ), j AS (
            SELECT d.doc_id, d.tk,
                   COALESCE(rs.rr, []::BIGINT[]) AS rr
            FROM d LEFT JOIN rs ON rs.doc_id = d.doc_id
        ), k AS (
            SELECT doc_id, tk, rr,
                   LIST_TRANSFORM(
                       LIST_FILTER(RANGE(1, LEN(tk) + 1),
                           i2 -> LEN(LIST_FILTER(rr,
                               r2 -> i2 >= r2 AND i2 < r2 + {w})) = 0),
                       i3 -> tk[CAST(i3 AS INT)]) AS kept
            FROM j
        )
        SELECT doc_id,
               CAST(LEN(tk) AS BIGINT) AS n_tokens,
               CAST(LEN(rr) AS BIGINT) AS n_repeat_windows,
               CAST(LEN(tk) - LEN(kept) AS BIGINT) AS n_tokens_removed,
               MD5(COALESCE(ARRAY_TO_STRING(kept, ' '), '')) AS clean_md5
        FROM k
    """


def _q_ict_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ICT query/context pretext pairs: md5-picked 10-token group vs the
    rest of the document — one codegen projection, zero shuffle."""
    from document_quality_assessment_ocr_spark.operators.augment import (
        ict_pairs,
    )

    return ict_pairs(
        _doc(spark, sf_dir).select(
            F.col("doc_id").cast("long").alias("doc_id"), "text"
        ),
        span_tokens=10,
    )


def _ict_pairs_sql(s: int = 10) -> str:
    """q136 oracle: the q110 md5-cut idiom with group tiling — 60-bit md5
    mod n_groups pick, DuckDB inclusive slices + list concat, COALESCE'd
    ARRAY_TO_STRING."""
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                       TRIM(COALESCE(text,'')), '{WS}+'), x -> x <> '') AS a
            FROM documents
        ), c AS (
            SELECT doc_id, a, CAST(LEN(a) AS BIGINT) AS n,
                   (CAST(LEN(a) AS BIGINT) + {s} - 1) // {s} AS n_groups
            FROM d
        ), p AS (
            SELECT doc_id, a, n, n_groups,
                   CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)
                        || '|ict{s}'), 1, 15)) AS BIGINT) % n_groups AS pick
            FROM c WHERE n_groups >= 2
        )
        SELECT doc_id, n AS n_tokens, n_groups, pick,
               COALESCE(ARRAY_TO_STRING(
                   a[CAST(pick * {s} + 1 AS INT)
                     : CAST(pick * {s} + {s} AS INT)], ' '), '') AS query,
               COALESCE(ARRAY_TO_STRING(
                   a[1 : CAST(pick * {s} AS INT)]
                   || a[CAST(pick * {s} + {s} + 1 AS INT) : CAST(n AS INT)],
                   ' '), '') AS context
        FROM p
    """


def _q_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5/UL2 span-corruption examples: one md5-placed 3-token span
    masked per 20-token tile (15% noise), sentinels in place, targets
    carry the hidden tokens — one codegen projection, zero shuffle."""
    from document_quality_assessment_ocr_spark.operators.augment import (
        span_corruption,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return span_corruption(d, tile_tokens=20, span_tokens=3)


def _span_corruption_sql(T: int = 20, L: int = 3) -> str:
    """q142 oracle: the q136 tiling idiom per tile — UNNEST(RANGE) tiles,
    60-bit md5 offsets, inclusive list slices assembled in g order via
    FLATTEN(LIST(.. ORDER BY g)), ragged tail appended unmasked."""
    sent = "'<extra_id_' || CAST(g AS VARCHAR) || '>'"
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                       TRIM(COALESCE(text,'')), '{WS}+'), x -> x <> '') AS a
            FROM documents
        ), c AS (
            SELECT doc_id, a, CAST(LEN(a) AS BIGINT) AS n,
                   CAST(LEN(a) AS BIGINT) // {T} AS nt
            FROM d
        ), tiles AS (
            SELECT doc_id, a, UNNEST(RANGE(0, nt)) AS g
            FROM c WHERE nt >= 1
        ), sp AS (
            SELECT doc_id, a, g,
                   ('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR) || '|sc{L}|'
                        || CAST(g AS VARCHAR)), 1, 15))::BIGINT
                       % {T - L + 1} AS o
            FROM tiles
        ), parts AS (
            SELECT doc_id, g,
                   a[CAST(g * {T} + 1 AS INT) : CAST(g * {T} + o AS INT)]
                     || [{sent}]
                     || a[CAST(g * {T} + o + {L} + 1 AS INT)
                          : CAST((g + 1) * {T} AS INT)] AS ip,
                   [{sent}]
                     || a[CAST(g * {T} + o + 1 AS INT)
                          : CAST(g * {T} + o + {L} AS INT)] AS tp
            FROM sp
        ), agg AS (
            SELECT doc_id, FLATTEN(LIST(ip ORDER BY g)) AS inp,
                   FLATTEN(LIST(tp ORDER BY g)) AS tgt
            FROM parts GROUP BY doc_id
        )
        SELECT c.doc_id, c.n AS n_tokens, c.nt AS n_spans,
               c.nt * {L} AS n_masked,
               CASE WHEN agg.doc_id IS NULL
                    THEN COALESCE(ARRAY_TO_STRING(c.a, ' '), '')
                    ELSE COALESCE(ARRAY_TO_STRING(
                        agg.inp || c.a[CAST(c.nt * {T} + 1 AS INT)
                                       : CAST(c.n AS INT)], ' '), '')
                    END AS inputs,
               COALESCE(ARRAY_TO_STRING(agg.tgt, ' '), '') AS targets
        FROM c LEFT JOIN agg ON c.doc_id = agg.doc_id
    """


def _q_bt_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry strengths over synthesized preference pairs:
    consecutive docs within md5-free %50 buckets battle, more tokens
    wins (tie → smaller id) — then 3 fixed-point MM rounds
    (graph.bt_strength, the pagerank_fixed integer idiom)."""
    from pyspark.sql import Window

    from document_quality_assessment_ocr_spark.operators.graph import bt_strength
    from document_quality_assessment_ocr_spark.operators.textstats import _tokens

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(_tokens(F.col("text"))).cast("long").alias("n"),
    )
    win = Window.partitionBy(F.expr("doc_id % 50")).orderBy("doc_id")
    p = d.select(
        "doc_id",
        "n",
        F.lead("doc_id").over(win).alias("nid"),
        F.lead("n").over(win).alias("nn"),
    ).where(F.col("nid").isNotNull())
    won = (F.col("n") > F.col("nn")) | (
        (F.col("n") == F.col("nn")) & (F.col("doc_id") < F.col("nid"))
    )
    pairs = p.select(
        F.when(won, F.col("doc_id")).otherwise(F.col("nid")).alias("winner_id"),
        F.when(won, F.col("nid")).otherwise(F.col("doc_id")).alias("loser_id"),
    )
    return bt_strength(pairs, iters=3)


def _bt_strength_sql(iters: int = 3) -> str:
    """q143 oracle: same LEAD-pair synthesis, then the MM rounds UNROLLED
    (the q56 fixed-point-iteration technique) — every division a
    non-negative // with the shared BT_NUM/BT_SCALE constants, every
    SUM cast to BIGINT before reuse."""
    from document_quality_assessment_ocr_spark.operators.graph import BT_NUM, BT_SCALE

    rounds = []
    prev = "s0"
    for r in range(1, int(iters) + 1):
        rounds.append(f"""
        d{r} AS (
            SELECT a AS item_id,
                   CAST(SUM((n_ij * {BT_NUM}) //
                            GREATEST(sa.s + sb.s, 1)) AS BIGINT) AS d
            FROM dir
            JOIN {prev} sa ON dir.a = sa.item_id
            JOIN {prev} sb ON dir.b = sb.item_id
            GROUP BY a
        ), s{r} AS (
            SELECT it.item_id,
                   CAST((n_wins * {BT_NUM}) //
                        GREATEST(COALESCE(d, 0), 1) AS BIGINT) AS s
            FROM it LEFT JOIN d{r} USING (item_id)
        )""")
        prev = f"s{r}"
    return f"""
        WITH doc AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                       TRIM(LOWER(COALESCE(text, ''))), '{WS}+'),
                       x -> x <> '')) AS BIGINT) AS n
            FROM documents
        ), p AS (
            SELECT doc_id, n,
                   LEAD(doc_id) OVER (PARTITION BY doc_id % 50
                                      ORDER BY doc_id) AS nid,
                   LEAD(n) OVER (PARTITION BY doc_id % 50
                                 ORDER BY doc_id) AS nn
            FROM doc
        ), pr AS (
            SELECT CASE WHEN n > nn OR (n = nn AND doc_id < nid)
                        THEN doc_id ELSE nid END AS winner_id,
                   CASE WHEN n > nn OR (n = nn AND doc_id < nid)
                        THEN nid ELSE doc_id END AS loser_id
            FROM p WHERE nid IS NOT NULL
        ), edges AS (
            SELECT LEAST(winner_id, loser_id) AS i,
                   GREATEST(winner_id, loser_id) AS j,
                   CAST(COUNT(*) AS BIGINT) AS n_ij
            FROM pr GROUP BY 1, 2
        ), wins AS (
            SELECT winner_id AS item_id, CAST(COUNT(*) AS BIGINT) AS n_wins
            FROM pr GROUP BY 1
        ), it AS (
            SELECT g.item_id, CAST(COALESCE(n_wins, 0) AS BIGINT) AS n_wins,
                   g.n_games
            FROM (SELECT item_id, CAST(COUNT(*) AS BIGINT) AS n_games
                  FROM (SELECT winner_id AS item_id FROM pr
                        UNION ALL SELECT loser_id FROM pr)
                  GROUP BY 1) g
            LEFT JOIN wins USING (item_id)
        ), dir AS (
            SELECT i AS a, j AS b, n_ij FROM edges
            UNION ALL SELECT j, i, n_ij FROM edges
        ), s0 AS (
            SELECT item_id, CAST({BT_SCALE} AS BIGINT) AS s FROM it
        ),{",".join(rounds)}
        SELECT it.item_id, it.n_wins, it.n_games, {prev}.s AS strength_micro
        FROM it JOIN {prev} USING (item_id)
    """


def _q_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram surprisal (distinct-continuation
    counts, D=0.75 fixed-point) — the q121 plan shape with the KenLM
    default smoother."""
    from document_quality_assessment_ocr_spark.operators.lm import kneser_ney_bits

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return kneser_ney_bits(d, discount_milli=750)


def _kneser_ney_sql(
    d_milli: int = 750, lo_bits: float = 3.0, hi_bits: float = 8.0
) -> str:
    """q144 oracle: the q121 twin with KN statistics — N1L/N1R/N1T are
    row counts over the same c12 table, the micro-prob recipe is the
    docstring's integer arithmetic verbatim (// == Spark DIV,
    non-negative everywhere), surfaced integers CAST to BIGINT."""
    D = int(d_milli)
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                       TRIM(LOWER(COALESCE(text, ''))), '{WS}+'),
                       x -> x <> '') AS tk
            FROM documents
        ), bg AS (
            SELECT doc_id,
                   tk[CAST(i AS INT)] || ' ' || tk[CAST(i AS INT) + 1] AS bg
            FROM (SELECT doc_id, tk,
                         UNNEST(RANGE(1, GREATEST(LEN(tk) - 1, 0) + 1)) AS i
                  FROM d)
        ), c12 AS (
            SELECT bg, CAST(COUNT(*) AS BIGINT) AS c12 FROM bg GROUP BY bg
        ), c1 AS (
            SELECT STR_SPLIT(bg, ' ')[1] AS w1,
                   CAST(SUM(c12) AS BIGINT) AS c1,
                   CAST(COUNT(*) AS BIGINT) AS n1l
            FROM c12 GROUP BY 1
        ), nr AS (
            SELECT STR_SPLIT(bg, ' ')[2] AS w2,
                   CAST(COUNT(*) AS BIGINT) AS n1r
            FROM c12 GROUP BY 1
        ), nt AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n1t FROM c12
        ), model AS (
            SELECT c12.bg,
                   CAST(LENGTH(BIN(1000000 // GREATEST(
                       (GREATEST(c12.c12 * 1000 - {D}, 0) * 1000) // c1.c1
                       + ((({D} * 1000 * c1.n1l) // c1.c1)
                          * ((nr.n1r * 1000000) // nt.n1t)) // 1000000,
                       1))) - 1 AS BIGINT) AS bits
            FROM c12
            JOIN c1 ON c1.w1 = STR_SPLIT(c12.bg, ' ')[1]
            JOIN nr ON nr.w2 = STR_SPLIT(c12.bg, ' ')[2]
            CROSS JOIN nt
        ), per_doc AS (
            SELECT bg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                   CAST(SUM(m.bits) AS BIGINT) AS sum_bits
            FROM bg JOIN model m ON m.bg = bg.bg
            GROUP BY bg.doc_id
        ), pd AS (
            SELECT doc_id, n_bigrams, sum_bits,
                   CAST(sum_bits AS DOUBLE) / CAST(n_bigrams AS DOUBLE)
                       AS avg_bits
            FROM per_doc
        )
        SELECT dd.doc_id,
               CAST(COALESCE(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
               CAST(COALESCE(p.sum_bits, 0) AS BIGINT) AS sum_bits,
               p.avg_bits,
               COALESCE(p.avg_bits BETWEEN CAST({lo_bits!r} AS DOUBLE)
                                       AND CAST({hi_bits!r} AS DOUBLE),
                        FALSE) AS keep
        FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents) dd
        LEFT JOIN pd p ON p.doc_id = dd.doc_id
    """


# Shared by _q_blocklist_gate AND _blocklist_gate_sql (twin contract):
# a corpus-common word, a rare word, and an absent word so the gate's
# blocked/permille surface exercises every branch.
_BLOCKLIST_WORDS = ["slow", "dup", "crash"]


def _q_blocklist_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bad-word blocklist gate (C4 / UT1 stage): token-exact literal
    IN-set (Catalyst InSet — O(1) per token, zero shuffle), integer
    bad-permille density, blocked at >= 2 occurrences."""
    from document_quality_assessment_ocr_spark.operators.quality import (
        blocklist_gate,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return blocklist_gate(d, _BLOCKLIST_WORDS, min_bad_tokens=2)


def _blocklist_gate_sql(min_bad_tokens: int = 2) -> str:
    """q139 oracle: same token-exact membership over the shared word
    list; permille via non-negative // (== Spark DIV)."""
    lst = ", ".join(f"'{w}'" for w in sorted(set(_BLOCKLIST_WORDS)))
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                       TRIM(LOWER(COALESCE(text, ''))), '{WS}+'),
                       x -> x <> '') AS tk
            FROM documents
        ), c AS (
            SELECT doc_id,
                   CAST(LEN(tk) AS BIGINT) AS n_tokens,
                   CAST(LEN(LIST_FILTER(tk,
                       t -> LIST_CONTAINS([{lst}], t))) AS BIGINT)
                       AS n_bad_tokens
            FROM d
        )
        SELECT doc_id, n_tokens, n_bad_tokens,
               CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT)
                    ELSE (1000 * n_bad_tokens) // n_tokens END AS bad_permille,
               n_bad_tokens >= {int(min_bad_tokens)} AS blocked
        FROM c
    """


def _q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k weighted sample — priority sampling (Duffield 2007):
    integer priority = md5-60bit DIV token weight, k smallest win via
    the two-level top-k merge (no task sorts the corpus)."""
    from document_quality_assessment_ocr_spark.operators.sampling import (
        weighted_priority_sample,
    )
    from document_quality_assessment_ocr_spark.operators.textstats import (
        _tokens,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(_tokens(F.col("text"))).cast("long").alias("n_tokens"),
    )
    return weighted_priority_sample(d, k=25, weight_col="n_tokens")


def _weighted_sample_sql(k: int = 25, salt: str = "wsample1") -> str:
    """q140 oracle: the single-node ORDER BY (priority, id) LIMIT k the
    two-level merge must reproduce; u is the shared 60-bit md5 idiom,
    priority the non-negative integer division (// == Spark DIV)."""
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   GREATEST(CAST(LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                       TRIM(LOWER(COALESCE(text, ''))), '{WS}+'),
                       x -> x <> '')) AS BIGINT), 1) AS weight
            FROM documents
        ), p AS (
            SELECT doc_id, weight,
                   ('0x' || SUBSTR(MD5('{salt}#' || CAST(doc_id AS VARCHAR)),
                                   1, 15))::BIGINT // weight AS priority
            FROM d
        )
        SELECT doc_id, weight, priority, CAST(rn AS INT) AS rank
        FROM (SELECT doc_id, weight, priority,
                     ROW_NUMBER() OVER (ORDER BY priority ASC, doc_id ASC)
                         AS rn
              FROM p)
        WHERE rn <= {int(k)}
    """


def _q_hll_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-overlap estimate via HLL inclusion-exclusion: vocabulary of
    the even-doc_id half vs the odd half, union = register-wise max —
    audit mode carries the exact intersection so the estimate is itself
    oracle-checked."""
    from document_quality_assessment_ocr_spark.operators.sketches import (
        hll_overlap,
    )
    from document_quality_assessment_ocr_spark.operators.textstats import (
        _tokens,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    tok = d.select(
        F.when(F.col("doc_id") % 2 == 0, F.lit("a"))
        .otherwise(F.lit("b"))
        .alias("side"),
        F.explode(_tokens(F.col("text"))).alias("word"),
    )
    return hll_overlap(tok, "side", "word", "a", "b", with_exact=True)


def _hll_overlap_sql() -> str:
    """q141 oracle: the q35 register/rho arithmetic split by corpus side;
    GREATEST ignores NULLs on both engines (the union register);
    harmonic sums are exact powers of two (order-free); the alpha·m²
    constant rides as an exponent-form literal (parses straight to
    DOUBLE — CLAUDE.md round-4 lesson)."""
    from document_quality_assessment_ocr_spark.operators.sketches import ALPHA_M, M

    h = "hh"
    reg = f"({_nib_sql(h, 1)} * 16 + {_nib_sql(h, 2)})"
    v = _md5_u32_sql(h, 3)
    num = f"{ALPHA_M * M * M:.17e}"
    est = lambda hs, nh: (
        f"{num} / (COALESCE({hs}, 0) + CAST({M} - {nh} AS DOUBLE))"
    )
    return f"""
        WITH d AS (
            SELECT CASE WHEN CAST(doc_id AS BIGINT) % 2 = 0
                        THEN 'a' ELSE 'b' END AS s,
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                       TRIM(LOWER(COALESCE(text, ''))), '{WS}+'),
                       x -> x <> '') AS tk
            FROM documents
        ), t AS (
            SELECT s, UNNEST(tk) AS word, MD5(UNNEST(tk)) AS hh FROM d
        ), rt AS (
            SELECT s, word, {reg} AS reg,
                   CASE WHEN {v} = 0 THEN 33
                        ELSE 33 - LENGTH(LTRIM(BIN({v}), '0')) END AS rho
            FROM t
        ), per_reg AS (
            SELECT reg,
                   MAX(CASE WHEN s = 'a' THEN rho END) AS ra,
                   MAX(CASE WHEN s = 'b' THEN rho END) AS rb
            FROM rt GROUP BY reg
        ), fold AS (
            SELECT CAST(COUNT(ra) AS INT) AS n_hit_a,
                   CAST(COUNT(rb) AS INT) AS n_hit_b,
                   CAST(COUNT(GREATEST(ra, rb)) AS INT) AS n_hit_union,
                   SUM(CASE WHEN ra IS NOT NULL
                            THEN POWER(2.0, -ra) END) AS ha,
                   SUM(CASE WHEN rb IS NOT NULL
                            THEN POWER(2.0, -rb) END) AS hb,
                   SUM(CASE WHEN GREATEST(ra, rb) IS NOT NULL
                            THEN POWER(2.0, -GREATEST(ra, rb)) END) AS hu
            FROM per_reg
        ), ex AS (
            SELECT CAST(SUM(ia) AS BIGINT) AS exact_a,
                   CAST(SUM(ib) AS BIGINT) AS exact_b,
                   CAST(SUM(ia * ib) AS BIGINT) AS exact_overlap
            FROM (SELECT word,
                         MAX(CASE WHEN s = 'a' THEN 1 ELSE 0 END) AS ia,
                         MAX(CASE WHEN s = 'b' THEN 1 ELSE 0 END) AS ib
                  FROM rt GROUP BY word)
        ), est AS (
            SELECT n_hit_a, n_hit_b, n_hit_union,
                   COALESCE(ha, 0) + CAST({M} - n_hit_a AS DOUBLE)
                       AS harmonic_a,
                   COALESCE(hb, 0) + CAST({M} - n_hit_b AS DOUBLE)
                       AS harmonic_b,
                   COALESCE(hu, 0) + CAST({M} - n_hit_union AS DOUBLE)
                       AS harmonic_union,
                   {est('ha', 'n_hit_a')} AS est_a,
                   {est('hb', 'n_hit_b')} AS est_b,
                   {est('hu', 'n_hit_union')} AS est_union
            FROM fold
        )
        SELECT n_hit_a, n_hit_b, n_hit_union,
               harmonic_a, harmonic_b, harmonic_union,
               est_a, est_b, est_union,
               est_a + est_b - est_union AS overlap_est,
               exact_a, exact_b, exact_overlap
        FROM est, ex
    """


def _q_rho1_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RHO-1 selective-token scoring: per-position excess surprisal
    (unigram-continuation reference minus MLE bigram) in the shared
    fixed-point whole-bit recipe, per-doc ceil(rho*n) top-excess pick."""
    from document_quality_assessment_ocr_spark.operators.lm import rho1_excess_select

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return rho1_excess_select(d, rho_milli=300)


def _rho1_select_sql(rho_milli: int = 300) -> str:
    """q145 oracle: the q121 CTE chain with positional bigrams, the same
    two integer micro-probs, a (doc-partition) window pick — BIGINT casts
    on every surfaced integer (HUGEINT trap)."""
    rho = int(rho_milli)
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                       TRIM(LOWER(COALESCE(text, ''))), '{WS}+'),
                       x -> x <> '') AS tk
            FROM documents
        ), bg AS (
            SELECT doc_id, CAST(i AS BIGINT) AS pos,
                   tk[CAST(i AS INT)] || ' ' || tk[CAST(i AS INT) + 1] AS bg
            FROM (SELECT doc_id, tk,
                         UNNEST(RANGE(1, GREATEST(LEN(tk) - 1, 0) + 1)) AS i
                  FROM d)
        ), c12 AS (
            SELECT bg, CAST(COUNT(*) AS BIGINT) AS c12 FROM bg GROUP BY bg
        ), c1 AS (
            SELECT STR_SPLIT(bg, ' ')[1] AS w1,
                   CAST(SUM(c12) AS BIGINT) AS c1
            FROM c12 GROUP BY 1
        ), c2 AS (
            SELECT STR_SPLIT(bg, ' ')[2] AS w2,
                   CAST(SUM(c12) AS BIGINT) AS c2
            FROM c12 GROUP BY 1
        ), tot AS (
            SELECT CAST(SUM(c12) AS BIGINT) AS nb FROM c12
        ), model AS (
            SELECT c12.bg,
                   CAST(LENGTH(BIN(1000000 // GREATEST(
                            (c2.c2 * 1000000) // tot.nb, 1))) - 1 AS BIGINT)
                   - CAST(LENGTH(BIN(1000000 // GREATEST(
                            (c12.c12 * 1000000) // c1.c1, 1))) - 1 AS BIGINT)
                       AS excess
            FROM c12
            JOIN c1 ON c1.w1 = STR_SPLIT(c12.bg, ' ')[1]
            JOIN c2 ON c2.w2 = STR_SPLIT(c12.bg, ' ')[2]
            CROSS JOIN tot
        ), tok AS (
            SELECT bg.doc_id, bg.pos, m.excess,
                   CAST(COUNT(*) OVER (PARTITION BY bg.doc_id) AS BIGINT) AS n,
                   CAST(ROW_NUMBER() OVER (PARTITION BY bg.doc_id
                            ORDER BY m.excess DESC, bg.pos ASC) AS BIGINT) AS rnk
            FROM bg JOIN model m ON m.bg = bg.bg
        ), per_doc AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                   CAST(SUM(CASE WHEN rnk <= ({rho} * n + 999) // 1000
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
                   CAST(SUM(CASE WHEN rnk <= ({rho} * n + 999) // 1000
                            THEN excess ELSE 0 END) AS BIGINT) AS sum_excess_sel,
                   CAST(MIN(CASE WHEN rnk = 1 THEN pos END) AS BIGINT) AS top_pos
            FROM tok GROUP BY doc_id
        )
        SELECT dd.doc_id,
               CAST(COALESCE(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
               CAST(COALESCE(p.n_selected, 0) AS BIGINT) AS n_selected,
               CAST(COALESCE(p.sum_excess_sel, 0) AS BIGINT) AS sum_excess_sel,
               p.top_pos
        FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents) dd
        LEFT JOIN per_doc p ON p.doc_id = dd.doc_id
    """


def _q_binary_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary sign-sketch ANN: 48-plane packed signatures, Hamming
    two-level top-m, exact-cosine rerank of the survivors."""
    from document_quality_assessment_ocr_spark.operators.similarity import (
        binary_sig_topk,
    )

    return binary_sig_topk(
        _emb(spark, sf_dir), probe_ids=[0, 1, 2, 3, 4], dim=64, k=5,
        n_planes=48, rerank=24,
    )


def _binary_topk_sql(
    n_planes: int = 48, dim: int = 64, k: int = 5, rerank: int = 24,
    seed: int = 42,
) -> str:
    """q146 oracle: the SAME seeded plane matrix via _bucket_sql, Hamming
    rank window capped at ``rerank``, cosine rerank — the two-level merge
    collapses to the windows because top-m-of-buckets == global top-m."""
    sig = _bucket_sql(n_planes, dim, seed)
    return f"""
        WITH e AS (
            SELECT CAST(vec_id AS BIGINT) AS vec_id,
                   CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ), b AS (
            SELECT vec_id, v, CAST({sig} AS BIGINT) AS sig FROM e
        ), p AS (
            SELECT vec_id AS probe_id, v AS pv, sig AS psig
            FROM b WHERE vec_id IN (0,1,2,3,4)
        ), s AS (
            SELECT probe_id, b.vec_id AS neighbor_id,
                   CAST(BIT_COUNT(XOR(b.sig, psig)) AS BIGINT) AS hd,
                   pv, v
            FROM p, b WHERE b.vec_id <> probe_id
        ), surv AS (
            SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                              ORDER BY hd ASC, neighbor_id ASC) AS hr
                FROM s)
            WHERE hr <= {int(rerank)}
        ), rr AS (
            SELECT probe_id, neighbor_id, hd,
                   ROUND(LIST_DOT_PRODUCT(pv, v)
                         / SQRT(LIST_DOT_PRODUCT(pv, pv)
                                * LIST_DOT_PRODUCT(v, v)), 6) AS cos
            FROM surv
        )
        SELECT probe_id, neighbor_id, hd, cos, CAST(rank AS INT) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
              FROM rr)
        WHERE rank <= {int(k)}
    """


def _q_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout assignment: Morton-interleave the word-count bucket
    with an md5-mod-256 spread bucket into a 16-bit key + target file id
    — the Delta/Iceberg OPTIMIZE ZORDER BY technique as a pure codegen
    projection (the morton16_sql expression TEXT is the cross-engine
    twin)."""
    from document_quality_assessment_ocr_spark.functions.text import WS_CLASS
    from document_quality_assessment_ocr_spark.operators.augment import _md5_mod
    from document_quality_assessment_ocr_spark.operators.layout import zorder_layout

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    tk = F.filter(
        F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), WS_CLASS + "+"),
        lambda x: x != F.lit(""),
    )
    feat = d.select(
        "doc_id",
        F.least(F.size(tk).cast("long"), F.lit(255).cast("long")).alias("xb"),
        _md5_mod(F.col("doc_id"), "zb", F.lit(256)).alias("yb"),
    )
    return zorder_layout(feat, "xb", "yb", cells_per_file=64)


def _zorder_sql(cells_per_file: int = 64) -> str:
    """q147 oracle: the SAME morton16_sql expression text (built only
    from `&`/`*`/`+`, the operator subset both engines parse identically)
    over the same clamped word-count / md5-mod-256 buckets; `//` ==
    Spark DIV on the non-negative zkey."""
    from document_quality_assessment_ocr_spark.operators.layout import morton16_sql

    z = morton16_sql("xb", "yb")
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   LEAST(CAST(LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                       TRIM(COALESCE(text, '')), '{WS}+'),
                       x -> x <> '')) AS BIGINT), 255) AS xb,
                   CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR) || '|zb'),
                        1, 15))::BIGINT % 256 AS BIGINT) AS yb
            FROM documents
        )
        SELECT doc_id, xb, yb, zkey,
               CAST(zkey // {int(cells_per_file)} AS BIGINT) AS file_id
        FROM (SELECT doc_id, xb, yb, CAST({z} AS BIGINT) AS zkey FROM d)
    """


def _q_matryoshka_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka two-stage ANN: coarse cosine over the first 16 dims,
    two-level top-m merge, exact full-dim rerank."""
    from document_quality_assessment_ocr_spark.operators.similarity import (
        matryoshka_topk,
    )

    return matryoshka_topk(
        _emb(spark, sf_dir), probe_ids=[0, 1, 2, 3, 4], dim=64, d_pre=16,
        k=5, rerank=24,
    )


def _matryoshka_sql(
    d_pre: int = 16, k: int = 5, rerank: int = 24
) -> str:
    """q148 oracle: prefix-slice coarse cosine with the SAME float op
    order as the engine's sequential-fold dot (LIST_DOT_PRODUCT /
    SQRT(da*db)), ROUND(·,6)+0e0 on both scores (-0.0 normalization),
    rank windows standing in for the two-level merge (top-m-of-buckets
    == global top-m)."""
    dp = int(d_pre)
    coarse = (
        f"ROUND(LIST_DOT_PRODUCT(pv[1:{dp}], v[1:{dp}])"
        f" / SQRT(LIST_DOT_PRODUCT(pv[1:{dp}], pv[1:{dp}])"
        f" * LIST_DOT_PRODUCT(v[1:{dp}], v[1:{dp}])), 6) + 0e0"
    )
    return f"""
        WITH e AS (
            SELECT CAST(vec_id AS BIGINT) AS vec_id,
                   CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ), p AS (
            SELECT vec_id AS probe_id, v AS pv
            FROM e WHERE vec_id IN (0,1,2,3,4)
        ), s AS (
            SELECT probe_id, e.vec_id AS neighbor_id,
                   {coarse} AS ccos, pv, v
            FROM p, e WHERE e.vec_id <> probe_id
        ), surv AS (
            SELECT * FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                              ORDER BY ccos DESC, neighbor_id ASC) AS cr
                FROM s)
            WHERE cr <= {int(rerank)}
        ), rr AS (
            SELECT probe_id, neighbor_id, ccos,
                   ROUND(LIST_DOT_PRODUCT(pv, v)
                         / SQRT(LIST_DOT_PRODUCT(pv, pv)
                                * LIST_DOT_PRODUCT(v, v)), 6) + 0e0 AS cos
            FROM surv
        )
        SELECT probe_id, neighbor_id, ccos, cos, CAST(rank AS INT) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rank
              FROM rr)
        WHERE rank <= {int(k)}
    """


def _q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities over the q131 host link graph — fixed-point
    integer with per-round max-normalization (bit-exact iterative
    numerics, the pagerank discipline)."""
    from document_quality_assessment_ocr_spark.operators.graph import hits_fixed

    return hits_fixed(_host_edges(spark, sf_dir), iters=3).select(
        F.col("id").alias("host"), "hub_micro", "auth_micro"
    )


def _hits_sql(iters: int = 3) -> str:
    """q149 oracle: the shared q131 host-graph prefix, then HITS unrolled
    — per round an authority sum (h over in-edges), max-normalize,
    a hub sum (NEW a over out-edges), max-normalize; `//` == Spark DIV
    on non-negatives; BIGINT casts on every surfaced SUM (HUGEINT
    trap). The max is MAX(raw) OVER () in the SAME CTE, not a separate
    1-row CTE: DuckDB INLINES plain CTEs at every reference, so a CTE
    that reads its predecessor twice doubles the whole upstream subtree
    per round (4^iters expansions of the URL-parse chain — measured as a
    multi-minute hang at sf0.001); the window form keeps the chain
    linear, the q131 cost class."""
    from document_quality_assessment_ocr_spark.operators.graph import HITS_SCALE

    its = []
    prev_h = "h0"
    for i in range(1, int(iters) + 1):
        its.append(f"""
            a{i}r AS (
                SELECT e.dst AS id, CAST(SUM(h.h) AS BIGINT) AS raw
                FROM edges e JOIN {prev_h} h ON h.id = e.src
                GROUP BY 1
            ), a{i} AS (
                SELECT id,
                       (raw * {HITS_SCALE}) // GREATEST(MAX(raw) OVER (), 1)
                           AS a
                FROM a{i}r
            ), h{i}r AS (
                SELECT e.src AS id, CAST(SUM(a.a) AS BIGINT) AS raw
                FROM edges e JOIN a{i} a ON a.id = e.dst
                GROUP BY 1
            ), h{i} AS (
                SELECT id,
                       (raw * {HITS_SCALE}) // GREATEST(MAX(raw) OVER (), 1)
                           AS h
                FROM h{i}r
            )""")
        prev_h = f"h{i}"
    n = int(iters)
    return _host_graph_ctes() + f""", h0 AS (
            SELECT id, CAST({HITS_SCALE} AS BIGINT) AS h FROM nodes
        ), {", ".join(its)}
        SELECT n.id AS host,
               CAST(COALESCE(h{n}.h, 0) AS BIGINT) AS hub_micro,
               CAST(COALESCE(a{n}.a, 0) AS BIGINT) AS auth_micro
        FROM nodes n
        LEFT JOIN h{n} ON h{n}.id = n.id
        LEFT JOIN a{n} ON a{n}.id = n.id
    """


def _q_borda_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Borda rank fusion of three integer quality signals (clamped word
    count, clamped distinct-word vocabulary, clamped Flesch milli) —
    per-signal global ranks via the bounded score-bucket construction,
    Borda sum, fixed-width tiers."""
    from document_quality_assessment_ocr_spark.functions.text import WS_CLASS
    from document_quality_assessment_ocr_spark.operators.curriculum import borda_fuse
    from document_quality_assessment_ocr_spark.operators.textstats import (
        flesch_readability,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    tk = F.filter(
        F.split(
            F.trim(F.lower(F.coalesce(F.col("text"), F.lit("")))),
            WS_CLASS + "+",
        ),
        lambda x: x != F.lit(""),
    )
    v = d.select(
        "doc_id", F.size(F.array_distinct(tk)).cast("long").alias("n_vocab")
    )
    scored = (
        flesch_readability(d)
        .select("doc_id", "n_words", "flesch_milli")
        .join(v, "doc_id")
        .select(
            "doc_id",
            F.expr("LEAST(n_words, 65535L)").alias("wclamp"),
            F.expr("LEAST(n_vocab, 65535L)").alias("vclamp"),
            F.expr("LEAST(GREATEST(flesch_milli, 0L), 206835L)").alias(
                "cscore"
            ),
        )
    )
    return borda_fuse(
        scored, ["wclamp", "vclamp", "cscore"], bucket_width=1000,
        tier_width=1000,
    )


def _borda_sql(tier_width: int = 1000) -> str:
    """q150 oracle: the q116 readability SQL joined with a
    distinct-token count, the three single-reducer ROW_NUMBER ranks the
    engine deliberately avoids, Borda sum + `//` tiers — BIGINT casts
    on every surfaced integer."""
    return f"""
        WITH v AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(LEN(LIST_DISTINCT(LIST_FILTER(
                        REGEXP_SPLIT_TO_ARRAY(
                            TRIM(LOWER(COALESCE(text, ''))), '{WS}+'),
                        x -> x <> ''))) AS BIGINT) AS n_vocab
            FROM documents
        ), s AS (
            SELECT r.doc_id,
                   CAST(LEAST(r.n_words, 65535) AS BIGINT) AS wclamp,
                   CAST(LEAST(v.n_vocab, 65535) AS BIGINT) AS vclamp,
                   CAST(LEAST(GREATEST(r.flesch_milli, 0), 206835)
                        AS BIGINT) AS cscore
            FROM ({_READABILITY_SQL}) r JOIN v ON v.doc_id = r.doc_id
        ), rk AS (
            SELECT doc_id, wclamp, vclamp, cscore,
                   CAST(ROW_NUMBER() OVER (ORDER BY wclamp DESC, doc_id ASC)
                        - 1 AS BIGINT) AS r_wclamp,
                   CAST(ROW_NUMBER() OVER (ORDER BY vclamp DESC, doc_id ASC)
                        - 1 AS BIGINT) AS r_vclamp,
                   CAST(ROW_NUMBER() OVER (ORDER BY cscore DESC, doc_id ASC)
                        - 1 AS BIGINT) AS r_cscore
            FROM s
        )
        SELECT doc_id, wclamp, vclamp, cscore,
               r_wclamp, r_vclamp, r_cscore,
               CAST(r_wclamp + r_vclamp + r_cscore AS BIGINT) AS borda,
               CAST((r_wclamp + r_vclamp + r_cscore) // {int(tier_width)}
                    AS BIGINT) AS tier
        FROM rk
    """


def _q_fragment_stitch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-fragment stitching over a synthesized fragment corpus: each
    long-enough document splits into two fragments overlapping by k=8
    tokens (the sf docs are unbroken word streams — the q87/q133 synth
    discipline: derive the structure the operator needs, identically on
    both engines), then tail-k == head-k md5 boundary keys join them
    back; boundary keys over the frequency cap drop as boilerplate."""
    from document_quality_assessment_ocr_spark.functions.text import WS_CLASS
    from document_quality_assessment_ocr_spark.operators.dedup import (
        fragment_stitch,
    )

    k = 8
    tk = F.filter(
        F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))), WS_CLASS + "+"),
        lambda x: x != F.lit(""),
    )
    # checkpoint the token-array BEFORE the length filter: the filter
    # otherwise pushes below _par's exchange and the tokenizer runs on the
    # raw scan tasks, once per downstream branch (r6 — the barrier keeps
    # the one tokenize pass on full parallelism)
    e = (
        _doc(spark, sf_dir)
        .select(F.col("doc_id").cast("long").alias("doc_id"), tk.alias("tk"))
        .localCheckpoint()
        .where(F.size("tk") >= 2 * k + 2)
    )
    left = e.select(
        (F.col("doc_id") * 2).alias("frag_id"),
        F.array_join(
            F.expr(f"slice(tk, 1, (size(tk) DIV 2) + {k})"), " "
        ).alias("text"),
    )
    right = e.select(
        (F.col("doc_id") * 2 + 1).alias("frag_id"),
        F.array_join(
            F.expr("slice(tk, (size(tk) DIV 2) + 1, size(tk) - (size(tk) DIV 2))"),
            " ",
        ).alias("text"),
    )
    return fragment_stitch(
        left.unionAll(right), k=k, key_cap=16, id_col="frag_id"
    )


def _fragment_stitch_sql(k: int = 8, key_cap: int = 16) -> str:
    """q151 oracle: the same fragment synthesis (`//` == Spark DIV on
    non-negative lengths), md5 boundary keys, HAVING-capped key
    frequency on both sides, equi-join."""
    kk, cap = int(k), int(key_cap)
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                       TRIM(COALESCE(text, '')), '{WS}+'),
                       x -> x <> '') AS tk
            FROM documents
        ), e AS (
            SELECT * FROM d WHERE LEN(tk) >= 2 * {kk} + 2
        ), fr AS (
            SELECT doc_id * 2 AS frag_id,
                   tk[1 : (LEN(tk) // 2) + {kk}] AS ftk
            FROM e
            UNION ALL
            SELECT doc_id * 2 + 1,
                   tk[(LEN(tk) // 2) + 1 : LEN(tk)]
            FROM e
        ), g AS (
            SELECT frag_id, ftk FROM fr WHERE LEN(ftk) >= {kk}
        ), h AS (
            SELECT frag_id AS right_id,
                   MD5(ARRAY_TO_STRING(ftk[1:{kk}], ' ')) AS bkey
            FROM g
        ), t AS (
            SELECT frag_id AS left_id,
                   MD5(ARRAY_TO_STRING(
                       ftk[LEN(ftk) - {kk} + 1 : LEN(ftk)], ' ')) AS bkey
            FROM g
        ), hk AS (
            SELECT bkey FROM h GROUP BY 1 HAVING COUNT(*) <= {cap}
        ), tkc AS (
            SELECT bkey FROM t GROUP BY 1 HAVING COUNT(*) <= {cap}
        )
        SELECT left_id, right_id, bkey AS boundary_md5
        FROM t JOIN h USING (bkey) JOIN hk USING (bkey) JOIN tkc USING (bkey)
        WHERE left_id <> right_id
    """


def _q_template_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAN-style instruction-template expansion: one md5-chosen template
    per doc, first-30-token render as input, next-20 tokens as target —
    zero-shuffle codegen projection."""
    from document_quality_assessment_ocr_spark.operators.augment import (
        template_expand,
    )

    return template_expand(
        _doc(spark, sf_dir).select(
            F.col("doc_id").cast("long").alias("doc_id"), "text"
        ),
        n_head=30,
        n_target=20,
        salt=7,
    )


def _template_expand_sql(
    n_head: int = 30, n_target: int = 20, salt: int = 7
) -> str:
    """q152 oracle: the SAME INSTRUCTION_TEMPLATES literals (shared
    constant — oracle-literal technique) rendered prefix||head||suffix;
    COALESCE around ARRAY_TO_STRING (DuckDB returns NULL for [])."""
    from document_quality_assessment_ocr_spark.operators.augment import (
        INSTRUCTION_TEMPLATES,
    )

    nh, nt = int(n_head), int(n_target)
    arms = " ".join(
        f"WHEN {i} THEN '{pre}' || head || '{suf}'"
        for i, (pre, suf) in enumerate(INSTRUCTION_TEMPLATES)
    )
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                       TRIM(COALESCE(text, '')), '{WS}+'),
                       x -> x <> '') AS tk
            FROM documents
        ), x AS (
            SELECT doc_id, tk,
                   CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)
                        || '|tpl{int(salt)}'), 1, 15))::BIGINT
                        % {len(INSTRUCTION_TEMPLATES)} AS BIGINT) AS tpl_id
            FROM d
        ), r AS (
            SELECT doc_id, tpl_id,
                   CAST(LEN(tk) AS BIGINT) AS n_tokens,
                   COALESCE(ARRAY_TO_STRING(tk[1:{nh}], ' '), '') AS head,
                   COALESCE(ARRAY_TO_STRING(tk[{nh} + 1:{nh} + {nt}], ' '),
                            '') AS target
            FROM x
        )
        SELECT doc_id, tpl_id, n_tokens,
               CASE tpl_id {arms} ELSE '' END AS input,
               target
        FROM r
    """


def _q_group_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source percentile calibration of the clamped-Flesch score —
    (group, score-bucket) offsets + bucket-partitioned windows, never a
    per-group global window."""
    from document_quality_assessment_ocr_spark.operators.curriculum import (
        group_percentile,
    )
    from document_quality_assessment_ocr_spark.operators.textstats import (
        flesch_readability,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text", "source"
    )
    scored = (
        flesch_readability(d.select("doc_id", "text"))
        .select(
            "doc_id",
            F.expr("LEAST(GREATEST(flesch_milli, 0L), 206835L)").alias(
                "cscore"
            ),
        )
        .join(d.select("doc_id", "source"), "doc_id")
    )
    return group_percentile(scored, "cscore", "source")


def _group_percentile_sql(scale: int = 1_000_000) -> str:
    """q153 oracle: the q126 clamped score joined with source, then the
    per-group single-reducer windows the engine deliberately avoids."""
    return f"""
        SELECT doc_id, source, cscore,
               CAST(ROW_NUMBER() OVER w - 1 AS BIGINT) AS rank_in_group,
               CAST(COUNT(*) OVER g AS BIGINT) AS n_group,
               CAST(((ROW_NUMBER() OVER w - 1) * {int(scale)})
                    // GREATEST(COUNT(*) OVER g - 1, 1) AS BIGINT)
                   AS pctl_micro
        FROM (
            SELECT r.doc_id, d2.source,
                   CAST(LEAST(GREATEST(r.flesch_milli, 0), 206835)
                        AS BIGINT) AS cscore
            FROM ({_READABILITY_SQL}) r
            JOIN (SELECT CAST(doc_id AS BIGINT) AS doc_id, source
                  FROM documents) d2 USING (doc_id)
        )
        WINDOW w AS (PARTITION BY source ORDER BY cscore ASC, doc_id ASC),
               g AS (PARTITION BY source)
    """


def _q_png_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural PNG container profiles over derived media picks: REAL
    chunk-table walk (length-prefixed chunks, IHDR fields, IDAT byte
    total — no pixel decode) via mapInPandas over the seeded image
    catalog, joined to the SAME md5-nibble picks as q57 (salts 1/2: a
    document's images are the same in every query). Malformed containers
    emit no rows (the q137 undecodable-payload convention). The oracle
    embeds per-payload profiles computed by the SAME
    png_chunk_profile_values the UDF calls."""
    from document_quality_assessment_ocr_spark.operators.multimodal import (
        png_chunk_stats,
    )
    from document_quality_assessment_ocr_spark.sources.derive import (
        _md5_pick_index,
        payloads_df,
    )
    from document_quality_assessment_ocr_spark.sources.fixtures import payload_names

    names = sorted(payload_names())
    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|1"))).alias("_h1"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|2"))).alias("_h2"),
    )
    arr = F.array(*[F.lit(x) for x in names])
    picks = d.select(
        "doc_id",
        F.explode(
            F.array(
                F.element_at(arr, _md5_pick_index("_h1", len(names)) + 1),
                F.element_at(arr, _md5_pick_index("_h2", len(names)) + 1),
            )
        ).alias("media_ref"),
    ).distinct()
    st = png_chunk_stats(payloads_df(spark)).where(F.col("error").isNull())
    return picks.join(F.broadcast(st), "media_ref").select(
        "doc_id", "media_ref", "n_chunks", "idat_bytes", "width", "height",
        "bit_depth", "color_type", "chunk_types",
    )


def _png_chunks_sql() -> str:
    """q154 oracle: the seeded image catalog's chunk profiles as literals
    (computed by the SAME png_chunk_profile_values the engine's
    mapInPandas calls), derived media picks via the md5-nibble twin at
    salts 1/2; malformed containers contribute no VALUES row. BIGINT
    casts on every integer (VALUES literals lex as INTEGER)."""
    from document_quality_assessment_ocr_spark.operators.multimodal import (
        png_chunk_profile_values,
    )
    from document_quality_assessment_ocr_spark.sources.fixtures import (
        build_payloads,
        payload_names,
    )

    cat = build_payloads(seed=42)
    names = sorted(payload_names())
    vals = []
    for n in names:
        try:
            v = png_chunk_profile_values(cat[n]["png"])
        except Exception:
            continue  # engine emits no rows for malformed containers
        vals.append(
            f"('{n}', {v[0]}, {v[1]}, {v[2]}, {v[3]}, {v[4]}, {v[5]}, "
            f"'{v[6]}')"
        )
    names_lit = "[" + ", ".join(f"'{n}'" for n in names) + "]"
    return f"""
        WITH st(media_ref, n_chunks, idat_bytes, width, height, bit_depth,
                color_type, chunk_types) AS (VALUES {", ".join(vals)}),
        picks AS (
            SELECT DISTINCT doc_id, media_ref FROM (
                SELECT CAST(doc_id AS BIGINT) AS doc_id,
                       LIST_EXTRACT({names_lit}, {_md5_pick_sql(1, len(names))} + 1) AS media_ref
                FROM documents
                UNION ALL
                SELECT CAST(doc_id AS BIGINT),
                       LIST_EXTRACT({names_lit}, {_md5_pick_sql(2, len(names))} + 1)
                FROM documents)
        )
        SELECT p.doc_id, p.media_ref,
               CAST(st.n_chunks AS BIGINT) AS n_chunks,
               CAST(st.idat_bytes AS BIGINT) AS idat_bytes,
               CAST(st.width AS BIGINT) AS width,
               CAST(st.height AS BIGINT) AS height,
               CAST(st.bit_depth AS BIGINT) AS bit_depth,
               CAST(st.color_type AS BIGINT) AS color_type,
               st.chunk_types
        FROM picks p JOIN st USING (media_ref)
    """


def _q_jpeg_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decoded-JPEG luma profiles over derived media picks: REAL baseline
    JFIF decode (from-scratch Huffman + dequant + float64 iDCT,
    sources/jpeg.py — the reference delegates this to PIL,
    handlers/pdf_handler.py:48) over the seeded JPEG catalog via
    mapInPandas, joined to md5-nibble per-document picks at salts 9/10
    (the q57/q137 shape; fresh salts — grep'd the registry first per the
    CLAUDE.md checklist). Undecodable payloads (corrupt container) emit
    no rows. The oracle embeds per-payload (width, height,
    mean_luma_milli, ahash) literals computed by the SAME
    multimodal.jpeg_profile_values the engine's UDF calls — the shared-
    INTEGER contract: only integers and a hex string cross engines."""
    from document_quality_assessment_ocr_spark.operators.multimodal import (
        jpeg_stats,
    )
    from document_quality_assessment_ocr_spark.sources.derive import _md5_pick_index
    from document_quality_assessment_ocr_spark.sources.fixtures import (
        build_jpeg_payloads,
        jpeg_payload_names,
    )

    names = sorted(jpeg_payload_names())
    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|9"))).alias("_h9"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|10"))).alias("_h10"),
    )
    arr = F.array(*[F.lit(x) for x in names])
    picks = d.select(
        "doc_id",
        F.explode(
            F.array(
                F.element_at(arr, _md5_pick_index("_h9", len(names)) + 1),
                F.element_at(arr, _md5_pick_index("_h10", len(names)) + 1),
            )
        ).alias("media_ref"),
    ).distinct()
    cat = build_jpeg_payloads()
    pay = spark.createDataFrame(
        [(n, bytearray(cat[n])) for n in names], "media_ref string, png binary"
    )
    st = jpeg_stats(pay).where(F.col("error").isNull())
    return picks.join(F.broadcast(st), "media_ref").select(
        "doc_id", "media_ref", "width", "height", "mean_luma_milli", "ahash"
    )


def _jpeg_profile_sql() -> str:
    """q261 oracle: the seeded JPEG catalog's decoded profiles as literals
    (computed by the SAME jpeg_profile_values the engine's mapInPandas
    calls — real decode on the generator side too), derived media picks
    via the md5-nibble twin at salts 9/10; the corrupt container
    contributes no VALUES row. BIGINT casts on every integer (VALUES
    literals lex as INTEGER in DuckDB)."""
    from document_quality_assessment_ocr_spark.operators.multimodal import (
        jpeg_profile_values,
    )
    from document_quality_assessment_ocr_spark.sources.fixtures import (
        build_jpeg_payloads,
        jpeg_payload_names,
    )

    cat = build_jpeg_payloads()
    names = sorted(jpeg_payload_names())
    vals = []
    for n in names:
        try:
            v = jpeg_profile_values(cat[n])
        except Exception:
            continue  # engine emits no rows for undecodable payloads
        vals.append(f"('{n}', {v[0]}, {v[1]}, {v[2]}, '{v[3]}')")
    names_lit = "[" + ", ".join(f"'{n}'" for n in names) + "]"
    return f"""
        WITH st(media_ref, width, height, mean_luma_milli, ahash) AS
            (VALUES {", ".join(vals)}),
        picks AS (
            SELECT DISTINCT doc_id, media_ref FROM (
                SELECT CAST(doc_id AS BIGINT) AS doc_id,
                       LIST_EXTRACT({names_lit}, {_md5_pick_sql(9, len(names))} + 1) AS media_ref
                FROM documents
                UNION ALL
                SELECT CAST(doc_id AS BIGINT),
                       LIST_EXTRACT({names_lit}, {_md5_pick_sql(10, len(names))} + 1)
                FROM documents)
        )
        SELECT p.doc_id, p.media_ref,
               CAST(st.width AS BIGINT) AS width,
               CAST(st.height AS BIGINT) AS height,
               CAST(st.mean_luma_milli AS BIGINT) AS mean_luma_milli,
               st.ahash
        FROM picks p JOIN st USING (media_ref)
    """


def _reencode_rows(_cache={}) -> list:
    """Driver-side (media_ref, ahash_png, ahash_jpeg, hamming) panel rows
    via the SHARED reencode_profile_values — the q201/oracle-literal
    panel-bounded pattern (the oracle builder `_reencode_sql` computes the
    SAME rows the same way). Memoized per process (r5 verdict item #5:
    the ~0.34 s/payload pure-python codec chain was re-paid every run;
    the panel is a fixed 17-payload catalog, never corpus data)."""
    if "rows" not in _cache:
        from document_quality_assessment_ocr_spark.operators.multimodal import (
            reencode_profile_values,
        )
        from document_quality_assessment_ocr_spark.sources.fixtures import (
            build_payloads,
            payload_names,
        )

        cat = build_payloads(seed=42)
        rows = []
        for n in sorted(payload_names()):
            try:
                v = reencode_profile_values(cat[n]["png"])
            except Exception:
                continue
            rows.append((n, v[0], v[1], int(v[2])))
        _cache["rows"] = rows
    return _cache["rows"]


def _q_reencode_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-format near-dup invariance: the SAME rendered page as PNG
    and as a REAL baseline-JPEG re-encode (from-scratch encoder+decoder,
    sources/jpeg.py) must collide on the perceptual hash — per pick,
    both aHashes + hamming + the ≤4-bit cross_dup verdict. Picks ride
    salts 1/2 (the q57 contract: a document's images are the same in
    every query); panel-bounded crop window documented in
    reencode_profile_values. The panel profile table is driver-computed
    via the shared fn + broadcast (see :func:`_reencode_rows`); the
    distributed ``reencode_match`` operator remains the corpus-scale
    surface."""
    from document_quality_assessment_ocr_spark.sources.derive import (
        _md5_pick_index,
    )
    from document_quality_assessment_ocr_spark.sources.fixtures import payload_names

    names = sorted(payload_names())
    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|1"))).alias("_h1"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|2"))).alias("_h2"),
    )
    arr = F.array(*[F.lit(x) for x in names])
    picks = d.select(
        "doc_id",
        F.explode(
            F.array(
                F.element_at(arr, _md5_pick_index("_h1", len(names)) + 1),
                F.element_at(arr, _md5_pick_index("_h2", len(names)) + 1),
            )
        ).alias("media_ref"),
    ).distinct()
    st = spark.createDataFrame(
        _reencode_rows(),
        "media_ref string, ahash_png string, ahash_jpeg string, hamming long",
    )
    return picks.join(F.broadcast(st), "media_ref").select(
        "doc_id", "media_ref", "ahash_png", "ahash_jpeg", "hamming",
        (F.col("hamming") <= F.lit(4)).alias("cross_dup"),
    )


def _reencode_sql(_cache={}) -> str:
    """q264 oracle: per-payload (ahash_png, ahash_jpeg, hamming) literals
    computed by the SAME reencode_profile_values (real PNG decode → real
    JPEG encode → real JPEG decode on the generator side too — ~1.5 s,
    memoized), picks via the md5-nibble twin at salts 1/2."""
    if "sql" in _cache:
        return _cache["sql"]
    from document_quality_assessment_ocr_spark.operators.multimodal import (
        reencode_profile_values,
    )
    from document_quality_assessment_ocr_spark.sources.fixtures import (
        build_payloads,
        payload_names,
    )

    cat = build_payloads(seed=42)
    names = sorted(payload_names())
    vals = []
    for n in names:
        try:
            v = reencode_profile_values(cat[n]["png"])
        except Exception:
            continue
        vals.append(f"('{n}', '{v[0]}', '{v[1]}', {v[2]})")
    names_lit = "[" + ", ".join(f"'{n}'" for n in names) + "]"
    _cache["sql"] = f"""
        WITH st(media_ref, ahash_png, ahash_jpeg, hamming) AS
            (VALUES {", ".join(vals)}),
        picks AS (
            SELECT DISTINCT doc_id, media_ref FROM (
                SELECT CAST(doc_id AS BIGINT) AS doc_id,
                       LIST_EXTRACT({names_lit}, {_md5_pick_sql(1, len(names))} + 1) AS media_ref
                FROM documents
                UNION ALL
                SELECT CAST(doc_id AS BIGINT),
                       LIST_EXTRACT({names_lit}, {_md5_pick_sql(2, len(names))} + 1)
                FROM documents)
        )
        SELECT p.doc_id, p.media_ref, st.ahash_png, st.ahash_jpeg,
               CAST(st.hamming AS BIGINT) AS hamming,
               st.hamming <= 4 AS cross_dup
        FROM picks p JOIN st USING (media_ref)
    """
    return _cache["sql"]


def _q_mw_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiplicative-weights domain reweighting (DoReMi-shaped
    allocator): per-source token-weighted mean unigram surprisal (the
    q67 fixed-point bits), excess over the best source, 3 MW rounds with
    renormalization — all integer arithmetic."""
    from document_quality_assessment_ocr_spark.operators.sampling import (
        mw_domain_weights,
    )
    from document_quality_assessment_ocr_spark.operators.textstats import (
        unigram_surprisal,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text", "source"
    )
    per_doc = unigram_surprisal(d.select("doc_id", "text")).join(
        d.select("doc_id", "source"), "doc_id"
    )
    return mw_domain_weights(per_doc, "source", iters=3, eta_milli=200)


def _mw_weights_sql(iters: int = 3, eta_milli: int = 200) -> str:
    """q155 oracle: the q67 surprisal CTE chain (same LOWER tokenization,
    same whole-bit recipe) collapsed per source, then the MW rounds
    unrolled with single-reference CTEs (the q149 DuckDB-inlining
    lesson) — `SUM(wr) OVER ()` for the renormalizer, `//` == Spark DIV
    on the non-negative-by-construction operands."""
    from document_quality_assessment_ocr_spark.operators.sampling import MW_SCALE

    eta = int(eta_milli)
    its = []
    prev = "w0"
    for i in range(1, int(iters) + 1):
        its.append(f"""
            w{i}r AS (
                SELECT source, m_micro, excess_micro,
                       (w * ({MW_SCALE} + ({eta} * excess_micro) // 1000))
                           // {MW_SCALE} AS wr
                FROM {prev}
            ), w{i} AS (
                SELECT source, m_micro, excess_micro,
                       (wr * {MW_SCALE})
                           // GREATEST(SUM(wr) OVER (), 1) AS w
                FROM w{i}r
            )""")
        prev = f"w{i}"
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                       TRIM(LOWER(COALESCE(text,''))), '{WS}+'),
                       x -> x <> '') AS a
            FROM documents
        ), tk AS (
            SELECT doc_id, UNNEST(a) AS tok FROM d
        ), c AS (
            SELECT tok, COUNT(*) AS c FROM tk GROUP BY tok
        ), n AS (
            SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM c
        ), s AS (
            SELECT tk.doc_id,
                   CAST(LENGTH(BIN(n.n_total // c.c)) - 1 AS BIGINT) AS bits
            FROM tk JOIN c USING (tok) CROSS JOIN n
        ), a AS (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   CAST(SUM(bits) AS BIGINT) AS sum_bits
            FROM s GROUP BY doc_id
        ), pd AS (
            SELECT d.doc_id, d.source,
                   COALESCE(a.n_tokens, 0) AS n_tokens,
                   COALESCE(a.sum_bits, 0) AS sum_bits
            FROM d LEFT JOIN a USING (doc_id)
        ), g AS (
            SELECT source,
                   CAST((SUM(sum_bits) * {MW_SCALE})
                        // GREATEST(SUM(n_tokens), 1) AS BIGINT) AS m_micro
            FROM pd GROUP BY source
        ), e AS (
            SELECT source, m_micro,
                   CAST(m_micro - MIN(m_micro) OVER () AS BIGINT)
                       AS excess_micro
            FROM g
        ), w0 AS (
            SELECT source, m_micro, excess_micro,
                   CAST({MW_SCALE} AS BIGINT) AS w
            FROM e
        ), {", ".join(its)}
        SELECT source, m_micro, excess_micro,
               CAST(w AS BIGINT) AS weight_micro
        FROM {prev}
    """


def _q_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus drift monitor between the even- and odd-id halves of the
    corpus (the deterministic two-snapshot stand-in): fixed-point
    total-variation distance over unigram micro-probabilities + the
    top-20 drifting tokens via the two-level merge."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        token_drift,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return token_drift(
        d.where(F.expr("doc_id % 2 = 0")),
        d.where(F.expr("doc_id % 2 = 1")),
        k=20,
    )


def _token_drift_sql(k: int = 20) -> str:
    """q156 oracle: per-side token counts over the same LOWER
    tokenization, FULL OUTER merge (USING coalesces tok), window-total
    micro-probs (single-reference CTEs — the q149 inlining lesson),
    integer L1 and `// 2` TVD, rank window standing in for the two-level
    merge."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        DRIFT_SCALE,
    )

    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                       TRIM(LOWER(COALESCE(text,''))), '{WS}+'),
                       x -> x <> '') AS a
            FROM documents
        ), ca AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS ca
            FROM (SELECT UNNEST(a) AS tok FROM d WHERE doc_id % 2 = 0)
            GROUP BY tok
        ), cb AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS cb
            FROM (SELECT UNNEST(a) AS tok FROM d WHERE doc_id % 2 = 1)
            GROUP BY tok
        ), m AS (
            SELECT tok,
                   COALESCE(ca, 0) AS ca,
                   COALESCE(cb, 0) AS cb
            FROM ca FULL OUTER JOIN cb USING (tok)
        ), p AS (
            SELECT tok, ca, cb,
                   (ca * {DRIFT_SCALE}) // GREATEST(SUM(ca) OVER (), 1)
                       AS pa_micro,
                   (cb * {DRIFT_SCALE}) // GREATEST(SUM(cb) OVER (), 1)
                       AS pb_micro
            FROM m
        ), l AS (
            SELECT tok, ca, cb, pa_micro, pb_micro,
                   ABS(pa_micro - pb_micro) AS l1_micro,
                   CAST(SUM(ABS(pa_micro - pb_micro)) OVER () // 2
                        AS BIGINT) AS tv_micro
            FROM p
        )
        SELECT tok AS token, ca, cb,
               CAST(pa_micro AS BIGINT) AS pa_micro,
               CAST(pb_micro AS BIGINT) AS pb_micro,
               CAST(l1_micro AS BIGINT) AS l1_micro,
               tv_micro,
               CAST(rank AS INT) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY l1_micro DESC, tok ASC)
                  AS rank
              FROM l)
        WHERE rank <= {int(k)}
    """


def _q_video_scenes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal scene profile over derived video picks: REAL Y4M decode →
    sampled per-frame aHash (mapInPandas, pixels never leave the task) →
    consecutive-frame Hamming lag window → per-video scene-cut/static
    counts (the shot-boundary + static-slideshow curation signal).
    md5-nibble picks at salts 5/6 (the q137/q138 shape); the corrupt
    container contributes no rows (q137 convention, so every numeric stays
    NULL-free)."""
    from document_quality_assessment_ocr_spark.operators.multimodal import (
        video_frame_hashes,
        video_scene_profile,
    )
    from document_quality_assessment_ocr_spark.sources.derive import _md5_pick_index
    from document_quality_assessment_ocr_spark.sources.fixtures import (
        build_y4m_payloads,
        y4m_payload_names,
    )

    names = sorted(y4m_payload_names())
    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|5"))).alias("_h1"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|6"))).alias("_h2"),
    )
    arr = F.array(*[F.lit(x) for x in names])
    picks = d.select(
        "doc_id",
        F.explode(
            F.array(
                F.element_at(arr, _md5_pick_index("_h1", len(names)) + 1),
                F.element_at(arr, _md5_pick_index("_h2", len(names)) + 1),
            )
        ).alias("media_ref"),
    ).distinct()
    cat = build_y4m_payloads()
    pay = spark.createDataFrame(
        [(n, bytearray(cat[n])) for n in names], "media_ref string, png binary"
    )
    prof = video_scene_profile(
        video_frame_hashes(pay, every_k=1, max_frames=12), cut_threshold=16
    )
    return picks.join(F.broadcast(prof), "media_ref").select(
        "doc_id", "media_ref", "n_frames", "n_scenes", "n_cuts", "n_static",
        "max_ham",
    )


def _video_scenes_sql(cut_threshold: int = 16) -> str:
    """q157 oracle: per-frame aHash literals computed by the SAME
    video_frame_ahash_values the engine's mapInPandas calls, then the
    lag-window + per-nibble-popcount + scene aggregate replicated in SQL
    (an INDEPENDENT implementation of the temporal logic — only the
    hashes are shared); md5-nibble picks at salts 5/6. The corrupt
    container has no literals, matching the engine's no-rows convention."""
    from document_quality_assessment_ocr_spark.operators.multimodal import (
        video_frame_ahash_values,
    )
    from document_quality_assessment_ocr_spark.sources.fixtures import (
        build_y4m_payloads,
        y4m_payload_names,
    )

    cat = build_y4m_payloads()
    names = sorted(y4m_payload_names())
    vals = []
    for n in names:
        try:
            for i, hx in video_frame_ahash_values(cat[n], 1, 12):
                vals.append(f"('{n}', {i}, '{hx}')")
        except Exception:
            continue
    names_lit = "[" + ", ".join(f"'{n}'" for n in names) + "]"
    nib_x = (
        "BIT_COUNT(XOR(CAST(('0x' || SUBSTR(fhash, CAST(i AS INT), 1)) AS BIGINT),"
        " CAST(('0x' || SUBSTR(prev, CAST(i AS INT), 1)) AS BIGINT)))"
    )
    thr = int(cut_threshold)
    return f"""
        WITH fh(media_ref, frame_idx, fhash) AS (VALUES {", ".join(vals)}),
        lagged AS (
            SELECT media_ref, fhash,
                   LAG(fhash) OVER (PARTITION BY media_ref ORDER BY frame_idx)
                       AS prev
            FROM fh
        ), ham AS (
            SELECT media_ref,
                   CASE WHEN prev IS NULL THEN NULL
                        ELSE CAST(LIST_SUM(LIST_TRANSFORM(RANGE(1, 17),
                             i -> {nib_x})) AS BIGINT) END AS ham
            FROM lagged
        ), prof AS (
            SELECT media_ref,
                   CAST(COUNT(*) AS BIGINT) AS n_frames,
                   CAST(COALESCE(SUM(CASE WHEN ham > {thr} THEN 1 ELSE 0 END), 0)
                        + 1 AS BIGINT) AS n_scenes,
                   CAST(COALESCE(SUM(CASE WHEN ham > {thr} THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS n_cuts,
                   CAST(COALESCE(SUM(CASE WHEN ham = 0 THEN 1 ELSE 0 END), 0)
                        AS BIGINT) AS n_static,
                   CAST(COALESCE(MAX(ham), 0) AS BIGINT) AS max_ham
            FROM ham GROUP BY media_ref
        ), picks AS (
            SELECT DISTINCT doc_id, media_ref FROM (
                SELECT CAST(doc_id AS BIGINT) AS doc_id,
                       LIST_EXTRACT({names_lit}, {_md5_pick_sql(5, len(names))} + 1) AS media_ref
                FROM documents
                UNION ALL
                SELECT CAST(doc_id AS BIGINT),
                       LIST_EXTRACT({names_lit}, {_md5_pick_sql(6, len(names))} + 1)
                FROM documents)
        )
        SELECT p.doc_id, p.media_ref, prof.n_frames, prof.n_scenes,
               prof.n_cuts, prof.n_static, prof.max_ham
        FROM picks p JOIN prof USING (media_ref)
    """


def _q_zone_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map / file-skipping audit over doc_id-range buckets (file /
    row-group stand-ins): for each candidate ``n_chars >= T`` predicate,
    buckets fully prunable vs fully selected from (min, max) bounds alone
    — the Iceberg manifest-stats evaluation that decides whether the
    current layout serves a predicate class before paying for a
    re-cluster."""
    from document_quality_assessment_ocr_spark.operators.profile import (
        zone_map_audit,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "n_chars"
    )
    return zone_map_audit(
        d, "n_chars", thresholds=[100, 200, 400, 600], bucket_size=16
    )


def _zone_map_sql(bucket_size: int = 16) -> str:
    """q158 oracle: per-bucket min/max/count then the threshold-grid
    rollup; `//` == Spark DIV on the non-negative ids and counts."""
    return f"""
        WITH stats AS (
            SELECT CAST(doc_id AS BIGINT) // {int(bucket_size)} AS bucket,
                   MIN(CAST(n_chars AS BIGINT)) AS vmin,
                   MAX(CAST(n_chars AS BIGINT)) AS vmax,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM documents GROUP BY 1
        ), fanned AS (
            SELECT s.*, CAST(t.threshold AS BIGINT) AS threshold
            FROM stats s, (SELECT UNNEST([100, 200, 400, 600]) AS threshold) t
        )
        SELECT threshold,
               CAST(COUNT(*) AS BIGINT) AS n_buckets,
               CAST(COALESCE(SUM(CASE WHEN vmax < threshold THEN 1 ELSE 0 END), 0)
                    AS BIGINT) AS n_pruned,
               CAST(COALESCE(SUM(CASE WHEN vmin >= threshold THEN 1 ELSE 0 END), 0)
                    AS BIGINT) AS n_full,
               CAST(SUM(n) AS BIGINT) AS rows_total,
               CAST(COALESCE(SUM(CASE WHEN vmax < threshold THEN n ELSE 0 END), 0)
                    AS BIGINT) AS rows_skipped,
               CAST((COALESCE(SUM(CASE WHEN vmax < threshold THEN n ELSE 0 END), 0)
                     * 1000000) // GREATEST(SUM(n), 1) AS BIGINT) AS skip_micro
        FROM fanned GROUP BY threshold
    """


def _q_distinct_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct-n diversity dashboard (distinct-1/2/3 in
    micro-units) — the corpus-health number a mixture run watches as
    sources swap in and out."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        distinct_ngram_diversity,
    )

    d = _doc(spark, sf_dir).select("source", "text")
    return distinct_ngram_diversity(d, ns=(1, 2, 3))


def _distinct_n_sql() -> str:
    """q159 oracle: one tokenized CTE, per-n LIST_SLICE gram branches
    UNION ALL'd (the q130 gram idiom), Zipf-shrunk (grp, n, gram) counts,
    `//` micro ratio."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        DIVERSITY_SCALE,
    )

    branches = []
    for n in (1, 2, 3):
        branches.append(f"""
            SELECT grp, {n} AS n,
                   ARRAY_TO_STRING(LIST_SLICE(tk, CAST(i AS INT),
                       CAST(i AS INT) + {n - 1}), ' ') AS gram
            FROM (SELECT grp, tk,
                         UNNEST(RANGE(1, GREATEST(LEN(tk) - {n - 1}, 0) + 1))
                             AS i
                  FROM d)""")
    return f"""
        WITH d AS (
            SELECT source AS grp,
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                       TRIM(LOWER(COALESCE(text, ''))), '{WS}+'),
                       x -> x <> '') AS tk
            FROM documents
        ), g AS ({" UNION ALL ".join(branches)}),
        counts AS (
            SELECT grp, n, gram, CAST(COUNT(*) AS BIGINT) AS c
            FROM g GROUP BY grp, n, gram
        )
        SELECT grp AS source, CAST(n AS INT) AS n,
               CAST(SUM(c) AS BIGINT) AS total_ngrams,
               CAST(COUNT(*) AS BIGINT) AS distinct_ngrams,
               CAST((COUNT(*) * {DIVERSITY_SCALE}) // GREATEST(SUM(c), 1)
                    AS BIGINT) AS distinct_micro
        FROM counts GROUP BY grp, n
    """


def _q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host triangle counts over the q131/q149 host link graph via
    degree-oriented wedge joins — the link-farm-clique signal (farms are
    triangle-dense for their degree); orientation bounds wedge fan-out
    by O(sqrt(m)) so hub hosts never explode."""
    from document_quality_assessment_ocr_spark.operators.graph import triangle_count

    return triangle_count(_host_edges(spark, sf_dir)).select(
        F.col("id").alias("host"), "degree", "tri"
    )


def _triangles_sql() -> str:
    """q160 oracle: the shared q131/q149 host-graph prefix, then the SAME
    degree orientation (LPAD degree-20 || '|' || id sortable key) and
    wedge/closing-edge joins in SQL. The multi-referenced CTEs (und 2×,
    keyed 3×, ork 3×, tri 3×) are ``AS MATERIALIZED`` — DuckDB 1.0
    inlines PLAIN CTEs at every reference (the q149 4^iters lesson), but
    a MATERIALIZED CTE runs its subtree ONCE, so the URL-parse chain is
    evaluated a single time instead of ~47×."""
    return _host_graph_ctes() + """, und AS MATERIALIZED (
            SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
            FROM edges WHERE src <> dst
        ), dg AS (
            SELECT id, CAST(COUNT(*) AS BIGINT) AS degree
            FROM (SELECT u AS id FROM und UNION ALL SELECT v FROM und)
            GROUP BY id
        ), keyed AS MATERIALIZED (
            SELECT id, degree,
                   LPAD(CAST(degree AS VARCHAR), 20, '0') || '|' || id AS k
            FROM dg
        ), ork AS MATERIALIZED (
            SELECT CASE WHEN ku.k < kv.k THEN ku.k ELSE kv.k END AS ks,
                   CASE WHEN ku.k < kv.k THEN kv.k ELSE ku.k END AS kd
            FROM und
            JOIN keyed ku ON ku.id = und.u
            JOIN keyed kv ON kv.id = und.v
        ), tri AS MATERIALIZED (
            SELECT w1.ks AS a, w1.kd AS b, w2.kd AS c
            FROM ork w1
            JOIN ork w2 ON w1.ks = w2.ks AND w1.kd < w2.kd
            JOIN ork e ON e.ks = w1.kd AND e.kd = w2.kd
        ), corners AS (
            SELECT k, CAST(COUNT(*) AS BIGINT) AS tri
            FROM (SELECT a AS k FROM tri
                  UNION ALL SELECT b FROM tri
                  UNION ALL SELECT c FROM tri)
            GROUP BY k
        )
        SELECT keyed.id AS host, keyed.degree,
               CAST(COALESCE(corners.tri, 0) AS BIGINT) AS tri
        FROM keyed LEFT JOIN corners ON corners.k = keyed.k
    """


def _q_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dup pairs (small-doc-in-big-doc, the
    quote/excerpt detector Jaccard misses): q25's banded word-shingle
    MinHash candidates, then exact containment of the smaller shingle
    set via pair-keyed intersection joins."""
    from document_quality_assessment_ocr_spark.operators.dedup import (
        containment_pairs,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return containment_pairs(
        d, n_hashes=16, bands=4, ngram=5, shingle="word",
        min_cont_micro=600_000,
    )


def _containment_sql(min_cont_micro: int = 600_000) -> str:
    """q161 oracle: the q122 candidate chain (16 word-shingle perms, 4×4
    bands), DISTINCT shingle sets + sizes from the SAME sh CTE, pair
    intersection counts, `//` == Spark DIV on the non-negative
    (inter·10⁶, min-size) operands."""
    return _minhash_sql(16, shingle="word") + f"""
            , bands AS (
                SELECT doc_id, 0 AS band,
                       MD5(CONCAT_WS('#', h00, h01, h02, h03)) AS key FROM sig
                UNION ALL SELECT doc_id, 1,
                       MD5(CONCAT_WS('#', h04, h05, h06, h07)) FROM sig
                UNION ALL SELECT doc_id, 2,
                       MD5(CONCAT_WS('#', h08, h09, h10, h11)) FROM sig
                UNION ALL SELECT doc_id, 3,
                       MD5(CONCAT_WS('#', h12, h13, h14, h15)) FROM sig
            ), cand AS (
                SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.key = b.key
                 AND a.doc_id < b.doc_id
            ), shd AS MATERIALIZED (
                SELECT DISTINCT doc_id, g FROM sh
            ), sizes AS (
                SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz
                FROM shd GROUP BY doc_id
            ), inter AS (
                SELECT c.id_a, c.id_b, CAST(COUNT(*) AS BIGINT) AS inter
                FROM cand c
                JOIN shd a ON a.doc_id = c.id_a
                JOIN shd b ON b.doc_id = c.id_b AND b.g = a.g
                GROUP BY c.id_a, c.id_b
            ), scored AS (
                SELECT i.id_a, i.id_b, sa.sz AS sz_a, sb.sz AS sz_b, i.inter,
                       CAST((i.inter * 1000000)
                            // GREATEST(LEAST(sa.sz, sb.sz), 1) AS BIGINT)
                           AS cont_micro,
                       CASE WHEN sa.sz <= sb.sz THEN 'a' ELSE 'b' END
                           AS small_side
                FROM inter i
                JOIN sizes sa ON sa.doc_id = i.id_a
                JOIN sizes sb ON sb.doc_id = i.id_b
            )
            SELECT id_a, id_b, sz_a, sz_b, inter, cont_micro, small_side
            FROM scored WHERE cont_micro >= {int(min_cont_micro)}
    """


def _q_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew audit for the (lang|source) partitioning key at
    candidate partition counts 8/32/128 — the pre-flight straggler /
    empty-partition / salt-this-key check before keying a big join on
    the column (md5-nibble placement, the derive.py registry
    discipline, so the oracle reproduces it byte-for-byte)."""
    from document_quality_assessment_ocr_spark.operators.profile import (
        partition_skew_audit,
    )

    d = _doc(spark, sf_dir).select(
        F.concat(
            F.coalesce(F.col("lang").cast("string"), F.lit("")),
            F.lit("|"),
            F.coalesce(F.col("source").cast("string"), F.lit("")),
        ).alias("mix_key")
    )
    return partition_skew_audit(d, "mix_key", partition_grid=(8, 32, 128))


def _skew_audit_sql(partition_grid: tuple[int, ...] = (8, 32, 128)) -> str:
    """q162 oracle: per-key counts, the md5 60-bit placement
    (`('0x'||SUBSTR(MD5(k),1,15))::BIGINT % p`, the shingle_hash_expr
    twin), explode over the P grid, per-(p, pid) rollup; `//` == Spark
    DIV on the non-negative count operands."""
    grid = ", ".join(str(int(p)) for p in partition_grid)
    return f"""
        WITH keys AS (
            SELECT COALESCE(CAST(lang AS VARCHAR), '') || '|'
                   || COALESCE(CAST(source AS VARCHAR), '') AS k,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM documents GROUP BY 1
        ), fanned AS (
            SELECT CAST(p AS BIGINT) AS p,
                   CAST(('0x' || SUBSTR(MD5(k), 1, 15)) AS BIGINT)
                       % CAST(p AS BIGINT) AS pid,
                   k, n
            FROM keys, (SELECT UNNEST([{grid}]) AS p)
        ), parts AS (
            SELECT p, pid,
                   CAST(SUM(n) AS BIGINT) AS nrows,
                   CAST(COUNT(*) AS BIGINT) AS nk,
                   CAST(MAX(n) AS BIGINT) AS mk
            FROM fanned GROUP BY p, pid
        )
        SELECT p,
               CAST(SUM(nk) AS BIGINT) AS n_keys,
               CAST(COUNT(*) AS BIGINT) AS n_nonempty,
               CAST(SUM(nrows) AS BIGINT) AS rows_total,
               CAST(MAX(nrows) AS BIGINT) AS max_rows,
               CAST(MAX(mk) AS BIGINT) AS top_key_rows,
               CAST((MAX(nrows) * p * 1000000)
                    // GREATEST(SUM(nrows), 1) AS BIGINT) AS skew_micro,
               CAST((MAX(mk) * 1000000)
                    // GREATEST(SUM(nrows), 1) AS BIGINT) AS top_key_micro
        FROM parts GROUP BY p
    """


def _q_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 PMI collocations over adjacent word pairs — whole-bit
    fixed-point log2 (the q67 floor-log2 idiom, sum-of-floors form so no
    operand leaves int64 at any corpus size), min-count 5, two-level
    top-k merge."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        pmi_collocations,
    )

    d = _doc(spark, sf_dir).select("text")
    return pmi_collocations(d, min_count=5, k=30)


def _pmi_sql(min_count: int = 5, k: int = 30) -> str:
    """q163 oracle: one tokenized CTE feeds the unigram counts and the
    LIST_SLICE adjacent bigrams (the n=2 gram idiom), window-total N in
    the same CTE (single-reference discipline), LENGTH(BIN(c))-1
    whole-bit log2, rank window standing in for the two-level merge.
    pmi_bits may be negative — surfaced/ordered only, never divided."""
    return f"""
        WITH d AS MATERIALIZED (
            SELECT LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                       TRIM(LOWER(COALESCE(text, ''))), '{WS}+'),
                       x -> x <> '') AS tk
            FROM documents
        ), uni AS (
            SELECT w, CAST(COUNT(*) AS BIGINT) AS c
            FROM (SELECT UNNEST(tk) AS w FROM d)
            GROUP BY w
        ), unin AS MATERIALIZED (
            SELECT w, c, CAST(SUM(c) OVER () AS BIGINT) AS n_tok FROM uni
        ), big AS (
            SELECT g, CAST(COUNT(*) AS BIGINT) AS c_xy
            FROM (SELECT ARRAY_TO_STRING(LIST_SLICE(tk, CAST(i AS INT),
                             CAST(i AS INT) + 1), ' ') AS g
                  FROM (SELECT tk,
                               UNNEST(RANGE(1, GREATEST(LEN(tk) - 1, 0) + 1))
                                   AS i
                        FROM d))
            GROUP BY g
            HAVING COUNT(*) >= {int(min_count)}
        ), scored AS (
            SELECT b.g AS bigram, b.c_xy, x.c AS c_x, y.c AS c_y,
                   CAST((LENGTH(BIN(b.c_xy)) - 1) + (LENGTH(BIN(x.n_tok)) - 1)
                        - (LENGTH(BIN(x.c)) - 1) - (LENGTH(BIN(y.c)) - 1)
                        AS BIGINT) AS pmi_bits
            FROM big b
            JOIN unin x ON x.w = SPLIT_PART(b.g, ' ', 1)
            JOIN unin y ON y.w = SPLIT_PART(b.g, ' ', 2)
        )
        SELECT bigram, c_xy, c_x, c_y, pmi_bits, CAST(rank AS INT) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY pmi_bits DESC,
                  c_xy DESC, bigram ASC) AS rank
              FROM scored)
        WHERE rank <= {int(k)}
    """


def _q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel signup → view → click → purchase over the events
    table: each level keeps the earliest event strictly after the
    previous level's time; conversions in fixed-point micro."""
    from document_quality_assessment_ocr_spark.operators.sessions import funnel_steps

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return funnel_steps(ev, ["signup", "view", "click", "purchase"])


def _funnel_sql(steps: tuple[str, ...] = ("signup", "view", "click", "purchase")) -> str:
    """q164 oracle: per-level MIN-after-previous CTEs (MATERIALIZED — each
    level reads the prior one), UNION ALL step table, FIRST_VALUE/LAG
    windows on the |steps|-row relation; `//` == Spark DIV on the
    non-negative user counts."""
    lvls = []
    unions = []
    for i, st in enumerate(steps, start=1):
        if i == 1:
            lvls.append(f"""l1 AS MATERIALIZED (
                SELECT u, MIN(t) AS t FROM e WHERE et = '{st}' GROUP BY u
            )""")
        else:
            lvls.append(f"""l{i} AS MATERIALIZED (
                SELECT e.u, MIN(e.t) AS t
                FROM e JOIN l{i - 1} p ON p.u = e.u
                WHERE e.et = '{st}' AND e.t > p.t
                GROUP BY e.u
            )""")
        unions.append(
            f"SELECT {i} AS step, '{st}' AS event_type,"
            f" CAST(COUNT(*) AS BIGINT) AS n_users FROM l{i}"
        )
    return f"""
        WITH e AS MATERIALIZED (
            SELECT CAST(user_id AS BIGINT) AS u, event_type AS et,
                   EPOCH_US(ts) AS t
            FROM events
        ), {", ".join(lvls)}, steps AS (
            {" UNION ALL ".join(unions)}
        )
        SELECT CAST(step AS INT) AS step, event_type, n_users,
               CAST((n_users * 1000000)
                    // GREATEST(FIRST_VALUE(n_users) OVER (ORDER BY step), 1)
                    AS BIGINT) AS conv_from_first_micro,
               CAST((n_users * 1000000)
                    // GREATEST(COALESCE(LAG(n_users) OVER (ORDER BY step),
                                         n_users), 1)
                    AS BIGINT) AS conv_from_prev_micro
        FROM steps
    """


def _q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix over events at 6-hour periods (first-
    activity cohort × still-active offset), retained fraction in
    fixed-point micro."""
    from document_quality_assessment_ocr_spark.operators.sessions import (
        retention_cohorts,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return retention_cohorts(ev, period_us=21_600_000_000)


def _retention_sql(period_us: int = 21_600_000_000) -> str:
    """q165 oracle: per-user MIN epoch `//` period cohorts, DISTINCT
    (user, period) activity, cohort-keyed rollup; every `//` operand
    non-negative (epochs)."""
    p = int(period_us)
    return f"""
        WITH e AS MATERIALIZED (
            SELECT CAST(user_id AS BIGINT) AS u, EPOCH_US(ts) AS t
            FROM events
        ), f AS MATERIALIZED (
            SELECT u, CAST(MIN(t) // {p} AS BIGINT) AS cohort
            FROM e GROUP BY u
        ), s AS (
            SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_size
            FROM f GROUP BY cohort
        ), a AS (
            SELECT DISTINCT u, CAST(t // {p} AS BIGINT) AS period FROM e
        ), m AS (
            SELECT f.cohort, CAST(a.period - f.cohort AS BIGINT) AS "offset",
                   CAST(COUNT(*) AS BIGINT) AS n_active
            FROM a JOIN f ON f.u = a.u
            GROUP BY 1, 2
        )
        SELECT m.cohort AS cohort_period, m."offset" AS "offset",
               s.cohort_size, m.n_active,
               CAST((m.n_active * 1000000) // GREATEST(s.cohort_size, 1)
                    AS BIGINT) AS retained_micro
        FROM m JOIN s USING (cohort)
    """


def _q_posting_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index size planner: per-term delta + Elias-gamma posting
    cost over the [2, 400] document-frequency band (hapaxes and
    stopwords excluded, exactly as the index build would)."""
    from document_quality_assessment_ocr_spark.operators.retrieval import (
        posting_list_size,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return posting_list_size(d, min_df=2, max_df=400)


def _posting_size_sql(min_df: int = 2, max_df: int = 400) -> str:
    """q167 oracle: DISTINCT (term, did) postings, df band in HAVING,
    per-term LAG gaps (first gap = did + 1 via the COALESCE(-1) trick),
    γ(g) = 2·(LENGTH(BIN(g))−1)+1, `//` byte rounding on non-negative
    bits."""
    return f"""
        WITH d AS MATERIALIZED (
            SELECT CAST(doc_id AS BIGINT) AS did,
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                       TRIM(LOWER(COALESCE(text, ''))), '{WS}+'),
                       x -> x <> '') AS tk
            FROM documents
        ), post AS MATERIALIZED (
            SELECT DISTINCT term, did
            FROM (SELECT did, UNNEST(tk) AS term FROM d)
        ), band AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS df
            FROM post GROUP BY term
            HAVING COUNT(*) >= {int(min_df)} AND COUNT(*) <= {int(max_df)}
        ), gaps AS (
            SELECT p.term, b.df,
                   p.did - COALESCE(LAG(p.did) OVER (
                       PARTITION BY p.term ORDER BY p.did ASC), -1) AS gap
            FROM post p JOIN band b USING (term)
        )
        SELECT term, df,
               CAST(SUM(2 * (LENGTH(BIN(gap)) - 1) + 1) AS BIGINT)
                   AS total_bits,
               CAST((SUM(2 * (LENGTH(BIN(gap)) - 1) + 1) + 7) // 8 AS BIGINT)
                   AS bytes_est
        FROM gaps GROUP BY term, df
    """


def _q_emb_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding-corpus profile (min/max/mean/var in
    truncated micro fixed point; min-shift mean keeps every DIV operand
    non-negative) — the embedding-health dashboard before an index
    build."""
    from document_quality_assessment_ocr_spark.operators.similarity import (
        embedding_dim_profile,
    )

    return embedding_dim_profile(_emb(spark, sf_dir), scale=1_000_000)


def _emb_profile_sql(scale: int = 1_000_000) -> str:
    """q168 oracle: UNNEST(RANGE) per-dim fan, CAST(TRUNC(v·10⁶)) ==
    Spark CAST-to-long truncation (both toward zero — ROUND has no
    single cross-engine semantics), min-shift mean, clamped integer
    variance; `//` == Spark DIV on the shifted non-negative operands."""
    s = float(int(scale))
    mean = "(((sv - n * min_micro) // GREATEST(n, 1)) + min_micro)"
    return f"""
        WITH ex AS (
            SELECT CAST(i - 1 AS INT) AS dim,
                   CAST(TRUNC(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
                        * {s!r}) AS BIGINT) AS vm
            FROM (SELECT embedding,
                         UNNEST(RANGE(1, LEN(embedding) + 1)) AS i
                  FROM embeddings)
        ), agg AS (
            SELECT dim,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(vm) AS BIGINT) AS sv,
                   CAST(SUM(vm * vm) AS BIGINT) AS svv,
                   CAST(MIN(vm) AS BIGINT) AS min_micro,
                   CAST(MAX(vm) AS BIGINT) AS max_micro
            FROM ex GROUP BY dim
        )
        SELECT dim, n, min_micro, max_micro,
               CAST({mean} AS BIGINT) AS mean_micro,
               CAST(GREATEST(svv // GREATEST(n, 1) - {mean} * {mean}, 0)
                    AS BIGINT) AS var_micro2
        FROM agg
    """


def _q_audio_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio quality gate over derived media picks (md5-nibble salts 7/8):
    REAL stdlib-``wave`` decode, per-payload silence/clipping counts via
    the SHARED wav_quality_values (only integers cross engines), fixed-
    point silence/clip micro ratios. Undecodable payloads contribute no
    rows (the q137 convention)."""
    from document_quality_assessment_ocr_spark.operators.multimodal import (
        audio_quality_profile,
    )
    from document_quality_assessment_ocr_spark.sources.derive import _md5_pick_index
    from document_quality_assessment_ocr_spark.sources.fixtures import (
        build_wav_payloads,
        wav_payload_names,
    )

    names = sorted(wav_payload_names())
    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|7"))).alias("_h1"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|8"))).alias("_h2"),
    )
    arr = F.array(*[F.lit(x) for x in names])
    picks = d.select(
        "doc_id",
        F.explode(
            F.array(
                F.element_at(arr, _md5_pick_index("_h1", len(names)) + 1),
                F.element_at(arr, _md5_pick_index("_h2", len(names)) + 1),
            )
        ).alias("media_ref"),
    ).distinct()
    cat = build_wav_payloads()
    pay = spark.createDataFrame(
        [(n, bytearray(cat[n])) for n in names], "media_ref string, png binary"
    )
    prof = audio_quality_profile(pay, frame=512, use_fake_decoder=False)
    return picks.join(F.broadcast(prof), "media_ref").select(
        "doc_id", "media_ref", "n_frames", "n_silent", "n_clipped",
        "peak_milli", "silence_micro", "clip_micro",
    )


def _audio_quality_sql(frame: int = 512) -> str:
    """q169 oracle: per-payload INTEGER quality tuples computed by the
    SAME wav_quality_values the engine's mapInPandas calls (float
    thresholding happens once, in python — no float literal rides the
    SQL), md5-nibble picks at salts 7/8, micro ratios via `//` on the
    non-negative counts. The corrupt container has no literals, matching
    the engine's no-rows convention."""
    from document_quality_assessment_ocr_spark.operators.multimodal import (
        wav_quality_values,
    )
    from document_quality_assessment_ocr_spark.sources.fixtures import (
        build_wav_payloads,
        wav_payload_names,
    )

    cat = build_wav_payloads()
    names = sorted(wav_payload_names())
    vals = []
    for n in names:
        try:
            nf, ns, nc, pk = wav_quality_values(cat[n], frame)
        except Exception:
            continue  # engine emits no rows for undecodable payloads
        vals.append(f"('{n}', {nf}, {ns}, {nc}, {pk})")
    names_lit = "[" + ", ".join(f"'{n}'" for n in names) + "]"
    return f"""
        WITH q(media_ref, n_frames, n_silent, n_clipped, peak_milli)
            AS (VALUES {", ".join(vals)}),
        prof AS (
            SELECT media_ref,
                   CAST(n_frames AS BIGINT) AS n_frames,
                   CAST(n_silent AS BIGINT) AS n_silent,
                   CAST(n_clipped AS BIGINT) AS n_clipped,
                   CAST(peak_milli AS BIGINT) AS peak_milli,
                   CAST((n_silent * 1000000) // GREATEST(n_frames, 1)
                        AS BIGINT) AS silence_micro,
                   CAST((n_clipped * 1000000) // GREATEST(n_frames, 1)
                        AS BIGINT) AS clip_micro
            FROM q
        ), picks AS (
            SELECT DISTINCT doc_id, media_ref FROM (
                SELECT CAST(doc_id AS BIGINT) AS doc_id,
                       LIST_EXTRACT({names_lit}, {_md5_pick_sql(7, len(names))} + 1) AS media_ref
                FROM documents
                UNION ALL
                SELECT CAST(doc_id AS BIGINT),
                       LIST_EXTRACT({names_lit}, {_md5_pick_sql(8, len(names))} + 1)
                FROM documents)
        )
        SELECT p.doc_id, p.media_ref, prof.n_frames, prof.n_silent,
               prof.n_clipped, prof.peak_milli, prof.silence_micro,
               prof.clip_micro
        FROM picks p JOIN prof USING (media_ref)
    """


def _q_join_explain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-explosion pre-flight on the (documents × doc_id%3 slice, key
    = lang) equi-join — exact output cardinality from per-key counts,
    amplification vs the larger input, top contributing keys via the
    two-level merge."""
    from document_quality_assessment_ocr_spark.operators.profile import (
        join_cardinality_audit,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang"
    )
    return join_cardinality_audit(
        d, d.where(F.col("doc_id") % 3 == 0), "lang", k=20
    )


def _join_explain_sql(k: int = 20) -> str:
    """q170 oracle: per-side key counts, FULL OUTER merge, window totals
    in the same CTE (single-reference discipline), rank window standing
    in for the two-level merge; `//` == Spark DIV on the non-negative
    count products."""
    return f"""
        WITH la AS (
            SELECT COALESCE(CAST(lang AS VARCHAR), '') AS k,
                   CAST(COUNT(*) AS BIGINT) AS ca
            FROM documents GROUP BY 1
        ), lb AS (
            SELECT COALESCE(CAST(lang AS VARCHAR), '') AS k,
                   CAST(COUNT(*) AS BIGINT) AS cb
            FROM documents WHERE CAST(doc_id AS BIGINT) % 3 = 0
            GROUP BY 1
        ), m AS (
            SELECT k, COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
            FROM la FULL OUTER JOIN lb USING (k)
        ), t AS (
            SELECT k, ca, cb, CAST(ca * cb AS BIGINT) AS prod,
                   CAST(SUM(ca * cb) OVER () AS BIGINT) AS est_total,
                   CAST(SUM(ca) OVER () AS BIGINT) AS na,
                   CAST(SUM(cb) OVER () AS BIGINT) AS nb
            FROM m
        )
        SELECT k AS key, ca, cb, prod, est_total,
               CAST((est_total * 1000000)
                    // GREATEST(GREATEST(na, nb), 1) AS BIGINT) AS amp_micro,
               CAST((prod * 1000000) // GREATEST(est_total, 1) AS BIGINT)
                   AS share_micro,
               CAST(rank AS INT) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY prod DESC, k ASC)
                  AS rank
              FROM t)
        WHERE rank <= {int(k)}
    """


def _q_encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-encoding planner over documents (lang, source, text):
    plain vs dictionary size estimates from one Zipf-shrunk value pass
    per column, whole-bit code width, winner + integer savings ratio."""
    from document_quality_assessment_ocr_spark.operators.profile import (
        encoding_advisor,
    )

    return encoding_advisor(_doc(spark, sf_dir), ["lang", "source", "text"])


def _encoding_advisor_sql(cols: tuple[str, ...] = ("lang", "source", "text")) -> str:
    """q171 oracle: per-column value-count subquery + 1-row rollup,
    UNION ALL'd; code_bits = LENGTH(BIN(GREATEST(nd−1, 1))) (the
    whole-bit idiom), `//` byte rounding on non-negative operands."""
    branches = []
    for c in cols:
        branches.append(f"""
            SELECT '{c}' AS "column",
                   CAST(SUM(cnt) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct,
                   CAST(SUM(LENGTH(v) * cnt) AS BIGINT) AS plain_bytes,
                   CAST(SUM(LENGTH(v)) AS BIGINT) AS dict_values_bytes
            FROM (SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt
                  FROM (SELECT COALESCE(CAST({c} AS VARCHAR), '') AS v
                        FROM documents)
                  GROUP BY v)""")
    return f"""
        WITH per AS ({" UNION ALL ".join(branches)}),
        sized AS (
            SELECT "column", n, n_distinct, plain_bytes,
                   CAST(dict_values_bytes
                        + (n * LENGTH(BIN(GREATEST(n_distinct - 1, 1))) + 7)
                          // 8 AS BIGINT) AS dict_bytes
            FROM per
        )
        SELECT "column", n, n_distinct, plain_bytes, dict_bytes,
               CASE WHEN dict_bytes < plain_bytes THEN 'dict'
                    ELSE 'plain' END AS winner,
               CAST(CASE WHEN dict_bytes < plain_bytes THEN
                        ((plain_bytes - dict_bytes) * 1000000)
                        // GREATEST(plain_bytes, 1)
                    ELSE 0 END AS BIGINT) AS save_micro
        FROM sized
    """


def _q_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host link reciprocity over the q131 host graph — the
    link-exchange detector (organic links are mostly asymmetric; paid
    rings reciprocate): out/in degree + returned-edge count + fixed-point
    reciprocity ratio."""
    from document_quality_assessment_ocr_spark.operators.graph import (
        edge_reciprocity,
    )

    return edge_reciprocity(_host_edges(spark, sf_dir)).select(
        F.col("id").alias("host"), "out_deg", "in_deg", "n_recip",
        "recip_micro",
    )


def _reciprocity_sql() -> str:
    """q172 oracle: the shared host-graph prefix, DISTINCT directed
    edges (MATERIALIZED — referenced four times), swapped-key self-join
    for returned edges, node-bounded degree rollups; `//` == Spark DIV
    on the non-negative degree operands."""
    return _host_graph_ctes() + """, de AS MATERIALIZED (
            SELECT DISTINCT src AS s, dst AS d FROM edges WHERE src <> dst
        ), recip AS MATERIALIZED (
            SELECT e.s AS id, CAST(COUNT(*) AS BIGINT) AS n_recip
            FROM de e JOIN de r ON r.s = e.d AND r.d = e.s
            GROUP BY 1
        ), outd AS MATERIALIZED (
            SELECT s AS id, CAST(COUNT(*) AS BIGINT) AS out_deg
            FROM de GROUP BY 1
        ), ind AS MATERIALIZED (
            SELECT d AS id, CAST(COUNT(*) AS BIGINT) AS in_deg
            FROM de GROUP BY 1
        ), n2 AS (
            SELECT id FROM outd UNION SELECT id FROM ind
        )
        SELECT n2.id AS host,
               CAST(COALESCE(outd.out_deg, 0) AS BIGINT) AS out_deg,
               CAST(COALESCE(ind.in_deg, 0) AS BIGINT) AS in_deg,
               CAST(COALESCE(recip.n_recip, 0) AS BIGINT) AS n_recip,
               CAST((COALESCE(recip.n_recip, 0) * 1000000)
                    // GREATEST(COALESCE(outd.out_deg, 0), 1) AS BIGINT)
                   AS recip_micro
        FROM n2
        LEFT JOIN outd ON outd.id = n2.id
        LEFT JOIN ind ON ind.id = n2.id
        LEFT JOIN recip ON recip.id = n2.id
    """


def _q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-round k-core peel (k=2, 3 rounds) over the q131/q149 host
    link graph — the dense-subgraph extractor (a link ring's core
    survives peeling; sub-k periphery falls off each round). Survivors
    surface with their degree inside the surviving set."""
    from document_quality_assessment_ocr_spark.operators.graph import kcore_peel

    return kcore_peel(_host_edges(spark, sf_dir), k=2, rounds=3).select(
        F.col("id").alias("host"), "core_deg"
    )


def _kcore_sql(k: int = 2, rounds: int = 3) -> str:
    """q173 oracle: the shared host-graph prefix, canonical undirected
    unique edges, then the peel loop UNROLLED — each round's survivor
    set and filtered edge set are ``AS MATERIALIZED`` (every one is
    referenced twice by the next round's endpoint semijoins; plain CTEs
    would re-inline the URL-parse subtree exponentially, the q149
    lesson). Every quantity is a non-negative integer count."""
    parts = [
        """, ue AS MATERIALIZED (
            SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
            FROM edges WHERE src <> dst
        )"""
    ]
    prev_e = "ue"
    for i in range(1, int(rounds) + 1):
        parts.append(f""", g{i} AS (
            SELECT id, CAST(COUNT(*) AS BIGINT) AS deg
            FROM (SELECT a AS id FROM {prev_e} UNION ALL SELECT b FROM {prev_e})
            GROUP BY id
        ), s{i} AS MATERIALIZED (
            SELECT id FROM g{i} WHERE deg >= {int(k)}
        ), e{i + 1} AS MATERIALIZED (
            SELECT a, b FROM {prev_e}
            WHERE a IN (SELECT id FROM s{i}) AND b IN (SELECT id FROM s{i})
        )""")
        prev_e = f"e{i + 1}"
    parts.append(f""", gf AS (
            SELECT id, CAST(COUNT(*) AS BIGINT) AS deg
            FROM (SELECT a AS id FROM {prev_e} UNION ALL SELECT b FROM {prev_e})
            GROUP BY id
        )
        SELECT id AS host, deg AS core_deg FROM gf WHERE deg >= 1
    """)
    return _host_graph_ctes() + "".join(parts)


def _q_degree_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed degree distribution of the host link graph — the
    power-law-tail / hub-skew audit consulted before paying a join on
    host (a heavy high bucket means salt or broadcast first)."""
    from document_quality_assessment_ocr_spark.operators.graph import (
        degree_histogram,
    )

    return degree_histogram(_host_edges(spark, sf_dir))


def _degree_hist_sql() -> str:
    """q176 oracle: undirected unique-edge degrees, floor-log2 bucket via
    the shared ``LENGTH(BIN(deg)) - 1`` fixed-point idiom (DuckDB BIN ==
    Spark F.bin, no leading zeros), integer ``<<`` for the bucket floor."""
    return _host_graph_ctes() + """, und AS MATERIALIZED (
            SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
            FROM edges WHERE src <> dst
        ), dg AS (
            SELECT id, CAST(COUNT(*) AS BIGINT) AS deg
            FROM (SELECT u AS id FROM und UNION ALL SELECT v FROM und)
            GROUP BY id
        ), bk AS (
            SELECT CAST(LENGTH(BIN(deg)) - 1 AS BIGINT) AS bucket, deg
            FROM dg
        )
        SELECT bucket,
               CAST(CAST(1 AS BIGINT) << CAST(bucket AS INT) AS BIGINT)
                   AS lo_deg,
               CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(MIN(deg) AS BIGINT) AS min_deg,
               CAST(MAX(deg) AS BIGINT) AS max_deg
        FROM bk GROUP BY bucket ORDER BY bucket
    """


def _q_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier calibration audit: bucket the q84 hashed-linear quality
    score (shifted fixed-point milli) and measure the per-bucket rate of
    a length proxy label — the monotone-ramp check run before gating a
    corpus on the classifier threshold."""
    from document_quality_assessment_ocr_spark.operators.classify import (
        calibration_audit,
    )

    return calibration_audit(
        _doc(spark, sf_dir), n_buckets=64, seed=7,
        bucket_width_milli=250, min_tokens=80,
    )


def _calibration_sql(
    bucket_width_milli: int = 250, min_tokens: int = 80
) -> str:
    """q174 oracle: the q84 gram/bucket/weight arithmetic (the SAME
    classifier_weights vector interpolated as literals), but the score
    stays in SHIFTED integer milli (`(gsum + 2000·ng) // ng` — every
    operand non-negative so DuckDB `//` == Spark DIV), bucketed and
    rolled up with integer pos-rate micro. LIST_SUM returns HUGEINT —
    CAST to BIGINT before arithmetic (the q41/q63 dtype lesson)."""
    from document_quality_assessment_ocr_spark.operators.classify import (
        OFFSET_MILLI,
        classifier_weights,
    )

    w = classifier_weights(64, 7)
    wl = "[" + ", ".join(str(x) for x in w) + "]::BIGINT[]"
    bucket = (
        "CAST(CAST(('0x' || SUBSTR(MD5(g), 1, 15)) AS BIGINT) % 64 AS INT) + 1"
    )
    bw = int(bucket_width_milli)
    return f"""
        WITH d AS (
            SELECT LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                       TRIM(LOWER(COALESCE(text,''))), '{WS}+'),
                       x -> x <> '') AS tk
            FROM documents
        ), gr AS (
            SELECT tk,
                   tk || CASE WHEN LEN(tk) >= 2
                         THEN LIST_TRANSFORM(RANGE(1, LEN(tk)),
                              i -> tk[CAST(i AS INT)] || CHR(1)
                                   || tk[CAST(i AS INT) + 1])
                         ELSE []::VARCHAR[] END AS grams
            FROM d
        ), sc AS (
            SELECT CASE WHEN LEN(grams) > 0
                        THEN ((CAST(LIST_SUM(LIST_TRANSFORM(grams,
                                  g -> ({wl})[{bucket}])) AS BIGINT)
                               + {int(OFFSET_MILLI)} * CAST(LEN(grams) AS BIGINT))
                              // CAST(LEN(grams) AS BIGINT)) // {bw}
                        ELSE {int(OFFSET_MILLI) // bw} END AS bucket,
                   LEN(tk) >= {int(min_tokens)} AS pos
            FROM gr
        )
        SELECT CAST(bucket AS BIGINT) AS bucket,
               CAST(bucket * {bw} - {int(OFFSET_MILLI)} AS BIGINT) AS lo_milli,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
               CAST((SUM(CASE WHEN pos THEN 1 ELSE 0 END) * 1000000)
                    // COUNT(*) AS BIGINT) AS pos_rate_micro
        FROM sc GROUP BY bucket ORDER BY bucket
    """


def _q_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TF-IDF keywords: top-3 most corpus-distinctive terms
    per doc under the fused fixed-point RSJ score — the tag/topic-routing
    stage of a curation pipeline."""
    from document_quality_assessment_ocr_spark.operators.retrieval import (
        tfidf_keywords,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return tfidf_keywords(d, k=3, min_df=2)


def _tfidf_sql(k: int = 3, min_df: int = 2) -> str:
    """q175 oracle: the shared whitespace tokenization, (doc,term) tf +
    term df aggregates, the FUSED fixed-point score
    ``(tf·(N−df)·1000) // df`` (one truncating division — `*`/`DIV` are
    same-precedence left-associative, so the fused spelling is the only
    cross-engine-identical one), per-doc ROW_NUMBER top-k with the
    (score DESC, term ASC) tie-break."""
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                       TRIM(LOWER(COALESCE(text,''))), '{WS}+'),
                       x -> x <> '') AS tk
            FROM documents
        ), tok AS (
            SELECT doc_id, UNNEST(tk) AS term FROM d
        ), tf AS (
            SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
            FROM tok GROUP BY 1, 2
        ), dfq AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
        ), n AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS c FROM d
        ), sc AS (
            SELECT tf.doc_id, tf.term, tf.tf,
                   CAST((tf.tf * (n.c - dfq.df) * 1000) // dfq.df AS BIGINT)
                       AS score_milli
            FROM tf JOIN dfq USING (term) CROSS JOIN n
            WHERE dfq.df < n.c AND dfq.df >= {int(min_df)}
        ), rk AS (
            SELECT doc_id, term, tf, score_milli,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY doc_id
                       ORDER BY score_milli DESC, term ASC) AS BIGINT) AS rk
            FROM sc
        )
        SELECT doc_id, term, tf, score_milli, rk FROM rk WHERE rk <= {int(k)}
    """


def _q_gap_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed inter-event gap distribution per user stream — the
    empirical sessionization-threshold chooser (the valley between
    within-session and between-session gap modes)."""
    from document_quality_assessment_ocr_spark.operators.sessions import (
        gap_histogram,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return gap_histogram(ev)


def _gap_hist_sql() -> str:
    """q177 oracle: per-user LAG on (EPOCH_US(ts), event_id) — the shared
    integer-microsecond timestamp contract — then the shared
    ``LENGTH(BIN(n)) - 1`` log2 bucket and an integer ``<<`` floor."""
    return """
        WITH g AS (
            SELECT EPOCH_US(ts) - LAG(EPOCH_US(ts)) OVER (
                       PARTITION BY user_id
                       ORDER BY EPOCH_US(ts) ASC, event_id ASC) AS gap_us
            FROM events
        ), b AS (
            SELECT CAST(LENGTH(BIN(gap_us)) - 1 AS BIGINT) AS bucket, gap_us
            FROM g WHERE gap_us IS NOT NULL
        )
        SELECT bucket,
               CAST(CAST(1 AS BIGINT) << CAST(bucket AS INT) AS BIGINT)
                   AS lo_us,
               CAST(COUNT(*) AS BIGINT) AS n_gaps,
               CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
               CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
        FROM b GROUP BY bucket ORDER BY bucket
    """


def _q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cross-source 5-gram overlap matrix — the "which corpora
    leaked into each other" pre-mixing audit; containment_micro is
    asymmetric-size-safe (small-in-big containment reads 1e6)."""
    from document_quality_assessment_ocr_spark.operators.decontam import (
        source_overlap_matrix,
    )

    return source_overlap_matrix(_doc(spark, sf_dir), n=5)


def _source_overlap_sql(n: int = 5) -> str:
    """q178 oracle: the q34 shingle CTE keyed by source (same md5 of the
    space-joined lowercase word n-gram), the per-source DISTINCT set
    MATERIALIZED (read three times: sizes + both join sides), pair join
    with src < src ordering; `//` == Spark DIV on the non-negative
    counts."""
    toks = (
        f"LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(COALESCE(text,''))), '{WS}+'),"
        " x -> x <> '')"
    )
    gram = " || ' ' || ".join(f"a[CAST(i AS INT) + {j}]" for j in range(int(n)))
    return f"""
        WITH d AS (
            SELECT COALESCE(source, '') AS src, {toks} AS a FROM documents
        ), sh AS MATERIALIZED (
            SELECT DISTINCT src, MD5({gram}) AS shingle
            FROM (SELECT src, a,
                         UNNEST(RANGE(1, GREATEST(LEN(a) - {int(n) - 1}, 0) + 1))
                             AS i
                  FROM d)
        ), sz AS MATERIALIZED (
            SELECT src, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY 1
        ), pr AS (
            SELECT a.src AS source_a, b.src AS source_b,
                   CAST(COUNT(*) AS BIGINT) AS n_shared
            FROM sh a JOIN sh b USING (shingle)
            WHERE a.src < b.src
            GROUP BY 1, 2
        )
        SELECT pr.source_a, pr.source_b, pr.n_shared,
               za.n_sh AS n_a, zb.n_sh AS n_b,
               CAST((pr.n_shared * 1000000)
                    // GREATEST(LEAST(za.n_sh, zb.n_sh), 1) AS BIGINT)
                   AS containment_micro
        FROM pr
        JOIN sz za ON za.src = pr.source_a
        JOIN sz zb ON zb.src = pr.source_b
    """


def _q_prefix_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host front-coding savings over the outlink URL store — the
    crawl-frontier / URL-index storage planner (sorted same-host URLs
    share long prefixes; saved_micro is the delta-encoding win)."""
    from document_quality_assessment_ocr_spark.operators.html import extract_links
    from document_quality_assessment_ocr_spark.operators.urls import (
        parse_urls,
        prefix_compression_profile,
    )

    d = _doc(spark, sf_dir)
    parsed = parse_urls(
        extract_links(_synth_html(d)).select("doc_id", F.col("href").alias("url"))
    )
    return prefix_compression_profile(parsed)


def _prefix_compression_sql(cap: int = 64) -> str:
    """q179 oracle: the shared host-graph outlink parse chain (tparsed
    carries url_norm), per-host LAG over url ASC with COALESCE('') for
    the run head, and the monotone prefix-equality COUNT as the LCP —
    RANGE(1, GREATEST(m,1)+1) == the engine's guarded sequence."""
    return _host_graph_ctes() + f""", uu AS (
            SELECT host, url_norm AS u
            FROM tparsed WHERE url_norm IS NOT NULL
        ), lag_t AS (
            SELECT host, CAST(LENGTH(u) AS BIGINT) AS len, u,
                   COALESCE(LAG(u) OVER (PARTITION BY host ORDER BY u ASC),
                            '') AS prev
            FROM uu
        ), lcp_t AS (
            SELECT host, len,
                   CAST(LEN(LIST_FILTER(
                       RANGE(1, GREATEST(LEAST(LENGTH(u), LENGTH(prev),
                                                {int(cap)}), 1) + 1),
                       i -> SUBSTR(u, 1, CAST(i AS INT))
                            = SUBSTR(prev, 1, CAST(i AS INT))))
                       AS BIGINT) AS lcp
            FROM lag_t
        )
        SELECT host,
               CAST(COUNT(*) AS BIGINT) AS n_urls,
               CAST(SUM(len) AS BIGINT) AS total_chars,
               CAST(SUM(lcp) AS BIGINT) AS saved_chars,
               CAST((SUM(lcp) * 1000000) // GREATEST(SUM(len), 1) AS BIGINT)
                   AS saved_micro
        FROM lcp_t GROUP BY host
    """


def _q_quality_joint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joint (token-count log2 bucket × classifier shifted-milli bucket)
    histogram — the 2-D drift dashboard that catches shifts the 1-D
    audits (q156 drift, q174 calibration) cannot see."""
    from document_quality_assessment_ocr_spark.operators.classify import (
        quality_length_joint,
    )

    return quality_length_joint(
        _doc(spark, sf_dir), n_buckets=64, seed=7, bucket_width_milli=500
    )


def _quality_joint_sql(bucket_width_milli: int = 500) -> str:
    """q180 oracle: the q84 gram/weight arithmetic (shared
    classifier_weights literals) + the q174 shifted-milli bucket at
    width 500 + the shared BIN log2 token bucket, rolled up on the 2-D
    cell."""
    from document_quality_assessment_ocr_spark.operators.classify import (
        OFFSET_MILLI,
        classifier_weights,
    )

    w = classifier_weights(64, 7)
    wl = "[" + ", ".join(str(x) for x in w) + "]::BIGINT[]"
    bucket = (
        "CAST(CAST(('0x' || SUBSTR(MD5(g), 1, 15)) AS BIGINT) % 64 AS INT) + 1"
    )
    bw = int(bucket_width_milli)
    return f"""
        WITH d AS (
            SELECT LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                       TRIM(LOWER(COALESCE(text,''))), '{WS}+'),
                       x -> x <> '') AS tk
            FROM documents
        ), gr AS (
            SELECT tk,
                   tk || CASE WHEN LEN(tk) >= 2
                         THEN LIST_TRANSFORM(RANGE(1, LEN(tk)),
                              i -> tk[CAST(i AS INT)] || CHR(1)
                                   || tk[CAST(i AS INT) + 1])
                         ELSE []::VARCHAR[] END AS grams
            FROM d
        ), sc AS (
            SELECT CAST(LENGTH(BIN(CAST(LEN(tk) AS BIGINT))) - 1 AS BIGINT)
                       AS tok_bucket,
                   CASE WHEN LEN(grams) > 0
                        THEN ((CAST(LIST_SUM(LIST_TRANSFORM(grams,
                                  g -> ({wl})[{bucket}])) AS BIGINT)
                               + {int(OFFSET_MILLI)} * CAST(LEN(grams) AS BIGINT))
                              // CAST(LEN(grams) AS BIGINT)) // {bw}
                        ELSE {int(OFFSET_MILLI) // bw} END AS q_bucket
            FROM gr
        )
        SELECT tok_bucket, CAST(q_bucket AS BIGINT) AS q_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM sc GROUP BY tok_bucket, q_bucket
        ORDER BY tok_bucket, q_bucket
    """


def _q_char_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source character-class composition (alpha/digit/ws/ctrl/other
    + micro shares) — the cheap data-health dashboard that flags binary
    spill and serial-number floods before any model-based score."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        char_class_profile,
    )

    return char_class_profile(_doc(spark, sf_dir))


def _char_classes_sql() -> str:
    """q181 oracle: the same length-minus-stripped counting idiom with
    the SHARED class constants (WS, scrub.CONTROLS — \\x{..} escapes,
    the cross-engine regex contract); DuckDB REGEXP_REPLACE takes an
    explicit 'g' flag. Micro ratios after the per-source sums."""
    from document_quality_assessment_ocr_spark.operators.scrub import CONTROLS

    def cnt(cls: str) -> str:
        return f"LENGTH(t) - LENGTH(REGEXP_REPLACE(t, '{cls}', '', 'g'))"

    return f"""
        WITH b AS (
            SELECT COALESCE(source, '') AS source,
                   CAST(LENGTH(t) AS BIGINT) AS tot,
                   CAST({cnt('[a-zA-Z]')} AS BIGINT) AS alpha,
                   CAST({cnt('[0-9]')} AS BIGINT) AS digit,
                   CAST({cnt(WS)} AS BIGINT) AS ws,
                   CAST({cnt(CONTROLS)} AS BIGINT) AS ctrl
            FROM (SELECT source, COALESCE(text, '') AS t FROM documents)
        ), s AS (
            SELECT source,
                   CAST(SUM(tot) AS BIGINT) AS total_chars,
                   CAST(SUM(alpha) AS BIGINT) AS alpha,
                   CAST(SUM(digit) AS BIGINT) AS digit,
                   CAST(SUM(ws) AS BIGINT) AS ws,
                   CAST(SUM(ctrl) AS BIGINT) AS ctrl
            FROM b GROUP BY source
        )
        SELECT source, total_chars, alpha, digit, ws, ctrl,
               CAST(total_chars - alpha - digit - ws - ctrl AS BIGINT)
                   AS other,
               CAST((alpha * 1000000) // GREATEST(total_chars, 1) AS BIGINT)
                   AS alpha_micro,
               CAST((digit * 1000000) // GREATEST(total_chars, 1) AS BIGINT)
                   AS digit_micro,
               CAST((ws * 1000000) // GREATEST(total_chars, 1) AS BIGINT)
                   AS ws_micro,
               CAST((ctrl * 1000000) // GREATEST(total_chars, 1) AS BIGINT)
                   AS ctrl_micro
        FROM s ORDER BY source
    """


def _q_anchor_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text diversity per target host — the link-farm texture
    signal (organic inbound links vary their anchors; paid rings stamp
    one string): distinct anchors / total links in fixed-point micro."""
    from document_quality_assessment_ocr_spark.operators.html import (
        anchor_diversity,
        extract_links,
    )
    from document_quality_assessment_ocr_spark.operators.urls import parse_urls

    d = _doc(spark, sf_dir)
    parsed = parse_urls(
        extract_links(_synth_html(d)).select(
            "doc_id", F.col("href").alias("url"), "anchor_text"
        ),
        keep=("anchor_text",),
    )
    return anchor_diversity(parsed)


def _anchor_diversity_sql() -> str:
    """q182 oracle: the q127 anchor-threaded parse chain (extra param —
    the twin of parse_urls' keep), the same (host, anchor) aggregate,
    then the host rollup; `//` == Spark DIV on non-negative counts."""
    from document_quality_assessment_ocr_spark.operators.html import ANCHOR_HREF

    g2 = f"REGEXP_EXTRACT(ms[CAST(i AS INT)], '{ANCHOR_HREF}', 2)"
    return _HTML_SYNTH_CTE + f""", mt AS (
            SELECT doc_id,
                   REGEXP_EXTRACT_ALL(COALESCE(html,''), '{ANCHOR_HREF}') AS ms
            FROM d
        ), ex AS (
            SELECT doc_id, ms, UNNEST(RANGE(1, LEN(ms) + 1)) AS i FROM mt
        ), lk AS (
            SELECT doc_id,
                   REGEXP_EXTRACT(ms[CAST(i AS INT)], '{ANCHOR_HREF}', 1) AS url,
                   {_vis_sql(g2)} AS anchor_text
            FROM ex
        ), {_url_parse_ctes('lk', extra=', anchor_text')}, cnt AS (
            SELECT host, anchor_text, CAST(COUNT(*) AS BIGINT) AS n
            FROM parsed WHERE host <> '' AND anchor_text <> ''
            GROUP BY host, anchor_text
        )
        SELECT host,
               CAST(SUM(n) AS BIGINT) AS n_links,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               CAST((COUNT(*) * 1000000) // GREATEST(SUM(n), 1) AS BIGINT)
                   AS diversity_micro
        FROM cnt GROUP BY host
    """


def _q_event_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-burst detector per event type: same user re-firing the
    same type within 60 s — the retry-storm / at-least-once-replay
    audit that keeps funnels and retention honest."""
    from document_quality_assessment_ocr_spark.operators.sessions import (
        event_bursts,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return event_bursts(ev, threshold_ms=60_000)


def _event_bursts_sql(threshold_ms: int = 60_000) -> str:
    """q183 oracle: the shared per-user (EPOCH_US, event_id) window with
    TWO lags (time + type), burst = strictly-within-threshold AND
    same-type; `//` == Spark DIV on the non-negative counts."""
    thr_us = int(threshold_ms) * 1000
    return f"""
        WITH g AS (
            SELECT COALESCE(event_type, '') AS event_type,
                   EPOCH_US(ts) AS t,
                   LAG(EPOCH_US(ts)) OVER w AS pt,
                   LAG(event_type) OVER w AS pty
            FROM events
            WINDOW w AS (PARTITION BY user_id
                         ORDER BY EPOCH_US(ts) ASC, event_id ASC)
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN pt IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_with_prev,
               CAST(SUM(CASE WHEN pt IS NOT NULL AND t - pt < {thr_us}
                                  AND COALESCE(pty, '') = event_type
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_bursts,
               CAST((SUM(CASE WHEN pt IS NOT NULL AND t - pt < {thr_us}
                                   AND COALESCE(pty, '') = event_type
                              THEN 1 ELSE 0 END) * 1000000)
                    // GREATEST(SUM(CASE WHEN pt IS NOT NULL THEN 1
                                         ELSE 0 END), 1) AS BIGINT)
                   AS burst_micro
        FROM g GROUP BY event_type ORDER BY event_type
    """


def _q_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured property rollup: integer key 'k' pulled from the
    JSON props payload per event type — the schema-drift check for
    loosely-typed event pipelines."""
    from document_quality_assessment_ocr_spark.operators.sessions import props_stats

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return props_stats(ev, key="k")


def _props_stats_sql(key: str = "k") -> str:
    """q184 oracle: JSON_VALID-guarded JSON_EXTRACT_STRING + TRY_CAST —
    the DuckDB spelling of Spark's NULL-on-failure get_json_object +
    cast (DuckDB's raw extract ERRORS on malformed JSON; Spark never
    does). Integer min/max/sum coalesced to 0 so an all-missing type
    stays int64 end-to-end (the q41 dtype lesson)."""
    return f"""
        WITH v AS (
            SELECT COALESCE(event_type, '') AS event_type,
                   CASE WHEN JSON_VALID(COALESCE(props, ''))
                        THEN TRY_CAST(JSON_EXTRACT_STRING(
                                 COALESCE(props, ''), '$.{key}') AS BIGINT)
                        ELSE NULL END AS val
            FROM events
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_missing,
               CAST(COALESCE(SUM(val), 0) AS BIGINT) AS sum_v,
               CAST(COALESCE(MIN(val), 0) AS BIGINT) AS min_v,
               CAST(COALESCE(MAX(val), 0) AS BIGINT) AS max_v
        FROM v GROUP BY event_type ORDER BY event_type
    """


def _q_rendezvous(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous-hash reshard movement matrix for growing 8 → 9 shards:
    under HRW only ~1/9 of keys move (vs ~100% under hash-mod) — this
    computes the exact (from, to) matrix so the re-shard network bill is
    known before it is paid."""
    from document_quality_assessment_ocr_spark.operators.compaction import (
        rendezvous_reshard,
    )

    d = _doc(spark, sf_dir).select(F.col("doc_id").cast("long").alias("doc_id"))
    return rendezvous_reshard(d, n_old=8, n_new=9)


def _rendezvous_sql(n_old: int = 8, n_new: int = 9, salt: str = "rv") -> str:
    """q185 oracle: the SAME per-shard ``md5hex || '|' || shard`` strings
    (md5 hex is 32 fixed lowercase chars — lexicographic GREATEST decides
    on the hash, the q160 sortable-key idiom) and the winner's suffix
    parsed from position 34."""

    def pick(n: int) -> str:
        keys = ", ".join(
            f"MD5(CAST(doc_id AS VARCHAR) || '|{salt}{s}') || '|' || '{s}'"
            for s in range(int(n))
        )
        expr = keys if int(n) == 1 else f"GREATEST({keys})"
        return f"CAST(SUBSTR({expr}, 34, 20) AS BIGINT)"

    return f"""
        WITH b AS (
            SELECT {pick(n_old)} AS from_shard,
                   {pick(n_new)} AS to_shard
            FROM documents
        )
        SELECT from_shard, to_shard,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               from_shard <> to_shard AS moved
        FROM b GROUP BY 1, 2 ORDER BY 1, 2
    """


def _q_dup_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wedge closure (global clustering coefficient) of the q10
    MinHash-LSH near-dup pair graph — the transitivity audit: chains
    without triangles mean the banding emits A~B~C without A~C (bands
    too coarse); a healthy dup graph is triangle-dense."""
    from document_quality_assessment_ocr_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from document_quality_assessment_ocr_spark.operators.graph import wedge_closure

    pairs = minhash_lsh_pairs(
        _doc(spark, sf_dir).select(
            F.col("doc_id").cast("long").alias("doc_id"), "text"
        ),
        n_hashes=16,
        bands=4,
        shingle="word",
    )
    return wedge_closure(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )


def _dup_closure_sql() -> str:
    """q186 oracle: the q10 sig/bands/pairs chain, then the q160
    degree-orientation triangle pattern over the pair graph (pairs are
    already canonical id_a < id_b), rolled up to the one-row closure.
    Multi-referenced CTEs are MATERIALIZED (the q149 inlining lesson);
    integer wedge arithmetic is exact (`deg·(deg−1)` is even)."""
    return _minhash_sql(16, shingle="word") + """
            , bands AS (
                SELECT doc_id, 0 AS band,
                       MD5(CONCAT_WS('#', h00, h01, h02, h03)) AS key FROM sig
                UNION ALL SELECT doc_id, 1,
                       MD5(CONCAT_WS('#', h04, h05, h06, h07)) FROM sig
                UNION ALL SELECT doc_id, 2,
                       MD5(CONCAT_WS('#', h08, h09, h10, h11)) FROM sig
                UNION ALL SELECT doc_id, 3,
                       MD5(CONCAT_WS('#', h12, h13, h14, h15)) FROM sig
            ), und AS MATERIALIZED (
                SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
            ), dg AS (
                SELECT id, CAST(COUNT(*) AS BIGINT) AS degree
                FROM (SELECT u AS id FROM und UNION ALL SELECT v FROM und)
                GROUP BY id
            ), keyed AS MATERIALIZED (
                SELECT id, degree,
                       LPAD(CAST(degree AS VARCHAR), 20, '0') || '|'
                           || CAST(id AS VARCHAR) AS k
                FROM dg
            ), ork AS MATERIALIZED (
                SELECT CASE WHEN ku.k < kv.k THEN ku.k ELSE kv.k END AS ks,
                       CASE WHEN ku.k < kv.k THEN kv.k ELSE ku.k END AS kd
                FROM und
                JOIN keyed ku ON ku.id = und.u
                JOIN keyed kv ON kv.id = und.v
            ), tri AS MATERIALIZED (
                SELECT w1.ks AS a, w1.kd AS b, w2.kd AS c
                FROM ork w1
                JOIN ork w2 ON w1.ks = w2.ks AND w1.kd < w2.kd
                JOIN ork e ON e.ks = w1.kd AND e.kd = w2.kd
            ), corners AS (
                SELECT k, CAST(COUNT(*) AS BIGINT) AS tri
                FROM (SELECT a AS k FROM tri
                      UNION ALL SELECT b FROM tri
                      UNION ALL SELECT c FROM tri)
                GROUP BY k
            ), fin AS (
                SELECT keyed.degree AS degree,
                       COALESCE(corners.tri, 0) AS tri
                FROM keyed LEFT JOIN corners ON corners.k = keyed.k
            )
            SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
                   CAST(SUM(degree) // 2 AS BIGINT) AS n_edges,
                   CAST(SUM((degree * (degree - 1)) // 2) AS BIGINT) AS wedges,
                   CAST(SUM(tri) AS BIGINT) AS closed,
                   CAST((SUM(tri) * 1000000)
                        // GREATEST(SUM((degree * (degree - 1)) // 2), 1)
                        AS BIGINT) AS closure_micro
            FROM fin
    """


def _q_url_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host URL shape profile over the outlink store: path depth ×
    file extension counts — the crawler-trap / binary-drift dashboard."""
    from document_quality_assessment_ocr_spark.operators.html import extract_links
    from document_quality_assessment_ocr_spark.operators.urls import (
        parse_urls,
        url_depth_profile,
    )

    d = _doc(spark, sf_dir)
    parsed = parse_urls(
        extract_links(_synth_html(d)).select(
            "doc_id", F.col("href").alias("url")
        )
    )
    return url_depth_profile(parsed)


def _url_depth_sql() -> str:
    """q187 oracle: the shared outlink parse chain (tparsed carries the
    normalized path), the length-minus-stripped '/' depth count and the
    shared extension regex with explicit 'g'-less single extract."""
    return _host_graph_ctes() + r""", pp AS (
            SELECT host, COALESCE(path, '/') AS p
            FROM tparsed WHERE host <> ''
        )
        SELECT host,
               CAST(LENGTH(p) - LENGTH(REPLACE(p, '/', '')) AS BIGINT)
                   AS depth,
               LOWER(REGEXP_EXTRACT(p, '\.([A-Za-z0-9]{1,5})$', 1)) AS ext,
               CAST(COUNT(*) AS BIGINT) AS n_urls
        FROM pp GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """


def _q_two_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop reach per host over the link graph (hub-capped wedge
    join) — the crawl-frontier expansion estimate: how many new hosts a
    one-hop-deeper crawl from each seed would reach."""
    from document_quality_assessment_ocr_spark.operators.graph import two_hop_reach

    return two_hop_reach(_host_edges(spark, sf_dir), max_mid_degree=64).select(
        F.col("id").alias("host"), "deg", "n_2hop"
    )


def _two_hop_sql(max_mid_degree: int = 64) -> str:
    """q188 oracle: canonical undirected edges symmetrized, the SAME
    hub-capped wedge join (mids filtered by degree ≤ cap), distinct
    union of 1-hop and 2-hop reach; multi-referenced CTEs MATERIALIZED."""
    return _host_graph_ctes() + f""", und AS MATERIALIZED (
            SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
            FROM edges WHERE src <> dst
        ), sym AS MATERIALIZED (
            SELECT u AS s, v AS d FROM und
            UNION ALL SELECT v, u FROM und
        ), dg AS MATERIALIZED (
            SELECT s AS id, CAST(COUNT(*) AS BIGINT) AS deg
            FROM sym GROUP BY 1
        ), mids AS MATERIALIZED (
            SELECT id AS m FROM dg WHERE deg <= {int(max_mid_degree)}
        ), two AS (
            SELECT e1.s AS s, e2.d AS r
            FROM sym e1
            JOIN mids ON mids.m = e1.d
            JOIN sym e2 ON e2.s = e1.d
            WHERE e1.s <> e2.d
        ), reach AS (
            SELECT s, CAST(COUNT(*) AS BIGINT) AS n_2hop
            FROM (SELECT DISTINCT s, r
                  FROM (SELECT s, d AS r FROM sym UNION ALL
                        SELECT s, r FROM two))
            GROUP BY s
        )
        SELECT dg.id AS host, dg.deg,
               CAST(COALESCE(reach.n_2hop, 0) AS BIGINT) AS n_2hop
        FROM dg LEFT JOIN reach ON reach.s = dg.id
    """


def _q_field_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-field ingestion validator: does the denormalized n_chars
    column still equal LENGTH(text) per source? The silent multi-writer
    corruption check no content-level audit can see."""
    from document_quality_assessment_ocr_spark.operators.profile import (
        field_consistency_audit,
    )

    return field_consistency_audit(_doc(spark, sf_dir))


def _field_consistency_sql() -> str:
    """q189 oracle: the same NULL contract (NULL text compares as length
    0; NULL length coalesces to −1 so it disagrees with any real
    length); micro rate after the source sums."""
    return """
        WITH b AS (
            SELECT COALESCE(source, '') AS source,
                   CASE WHEN text IS NULL THEN 1 ELSE 0 END AS null_text,
                   CASE WHEN COALESCE(CAST(n_chars AS BIGINT), -1)
                             <> LENGTH(COALESCE(text, ''))
                        THEN 1 ELSE 0 END AS mism
            FROM documents
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(null_text) AS BIGINT) AS n_null_text,
               CAST(SUM(mism) AS BIGINT) AS n_mismatch,
               CAST((SUM(mism) * 1000000) // GREATEST(COUNT(*), 1) AS BIGINT)
                   AS mismatch_micro
        FROM b GROUP BY source ORDER BY source
    """


def _q_source_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source mean unigram surprisal (corpus-global whole-bit model,
    q67 machinery) — the repetitive-vs-gibberish drift row of the corpus
    dashboard, in integer centi-bits."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        source_surprisal,
    )

    return source_surprisal(_doc(spark, sf_dir))


def _source_surprisal_sql() -> str:
    """q190 oracle: the q67 token/count/whole-bit chain with the rollup
    keyed by source; integer centi-bit mean (`//` == Spark DIV on the
    non-negative sums)."""
    return f"""
        WITH d AS (
            SELECT COALESCE(source, '') AS source,
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                       TRIM(LOWER(COALESCE(text,''))), '{WS}+'),
                       x -> x <> '') AS a
            FROM documents
        ), nd AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM d GROUP BY source
        ), tk AS (
            SELECT source, UNNEST(a) AS tok FROM d
        ), c AS (
            SELECT tok, COUNT(*) AS c FROM tk GROUP BY tok
        ), n AS (
            SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM c
        ), s AS (
            SELECT tk.source,
                   CAST(LENGTH(BIN(n.n_total // c.c)) - 1 AS BIGINT) AS bits
            FROM tk JOIN c USING (tok) CROSS JOIN n
        ), a AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   CAST(SUM(bits) AS BIGINT) AS sum_bits
            FROM s GROUP BY source
        )
        SELECT nd.source, nd.n_docs,
               CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(COALESCE(a.sum_bits, 0) AS BIGINT) AS sum_bits,
               CAST((COALESCE(a.sum_bits, 0) * 100)
                    // GREATEST(COALESCE(a.n_tokens, 0), 1) AS BIGINT)
                   AS avg_centibits
        FROM nd LEFT JOIN a USING (source) ORDER BY nd.source
    """


def _q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit per (lang, source) cohort with the n_chars
    hecto-bucket as the sensitive attribute — the release gate
    k-anonymity alone misses (a big cohort carrying ONE sensitive value
    still discloses it)."""
    from document_quality_assessment_ocr_spark.operators.privacy import (
        l_diversity_audit,
    )

    d = _doc(spark, sf_dir).select(
        "lang", "source",
        F.expr("CAST(n_chars AS LONG) DIV 100L").cast("long").alias("len_bucket"),
    )
    return l_diversity_audit(
        d, quasi_cols=("lang", "source"), sensitive_col="len_bucket", k=5, l=2
    )


def _l_diversity_sql(k: int = 5, l: int = 2) -> str:
    """q191 oracle: the same NULL-to-'' cohort contract, exact
    COUNT(DISTINCT sensitive) per quasi cohort; the sensitive attribute
    is the non-negative `n_chars // 100` bucket cast through VARCHAR
    exactly like the engine's string coalesce."""
    return f"""
        WITH b AS (
            SELECT COALESCE(lang, '') AS lang,
                   COALESCE(source, '') AS source,
                   COALESCE(CAST(CAST(n_chars AS BIGINT) // 100 AS VARCHAR),
                            '') AS s
            FROM documents
        )
        SELECT lang, source,
               CAST(COUNT(*) AS BIGINT) AS group_size,
               CAST(COUNT(DISTINCT s) AS BIGINT) AS l_distinct,
               COUNT(*) >= {int(k)} AS k_ok,
               COUNT(DISTINCT s) >= {int(l)} AS l_ok
        FROM b GROUP BY lang, source ORDER BY lang, source
    """


def _q_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document templated-ness: share of the doc's distinct 5-gram
    shingles that appear in >= 3 documents corpus-wide — the template/
    boilerplate detector exact line dedup misses."""
    from document_quality_assessment_ocr_spark.operators.quality import (
        boilerplate_share,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return boilerplate_share(d, n=5, min_df=3)


def _boilerplate_sql(n: int = 5, min_df: int = 3) -> str:
    """q192 oracle: the q34 distinct-shingle CTE, shingle df aggregate,
    common = df >= min_df, per-doc rollup left-joined so short docs
    surface 0; `//` == Spark DIV on non-negative counts."""
    toks = (
        f"LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(COALESCE(text,''))), '{WS}+'),"
        " x -> x <> '')"
    )
    gram = " || ' ' || ".join(f"a[CAST(i AS INT) + {j}]" for j in range(int(n)))
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id, {toks} AS a FROM documents
        ), sh AS MATERIALIZED (
            SELECT DISTINCT doc_id, MD5({gram}) AS shingle
            FROM (SELECT doc_id, a,
                         UNNEST(RANGE(1, GREATEST(LEN(a) - {int(n) - 1}, 0) + 1))
                             AS i
                  FROM d)
        ), dfq AS (
            SELECT shingle, CAST(COUNT(*) AS BIGINT) AS df FROM sh GROUP BY 1
        ), pd AS (
            SELECT sh.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_shingles,
                   CAST(SUM(CASE WHEN dfq.df >= {int(min_df)} THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_common
            FROM sh JOIN dfq USING (shingle)
            GROUP BY sh.doc_id
        )
        SELECT d.doc_id,
               CAST(COALESCE(pd.n_shingles, 0) AS BIGINT) AS n_shingles,
               CAST(COALESCE(pd.n_common, 0) AS BIGINT) AS n_common,
               CAST((COALESCE(pd.n_common, 0) * 1000000)
                    // GREATEST(COALESCE(pd.n_shingles, 0), 1) AS BIGINT)
                   AS common_micro
        FROM d LEFT JOIN pd USING (doc_id)
    """


def _q_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-annotator agreement per source (Cohen's kappa): two
    md5-derived 3-class annotators, the second copying the first 70% of
    the time (md5-uniform) — the label-quality gate; kappa is the ONE
    exact DOUBLE division of two BIGINT micros."""
    from document_quality_assessment_ocr_spark.operators.augment import _md5_mod
    from document_quality_assessment_ocr_spark.operators.classify import (
        annotator_agreement,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "source"
    )
    a = _md5_mod(F.col("doc_id"), "ann_a", F.lit(3))
    flip = _md5_mod(F.col("doc_id"), "ann_flip", F.lit(10))
    b = F.when(flip < 7, a).otherwise(
        _md5_mod(F.col("doc_id"), "ann_b", F.lit(3))
    )
    lab = d.select(
        "source",
        a.cast("string").alias("ann_a"),
        b.cast("string").alias("ann_b"),
    )
    return annotator_agreement(lab, "ann_a", "ann_b", group_col="source")


def _agreement_sql() -> str:
    """q194 oracle: the shared _md5_mod twin ('0x'||15-hex-chars %% m,
    tags `ann_a`/`ann_flip`/`ann_b` are part of the contract), integer
    po/pe micros with non-negative `//`, and kappa as the identical
    single DOUBLE division (NULL when pe_micro hits 1e6)."""

    def mm(tag: str, m: int) -> str:
        return (
            f"(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR) || '|{tag}'),"
            f" 1, 15))::BIGINT % {m})"
        )

    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   COALESCE(source, '') AS g
            FROM documents
        ), lab AS MATERIALIZED (
            SELECT g,
                   CAST({mm('ann_a', 3)} AS VARCHAR) AS la,
                   CAST(CASE WHEN {mm('ann_flip', 10)} < 7
                             THEN {mm('ann_a', 3)}
                             ELSE {mm('ann_b', 3)} END AS VARCHAR) AS lb
            FROM d
        ), tot AS (
            SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(COUNT(*) FILTER (WHERE la = lb) AS BIGINT) AS n_agree
            FROM lab GROUP BY g
        ), ma AS (
            SELECT g, la AS k, CAST(COUNT(*) AS BIGINT) AS na
            FROM lab GROUP BY g, la
        ), mb AS (
            SELECT g, lb AS k, CAST(COUNT(*) AS BIGINT) AS nb
            FROM lab GROUP BY g, lb
        ), pe AS (
            SELECT g, CAST(SUM(na * nb) AS BIGINT) AS pe_mass
            FROM ma JOIN mb USING (g, k) GROUP BY g
        ), r AS (
            SELECT tot.g, n, n_agree,
                   CAST((n_agree * 1000000) // n AS BIGINT) AS po_micro,
                   CAST((COALESCE(pe_mass, 0) * 1000000) // (n * n)
                        AS BIGINT) AS pe_micro
            FROM tot LEFT JOIN pe USING (g)
        )
        SELECT g AS source, n, n_agree, po_micro, pe_micro,
               CASE WHEN pe_micro < 1000000
                    THEN CAST(po_micro - pe_micro AS DOUBLE)
                         / CAST(1000000 - pe_micro AS DOUBLE)
                    ELSE NULL END AS kappa
        FROM r ORDER BY source
    """


def _q_vocab_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary-health audit: token mass, type count, hapax
    share, type-token ratio — the drift row separating REPETITIVE
    corpora from GIBBERISH/OCR-noise ones (q125 plots the Heaps growth
    CURVE; this is the per-source health TABLE)."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        vocab_health_by_source,
    )

    return vocab_health_by_source(_doc(spark, sf_dir))


def _vocab_health_sql() -> str:
    """q195 oracle: the q190 tokenizer/rollup shape with a (source,
    token) count CTE; hapax = count==1 filter; all-integer micros with
    non-negative `//`; SUM→BIGINT casts throughout."""
    return f"""
        WITH d AS (
            SELECT COALESCE(source, '') AS source,
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                       TRIM(LOWER(COALESCE(text, ''))), '{WS}+'),
                   x -> x <> '') AS a
            FROM documents
        ), nd AS (
            SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM d GROUP BY source
        ), wc AS (
            SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
            FROM (SELECT source, UNNEST(a) AS tok FROM d)
            GROUP BY source, tok
        ), ps AS (
            SELECT source,
                   CAST(SUM(c) AS BIGINT) AS n_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_types,
                   CAST(COUNT(*) FILTER (WHERE c = 1) AS BIGINT) AS n_hapax
            FROM wc GROUP BY source
        )
        SELECT nd.source, nd.n_docs,
               CAST(COALESCE(n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(COALESCE(n_types, 0) AS BIGINT) AS n_types,
               CAST(COALESCE(n_hapax, 0) AS BIGINT) AS n_hapax,
               CAST((COALESCE(n_types, 0) * 1000000)
                    // GREATEST(COALESCE(n_tokens, 0), 1) AS BIGINT)
                   AS ttr_micro,
               CAST((COALESCE(n_hapax, 0) * 1000000)
                    // GREATEST(COALESCE(n_types, 0), 1) AS BIGINT)
                   AS hapax_micro
        FROM nd LEFT JOIN ps USING (source) ORDER BY nd.source
    """


def _q_mirrors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mirror-host detection over a deterministic (host, path) synthesis:
    two mirror hosts sharing a 30-path space, solo hosts with unique
    paths, and a 20-host '/common' page that the heavy-path cap (8)
    must prune before the pair join."""
    from document_quality_assessment_ocr_spark.operators.urls import mirror_pairs

    did = F.col("doc_id")
    d = _doc(spark, sf_dir).select(did.cast("long").alias("doc_id"))
    host = (
        F.when(did % 4 == 0, F.lit("mirror-a.net"))
        .when(did % 4 == 1, F.lit("mirror-b.net"))
        .when(
            did % 4 == 2,
            F.concat(F.lit("solo-"), (did % 5).cast("string"), F.lit(".org")),
        )
        .otherwise(
            F.concat(
                F.lit("h"), (did % 20).cast("string"), F.lit(".popular.net")
            )
        )
    )
    path = (
        F.when(
            did % 4 <= 1,
            F.concat(
                F.lit("/p/"), F.expr("(doc_id DIV 4L) % 30L").cast("string")
            ),
        )
        .when(did % 4 == 2, F.concat(F.lit("/u/"), did.cast("string")))
        .otherwise(F.lit("/common"))
    )
    pages = d.select(host.alias("host"), path.alias("path"))
    return mirror_pairs(pages, min_shared=2, max_hosts_per_path=8)


def _mirrors_sql(min_shared: int = 2, max_hosts_per_path: int = 8) -> str:
    """q196 oracle: byte-identical (host, path) synthesis (integer `//`
    == Spark DIV on the non-negative doc_id), md5 path key, heavy-path
    cap BEFORE the self-join, min-normalized containment. The capped
    path set is MATERIALIZED (read three times — q149 lesson)."""
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents
        ), s AS (
            SELECT
                CASE WHEN doc_id % 4 = 0 THEN 'mirror-a.net'
                     WHEN doc_id % 4 = 1 THEN 'mirror-b.net'
                     WHEN doc_id % 4 = 2
                         THEN 'solo-' || CAST(doc_id % 5 AS VARCHAR) || '.org'
                     ELSE 'h' || CAST(doc_id % 20 AS VARCHAR) || '.popular.net'
                END AS h,
                CASE WHEN doc_id % 4 <= 1
                         THEN '/p/' || CAST((doc_id // 4) % 30 AS VARCHAR)
                     WHEN doc_id % 4 = 2
                         THEN '/u/' || CAST(doc_id AS VARCHAR)
                     ELSE '/common'
                END AS p
            FROM d
        ), hp AS (
            SELECT DISTINCT h, MD5(COALESCE(p, '')) AS pk FROM s
        ), light AS MATERIALIZED (
            SELECT h, pk FROM hp
            WHERE pk IN (SELECT pk FROM hp GROUP BY pk
                         HAVING COUNT(*) <= {int(max_hosts_per_path)})
        ), ph AS (
            SELECT h, CAST(COUNT(*) AS BIGINT) AS n_paths
            FROM light GROUP BY h
        ), pr AS (
            SELECT a.h AS host1, b.h AS host2,
                   CAST(COUNT(*) AS BIGINT) AS shared_paths
            FROM light a JOIN light b USING (pk)
            WHERE a.h < b.h
            GROUP BY a.h, b.h
            HAVING COUNT(*) >= {int(min_shared)}
        )
        SELECT host1, host2, shared_paths,
               p1.n_paths AS n_paths1, p2.n_paths AS n_paths2,
               CAST((shared_paths * 1000000)
                    // LEAST(p1.n_paths, p2.n_paths) AS BIGINT)
                   AS containment_micro
        FROM pr
        JOIN ph p1 ON pr.host1 = p1.h
        JOIN ph p2 ON pr.host2 = p2.h
        ORDER BY containment_micro DESC, host1, host2
    """


def _q_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams
    (the 'what happens after X' grid with row-normalized integer
    probabilities)."""
    from document_quality_assessment_ocr_spark.operators.sessions import (
        transition_matrix,
    )

    return transition_matrix(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    )


def _transitions_sql() -> str:
    """q197 oracle: the shared deterministic per-user ordering
    (EPOCH_US(ts), event_id — the q183 window twin), one LAG, grid
    aggregate + |types|-row marginal join; grid CTE read twice →
    MATERIALIZED; non-negative `//` for prob_micro."""
    return """
        WITH e AS (
            SELECT COALESCE(event_type, '') AS ty, user_id,
                   EPOCH_US(ts) AS t, event_id
            FROM events
        ), p AS (
            SELECT LAG(ty) OVER (PARTITION BY user_id
                                 ORDER BY t, event_id) AS prev_type,
                   ty AS next_type
            FROM e
        ), g AS MATERIALIZED (
            SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM p WHERE prev_type IS NOT NULL
            GROUP BY prev_type, next_type
        ), mg AS (
            SELECT prev_type, CAST(SUM(n) AS BIGINT) AS out_mass
            FROM g GROUP BY prev_type
        )
        SELECT prev_type, next_type, n,
               CAST((n * 1000000) // out_mass AS BIGINT) AS prob_micro
        FROM g JOIN mg USING (prev_type)
        ORDER BY prev_type, next_type
    """


def _q_transitions2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SECOND-order Markov transitions between event types per user
    ((ts, event_id) deterministic order, two lags over ONE window):
    given the last two event types, what comes next — the path-level
    contract that distinguishes this entry from q166's first-order
    matrix."""
    from document_quality_assessment_ocr_spark.operators.sessions import (
        transition_matrix2,
    )

    return transition_matrix2(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    )


def _transitions2_sql() -> str:
    """q197 oracle: the shared deterministic per-user ordering
    (EPOCH_US(ts), event_id), TWO LAGs over the same window, |types|³
    path-grid aggregate + |types|²-row marginal join; grid CTE read
    twice → MATERIALIZED; non-negative `//` for prob_micro."""
    return """
        WITH e AS (
            SELECT COALESCE(event_type, '') AS ty, user_id,
                   EPOCH_US(ts) AS t, event_id
            FROM events
        ), p AS (
            SELECT LAG(ty, 2) OVER (PARTITION BY user_id
                                    ORDER BY t, event_id) AS prev2_type,
                   LAG(ty, 1) OVER (PARTITION BY user_id
                                    ORDER BY t, event_id) AS prev_type,
                   ty AS next_type
            FROM e
        ), g AS MATERIALIZED (
            SELECT prev2_type, prev_type, next_type,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM p WHERE prev2_type IS NOT NULL
            GROUP BY prev2_type, prev_type, next_type
        ), mg AS (
            SELECT prev2_type, prev_type, CAST(SUM(n) AS BIGINT) AS out_mass
            FROM g GROUP BY prev2_type, prev_type
        )
        SELECT prev2_type, prev_type, next_type, n,
               CAST((n * 1000000) // out_mass AS BIGINT) AS prob_micro
        FROM g JOIN mg USING (prev2_type, prev_type)
        ORDER BY prev2_type, prev_type, next_type
    """


def _q_snapshot_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source snapshot churn report between two derived corpus
    versions (old = %10!=0, new = %7!=0 with %6==0 texts mutated):
    added/removed/changed/unchanged counts + churn_micro — the rollup
    the row-level diff (q86) never aggregates."""
    from document_quality_assessment_ocr_spark.operators.compaction import (
        snapshot_churn,
    )

    did = F.col("doc_id")
    d = _doc(spark, sf_dir).select(
        did.cast("long").alias("doc_id"), "source", "text"
    )
    old = d.where(did % 10 != 0).select(
        "doc_id",
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("content_hash"),
        "source",
    )
    new = d.where(did % 7 != 0).select(
        "doc_id",
        F.md5(
            F.concat(
                F.coalesce(F.col("text"), F.lit("")),
                F.when(did % 6 == 0, F.lit("~v2")).otherwise(F.lit("")),
            )
        ).alias("content_hash"),
        "source",
    )
    return snapshot_churn(old, new)


def _snapshot_churn_sql() -> str:
    """q198 oracle: identical snapshot derivation (md5 of text with the
    '~v2' mutation suffix on %6==0), FULL OUTER null-pattern statuses,
    grid rollup with non-negative `//` churn."""
    return """
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   COALESCE(source, '') AS source,
                   COALESCE(text, '') AS t
            FROM documents
        ), oldv AS (
            SELECT doc_id, MD5(t) AS h, source
            FROM d WHERE doc_id % 10 <> 0
        ), newv AS (
            SELECT doc_id,
                   MD5(t || CASE WHEN doc_id % 6 = 0 THEN '~v2' ELSE '' END)
                       AS h,
                   source
            FROM d WHERE doc_id % 7 <> 0
        ), j AS (
            SELECT COALESCE(n.source, o.source) AS grp,
                   o.h IS NOT NULL AS in_old,
                   n.h IS NOT NULL AS in_new,
                   (o.h IS NOT NULL AND n.h IS NOT NULL AND o.h <> n.h)
                       AS is_changed
            FROM oldv o FULL OUTER JOIN newv n ON o.doc_id = n.doc_id
        ), a AS (
            SELECT grp,
                   CAST(COUNT(*) FILTER (WHERE in_old) AS BIGINT) AS n_old,
                   CAST(COUNT(*) FILTER (WHERE in_new) AS BIGINT) AS n_new,
                   CAST(COUNT(*) FILTER (WHERE in_new AND NOT in_old)
                        AS BIGINT) AS added,
                   CAST(COUNT(*) FILTER (WHERE in_old AND NOT in_new)
                        AS BIGINT) AS removed,
                   CAST(COUNT(*) FILTER (WHERE is_changed) AS BIGINT)
                       AS changed,
                   CAST(COUNT(*) FILTER (WHERE in_old AND in_new
                                         AND NOT is_changed) AS BIGINT)
                       AS unchanged,
                   CAST(COUNT(*) AS BIGINT) AS n_union
            FROM j GROUP BY grp
        )
        SELECT grp AS source, n_old, n_new, added, removed, changed,
               unchanged,
               CAST(((added + removed + changed) * 1000000)
                    // GREATEST(n_union, 1) AS BIGINT) AS churn_micro
        FROM a ORDER BY source
    """


def _q_span_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-sequence integrity audit over a deterministic span synthesis:
    1 + doc_id%5 spans at 100-byte strides, md5-varied lengths 80..119
    (planting both overlaps and gaps), and an md5-picked 10% of docs with
    their first two span offsets swapped (planting out-of-order +
    overlap) — the ingest validator for the engine's own input shape."""
    from document_quality_assessment_ocr_spark.operators.augment import _md5_mod
    from document_quality_assessment_ocr_spark.operators.profile import (
        span_integrity_audit,
    )

    d = _doc(spark, sf_dir).select(F.col("doc_id").cast("long").alias("doc_id"))
    base = d.select(
        "doc_id",
        (F.lit(1) + F.col("doc_id") % 5).alias("n"),
        (_md5_mod(F.col("doc_id"), "swap", F.lit(10)) == 0).alias("swap"),
    )
    sp = base.select(
        "doc_id",
        "n",
        "swap",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("n") - 1)
        ).alias("i"),
    )
    spans = sp.select(
        "doc_id",
        F.col("i").alias("span_idx"),
        F.when(
            F.col("swap") & (F.col("n") >= 2) & (F.col("i") < 2),
            (F.lit(1) - F.col("i")) * 100,
        )
        .otherwise(F.col("i") * 100)
        .alias("offset"),
        (
            F.lit(80)
            + _md5_mod(
                F.concat(
                    F.col("doc_id").cast("string"),
                    F.lit("#"),
                    F.col("i").cast("string"),
                ),
                "sl",
                F.lit(40),
            )
        ).alias("length"),
    )
    return span_integrity_audit(spans)


def _span_integrity_sql() -> str:
    """q199 oracle: byte-identical span synthesis (shared _md5_mod twin,
    tags `swap` / `sl` with the `doc_id#i` composite id), LAG window on
    (doc_id, i), FILTER counts (NULL first-pair comparisons skipped on
    both engines), non-negative `//` coverage."""

    def mm(idexpr: str, tag: str, m: int) -> str:
        return (
            f"(('0x' || SUBSTR(MD5({idexpr} || '|{tag}'), 1, 15))::BIGINT"
            f" % {m})"
        )

    did = "CAST(doc_id AS VARCHAR)"
    comp = f"{did} || '#' || CAST(i AS VARCHAR)"
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents
        ), e AS (
            SELECT doc_id,
                   1 + doc_id % 5 AS n,
                   {mm(did, 'swap', 10)} = 0 AS swap,
                   UNNEST(RANGE(0, 1 + doc_id % 5)) AS i
            FROM d
        ), sp AS (
            SELECT doc_id, i,
                   CASE WHEN swap AND n >= 2 AND i < 2
                        THEN (1 - i) * 100 ELSE i * 100 END AS off,
                   80 + {mm(comp, 'sl', 40)} AS len
            FROM e
        ), fl AS (
            SELECT doc_id, off, len,
                   LAG(off) OVER w AS poff,
                   LAG(off + len) OVER w AS pend
            FROM sp WINDOW w AS (PARTITION BY doc_id ORDER BY i)
        ), a AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_spans,
                   CAST(COUNT(*) FILTER (WHERE off < poff) AS BIGINT)
                       AS n_out_of_order,
                   CAST(COUNT(*) FILTER (WHERE off < pend) AS BIGINT)
                       AS n_overlaps,
                   CAST(COUNT(*) FILTER (WHERE off > pend) AS BIGINT)
                       AS n_gaps,
                   CAST(SUM(len) AS BIGINT) AS span_mass,
                   CAST(MAX(off + len) - MIN(off) AS BIGINT) AS extent
            FROM fl GROUP BY doc_id
        )
        SELECT doc_id, n_spans, n_out_of_order, n_overlaps, n_gaps,
               span_mass, extent,
               CAST((span_mass * 1000000) // GREATEST(extent, 1)
                    AS BIGINT) AS coverage_micro
        FROM a ORDER BY doc_id
    """


def _q_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B lift report over an md5-split corpus experiment: control vs
    treat on doc_id, metric = n_chars with a planted +100 treat effect —
    the launch-review table for any gated pipeline change."""
    from document_quality_assessment_ocr_spark.operators.augment import _md5_mod
    from document_quality_assessment_ocr_spark.operators.experiment import (
        ab_lift_report,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_chars").cast("long").alias("nc"),
    )
    v = F.when(
        _md5_mod(F.col("doc_id"), "exp", F.lit(2)) == 0, F.lit("control")
    ).otherwise(F.lit("treat"))
    units = d.select(
        v.alias("variant"),
        (
            F.col("nc")
            + F.when(v == "treat", F.lit(100)).otherwise(F.lit(0))
        ).cast("long").alias("metric"),
    )
    return ab_lift_report(units)


def _ab_lift_sql() -> str:
    """q200 oracle: shared _md5_mod split (tag `exp`), BIGINT n/sums, each
    mean ONE exact double division, lift in the identical float op order
    (mean / control_mean - 1e0); the variant aggregate is MATERIALIZED
    (read twice: control row + report join)."""
    return """
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(n_chars AS BIGINT) AS nc
            FROM documents
        ), u AS (
            SELECT CASE WHEN (('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)
                                || '|exp'), 1, 15))::BIGINT % 2) = 0
                        THEN 'control' ELSE 'treat' END AS v,
                   nc
            FROM d
        ), a AS MATERIALIZED (
            SELECT v, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(nc + CASE WHEN v = 'treat' THEN 100 ELSE 0 END)
                        AS BIGINT) AS metric_sum
            FROM u GROUP BY v
        ), c AS (
            SELECT v AS cv, n AS cn, metric_sum AS cs
            FROM a ORDER BY v LIMIT 1
        )
        SELECT a.v AS variant, a.n, a.metric_sum,
               CAST(a.metric_sum AS DOUBLE) / CAST(a.n AS DOUBLE) AS mean,
               a.v = c.cv AS is_control,
               CASE WHEN c.cs <> 0 THEN
                   (CAST(a.metric_sum AS DOUBLE) / CAST(a.n AS DOUBLE))
                   / (CAST(c.cs AS DOUBLE) / CAST(c.cn AS DOUBLE)) - 1e0
               END AS lift_vs_control
        FROM a CROSS JOIN c ORDER BY variant
    """


def _q_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio quality profile over the deterministic 2% md5
    audit panel (tag `zq`, modulus 50): stdlib zlib level 6 via ONE
    Arrow-batched mapInPandas pass — the assumption-free junk-text
    detector (low ratio = template spam, ~1e6 = binary/noise)."""
    from document_quality_assessment_ocr_spark.operators.augment import _md5_mod
    from document_quality_assessment_ocr_spark.operators.quality import (
        compression_profile,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    panel = d.where(_md5_mod(F.col("doc_id"), "zq", F.lit(50)) == 0)
    return compression_profile(panel)


def _compression_sql(m: int = 50) -> str:
    """q201 oracle-literal builder (the wav_frame_rms_values contract):
    reads the SAME parquet the engine reads (SPARK_GRAFT_ORACLE_SF),
    applies the byte-identical md5 panel predicate (shared _md5_mod twin,
    tag `zq`), and embeds the SHARED `quality.zlib_profile_values`
    integers as VALUES literals — panel-bounded at corpus/50 rows, and
    zlib never has to exist inside DuckDB. ratio recomputed with
    non-negative `//` on both engines."""
    import os

    import duckdb

    from document_quality_assessment_ocr_spark.operators.quality import (
        zlib_profile_values,
    )

    sf = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")
    pred = (
        "(('0x' || SUBSTR(MD5(CAST(CAST(doc_id AS BIGINT) AS VARCHAR)"
        f" || '|zq'), 1, 15))::BIGINT % {int(m)}) = 0"
    )
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT CAST(doc_id AS BIGINT) AS did, COALESCE(text, '') AS t "
        f"FROM '{sf}/documents.parquet' WHERE {pred} ORDER BY did"
    ).fetchall()
    con.close()
    vals = zlib_profile_values([t for _, t in rows])
    if rows:
        lits = ",\n                ".join(
            f"({d}, {r}, {c})" for (d, _), (r, c) in zip(rows, vals)
        )
        body = f"(VALUES {lits}) AS v(doc_id, raw_bytes, comp_bytes)"
    else:
        body = (
            "(SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT)"
            " AS raw_bytes, CAST(NULL AS BIGINT) AS comp_bytes WHERE FALSE)"
            " AS v"
        )
    return f"""
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(raw_bytes AS BIGINT) AS raw_bytes,
               CAST(comp_bytes AS BIGINT) AS comp_bytes,
               CAST((comp_bytes * 1000000) // GREATEST(raw_bytes, 1)
                    AS BIGINT) AS ratio_micro
        FROM {body}
        ORDER BY doc_id
    """


def _q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS drift between even- and odd-doc_id length
    distributions — the distribution-level drift statistic next to
    q156's token-level TVD; exact integer ECDF over the length-bucket
    grid."""
    from document_quality_assessment_ocr_spark.operators.experiment import ks_drift

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "n_chars"
    )
    return ks_drift(d, F.col("doc_id") % 2 == 0, "n_chars", bucket_width=64)


def _ks_drift_sql() -> str:
    """q202 oracle: identical integer pipeline — DIV-bucketed lengths,
    windowed integer cumsums over the bucket GRID, cross-multiplied
    |cum_a·n_b − cum_b·n_a| numerator, argmax tie-broken on the smallest
    bucket, and ONE exact double division (the q194 kappa discipline)."""
    return """
        WITH d AS (
            SELECT (doc_id % 2 = 0) AS l,
                   CAST(GREATEST(CAST(n_chars AS BIGINT), 0) // 64 AS BIGINT)
                       AS bucket
            FROM documents
        ), grid AS (
            SELECT bucket,
                   CAST(COUNT(*) FILTER (WHERE l) AS BIGINT) AS ca,
                   CAST(COUNT(*) FILTER (WHERE NOT l) AS BIGINT) AS cb
            FROM d GROUP BY bucket
        ), cum AS (
            SELECT bucket,
                   CAST(SUM(ca) OVER (ORDER BY bucket
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_a,
                   CAST(SUM(cb) OVER (ORDER BY bucket
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_b
            FROM grid
        ), tot AS (
            SELECT bucket, cum_a, cum_b,
                   CAST(MAX(cum_a) OVER () AS BIGINT) AS n_left,
                   CAST(MAX(cum_b) OVER () AS BIGINT) AS n_right
            FROM cum
        ), sc AS (
            SELECT n_left, n_right, bucket,
                   CAST(ABS(cum_a * n_right - cum_b * n_left) AS BIGINT) AS d_num
            FROM tot
        )
        SELECT n_left, n_right, CAST(bucket AS BIGINT) AS at_bucket, d_num,
               CAST((1000000 * d_num) // GREATEST(n_left * n_right, 1)
                    AS BIGINT) AS ks_micro,
               CAST(d_num AS DOUBLE)
                   / CAST(GREATEST(n_left * n_right, 1) AS DOUBLE) AS ks
        FROM sc ORDER BY d_num DESC, bucket LIMIT 1
    """


def _q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap CI for the per-source mean document length —
    the distributed resampling scheme (per-row Poisson(1) weights, no
    global sample indices), md5-deterministic and replay-stable."""
    from document_quality_assessment_ocr_spark.operators.experiment import (
        poisson_bootstrap_ci,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "source", "n_chars"
    )
    return poisson_bootstrap_ci(
        d, group_col="source", metric_col="n_chars", id_col="doc_id", n_reps=32
    )


def _bootstrap_ci_sql() -> str:
    """q203 oracle: the shared POISSON1_CDF_MICRO thresholds (imported,
    never forked) turn the md5-uniform micro draw into the replicate
    weight; all-integer micro means with non-negative //; trimmed
    rank CI = 2nd smallest / 2nd largest of the sorted replicate means
    (LIST filter drops the empty-resample NULLs exactly like Spark's
    collect_list)."""
    from document_quality_assessment_ocr_spark.operators.experiment import (
        POISSON1_CDF_MICRO,
    )

    wsum = " + ".join(
        f"CASE WHEN u >= {t} THEN 1 ELSE 0 END" for t in POISSON1_CDF_MICRO
    )
    return f"""
        WITH d AS (
            SELECT COALESCE(source, '') AS g,
                   GREATEST(CAST(n_chars AS BIGINT), 0) AS x,
                   CAST(CAST(doc_id AS BIGINT) AS VARCHAR) AS id
            FROM documents
        ), point AS (
            SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST((1000000 * SUM(x)) // COUNT(*) AS BIGINT) AS point_micro
            FROM d GROUP BY g
        ), rep AS (
            SELECT g, x,
                   ('0x' || SUBSTR(MD5(id || '|boot' || CAST(r AS VARCHAR)),
                    1, 15))::BIGINT % 1000000 AS u,
                   r
            FROM (SELECT g, x, id, UNNEST(RANGE(0, 32)) AS r FROM d)
        ), wgt AS (
            SELECT g, r, x, CAST({wsum} AS BIGINT) AS w FROM rep
        ), grid AS (
            SELECT g, r, CAST(SUM(w) AS BIGINT) AS wn,
                   CAST(SUM(w * x) AS BIGINT) AS ws
            FROM wgt GROUP BY g, r
        ), means AS (
            SELECT g, CASE WHEN wn > 0
                           THEN CAST((1000000 * ws) // wn AS BIGINT) END
                       AS mean_micro
            FROM grid
        ), ci AS (
            SELECT g, LIST_SORT(LIST(mean_micro)
                       FILTER (WHERE mean_micro IS NOT NULL)) AS ms
            FROM means GROUP BY g
        )
        SELECT point.g AS source, n, point_micro,
               CAST(LEN(ms) AS BIGINT) AS n_reps_valid,
               CASE WHEN LEN(ms) >= 4 THEN CAST(ms[2] AS BIGINT) END
                   AS boot_lo_micro,
               CASE WHEN LEN(ms) >= 4
                    THEN CAST(ms[CAST(LEN(ms) AS INT) - 1] AS BIGINT) END
                   AS boot_hi_micro
        FROM point JOIN ci USING (g) ORDER BY source
    """


def _synth_table_html(d: DataFrame) -> DataFrame:
    """Deterministic <table> HTML over documents.text — cells are fixed
    substring windows (cell k = SUBSTR(text, 1+4k, 3)), a 3-column header
    row, 1 + doc_id%3 data rows, and doc_id%5==0 drops the FIRST row's
    last cell (the ragged-table case the shape audit must catch).  The
    q204 oracle builds the IDENTICAL string — byte-identical twins, like
    `_synth_html`/`_HTML_SYNTH_CTE`."""
    t = F.coalesce(F.col("text"), F.lit(""))

    def td(k: int) -> Column:
        return F.concat(
            F.lit("<td>"), F.substring(t, 1 + 4 * k, 3), F.lit("</td>")
        )

    nrows = F.col("doc_id") % 3 + 1
    ragged = F.col("doc_id") % 5 == 0
    row0 = F.concat(
        F.lit("<tr>"),
        td(0),
        td(1),
        F.when(ragged, F.lit("")).otherwise(td(2)),
        F.lit("</tr>"),
    )
    row1 = F.when(
        nrows >= 2,
        F.concat(F.lit("<tr>"), td(3), td(4), td(5), F.lit("</tr>")),
    ).otherwise(F.lit(""))
    row2 = F.when(
        nrows >= 3,
        F.concat(F.lit("<tr>"), td(6), td(7), td(8), F.lit("</tr>")),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit(
            "<html><body><p>intro</p><table>"
            "<tr><th>A</th><th>B</th><th>C</th></tr>"
        ),
        row0,
        row1,
        row2,
        F.lit("</table><p>outro</p></body></html>"),
    )
    return d.select(F.col("doc_id").cast("long").alias("doc_id"), html.alias("html"))


def _q_html_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured <table> extraction from synthesized table HTML — the
    row/cell relation a crawl-to-training-data pipeline feeds to table
    QA / serialization stages."""
    from document_quality_assessment_ocr_spark.operators.html import extract_tables

    return extract_tables(_synth_table_html(_doc(spark, sf_dir)))


def _table_synth_sql() -> str:
    """Byte-identical SQL twin of `_synth_table_html` (cell k = SUBSTR
    1+4k len 3; ragged first row when doc_id%5==0; rows 2/3 gated on
    1 + doc_id%3)."""

    def td(k: int) -> str:
        return f"'<td>' || SUBSTR(t, {1 + 4 * k}, 3) || '</td>'"

    return f"""
        WITH tsrc AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   COALESCE(text, '') AS t
            FROM documents
        ), th AS (
            SELECT doc_id,
                   '<html><body><p>intro</p><table>'
                   || '<tr><th>A</th><th>B</th><th>C</th></tr>'
                   || '<tr>' || {td(0)} || {td(1)}
                   || CASE WHEN doc_id % 5 = 0 THEN '' ELSE {td(2)} END
                   || '</tr>'
                   || CASE WHEN doc_id % 3 + 1 >= 2
                           THEN '<tr>' || {td(3)} || {td(4)} || {td(5)}
                                || '</tr>' ELSE '' END
                   || CASE WHEN doc_id % 3 + 1 >= 3
                           THEN '<tr>' || {td(6)} || {td(7)} || {td(8)}
                                || '</tr>' ELSE '' END
                   || '</table><p>outro</p></body></html>' AS html
            FROM tsrc
        )"""


def _html_tables_sql() -> str:
    """q204 oracle: the synth twin + the SAME html.py regex constants
    (TABLE_RE/TR_RE/CELL_RE/TH_OPEN/TAG — imported, never forked), the
    UNNEST(RANGE(1, LEN(list)+1)) posexplode idiom, and the
    COALESCE(ARRAY_TO_STRING) guard for DuckDB's empty-list NULL."""
    from document_quality_assessment_ocr_spark.functions.text import WS_CLASS
    from document_quality_assessment_ocr_spark.operators.html import (
        CELL_RE,
        TABLE_RE,
        TAG,
        TH_OPEN,
        TR_RE,
    )

    return _table_synth_sql() + f""", tb0 AS (
            SELECT doc_id,
                   REGEXP_EXTRACT_ALL(html, '{TABLE_RE}', 1) AS tl
            FROM th
        ), tb AS (
            SELECT doc_id, CAST(i AS BIGINT) AS table_idx,
                   tl[CAST(i AS INT)] AS thtml
            FROM (SELECT doc_id, tl, UNNEST(RANGE(1, LEN(tl) + 1)) AS i
                  FROM tb0)
        ), rw0 AS (
            SELECT doc_id, table_idx,
                   REGEXP_EXTRACT_ALL(thtml, '{TR_RE}', 1) AS rl
            FROM tb
        ), rw AS (
            SELECT doc_id, table_idx, CAST(i AS BIGINT) AS row_idx,
                   rl[CAST(i AS INT)] AS rhtml
            FROM (SELECT doc_id, table_idx, rl,
                         UNNEST(RANGE(1, LEN(rl) + 1)) AS i
                  FROM rw0)
        ), cl AS (
            SELECT doc_id, table_idx, row_idx,
                   REGEXP_MATCHES(rhtml, '{TH_OPEN}') AS is_header,
                   REGEXP_EXTRACT_ALL(rhtml, '{CELL_RE}', 1) AS cells0
            FROM rw
        )
        SELECT doc_id, table_idx, row_idx, is_header,
               CAST(LEN(cells0) AS BIGINT) AS n_cells,
               COALESCE(ARRAY_TO_STRING(LIST_TRANSFORM(cells0,
                   c -> TRIM(REGEXP_REPLACE(REGEXP_REPLACE(c, '{TAG}', '',
                        'g'), '{WS_CLASS}+', ' ', 'g'))), '|'), '') AS cells
        FROM cl ORDER BY doc_id, table_idx, row_idx
    """


def _q_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset (farthest-point traversal) over integer-
    quantized embeddings — the coverage-guarantee diverse subsample next
    to the density-based prune families (q78/q107/q111)."""
    from document_quality_assessment_ocr_spark.operators.similarity import (
        kcenter_coreset,
    )

    return kcenter_coreset(_emb(spark, sf_dir), k=4, scale=64)


def _kcenter_sql() -> str:
    """q205 oracle: k=4 greedy rounds UNROLLED with MATERIALIZED CTEs
    (every dN is read twice — the q149 inlining-blowup cure), the q168
    portable float→int truncation for quantization, LIST_ZIP + numeric
    struct indexes for the exact BIGINT squared-L2, and argmax tie-break
    ORDER BY md DESC, vid — identical to the engine's min-struct."""
    q64 = (
        "LIST_TRANSFORM(embedding, x -> CAST(TRUNC(CAST(x AS DOUBLE) * 64)"
        " AS BIGINT))"
    )
    dist = (
        "CAST(LIST_SUM(LIST_TRANSFORM(LIST_ZIP({a}, {b}),"
        " s -> (s[1] - s[2]) * (s[1] - s[2]))) AS BIGINT)"
    )
    d0 = dist.format(a="b.q", b="c.q")
    dn = dist.format(a="d.q", b="c.q")
    return f"""
        WITH base AS MATERIALIZED (
            SELECT CAST(vec_id AS BIGINT) AS vid, {q64} AS q
            FROM embeddings
        ), c0 AS MATERIALIZED (
            SELECT vid, q FROM base ORDER BY vid LIMIT 1
        ), d0 AS MATERIALIZED (
            SELECT b.vid, b.q, {d0} AS md FROM base b, c0 c
        ), c1 AS MATERIALIZED (
            SELECT vid, q, md FROM d0 ORDER BY md DESC, vid LIMIT 1
        ), d1 AS MATERIALIZED (
            SELECT d.vid, d.q, LEAST(d.md, {dn}) AS md FROM d0 d, c1 c
        ), c2 AS MATERIALIZED (
            SELECT vid, q, md FROM d1 ORDER BY md DESC, vid LIMIT 1
        ), d2 AS MATERIALIZED (
            SELECT d.vid, d.q, LEAST(d.md, {dn}) AS md FROM d1 d, c2 c
        ), c3 AS MATERIALIZED (
            SELECT vid, q, md FROM d2 ORDER BY md DESC, vid LIMIT 1
        ), d3 AS MATERIALIZED (
            SELECT d.vid, d.q, LEAST(d.md, {dn}) AS md FROM d2 d, c3 c
        ), fin AS (
            SELECT CAST(MAX(md) AS BIGINT) AS mx FROM d3
        )
        SELECT * FROM (
            SELECT CAST(0 AS BIGINT) AS rank, vid AS vec_id,
                   CAST(NULL AS BIGINT) AS chosen_dist,
                   CAST((SELECT md FROM c1) AS BIGINT) AS radius_after
            FROM c0
            UNION ALL
            SELECT CAST(1 AS BIGINT), vid, CAST(md AS BIGINT),
                   CAST((SELECT md FROM c2) AS BIGINT) FROM c1
            UNION ALL
            SELECT CAST(2 AS BIGINT), vid, CAST(md AS BIGINT),
                   CAST((SELECT md FROM c3) AS BIGINT) FROM c2
            UNION ALL
            SELECT CAST(3 AS BIGINT), vid, CAST(md AS BIGINT),
                   CAST((SELECT mx FROM fin) AS BIGINT) FROM c3
        ) ORDER BY rank
    """


def _q_rr_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warner randomized-response privatized collection: an md5-derived
    sensitive bit (20% base rate) reported truthfully with p=3/4, then
    debiased per source — the privacy family's collection leg next to
    the k-anonymity/l-diversity release audits."""
    from document_quality_assessment_ocr_spark.operators.augment import _md5_mod
    from document_quality_assessment_ocr_spark.operators.privacy import (
        randomized_response_estimate,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "source"
    )
    tb = F.when(_md5_mod(F.col("doc_id"), "sens", F.lit(5)) == 0, 1).otherwise(0)
    keep = _md5_mod(F.col("doc_id"), "rr", F.lit(4)) < 3
    reports = d.select(
        "source", F.when(keep, tb).otherwise(1 - tb).alias("reported")
    )
    return randomized_response_estimate(
        reports, group_col="source", bit_col="reported", keep_num=3, keep_den=4
    )


def _rr_release_sql() -> str:
    """q206 oracle: the shared _md5_mod twin (tags `sens`/`rr` are part
    of the contract), all-BIGINT counts, non-negative // for obs_micro,
    and the debiased estimate as ONE exact double division (numerator
    can be negative — the q194 kappa discipline, never integer
    division)."""

    def mm(tag: str, m: int) -> str:
        return (
            f"(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR) || '|{tag}'),"
            f" 1, 15))::BIGINT % {m})"
        )

    return f"""
        WITH d AS (
            SELECT COALESCE(source, '') AS g,
                   CASE WHEN {mm('sens', 5)} = 0 THEN 1 ELSE 0 END AS tb,
                   {mm('rr', 4)} AS kd
            FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id, source
                  FROM documents)
        ), rep AS (
            SELECT g, CASE WHEN kd < 3 THEN tb ELSE 1 - tb END AS b FROM d
        ), agg AS (
            SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(b) AS BIGINT) AS n_reported
            FROM rep GROUP BY g
        ), o AS (
            SELECT g, n, n_reported,
                   CAST((1000000 * n_reported) // n AS BIGINT) AS obs_micro
            FROM agg
        )
        SELECT g AS source, n, n_reported, obs_micro,
               CAST(obs_micro * 4 - 1000000 AS DOUBLE)
                   / CAST(2000000 AS DOUBLE) AS est
        FROM o ORDER BY source
    """


def _q_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-statistics PCA projection of the embedding table (top-2
    components) — whitening/2-D-map preprocessing for embedding
    curation; sufficient statistics are exact BIGINTs so engine and
    oracle feed IDENTICAL matrices to the shared eigensolver."""
    from document_quality_assessment_ocr_spark.operators.similarity import (
        pca_project,
    )

    return pca_project(_emb(spark, sf_dir), k=2, scale=1024)


def _pca_sql() -> str:
    """q207 oracle-literal builder: recomputes the SAME integer
    sufficient statistics (n, Σq, Σqqᵀ) from the parquet the engine
    reads (SPARK_GRAFT_ORACLE_SF) with numpy int64 matmul, calls the
    SHARED similarity.pca_from_stats (never forked), and interpolates
    the components/offsets as f\"{{v:.17e}}\" DOUBLE literals (the q137
    exponent-form rule).  Literal volume is DIMENSION-bounded (d + 1
    doubles per component), never corpus-bounded.  LIST_DOT_PRODUCT's
    fold order matches the engine's `_dot` (the q13 contract);
    ROUND(·,6)+0e0 guards the −0.0 collapse (q148)."""
    import os

    import duckdb
    import numpy as np

    from document_quality_assessment_ocr_spark.operators.similarity import (
        pca_from_stats,
    )

    sf = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")
    con = duckdb.connect()
    vecs = con.execute(
        f"SELECT embedding FROM '{sf}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    con.close()
    X = np.array([v[0] for v in vecs], dtype=np.float32).astype(np.float64)
    Q = np.trunc(X * 1024.0).astype(np.int64)
    n = Q.shape[0]
    s = Q.sum(axis=0)
    G = Q.T @ Q
    comps, offs = pca_from_stats(n, s.tolist(), G.reshape(-1).tolist(), k=2)

    qd = (
        "LIST_TRANSFORM(embedding, x -> CAST(CAST(TRUNC(CAST(x AS DOUBLE)"
        " * 1024) AS BIGINT) AS DOUBLE))"
    )
    pcs = []
    for j, (v, off) in enumerate(zip(comps, offs), start=1):
        lit = "[" + ", ".join(f"{x:.17e}" for x in v) + "]"
        pcs.append(
            f"ROUND(LIST_DOT_PRODUCT({qd}, {lit}) + {off:.17e}, 6) + 0e0"
            f" AS pc{j}"
        )
    cols = ",\n               ".join(pcs)
    return f"""
        SELECT CAST(vec_id AS BIGINT) AS vec_id,
               {cols}
        FROM embeddings ORDER BY vec_id
    """


def _q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix vs the labeled lang column — the
    classifier-eval grid for the q14 heuristic."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        lang_confusion,
    )

    return lang_confusion(_doc(spark, sf_dir))


def _lang_confusion_sql() -> str:
    """q208 oracle: the SHARED q14 lang_case expression (from
    _text_exprs — never forked), grid counts + ON-GRID marginals, all
    integer micros with non-negative //."""
    e = _text_exprs()
    return f"""
        WITH d AS (
            SELECT COALESCE(lang, '') AS label,
                   {e["lang_case"]} AS pred
            FROM documents
        ), grid AS (
            SELECT label, pred, CAST(COUNT(*) AS BIGINT) AS n
            FROM d GROUP BY label, pred
        ), marg AS (
            SELECT label, CAST(SUM(n) AS BIGINT) AS label_n,
                   CAST(SUM(CASE WHEN pred = label THEN n ELSE 0 END)
                        AS BIGINT) AS diag_n
            FROM grid GROUP BY label
        )
        SELECT label, pred, n,
               CAST((1000000 * n) // GREATEST(label_n, 1) AS BIGINT)
                   AS row_share_micro,
               label_n,
               CAST((1000000 * diag_n) // GREATEST(label_n, 1) AS BIGINT)
                   AS recall_micro,
               (pred = label) AS is_correct
        FROM grid JOIN marg USING (label)
        ORDER BY label, pred
    """


_SWEEP_THRESHOLDS = (500000, 600000, 700000, 800000, 900000)


def _q_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash banding threshold-sensitivity sweep: the q25 production
    candidate chain verified with exact Jaccard at threshold 0, then a
    bounded threshold GRID counts surviving pairs and touched docs per
    cut — the tuning panel that justifies a dedup threshold before a
    100 TB run."""
    from document_quality_assessment_ocr_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    from document_quality_assessment_ocr_spark.operators.dedup import (
        minhash_signatures,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    # one fused python pass: signatures + distinct shingle sets (r6)
    fused = minhash_signatures(
        d, n_hashes=16, shingle="word", with_gram_sets=True
    ).localCheckpoint()
    cand = minhash_lsh_pairs(
        d, n_hashes=16, bands=4, shingle="word", _sig=fused.drop("gs")
    )
    pairs = ngram_jaccard_pairs(
        d, ngram=5, threshold=0.0, candidates=cand, shingle="word",
        _sets=fused.select("doc_id", "gs"),
    ).select("id_a", "id_b", "jaccard")
    thrs = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(t).cast("long") for t in _SWEEP_THRESHOLDS])
        ).alias("thr_micro")
    )
    hit = thrs.join(
        pairs,
        F.col("jaccard")
        >= F.col("thr_micro").cast("double") / F.lit(1000000.0),
        "left",
    )
    a1 = hit.groupBy("thr_micro").agg(
        F.count("id_a").cast("long").alias("n_pairs")
    )
    docs_hit = (
        hit.where(F.col("id_a").isNotNull())
        .select(
            "thr_micro",
            F.explode(F.array(F.col("id_a"), F.col("id_b"))).alias("id"),
        )
        .groupBy("thr_micro")
        .agg(F.countDistinct("id").cast("long").alias("n_docs"))
    )
    return (
        a1.join(docs_hit, "thr_micro", "left")
        .select(
            "thr_micro",
            "n_pairs",
            F.coalesce(F.col("n_docs"), F.lit(0)).cast("long").alias("n_docs"),
        )
        .orderBy("thr_micro")
    )


def _threshold_sweep_sql() -> str:
    """q209 oracle: the q25 candidate/verify chain (shared _minhash_sql
    prefix, word shingles) with the SAME threshold grid; the cut
    compares the raw double Jaccard against CAST(t AS DOUBLE)/CAST(1e6
    AS DOUBLE) — identical float construction on both engines."""
    vals = ", ".join(f"({t})" for t in _SWEEP_THRESHOLDS)
    return (
        _minhash_sql(16, shingle="word")
        + f"""
            , bands AS (
                SELECT doc_id, 0 AS band,
                       MD5(CONCAT_WS('#', h00, h01, h02, h03)) AS key FROM sig
                UNION ALL SELECT doc_id, 1,
                       MD5(CONCAT_WS('#', h04, h05, h06, h07)) FROM sig
                UNION ALL SELECT doc_id, 2,
                       MD5(CONCAT_WS('#', h08, h09, h10, h11)) FROM sig
                UNION ALL SELECT doc_id, 3,
                       MD5(CONCAT_WS('#', h12, h13, h14, h15)) FROM sig
            ), cand AS (
                SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
            ), shd AS (
                SELECT DISTINCT doc_id, g FROM sh
            ), sizes AS (
                SELECT doc_id, COUNT(*) AS sz FROM shd GROUP BY doc_id
            ), inter AS (
                SELECT c.id_a, c.id_b, COUNT(*) AS i
                FROM cand c
                JOIN shd a ON a.doc_id = c.id_a
                JOIN shd b ON b.doc_id = c.id_b AND b.g = a.g
                GROUP BY 1, 2
            ), pj AS (
                SELECT inter.id_a, inter.id_b,
                       CAST(i AS DOUBLE)
                           / CAST(sa.sz + sb.sz - i AS DOUBLE) AS j
                FROM inter
                JOIN sizes sa ON sa.doc_id = inter.id_a
                JOIN sizes sb ON sb.doc_id = inter.id_b
            ), thr AS (
                SELECT CAST(t AS BIGINT) AS thr_micro
                FROM (VALUES {vals}) AS v(t)
            ), hit AS (
                SELECT t.thr_micro, p.id_a, p.id_b
                FROM thr t JOIN pj p
                  ON p.j >= CAST(t.thr_micro AS DOUBLE)
                            / CAST(1000000 AS DOUBLE)
            ), a1 AS (
                SELECT thr_micro, CAST(COUNT(*) AS BIGINT) AS n_pairs
                FROM hit GROUP BY thr_micro
            ), a2 AS (
                SELECT thr_micro, CAST(COUNT(DISTINCT id) AS BIGINT) AS n_docs
                FROM (SELECT thr_micro, id_a AS id FROM hit
                      UNION ALL SELECT thr_micro, id_b FROM hit)
                GROUP BY thr_micro
            )
            SELECT t.thr_micro,
                   CAST(COALESCE(n_pairs, 0) AS BIGINT) AS n_pairs,
                   CAST(COALESCE(n_docs, 0) AS BIGINT) AS n_docs
            FROM thr t
            LEFT JOIN a1 USING (thr_micro)
            LEFT JOIN a2 USING (thr_micro)
            ORDER BY thr_micro
        """
    )


def _q_text_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextTiling-style topical segmentation over documents — block
    cohesion by exact set-Jaccard micro, boundaries where cohesion
    breaks."""
    from document_quality_assessment_ocr_spark.operators.chunking import (
        text_segments,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    return text_segments(d, w=10, threshold_micro=100_000)


def _text_segments_sql(w: int = 10, thr: int = 100_000) -> str:
    """q210 oracle: identical blocking (LIST_SLICE inclusive-end == Spark
    slice length form), set-Jaccard via LIST_INTERSECT /
    LIST_DISTINCT(a||b) sizes, non-negative //, and the
    COALESCE(ARRAY_TO_STRING) guard."""

    def sl(expr: str) -> str:
        return (
            f"LIST_SLICE(tk, CAST({expr} * {w} + 1 AS INT),"
            f" CAST({expr} * {w} + {w} AS INT))"
        )

    a, b = sl("i"), sl("(i + 1)")
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                       TRIM(LOWER(COALESCE(text, ''))), '{WS}+'),
                   x -> x <> '') AS tk
            FROM documents
        ), b AS (
            SELECT doc_id, tk, CAST(LEN(tk) AS BIGINT) AS n_tokens,
                   CAST((LEN(tk) + {w - 1}) // {w} AS BIGINT) AS n_blocks
            FROM d
        ), s AS (
            SELECT doc_id, n_tokens, n_blocks,
                   CASE WHEN n_blocks >= 2 THEN
                       LIST_TRANSFORM(RANGE(0, n_blocks - 1), i ->
                           CAST((1000000 * LEN(LIST_INTERSECT({a}, {b})))
                                // GREATEST(LEN(LIST_DISTINCT({a} || {b})),
                                            1) AS BIGINT))
                   END AS sims
            FROM b
        ), f AS (
            SELECT doc_id, n_tokens, n_blocks, sims,
                   CASE WHEN sims IS NOT NULL THEN
                       LIST_FILTER(RANGE(1, LEN(sims) + 1),
                                   j -> sims[j] < {thr})
                   END AS bnds
            FROM s
        )
        SELECT doc_id, n_tokens, n_blocks,
               CAST(COALESCE(LEN(bnds), 0) AS BIGINT) AS n_boundaries,
               CAST(CASE WHEN n_blocks >= 1 THEN COALESCE(LEN(bnds), 0) + 1
                         ELSE 0 END AS BIGINT) AS n_segments,
               CAST(LIST_MIN(sims) AS BIGINT) AS min_sim_micro,
               COALESCE(ARRAY_TO_STRING(LIST_TRANSFORM(bnds,
                   x -> CAST(x AS VARCHAR)), ','), '') AS boundaries
        FROM f ORDER BY doc_id
    """


def _q_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language source-concentration audit (HHI) — the monoculture
    flag a mixture design reads before weighting."""
    from document_quality_assessment_ocr_spark.operators.profile import (
        concentration_profile,
    )

    return concentration_profile(_doc(spark, sf_dir), "lang", "source")


def _concentration_sql() -> str:
    """q211 oracle: grid counts, per-sub integer shares, the overflow-
    safe per-term ``share_micro² // 1e6`` HHI, top sub via
    ROW_NUMBER ORDER BY cnt DESC, s (== the engine's min-struct)."""
    return """
        WITH grid AS (
            SELECT COALESCE(lang, '') AS g, COALESCE(source, '') AS s,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM documents GROUP BY 1, 2
        ), tot AS (
            SELECT g, CAST(SUM(cnt) AS BIGINT) AS n_rows FROM grid GROUP BY g
        ), sh AS (
            SELECT g, s, cnt, n_rows,
                   CAST((1000000 * cnt) // GREATEST(n_rows, 1) AS BIGINT) AS sm
            FROM grid JOIN tot USING (g)
        ), agg AS (
            SELECT g, n_rows, CAST(COUNT(*) AS BIGINT) AS n_subs,
                   CAST(SUM((sm * sm) // 1000000) AS BIGINT) AS hhi_micro
            FROM sh GROUP BY g, n_rows
        ), rk AS (
            SELECT g, s, sm,
                   ROW_NUMBER() OVER (PARTITION BY g
                                      ORDER BY cnt DESC, s) AS rn
            FROM sh
        )
        SELECT agg.g AS lang, n_rows, n_subs, hhi_micro,
               rk.s AS top_sub, CAST(rk.sm AS BIGINT) AS top_share_micro
        FROM agg JOIN rk ON rk.g = agg.g AND rk.rn = 1
        ORDER BY lang
    """


# q212/q220 shared synthesis CTE — the SQL twin of _synth_entities.
# Both oracle builders interpolate THIS text; never fork it.
_ENTITY_SYNTH_CTE = """
        WITH es AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   COALESCE(text, '')
                   || ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@ex' || CAST(doc_id % 7 AS VARCHAR) || '.com'
                   || CASE WHEN doc_id % 3 = 0
                           THEN ' call +1415555'
                                || LPAD(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                           ELSE '' END
                   || CASE WHEN doc_id % 4 = 0
                           THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                                || '.' || CAST(doc_id % 200 AS VARCHAR)
                           ELSE '' END AS text
            FROM documents
        )"""


def _synth_entities(d: DataFrame) -> DataFrame:
    """Deterministic entity-bearing text over documents.text: every doc
    gains an email (local part + domain derived from doc_id), %3==0 docs
    a phone, %4==0 docs an IPv4.  The q212 oracle builds the IDENTICAL
    string — byte-identical twins (the _synth_html contract)."""
    t = F.coalesce(F.col("text"), F.lit(""))
    did = F.col("doc_id")
    email = F.concat(
        F.lit(" contact user"),
        did.cast("string"),
        F.lit("@ex"),
        (did % 7).cast("string"),
        F.lit(".com"),
    )
    phone = F.when(
        did % 3 == 0,
        F.concat(
            F.lit(" call +1415555"),
            F.lpad((did % 100).cast("string"), 2, "0"),
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        did % 4 == 0,
        F.concat(
            F.lit(" from 10.0."),
            (did % 256).cast("string"),
            F.lit("."),
            (did % 200).cast("string"),
        ),
    ).otherwise(F.lit(""))
    return d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.concat(t, email, phone, ip).alias("text"),
    )


def _q_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed entity extraction (email/IPv4/phone rows) over synthesized
    entity-bearing text — the IE counterpart of the q53 PII mask."""
    from document_quality_assessment_ocr_spark.operators.scrub import (
        extract_entities,
    )

    return extract_entities(_synth_entities(_doc(spark, sf_dir)))


def _entities_sql() -> str:
    """q212 oracle: the entity synth twin + the SHARED
    scrub.ENTITY_PATTERNS dict (imported, never forked — dict order is
    the emission contract), per-type REGEXP_EXTRACT_ALL + the
    UNNEST(RANGE) posexplode idiom, UNION ALL across types."""
    from document_quality_assessment_ocr_spark.operators.scrub import (
        ENTITY_PATTERNS,
    )

    synth = _ENTITY_SYNTH_CTE
    parts = []
    for etype, pat in ENTITY_PATTERNS.items():
        parts.append(f"""
            SELECT doc_id, '{etype}' AS etype, CAST(i AS BIGINT) AS pos,
                   m[CAST(i AS INT)] AS value
            FROM (SELECT doc_id, m, UNNEST(RANGE(1, LEN(m) + 1)) AS i
                  FROM (SELECT doc_id,
                               REGEXP_EXTRACT_ALL(text, '{pat}', 0) AS m
                        FROM es))""")
    body = "\n            UNION ALL\n".join(parts)
    return f"""{synth}
        SELECT * FROM (
            {body}
        ) ORDER BY doc_id, etype, pos
    """


def _q_bitext_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-criterion bitext mining over the embedding table split by
    parity (even ids = probe side, odd = candidate side); the probe
    panel is md5-picked at 1/10 (tag `bitext` — the pick-salt registry
    note applies)."""
    from document_quality_assessment_ocr_spark.operators.augment import _md5_mod
    from document_quality_assessment_ocr_spark.operators.similarity import (
        bitext_margin_mine,
    )

    e = _emb(spark, sf_dir)
    left = e.where(
        (F.col("vec_id") % 2 == 0)
        & (_md5_mod(F.col("vec_id"), "bitext", F.lit(10)) == 0)
    )
    right = e.where(F.col("vec_id") % 2 == 1)
    return bitext_margin_mine(left, right, k=4, accept=1.05)


def _bitext_margin_sql() -> str:
    """q213 oracle: brute-force ranking with ROW_NUMBER ORDER BY cos
    DESC, nid (== the engine's (-cos, id) struct order on ROUND(·,6)
    cosines), the engine's exact mean fold ((((0+c1)+c2)+c3)+c4)/4, the
    shared _md5_mod pick (tag `bitext`), and +0e0 guards on surfaced
    doubles."""
    mm = (
        "(('0x' || SUBSTR(MD5(CAST(vec_id AS VARCHAR) || '|bitext'),"
        " 1, 15))::BIGINT % 10)"
    )
    fold = "((((0e0 + c1) + c2) + c3) + c4)"
    return f"""
        WITH e AS (
            SELECT CAST(vec_id AS BIGINT) AS vec_id,
                   CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ), l AS (
            SELECT vec_id AS probe_id, v AS pv FROM e
            WHERE vec_id % 2 = 0 AND {mm} = 0
        ), r AS (
            SELECT vec_id, v FROM e WHERE vec_id % 2 = 1
        ), s AS (
            SELECT probe_id, r.vec_id AS nid,
                   ROUND(LIST_DOT_PRODUCT(pv, v)
                         / SQRT(LIST_DOT_PRODUCT(pv, pv)
                                * LIST_DOT_PRODUCT(v, v)), 6) AS cos
            FROM l, r
        ), rk AS (
            SELECT probe_id, nid, cos,
                   ROW_NUMBER() OVER (PARTITION BY probe_id
                                      ORDER BY cos DESC, nid) AS rn
            FROM s
        ), top AS (
            SELECT probe_id,
                   MAX(CASE WHEN rn = 1 THEN nid END) AS m1,
                   MAX(CASE WHEN rn = 1 THEN cos END) AS c1,
                   MAX(CASE WHEN rn = 2 THEN cos END) AS c2,
                   MAX(CASE WHEN rn = 3 THEN cos END) AS c3,
                   MAX(CASE WHEN rn = 4 THEN cos END) AS c4,
                   CAST(COUNT(*) AS BIGINT) AS nk
            FROM rk WHERE rn <= 4 GROUP BY probe_id
        )
        SELECT probe_id, CAST(m1 AS BIGINT) AS match_id,
               c1 + 0e0 AS cos,
               CASE WHEN nk = 4
                    THEN ROUND(c1 / ({fold} / CAST(4 AS DOUBLE)), 6) + 0e0
               END AS margin,
               CASE WHEN nk = 4
                    THEN (ROUND(c1 / ({fold} / CAST(4 AS DOUBLE)), 6) + 0e0)
                         >= 1.05e0
               END AS accepted
        FROM top ORDER BY probe_id
    """


def _q_banding_selectivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-run LSH banding-selectivity planner over documents at the
    PRODUCTION shape (16 perms / 4 bands, word shingles — the q25/q186
    contract): exact candidate-pair volume from bucket counts alone."""
    from document_quality_assessment_ocr_spark.operators.dedup import (
        banding_selectivity,
    )

    return banding_selectivity(
        _doc(spark, sf_dir), n_hashes=16, bands=4, shingle="word"
    )


def _banding_selectivity_sql() -> str:
    """q214 oracle: shared _minhash_sql word-shingle prefix + the q209
    band-key CTE, then pure integer bucket arithmetic (c·(c−1)//2 pair
    mass, largest bucket, reduction ratio per million — all // on
    non-negative operands)."""
    return (
        _minhash_sql(16, shingle="word")
        + """
            , bands AS (
                SELECT doc_id, 0 AS band,
                       MD5(CONCAT_WS('#', h00, h01, h02, h03)) AS key FROM sig
                UNION ALL SELECT doc_id, 1,
                       MD5(CONCAT_WS('#', h04, h05, h06, h07)) FROM sig
                UNION ALL SELECT doc_id, 2,
                       MD5(CONCAT_WS('#', h08, h09, h10, h11)) FROM sig
                UNION ALL SELECT doc_id, 3,
                       MD5(CONCAT_WS('#', h12, h13, h14, h15)) FROM sig
            ), bc AS (
                SELECT band, key, CAST(COUNT(*) AS BIGINT) AS c
                FROM bands GROUP BY band, key
            )
            SELECT CAST(band AS BIGINT) AS band,
                   CAST(SUM(c) AS BIGINT) AS n_docs,
                   CAST(COUNT(*) AS BIGINT) AS n_buckets,
                   CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS singleton_buckets,
                   CAST(MAX(c) AS BIGINT) AS max_bucket,
                   CAST(SUM((c * (c - 1)) // 2) AS BIGINT) AS est_pairs,
                   CAST(CASE WHEN SUM(c) >= 2
                        THEN (SUM((c * (c - 1)) // 2) * 1000000)
                             // ((SUM(c) * (SUM(c) - 1)) // 2)
                        ELSE 0 END AS BIGINT) AS rr_micro
            FROM bc GROUP BY band ORDER BY band
        """
    )


def _q_isotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding isotropy audit: exact corpus-mean pairwise dot via the
    ‖Σq‖² − Σ‖q‖² identity over q168-quantized vectors — no pair ever
    materialized."""
    from document_quality_assessment_ocr_spark.operators.similarity import (
        isotropy_audit,
    )

    return isotropy_audit(_emb(spark, sf_dir), scale=64)


def _isotropy_sql() -> str:
    """q215 oracle: the same TRUNC-quantization (q168 contract), per-dim
    UNNEST(RANGE) fan, BIGINT sums, and the identical fixed-order double
    divisions with ROUND(·,6) + 0e0 guards."""
    return """
        WITH q AS (
            SELECT LIST_TRANSFORM(embedding,
                       x -> CAST(TRUNC(CAST(x AS DOUBLE) * 64) AS BIGINT)) AS q
            FROM embeddings
        ), f AS (
            SELECT CAST(i AS BIGINT) - 1 AS dim, q[CAST(i AS INT)] AS v
            FROM (SELECT q, UNNEST(RANGE(1, LEN(q) + 1)) AS i FROM q)
        ), g AS (
            SELECT dim, CAST(SUM(v) AS BIGINT) AS s,
                   CAST(SUM(v * v) AS BIGINT) AS ssq,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM f GROUP BY dim
        ), r AS (
            SELECT CAST(MAX(cnt) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS dim,
                   CAST(SUM(ssq) AS BIGINT) AS self_dot_sum,
                   CAST(SUM(s * s) AS BIGINT) AS s2
            FROM g
        )
        SELECT n, dim, self_dot_sum,
               CAST(s2 - self_dot_sum AS BIGINT) AS pair_dot_sum,
               ROUND(CAST(self_dot_sum AS DOUBLE) / CAST(n AS DOUBLE), 6)
                   + 0e0 AS avg_self_dot,
               CASE WHEN n >= 2 THEN
                   ROUND(CAST(s2 - self_dot_sum AS DOUBLE)
                         / CAST(n * (n - 1) AS DOUBLE), 6) + 0e0
               END AS avg_pair_dot,
               CASE WHEN n >= 2 AND self_dot_sum > 0 THEN
                   ROUND((CAST(s2 - self_dot_sum AS DOUBLE)
                          / CAST(n * (n - 1) AS DOUBLE))
                         / (CAST(self_dot_sum AS DOUBLE)
                            / CAST(n AS DOUBLE)), 6) + 0e0
               END AS anisotropy
        FROM r
    """


def _q_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified-silhouette audit of the shared k-means cells: pair-free
    per-point a/b from per-cluster (n, Σq, Σ‖q‖²) sufficient statistics
    (the q215 identity per cluster), exact BIGINT distance numerators,
    bit-identical double keys, micro-truncated order-free sums."""
    from document_quality_assessment_ocr_spark.operators.similarity import (
        silhouette_audit,
    )

    return silhouette_audit(_emb(spark, sf_dir), scale=64)


def _silhouette_sql(sf_dir: str | None = None, seed: int = 42) -> str:
    """q262 oracle: recomputes the SAME deterministic k-means centroids
    (scaled_n_centroids / scaled_sample_rows — the shared rules) as
    literals, replays the LIST_INDEXOF(LIST_MIN) assignment (q17 twin),
    then derives the whole silhouette chain IN SQL from the same
    TRUNC-quantized integers: (cell, dim) sums, per-point p2, exact
    dnum = n·p2 + S2 − 2·dot, b via ROW_NUMBER over the identical double
    key (ties → smaller cell), one fixed-order double s, TRUNC micro.
    Multi-referenced CTEs are MATERIALIZED (q149/q160 rule)."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from document_quality_assessment_ocr_spark.operators.similarity import (
        _kmeans_lite,
        scaled_n_centroids,
        scaled_sample_rows,
    )

    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.array(tbl.column("vec_id"))
    vecs = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    k = scaled_n_centroids(len(ids))
    order = np.argsort(ids)
    sample = vecs[order[: scaled_sample_rows(k)]]
    cents = _kmeans_lite(sample, k, seed=seed)
    dists = ", ".join(
        "(-2.0 * LIST_DOT_PRODUCT(v, ["
        + ", ".join(repr(float(x)) for x in c)
        + f"]) + {float((c * c).sum())!r})"
        for c in cents
    )
    cell = f"(LIST_INDEXOF([{dists}], LIST_MIN([{dists}])) - 1)"
    return f"""
        WITH e AS MATERIALIZED (
            SELECT CAST(vec_id AS BIGINT) AS vec_id,
                   CAST(embedding AS DOUBLE[]) AS v,
                   LIST_TRANSFORM(embedding,
                       x -> CAST(TRUNC(CAST(x AS DOUBLE) * 64) AS BIGINT)) AS q
            FROM embeddings
        ), assigned AS MATERIALIZED (
            SELECT vec_id, q, {cell} AS cell FROM e
        ), f AS MATERIALIZED (
            SELECT vec_id, cell, CAST(i AS BIGINT) - 1 AS dim,
                   q[CAST(i AS INT)] AS qv
            FROM (SELECT vec_id, cell, q,
                         UNNEST(RANGE(1, LEN(q) + 1)) AS i FROM assigned)
        ), g AS MATERIALIZED (
            SELECT cell, dim, CAST(SUM(qv) AS BIGINT) AS sq
            FROM f GROUP BY cell, dim
        ), p AS MATERIALIZED (
            SELECT vec_id, cell, CAST(SUM(qv * qv) AS BIGINT) AS p2
            FROM f GROUP BY vec_id, cell
        ), cs AS MATERIALIZED (
            SELECT cell, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(p2) AS BIGINT) AS s2
            FROM p GROUP BY cell
        ), dots AS MATERIALIZED (
            SELECT f.vec_id, g.cell AS oc, CAST(SUM(f.qv * g.sq) AS BIGINT) AS dot
            FROM f JOIN g ON f.dim = g.dim GROUP BY f.vec_id, g.cell
        ), dmat AS MATERIALIZED (
            SELECT p.vec_id, p.cell AS own, d.oc, cs.n AS nc,
                   cs.n * p.p2 + cs.s2 - 2 * d.dot AS dnum
            FROM p JOIN dots d ON d.vec_id = p.vec_id
                 JOIN cs ON cs.cell = d.oc
        ), aa AS MATERIALIZED (
            SELECT vec_id, own, dnum, nc FROM dmat WHERE oc = own
        ), bb AS MATERIALIZED (
            SELECT vec_id, dnum AS bnum, nc AS bn FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY vec_id
                    ORDER BY CAST(dnum AS DOUBLE) / CAST(nc AS DOUBLE) ASC,
                             oc ASC) AS rn
                FROM dmat WHERE oc <> own) WHERE rn = 1
        ), sil AS MATERIALIZED (
            SELECT a.own AS cell,
                   CASE WHEN a.nc > 1 AND b.vec_id IS NOT NULL
                             AND GREATEST(
                                 CAST(a.dnum AS DOUBLE) / CAST(a.nc - 1 AS DOUBLE),
                                 CAST(b.bnum AS DOUBLE) / CAST(b.bn AS DOUBLE)
                             ) > 0e0
                   THEN (CAST(b.bnum AS DOUBLE) / CAST(b.bn AS DOUBLE)
                         - CAST(a.dnum AS DOUBLE) / CAST(a.nc - 1 AS DOUBLE))
                        / GREATEST(
                            CAST(a.dnum AS DOUBLE) / CAST(a.nc - 1 AS DOUBLE),
                            CAST(b.bnum AS DOUBLE) / CAST(b.bn AS DOUBLE))
                   ELSE 0e0 END AS s
            FROM aa a LEFT JOIN bb b ON b.vec_id = a.vec_id
        )
        SELECT CAST(cell AS BIGINT) AS cell,
               CAST(COUNT(*) AS BIGINT) AS n_points,
               CAST(SUM(CASE WHEN s > 0e0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_positive,
               CAST(SUM(CAST(TRUNC(s * 1000000e0) AS BIGINT)) AS BIGINT)
                   AS sum_s_micro
        FROM sil GROUP BY cell ORDER BY cell
    """


def _q_cuped_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B report: md5-split arms (tag `cuped`),
    metric = n_chars + deterministic md5 noise (tag `cnoise`) + a planted
    +50 treat effect, covariate = the pre-experiment n_chars itself — the
    textbook shape where CUPED strips the covariate-explained variance."""
    from document_quality_assessment_ocr_spark.operators.augment import _md5_mod
    from document_quality_assessment_ocr_spark.operators.experiment import (
        cuped_lift,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_chars").cast("long").alias("nc"),
    )
    treat = _md5_mod(F.col("doc_id"), "cuped", F.lit(2)) == 1
    v = F.when(treat, F.lit("treat")).otherwise(F.lit("control"))
    noise = _md5_mod(F.col("doc_id"), "cnoise", F.lit(41)) - F.lit(20)
    units = d.select(
        v.alias("variant"),
        (
            F.col("nc") + noise + F.when(treat, F.lit(50)).otherwise(F.lit(0))
        ).cast("long").alias("metric"),
        F.col("nc").alias("covariate"),
    )
    return cuped_lift(units)


def _cuped_lift_sql() -> str:
    """q216 oracle: shared _md5_mod tags (`cuped`/`cnoise`), BIGINT
    sufficient statistics, θ as ONE double division of BIGINT
    determinants, and the engine's fixed op order
    sy/n − θ·(sx/n − sxp/N); u/g/r MATERIALIZED (each read twice)."""
    mm = (
        "(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR) || '|cuped'),"
        " 1, 15))::BIGINT % 2)"
    )
    nz = (
        "(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR) || '|cnoise'),"
        " 1, 15))::BIGINT % 41)"
    )
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(n_chars AS BIGINT) AS nc
            FROM documents
        ), u AS MATERIALIZED (
            SELECT CASE WHEN {mm} = 1 THEN 'treat' ELSE 'control' END AS v,
                   nc + ({nz} - 20)
                      + CASE WHEN {mm} = 1 THEN 50 ELSE 0 END AS y,
                   nc AS x
            FROM d
        ), g AS (
            SELECT v, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x) AS BIGINT) AS sx
            FROM u GROUP BY v
        ), p AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS nn,
                   CAST(SUM(x) AS BIGINT) AS sxp,
                   CAST(SUM(y) AS BIGINT) AS syp,
                   CAST(SUM(x * y) AS BIGINT) AS sxy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx
            FROM u
        ), t AS (
            SELECT nn, sxp,
                   CASE WHEN nn * sxx - sxp * sxp <> 0
                        THEN CAST(nn * sxy - sxp * syp AS DOUBLE)
                             / CAST(nn * sxx - sxp * sxp AS DOUBLE)
                        ELSE 0e0 END AS theta
            FROM p
        ), r AS MATERIALIZED (
            SELECT v, n, sy AS metric_sum, sx AS cov_sum,
                   CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS mean, theta,
                   CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                       - theta * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
                                  - CAST(sxp AS DOUBLE) / CAST(nn AS DOUBLE))
                       AS adj_mean
            FROM g, t
        ), c AS (
            SELECT v AS cv, adj_mean AS cadj FROM r ORDER BY v LIMIT 1
        )
        SELECT r.v AS variant, n, metric_sum, cov_sum, mean, theta, adj_mean,
               r.v = c.cv AS is_control,
               CASE WHEN c.cadj <> 0e0
                    THEN r.adj_mean / c.cadj - 1e0 END AS lift_adj
        FROM r, c ORDER BY variant
    """


# q217 corruption-synthesis twins: the engine expression and the oracle SQL
# interpolate the SAME (search, replacement) constants — never fork.
_MOJI_SUB = ("a", "Ã¡")  # UTF-8 'á' bytes read as Latin-1
_REPL_SUB = ("e", "�")  # decoder replacement character


def _q_encoding_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mojibake/encoding-corruption audit over a deterministically
    corrupted corpus: md5-picked docs (tag `moji`, mod 5) get either the
    UTF-8-as-Latin-1 substitution or replacement-char injection; the
    profiler must localize the damage by source."""
    from document_quality_assessment_ocr_spark.operators.augment import _md5_mod
    from document_quality_assessment_ocr_spark.operators.scrub import (
        encoding_quality_profile,
    )

    d = _doc(spark, sf_dir)
    pick = _md5_mod(F.col("doc_id"), "moji", F.lit(5))
    corrupt = (
        F.when(
            pick == 0,
            F.expr(f"replace(text, '{_MOJI_SUB[0]}', '{_MOJI_SUB[1]}')"),
        )
        .when(
            pick == 1,
            F.expr(f"replace(text, '{_REPL_SUB[0]}', '{_REPL_SUB[1]}')"),
        )
        .otherwise(F.col("text"))
    )
    docs = d.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        corrupt.alias("text"),
        "source",
    )
    return encoding_quality_profile(docs)


def _encoding_quality_sql() -> str:
    """q217 oracle: byte-identical corruption synthesis (shared
    _MOJI_SUB/_REPL_SUB constants, same md5 pick tag `moji`) + the shared
    scrub.py artifact regexes (Java∩RE2, \\x{{..}} escapes); every
    surfaced number a BIGINT count or non-negative // division."""
    from document_quality_assessment_ocr_spark.operators.scrub import (
        C1_CONTROLS,
        MOJIBAKE_UTF8,
        REPLACEMENT_CHAR,
    )

    mm = (
        "(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR) || '|moji'),"
        " 1, 15))::BIGINT % 5)"
    )
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   COALESCE(source, '') AS grp, text, {mm} AS pick
            FROM documents
        ), x AS (
            SELECT grp,
                   COALESCE(CASE
                       WHEN pick = 0
                           THEN REPLACE(text, '{_MOJI_SUB[0]}', '{_MOJI_SUB[1]}')
                       WHEN pick = 1
                           THEN REPLACE(text, '{_REPL_SUB[0]}', '{_REPL_SUB[1]}')
                       ELSE text END, '') AS t
            FROM d
        ), per AS (
            SELECT grp,
                   CAST(LEN(REGEXP_EXTRACT_ALL(t, '{MOJIBAKE_UTF8}')) AS BIGINT) AS m1,
                   CAST(LEN(REGEXP_EXTRACT_ALL(t, '{REPLACEMENT_CHAR}')) AS BIGINT) AS m2,
                   CAST(LEN(REGEXP_EXTRACT_ALL(t, '{C1_CONTROLS}')) AS BIGINT) AS m3,
                   CAST(LENGTH(t) AS BIGINT) AS nc
            FROM x
        ), sc AS (
            SELECT grp, m1, m2, m3,
                   ((m1 + m2 + m3) * 1000000) // GREATEST(nc, 1) AS score
            FROM per
        )
        SELECT grp AS source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN m1 + m2 + m3 > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_flagged,
               CAST(SUM(m1) AS BIGINT) AS moji_pairs,
               CAST(SUM(m2) AS BIGINT) AS repl_chars,
               CAST(SUM(m3) AS BIGINT) AS c1_chars,
               CAST(SUM(score) // COUNT(*) AS BIGINT) AS mean_score_micro
        FROM sc GROUP BY grp ORDER BY source
    """


def _q_quota_apportion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamilton largest-remainder apportionment of a 1000-doc sampling
    budget across sources — Σalloc == budget exactly, seats awarded in
    (remainder DESC, source) order."""
    from document_quality_assessment_ocr_spark.operators.sampling import (
        quota_apportionment,
    )

    return quota_apportionment(
        _doc(spark, sf_dir), group_col="source", budget=1000
    )


def _quota_apportion_sql(budget: int = 1000) -> str:
    """q218 oracle: the same grid windows — SUM OVER () total/floor-sum
    and ROW_NUMBER seat order (remainder DESC, group ASC); // and % on
    non-negative operands only."""
    return f"""
        WITH g AS (
            SELECT COALESCE(source, '') AS grp,
                   CAST(COUNT(*) AS BIGINT) AS weight
            FROM documents GROUP BY 1
        ), t AS (
            SELECT grp, weight,
                   CAST(SUM(weight) OVER () AS BIGINT) AS total
            FROM g
        ), q AS (
            SELECT grp, weight,
                   CAST(({budget} * weight) // GREATEST(total, 1) AS BIGINT)
                       AS quota_floor,
                   CAST(({budget} * weight) % GREATEST(total, 1) AS BIGINT)
                       AS remainder
            FROM t
        ), s AS (
            SELECT grp, weight, quota_floor, remainder,
                   CAST(SUM(quota_floor) OVER () AS BIGINT) AS fsum,
                   CAST(ROW_NUMBER() OVER (
                       ORDER BY remainder DESC, grp ASC) AS BIGINT) AS rn
            FROM q
        )
        SELECT grp AS source, weight, quota_floor, remainder,
               CAST(quota_floor + CASE WHEN rn <= {budget} - fsum
                    THEN 1 ELSE 0 END AS BIGINT) AS alloc
        FROM s ORDER BY source
    """



def _q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit conformance of n_chars per source — the
    fabricated/junk numeric-field detector."""
    from document_quality_assessment_ocr_spark.operators.profile import (
        benford_audit,
    )

    return benford_audit(_doc(spark, sf_dir), value_col="n_chars", group_col="source")


def _benford_sql() -> str:
    """q219 oracle: shared BENFORD_MICRO literals, first char of the
    positive BIGINT decimal rendering, zero-filled |groups|x9 grid,
    grid-partitioned windows, // on non-negative operands (abs
    numerator)."""
    from document_quality_assessment_ocr_spark.operators.profile import (
        BENFORD_MICRO,
    )

    case = " ".join(
        f"WHEN {d} THEN {e}" for d, e in enumerate(BENFORD_MICRO, start=1)
    )
    return f"""
        WITH base AS (
            SELECT COALESCE(source, '') AS grp,
                   CAST(SUBSTR(CAST(CAST(n_chars AS BIGINT) AS VARCHAR),
                        1, 1) AS BIGINT) AS digit
            FROM documents WHERE CAST(n_chars AS BIGINT) >= 1
        ), counted AS MATERIALIZED (
            SELECT grp, digit, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM base GROUP BY grp, digit
        ), grid AS (
            SELECT g.grp, d.digit, CAST(COALESCE(c.cnt, 0) AS BIGINT) AS cnt
            FROM (SELECT DISTINCT grp FROM counted) g
            CROSS JOIN (SELECT CAST(UNNEST(RANGE(1, 10)) AS BIGINT) AS digit) d
            LEFT JOIN counted c ON c.grp = g.grp AND c.digit = d.digit
        ), e AS (
            SELECT grp, digit, cnt,
                   CAST(CASE digit {case} END AS BIGINT) AS exp_micro,
                   CAST(SUM(cnt) OVER (PARTITION BY grp) AS BIGINT) AS n
            FROM grid
        )
        SELECT grp AS source, digit, cnt,
               CAST((cnt * 1000000) // n AS BIGINT) AS share_micro,
               exp_micro, n,
               CAST(SUM(ABS(cnt * 1000000 - exp_micro * n))
                        OVER (PARTITION BY grp)
                    // (2 * n) AS BIGINT) AS tvd_micro
        FROM e ORDER BY source, digit
    """


def _q_scrub_effectiveness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Defense-in-depth scrub audit over the q212 synthesized
    entity-bearing corpus: per-type before/after counts + removal rate."""
    from document_quality_assessment_ocr_spark.operators.scrub import (
        scrub_effectiveness,
    )

    return scrub_effectiveness(_synth_entities(_doc(spark, sf_dir)))


def _scrub_effectiveness_sql() -> str:
    """q220 oracle: the SHARED _ENTITY_SYNH synth CTE (q212 twin) + the
    shared EMAIL/IPV4/PHONE constants in the scrub_pii replacement order
    (email -> ip -> phone), 1-row MATERIALIZED aggregate, 3-row UNION."""
    from document_quality_assessment_ocr_spark.operators.scrub import (
        EMAIL,
        IPV4,
        PHONE,
    )

    per = []
    for name, pat in (("email", EMAIL), ("ipv4", IPV4), ("phone", PHONE)):
        per.append(
            f"CAST(LEN(REGEXP_EXTRACT_ALL(t, '{pat}')) AS BIGINT) AS b_{name},\n"
            f"                   CAST(LEN(REGEXP_EXTRACT_ALL(s, '{pat}')) AS BIGINT) AS a_{name}"
        )
    cols = ",\n                   ".join(per)
    sums = ",\n                   ".join(
        f"CAST(SUM(b_{n}) AS BIGINT) AS b_{n},"
        f" CAST(SUM(a_{n}) AS BIGINT) AS a_{n},"
        f" CAST(SUM(CASE WHEN a_{n} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS r_{n}"
        for n in ("email", "ipv4", "phone")
    )
    rows = "\n            UNION ALL\n".join(
        f"""SELECT '{n}' AS etype, b_{n} AS before_cnt, a_{n} AS after_cnt,
                   r_{n} AS docs_with_residual,
                   CAST((GREATEST(b_{n} - a_{n}, 0) * 1000000)
                        // GREATEST(b_{n}, 1) AS BIGINT) AS removed_micro
            FROM agg"""
        for n in ("email", "ipv4", "phone")
    )
    return f"""{_ENTITY_SYNTH_CTE}, sc AS (
            SELECT COALESCE(text, '') AS t,
                   REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(
                       COALESCE(text, ''),
                       '{EMAIL}', '<EMAIL>', 'g'),
                       '{IPV4}', '<IP>', 'g'),
                       '{PHONE}', '<PHONE>', 'g') AS s
            FROM es
        ), wide AS (
            SELECT {cols}
            FROM sc
        ), agg AS MATERIALIZED (
            SELECT {sums}
            FROM wide
        )
        SELECT * FROM (
            {rows}
        ) ORDER BY etype
    """


def _q_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf/power-law fit of the token-frequency distribution: floor-log2
    frequency buckets, integer least-squares slope over the bucket grid
    (sign-split DIV keeps every division non-negative)."""
    from document_quality_assessment_ocr_spark.operators.profile import zipf_fit

    return zipf_fit(_doc(spark, sf_dir).select("text"))


def _q_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence grid source × lang: exact BIGINT counts
    and marginals, per-cell contribution via the fixed-op-order double
    path truncated to micro (the q168 portable float→int contract)."""
    from document_quality_assessment_ocr_spark.operators.profile import (
        chisq_independence,
    )

    return chisq_independence(_doc(spark, sf_dir), "source", "lang")


def _q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source binned median/MAD outlier audit over n_chars (bin width
    32, 3×MAD fence) — integer grid medians, no percentile interpolation."""
    from document_quality_assessment_ocr_spark.operators.profile import (
        mad_outlier_audit,
    )

    return mad_outlier_audit(
        _doc(spark, sf_dir), "n_chars", "source", bin_width=32, k_mad=3
    )


def _q_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed Pareto frontier over (length, lexical diversity): xb =
    n_chars DIV 64, yb = distinct-token-ratio micro DIV 100000; dominance
    via ONE grid-bounded RANGE window (strictly-greater-x best-y)."""
    from document_quality_assessment_ocr_spark.operators.curriculum import (
        pareto_frontier_cells,
    )
    from document_quality_assessment_ocr_spark.functions.text import WS_CLASS

    d = _doc(spark, sf_dir).select(
        F.expr("cast(n_chars as long) DIV 64L").alias("xb"),
        F.filter(
            F.split(
                F.trim(F.lower(F.coalesce(F.col("text"), F.lit("")))),
                WS_CLASS + "+",
            ),
            lambda x: x != "",
        ).alias("tk"),
    ).select(
        "xb",
        F.expr(
            "(cast(size(array_distinct(tk)) as long) * 1000000L"
            " DIV greatest(cast(size(tk) as long), 1L)) DIV 100000L"
        ).alias("yb"),
    )
    return pareto_frontier_cells(d, "xb", "yb")


def _q_year_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal coverage per source over year-salted text (every doc gets
    one deterministic md5-mod year token 1970-2029 appended — the 'yr'
    tag); extraction is the shared YEAR_RE regex (Java∩RE2)."""
    from document_quality_assessment_ocr_spark.operators.augment import _md5_mod
    from document_quality_assessment_ocr_spark.operators.profile import year_coverage

    d = _doc(spark, sf_dir).select(
        "source",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(" "),
            (F.lit(1970) + _md5_mod(F.col("doc_id"), "yr", F.lit(60))).cast(
                "string"
            ),
        ).alias("text"),
    )
    return year_coverage(d, "text", "source")


def _q_quantile_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ECDF quantile harmonization of n_chars across sources onto the
    src0 reference grid (bucket width 16): BIGINT cross-multiplied ECDF
    compare, grid-bounded windows + broadcast ref-grid join."""
    from document_quality_assessment_ocr_spark.operators.experiment import (
        quantile_harmonize,
    )

    return quantile_harmonize(
        _doc(spark, sf_dir), "n_chars", "source", "src0", bucket_width=16
    )


def _q_cocitation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host co-citation pairs over a salted (doc, host) incidence: three
    md5-mod host picks per doc over a 12-host universe (tags cc1..cc3 —
    the synthesized HTML gives each doc only ONE absolute host, so the
    link-graph derivation stays q70/q72's job and this exercises the
    pair operator); per-doc sorted capped list, support >= 2."""
    from document_quality_assessment_ocr_spark.operators.augment import _md5_mod
    from document_quality_assessment_ocr_spark.operators.graph import (
        cocitation_pairs,
    )

    d = _doc(spark, sf_dir)
    inc = d.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.concat(
                        F.lit("h"),
                        _md5_mod(F.col("doc_id"), f"cc{i}", F.lit(12)).cast(
                            "string"
                        ),
                    )
                    for i in (1, 2, 3)
                ]
            )
        ).alias("host"),
    )
    return cocitation_pairs(inc, cap=16, min_support=2)


def _q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve (top-k token-mass share at power-of-two
    ks up to 1024): two-level top-k merge + panel-bounded cumsum +
    broadcast 1-row totals; micro ratios BIGINT DIV."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        vocab_coverage_curve,
    )

    return vocab_coverage_curve(_doc(spark, sf_dir), k_max=1024)


def _q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Church-Gale term burstiness panel (top 64 by collection freq):
    one (doc, term) aggregate, one term rollup (df = row count, never a
    corpus countDistinct), two-level top-k merge; burst = cf*1e6 DIV df."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        term_burstiness,
    )

    return term_burstiness(_doc(spark, sf_dir), k=64)


def _q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Gini of document char mass: value-grid rank trick
    (rank sums from (source, value) cell counts — docs never ranked
    individually), all-BIGINT, grid-bounded windows only."""
    from document_quality_assessment_ocr_spark.operators.profile import (
        gini_by_group,
    )

    return gini_by_group(_doc(spark, sf_dir), "n_chars", "source")


def _q_hoover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Hoover (Robin Hood) index of document char mass: the
    log-free all-BIGINT inequality companion to q230 — grid-only (no
    window, no rank), numerator non-negative via ABS."""
    from document_quality_assessment_ocr_spark.operators.profile import (
        hoover_by_group,
    )

    return hoover_by_group(_doc(spark, sf_dir), "n_chars", "source")


def _hoover_sql() -> str:
    """q263 oracle: (source, value) grid, per-group totals joined back on
    the grid, BIGINT Σ c·|v·n − S|, micro scale via `//` (non-negative
    numerator: DIV == floor)."""
    return """
        WITH base AS (
            SELECT COALESCE(CAST(source AS VARCHAR), '') AS g,
                   CAST(n_chars AS BIGINT) AS v
            FROM documents WHERE n_chars >= 0
        ), grid AS (
            SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c
            FROM base GROUP BY 1, 2
        ), tot AS (
            SELECT g, CAST(SUM(c) AS BIGINT) AS n_docs,
                   CAST(SUM(v * c) AS BIGINT) AS total_mass
            FROM grid GROUP BY 1
        ), agg AS (
            SELECT grid.g, MAX(n_docs) AS n_docs,
                   MAX(total_mass) AS total_mass,
                   CAST(SUM(c * ABS(v * n_docs - total_mass)) AS BIGINT) AS t
            FROM grid JOIN tot ON grid.g = tot.g
            GROUP BY grid.g
        )
        SELECT g AS source, n_docs, total_mass,
               CAST((t * 1000000) // GREATEST(2 * n_docs * total_mass, 1)
                    AS BIGINT) AS hoover_micro
        FROM agg ORDER BY source
    """


def _q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation grid over events: fixed recency edges, floor-log2
    frequency/monetary buckets (corpus-independent — no quantile
    windows); per-event milli-value truncation is the q168 portable
    float->int path."""
    from document_quality_assessment_ocr_spark.operators.sessions import (
        rfm_segments,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return rfm_segments(ev)


def _q_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per 7-day period: one (period, day, user)
    distinct aggregate, grid rollups, micro ratio BIGINT DIV."""
    from document_quality_assessment_ocr_spark.operators.sessions import (
        stickiness,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return stickiness(ev, period_days=7)


def _q_rank_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed rank concordance between n_chars and the q02 token
    count: 16x16 grid + 2-D cumulative sums — concordant/discordant
    pair counts without enumerating a single pair."""
    from document_quality_assessment_ocr_spark.functions.text import token_count
    from document_quality_assessment_ocr_spark.operators.experiment import (
        rank_concordance,
    )

    d = _doc(spark, sf_dir).select(
        "n_chars", token_count(F.col("text")).alias("n_toks")
    )
    return rank_concordance(
        d, "n_chars", "n_toks", x_width=32, y_width=8, n_buckets=16
    )


def _q_filter_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-gate rejection attribution (any/first/unique fail per
    gate): shared GOPHER_GATES predicate strings on both engines, one
    single-row aggregate, 7-row panel."""
    from document_quality_assessment_ocr_spark.operators.quality import (
        filter_attribution,
    )

    return filter_attribution(_doc(spark, sf_dir))


def _q_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-degree assortativity over a synthesized host edge per doc
    (da1/da2 md5-mod picks, 32->8 host universes): degree joins + the
    shared concordance grid core."""
    from document_quality_assessment_ocr_spark.operators.augment import _md5_mod
    from document_quality_assessment_ocr_spark.operators.graph import (
        degree_assortativity,
    )

    d = _doc(spark, sf_dir)
    edges = d.select(
        F.concat(
            F.lit("h"),
            _md5_mod(F.col("doc_id"), "da1", F.lit(32)).cast("string"),
        ).alias("src"),
        F.concat(
            F.lit("h"),
            _md5_mod(F.col("doc_id"), "da2", F.lit(8)).cast("string"),
        ).alias("dst"),
    )
    return degree_assortativity(edges)


def _q_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source winsorized mean of n_chars at p10/p90: grid-cumsum
    order statistics, clamp-and-mean in BIGINT micro."""
    from document_quality_assessment_ocr_spark.operators.profile import (
        winsorized_mean,
    )

    return winsorized_mean(_doc(spark, sf_dir), "n_chars", "source")


def _q_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversification over the q13 probe panel: exact top-8
    candidates, k^2 panel pair-cosines, 3 unrolled greedy rounds —
    integer micro scores, (-score, id) min-struct selection."""
    from document_quality_assessment_ocr_spark.operators.similarity import (
        mmr_rerank,
    )

    emb = _par(spark.read.parquet(f"{sf_dir}/embeddings.parquet")).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    return mmr_rerank(emb, probe_ids=[0, 1, 2, 3, 4], k=8)


_PR_THRESHOLDS = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192)


def _q_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Mann-Whitney AUC of n_chars predicting the Gopher
    keep verdict: value-grid rank trick with mid-rank tie correction
    (2*conc + ties over 2*n_pos*n_neg), all-BIGINT; the label comes
    from the shared gopher_cols projection (zero joins engine-side)."""
    from document_quality_assessment_ocr_spark.operators.experiment import (
        auc_by_group,
    )
    from document_quality_assessment_ocr_spark.operators.quality import (
        gopher_labeled,
    )

    lab = gopher_labeled(
        _doc(spark, sf_dir), ["source", "n_chars"]
    ).select("source", "n_chars", F.col("keep").cast("long").alias("label"))
    return auc_by_group(lab, "n_chars", "label", "source")


def _q_pr_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/F1 sweep of the `n_chars >= t` gate against the
    Gopher keep verdict over the fixed _PR_THRESHOLDS grid: one
    (score,label) grid aggregate, explode-fanned thresholds (q158
    idiom), micro ratios BIGINT DIV."""
    from document_quality_assessment_ocr_spark.operators.experiment import (
        pr_threshold_sweep,
    )
    from document_quality_assessment_ocr_spark.operators.quality import (
        gopher_labeled,
    )

    lab = gopher_labeled(_doc(spark, sf_dir), ["n_chars"]).select(
        "n_chars", F.col("keep").cast("long").alias("label")
    )
    return pr_threshold_sweep(
        lab, list(_PR_THRESHOLDS), "n_chars", "label"
    )


def _q_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dim embedding centroid drift between md5 halves (tag `cd`):
    quantized (half, dim) sufficient-statistic grid + min-shift integer
    means; the grid stage is the streaming twin's shared partial."""
    from document_quality_assessment_ocr_spark.operators.similarity import (
        centroid_drift,
    )

    emb = _par(spark.read.parquet(f"{sf_dir}/embeddings.parquet")).select(
        F.col("vec_id").cast("long").alias("vec_id"), "embedding"
    )
    return centroid_drift(emb, scale=64, tag="cd")


def _q_daily_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag 1..7 autocorrelation of daily event counts: one events->days
    aggregate, explode-fanned lags on the day grid, grid self-join,
    exact BIGINT moments, ONE fixed-order double Pearson expression
    (IEEE sqrt is correctly rounded — portable)."""
    from document_quality_assessment_ocr_spark.operators.sessions import (
        daily_autocorr,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return daily_autocorr(ev, max_lag=7)


def _q_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-round synchronous label propagation over a synthesized
    host graph (lp1/lp2 md5-mod picks, 48->12 universes): distinct
    undirected edges collapsed once + localCheckpoint, 3 rounds of
    join + vote + (-cnt, label) min-struct."""
    from document_quality_assessment_ocr_spark.operators.augment import _md5_mod
    from document_quality_assessment_ocr_spark.operators.graph import (
        label_propagation_fixed,
    )

    d = _doc(spark, sf_dir)
    edges = d.select(
        F.concat(
            F.lit("h"),
            _md5_mod(F.col("doc_id"), "lp1", F.lit(48)).cast("string"),
        ).alias("src"),
        F.concat(
            F.lit("h"),
            _md5_mod(F.col("doc_id"), "lp2", F.lit(12)).cast("string"),
        ).alias("dst"),
    )
    return label_propagation_fixed(edges, rounds=3)


def _q_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@5 of the q17 IVF index vs the exact brute-force ranking on
    the (0,1,2) probe panel: graded rel = k+1-exact_rank, shared
    ndcg_discounts_micro integer literals — zero float logs, all
    BIGINT."""
    from document_quality_assessment_ocr_spark.operators.retrieval import (
        ndcg_at_k,
    )
    from document_quality_assessment_ocr_spark.operators.similarity import (
        cosine_topk_bruteforce,
        ivf_topk,
    )

    emb = _emb(spark, sf_dir)
    approx = ivf_topk(emb, probe_ids=[0, 1, 2], dim=64, k=5, n_centroids=8)
    exact = cosine_topk_bruteforce(emb, probe_ids=[0, 1, 2], k=5)
    return ndcg_at_k(approx, exact, k=5)


def _q_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR@5 of the q17 IVF index vs the exact brute-force ranking on
    the (0,1,2) probe panel — first-hit depth, pure BIGINT
    (rr_micro = 1e6 DIV first rank)."""
    from document_quality_assessment_ocr_spark.operators.retrieval import (
        mrr_at_k,
    )
    from document_quality_assessment_ocr_spark.operators.similarity import (
        cosine_topk_bruteforce,
        ivf_topk,
    )

    emb = _emb(spark, sf_dir)
    approx = ivf_topk(emb, probe_ids=[0, 1, 2], dim=64, k=5, n_centroids=8)
    exact = cosine_topk_bruteforce(emb, probe_ids=[0, 1, 2], k=5)
    return mrr_at_k(approx, exact, k=5)


def _q_keep_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d of n_chars between Gopher keep/reject per source — the
    effect-size companion to the q238 AUC audit; exact BIGINT moments
    + the shared cohens_d_expr() text on both engines."""
    from document_quality_assessment_ocr_spark.operators.experiment import (
        cohens_d_by_group,
    )
    from document_quality_assessment_ocr_spark.operators.quality import (
        gopher_labeled,
    )

    lab = gopher_labeled(_doc(spark, sf_dir), ["source", "n_chars"]).select(
        "source", "n_chars", F.col("keep").cast("long").alias("label")
    )
    return cohens_d_by_group(lab, "n_chars", "label", "source")


def _q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-bit Zipf rank-frequency slope per source: value-grid rank
    bands × POW2_TRIPLES literal fan × Pearson-class finish — no
    per-term rank window anywhere."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        zipf_slope,
    )

    return zipf_slope(_doc(spark, sf_dir), "source")


def _q_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar paired comparison of the Gopher gate (original text, the
    q89/q238 surface) vs the C4 gate (the q88 derived multi-line text)
    on the SAME documents, per source — 2x2 agreement table + the
    discordant-cell chi-square via the shared mcnemar_expr() text."""
    from document_quality_assessment_ocr_spark.operators.experiment import (
        mcnemar_filters,
    )
    from document_quality_assessment_ocr_spark.operators.quality import (
        c4_line_filter,
        gopher_labeled,
    )

    d = _doc(spark, sf_dir)
    gop = gopher_labeled(d, ["doc_id", "source"]).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "source",
        F.col("keep").cast("long").alias("a"),
    )
    c4 = c4_line_filter(
        d.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.replace(
                F.coalesce(F.col("text"), F.lit("")),
                F.lit(". "),
                F.lit(".\n"),
            ).alias("text"),
        )
    ).select("doc_id", F.col("doc_keep").cast("long").alias("b"))
    return mcnemar_filters(gop.join(c4, "doc_id"), "a", "b", "source")


def _q_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival of user lifetimes over events: whole-day
    durations, last-day censoring, shared kaplan_meier_fold fixed-point
    product on the duration grid."""
    from document_quality_assessment_ocr_spark.operators.sessions import (
        kaplan_meier,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return kaplan_meier(ev)


def _q_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test on daily event counts: grid-bounded pair
    sum + tie-corrected var18, shared mann_kendall_expr() z."""
    from document_quality_assessment_ocr_spark.operators.sessions import (
        mann_kendall_daily,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return mann_kendall_daily(ev)


def _q_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword panel over documents: adjacent-token
    co-occurrence graph -> shared pagerank_fixed nano-ranks -> q13
    two-level top-20 merge."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        textrank_keywords,
    )

    return textrank_keywords(_doc(spark, sf_dir), k=20, iters=3)


def _q_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-bit PSI of the n_chars distribution between md5 halves:
    fixed whole-bit buckets, grid windows only, psi_term non-negative
    by bits-monotonicity."""
    from document_quality_assessment_ocr_spark.operators.experiment import (
        psi_drift,
    )

    return psi_drift(_doc(spark, sf_dir), "n_chars")


def _q_conductance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conductance of the md5-mod-4 host sharding on the q131 link
    graph: distinct canonical undirected edges localCheckpointed once,
    endpoint-explode volumes, cut counted to both sides."""
    from document_quality_assessment_ocr_spark.operators.graph import (
        partition_conductance,
    )

    return partition_conductance(_host_edges(spark, sf_dir), groups=4)


def _q_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the q256 md5-mod-4 host sharding on the
    same link graph: exact-integer 4m2-scaled contributions, ONE
    fixed-point division at the end."""
    from document_quality_assessment_ocr_spark.operators.graph import (
        partition_modularity,
    )

    return partition_modularity(_host_edges(spark, sf_dir), groups=4)


def _q_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: the q75 train-then-apply BPE
    chain rolled up to (lang) - subtokens per word is THE number a
    tokenizer-vocab review quotes per language before committing a
    vocab (high fertility = that language pays more sequence length
    per word). fertility_milli = subtok*1000 DIV words, all BIGINT."""
    from document_quality_assessment_ocr_spark.operators.bpe import (
        apply_bpe,
        train_bpe,
        word_counts,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text", "lang"
    )
    mrows = (
        train_bpe(spark, word_counts(d.select("doc_id", "text")), n_merges=8)
        .orderBy("step")
        .collect()
    )
    toks = apply_bpe(
        d.select("doc_id", "text"), [(r["left"], r["right"]) for r in mrows]
    )
    sub = toks.select(
        "doc_id",
        F.size(F.split(F.col("seg_text"), " ")).cast("long").alias("ns"),
    )
    per = (
        sub.join(d.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("ns").cast("long").alias("n_subtokens"),
        )
    )
    return per.select(
        "lang",
        "n_words",
        "n_subtokens",
        F.expr("(n_subtokens * 1000L) DIV greatest(n_words, 1L)")
        .cast("long")
        .alias("fertility_milli"),
    ).orderBy("lang")


def _q_sqrt_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact T=2 temperature mixture weights per language - the
    floor-sqrt fixed-point trick (operand <= 1e12, IEEE-exact)."""
    from document_quality_assessment_ocr_spark.operators.sampling import (
        sqrt_mixture_weights,
    )

    return sqrt_mixture_weights(_doc(spark, sf_dir), "lang")


def _q_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRF (Rocchio-lite) query expansion over the q98 BM25 panel:
    top-5-doc pools, pool-tf x RSJ milli-idf, original terms
    anti-joined out, grid-window rank."""
    from document_quality_assessment_ocr_spark.operators.retrieval import (
        bm25_top_terms,
        prf_expansion,
    )

    d = _doc(spark, sf_dir).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    terms = bm25_top_terms(d, 9)
    return prf_expansion(
        d, {1: terms[0:3], 2: terms[3:6], 3: terms[6:9]}, k_docs=5, m=5
    )


def _q_simpson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini-Simpson / inverse-Simpson token diversity per source: the
    log-free EXACT diversity index — one (source, term) aggregate, one
    rollup, pure BIGINT ratios."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        simpson_diversity,
    )

    return simpson_diversity(_doc(spark, sf_dir), "source")


def _q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over per-user event-type sets:
    support/confidence/lift, |types|^2-grid bounded, all-BIGINT micro
    ratios."""
    from document_quality_assessment_ocr_spark.operators.sessions import (
        event_assoc_rules,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return event_assoc_rules(ev, min_support=2)


def _q_local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host local clustering coefficient over the q131/q149 host
    link graph: q160's degree-oriented triangle plan + one exact micro
    ratio (2*tri*1e6 DIV deg*(deg-1))."""
    from document_quality_assessment_ocr_spark.operators.graph import (
        local_clustering,
    )

    return local_clustering(_host_edges(spark, sf_dir)).select(
        F.col("id").alias("host"), "degree", "tri", "cc_micro"
    )


def _q_ess(
    spark: SparkSession, sf_dir: str, clustered: DataFrame | None = None
) -> DataFrame:
    """Kish effective sample size + design effect of SoftDeDup weights
    per source: q100's weight chain, milli prescale (DIV 1e6), exact
    BIGINT sums, ONE double expression per surfaced ratio (q241
    class).  ``clustered`` = the persisted q31 artifact (bench/q134
    pattern) so the composite doesn't re-pay the CC loop."""
    from document_quality_assessment_ocr_spark.operators.dedup import (
        soft_dedup_weights,
    )
    from document_quality_assessment_ocr_spark.operators.experiment import (
        effective_sample_size,
    )

    d = _doc(spark, sf_dir)
    w = soft_dedup_weights(d, clusters=clustered).join(
        d.select("doc_id", "source"), "doc_id"
    )
    return effective_sample_size(w, "weight_nano", "source")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Registry order is load-bearing: the driver's CORRECTNESS gate checks
    the FIRST 50 entries in dict order.  Positions 1-50 therefore carry the
    flagship extraction queries plus one representative of every operator
    family; redundant narrow variants ride positions 51+ and are audited by
    scripts/check_queries.py → CHECKS.md instead (round-2 verdict item #1).

    ROTATION POLICY (round-4 verdict item #6): each round, ~15 window seats
    swap with their positions-51+ family siblings (q90-q92 stay pinned;
    every family keeps >= 1 in-window rep) so every registry entry cycles
    through the driver's hard gate across rounds. Round 4 rotated IN:
    q52/q59/q75/q100/q105/q110/q111/q114/q116/q119/q120/q123/q130/q132/q135,
    rotating their siblings q01/q02/q06/q12/q17/q27/q31/q33/q34/q39/q54/
    q71/q78/q126/q133 to the CHECKS.md audit path. Round 5 rotated IN:
    q44/q139/q142/q148/q151/q163/q181/q186/q205/q210/q214/q220/q242/q252/
    q258, rotating out their siblings q52/q56/q59/q75/q100/q105/q110/q111/
    q116/q119/q120/q123/q130/q134/q135 (graph-family rep is now q242
    label-prop; sessions rep q252 Kaplan-Meier; BPE window rep q258)."""
    return {
        # -- driver window (first 50): flagship + family representatives --
        "q90_extract_full": _q_extract_full,
        "q91_extract_metrics": _q_extract_metrics,
        "q92_main_content": _q_main_content,
        "q220_scrub_effect": _q_scrub_effectiveness,
        "q181_char_classes": _q_char_classes,
        "q03_fingerprint_dedup": _q_fingerprint_dedup,
        "q04_agg_modes": _q_agg_modes,
        "q05_verdict_fold": _q_verdict_fold,
        "q186_dup_closure": _q_dup_closure,
        "q07_reassembly": _q_reassembly,
        "q08_metrics_rollup": _q_metrics_rollup,
        "q10_minhash_lsh_pairs": _q_lsh_pairs,
        "q121_bigram_lm": _q_bigram_lm,
        "q214_banding_selectivity": _q_banding_selectivity,
        "q44_dedup_keep_best": _q_dedup_keep_best,
        # SFT/preference construction families — q110 (FIM) took the SFT
        # seat from q133 in the round-4 rotation; q134 stays (the heaviest
        # composite deserves the hard gate)
        "q142_span_corruption": _q_span_corruption,
        "q151_fragment_stitch": _q_fragment_stitch,
        "q73_exact_substring": _q_exact_substring,
        "q13_cosine_topk": _q_cosine_topk,
        "q148_matryoshka_topk": _q_matryoshka_topk,
        "q46_pq_topk": _q_pq_topk,
        "q124_heavy_hitters": _q_heavy_hitters,
        "q205_kcenter_coreset": _q_kcenter,
        "q76_phash_near_dup": _q_phash_near_dup,
        "q210_text_segments": _q_text_segments,
        "q114_fuzzy_decontam": _q_fuzzy_decontam,
        "q35_hll_distinct": _q_hll,
        "q139_blocklist_gate": _q_blocklist_gate,
        "q41_quantile_sketch": _q_quantile_sketch,
        "q42_bloom_decontam": _q_bloom_decontam,
        "q43_count_min": _q_count_min,
        "q258_bpe_fertility": _q_fertility,
        "q67_surprisal": _q_surprisal,
        "q163_pmi": _q_pmi,
        "q63_html_main": _q_html_main,
        "q66_host_stats": _q_host_stats,
        "q132_budget_select": _q_budget_select,
        "q83_host_policy": _q_host_policy,
        "q74_bpe_merges": _q_bpe_merges,
        "q64_cdc_upsert": _q_cdc_upsert,
        "q84_quality_classifier": _q_quality_classifier,
        "q89_gopher_filter": _q_gopher_filter,
        "q93_curation_v4": _q_curation_v4,
        "q94_dsir_resample": _q_dsir_resample,
        "q252_kaplan_meier": _q_km,
        "q36_asof_join": _q_asof_join,
        "q49_sequence_packing": _q_sequence_packing,
        "q77_mixture_sample": _q_mixture_sample,
        "q242_label_prop": _q_label_prop,
        "q98_bm25_search": _q_bm25_search,
        # -- positions 51+: narrow variants, audited via CHECKS.md --
        "q79_curation_v3": _q_curation_v3,
        "q09_minhash_signatures": _q_minhash,
        "q65_url_normalize": _q_url_normalize,
        "q54_tokenize_ids": _q_tokenize_ids,
        "q82_robots_rules": _q_robots_rules,
        "q25_lsh_jaccard": _q_lsh_jaccard,
        "q14_doc_stats": _q_doc_stats,
        "q15_rolling_fingerprint": _q_rolling_fp,
        "q16_lsh_topk": _q_lsh_topk,
        "q18_window_agg": _q_window_agg,
        "q19_curation": _q_curation,
        "q20_join_topk": _q_join_topk,
        "q23_embedding_near_dups": _q_embedding_near_dups,
        "q24_rollup": _q_rollup,
        "q21_semi_join": _q_semi_join,
        "q22_anti_join": _q_anti_join,
        "q26_batch_reattach": _q_batch_reattach,
        "q28_cube": _q_cube,
        "q29_bpe_tokens": _q_bpe_tokens,
        "q30_lsh_multiprobe": _q_lsh_multiprobe,
        "q32_value_quartiles": _q_value_quartiles,
        "q37_stratified_sample": _q_stratified_sample,
        "q38_source_cap": _q_source_cap,
        "q45_curation_v2": _q_curation_v2,
        "q47_random_projection": _q_random_projection,
        "q48_sq_int8": _q_sq_int8,
        "q50_regional_revenue": _q_regional_revenue,
        "q51_pq_refined": _q_pq_refined,
        "q01_text_density": _q_text_density,
        "q53_pii_scrub": _q_pii_scrub,
        "q55_profile_table": _q_profile_table,
        "q27_sessionize": _q_sessionize,
        "q60_deterministic_shuffle": _q_deterministic_shuffle,
        "q61_length_batches": _q_length_batches,
        "q62_html_blocks": _q_html_blocks,
        "q68_prefix_block": _q_prefix_block,
        "q69_compaction_plan": _q_compaction,
        "q72_link_hosts": _q_link_hosts,
        "q80_bpe_fertility": _q_bpe_fertility,
        "q81_hash_embedding": _q_hash_embedding,
        "q57_phash_dedup": _q_phash_dedup,
        "q85_temperature_mixture": _q_temperature_mixture,
        "q86_snapshot_diff": _q_snapshot_diff,
        "q87_line_dedup": _q_line_dedup,
        "q88_c4_filter": _q_c4_filter,
        "q95_ccnet_perplexity": _q_ccnet_perplexity,
        "q96_split_assign": _q_split_assign,
        "q97_corpus_card": _q_corpus_card,
        "q99_chunk_manifest": _q_chunk_manifest,
        "q31_dup_clusters": _q_dup_clusters,
        "q101_winnow_overlap": _q_winnow_overlap,
        "q102_rrf_hybrid": _q_rrf_hybrid,
        "q103_chunk_profile": _q_chunk_profile,
        "q104_corpus_line_dedup": _q_corpus_line_dedup,
        "q12_simhash": _q_simhash,
        "q106_unimax_sample": _q_unimax_sample,
        "q107_prototype_prune": _q_prototype_prune,
        "q108_domain_quality": _q_domain_quality,
        "q109_ngram_novelty": _q_ngram_novelty,
        "q133_chat_spans": _q_chat_spans,
        "q78_semdedup": _q_semdedup,
        "q112_k_anonymize": _q_k_anonymize,
        "q113_hard_negatives": _q_hard_negatives,
        "q34_decontam": _q_decontam,
        "q115_cluster_holdout": _q_cluster_holdout,
        "q02_token_count": _q_token_count,
        "q117_dedup_report": _q_dedup_report,
        "q118_window_chunks": _q_window_chunks,
        "q17_ivf_topk": _q_ivf_topk,
        "q71_inverted_index": _q_inverted_index,
        "q122_edit_pairs": _q_edit_pairs,
        "q06_dedup_last_wins": _q_dedup_last_wins,
        "q125_vocab_growth": _q_vocab_growth,
        "q127_anchor_index": _q_anchor_index,
        "q128_exact_k_sample": _q_exact_k_sample,
        "q129_shard_checksums": _q_shard_checksums,
        "q39_top_terms": _q_top_terms,
        "q131_host_pagerank": _q_host_pagerank,
        "q126_curriculum": _q_curriculum,
        "q40_chunk_dedup": _q_chunk_dedup,
        "q100_soft_dedup": _q_soft_dedup,
        "q33_repetition": _q_repetition,
        "q136_ict_pairs": _q_ict_pairs,
        "q11_ngram_jaccard": _q_ngram_jaccard,
        "q58_filtered_topk": _q_filtered_topk,
        "q70_outlinks": _q_outlinks,
        "q137_audio_rms": _q_audio_rms,
        "q138_video_frames": _q_video_frames,
        "q130_stopgram_blocklist": _q_stopgram_blocklist,
        "q140_weighted_sample": _q_weighted_sample,
        "q141_hll_overlap": _q_hll_overlap,
        "q110_fim_split": _q_fim_split,
        "q143_bt_strength": _q_bt_strength,
        "q144_kneser_ney": _q_kneser_ney,
        "q145_rho1_select": _q_rho1_select,
        "q146_binary_topk": _q_binary_topk,
        "q147_zorder_layout": _q_zorder,
        "q119_ann_recall": _q_ann_recall,
        "q149_hits": _q_hits,
        "q150_borda_ensemble": _q_borda_ensemble,
        "q134_preference_pairs": _q_preference_pairs,
        "q152_template_expand": _q_template_expand,
        "q153_group_percentile": _q_group_percentile,
        "q154_png_chunks": _q_png_chunks,
        "q155_mw_weights": _q_mw_weights,
        "q156_token_drift": _q_token_drift,
        "q157_video_scenes": _q_video_scenes,
        "q158_zone_map": _q_zone_map,
        "q159_distinct_n": _q_distinct_n,
        "q160_triangles": _q_triangles,
        "q161_containment": _q_containment,
        "q162_skew_audit": _q_skew_audit,
        "q120_phrase_search": _q_phrase_search,
        "q164_funnel": _q_funnel,
        "q165_retention": _q_retention,
        "q166_transitions": _q_transitions,
        "q167_posting_size": _q_posting_size,
        "q168_emb_profile": _q_emb_profile,
        "q169_audio_quality": _q_audio_quality,
        "q170_join_explain": _q_join_explain,
        "q171_encoding_advisor": _q_encoding_advisor,
        "q172_reciprocity": _q_reciprocity,
        "q173_kcore": _q_kcore,
        "q174_calibration": _q_calibration,
        "q175_tfidf_keywords": _q_tfidf_keywords,
        "q176_degree_hist": _q_degree_hist,
        "q177_gap_hist": _q_gap_hist,
        "q178_source_overlap": _q_source_overlap,
        "q179_prefix_compression": _q_prefix_compression,
        "q180_quality_joint": _q_quality_joint,
        "q116_readability": _q_readability,
        "q182_anchor_diversity": _q_anchor_diversity,
        "q183_event_bursts": _q_event_bursts,
        "q184_props_stats": _q_props_stats,
        "q185_rendezvous": _q_rendezvous,
        "q123_incremental_dedup": _q_incremental_dedup,
        "q187_url_depth": _q_url_depth,
        "q188_two_hop": _q_two_hop,
        "q189_field_consistency": _q_field_consistency,
        "q190_source_surprisal": _q_source_surprisal,
        "q191_l_diversity": _q_l_diversity,
        "q192_boilerplate": _q_boilerplate,
        "q194_annotator_agreement": _q_agreement,
        "q195_vocab_health": _q_vocab_health,
        "q196_mirror_hosts": _q_mirrors,
        "q197_event_transitions": _q_transitions2,
        "q198_snapshot_churn": _q_snapshot_churn,
        "q199_span_integrity": _q_span_integrity,
        "q200_ab_lift": _q_ab_lift,
        "q201_compression_quality": _q_compression,
        "q202_ks_drift": _q_ks_drift,
        "q203_bootstrap_ci": _q_bootstrap_ci,
        "q204_html_tables": _q_html_tables,
        "q111_d4_prune": _q_d4_prune,
        "q206_rr_release": _q_rr_release,
        "q207_pca_project": _q_pca,
        "q208_lang_confusion": _q_lang_confusion,
        "q209_threshold_sweep": _q_threshold_sweep,
        "q135_trim_repeats": _q_trim_repeats,
        "q211_concentration": _q_concentration,
        "q212_entity_extract": _q_entities,
        "q213_bitext_margin": _q_bitext_margin,
        "q105_simhash_pairs": _q_simhash_pairs,
        "q215_isotropy": _q_isotropy,
        "q216_cuped_lift": _q_cuped_lift,
        "q217_encoding_quality": _q_encoding_quality,
        "q218_quota_apportion": _q_quota_apportion,
        "q219_benford": _q_benford,
        "q52_normalize_text": _q_normalize_text,
        "q221_zipf_fit": _q_zipf,
        "q222_chisq_grid": _q_chisq,
        "q223_mad_outliers": _q_mad_outliers,
        "q224_pareto_frontier": _q_pareto,
        "q225_year_coverage": _q_year_coverage,
        "q226_quantile_map": _q_quantile_map,
        "q227_cocitation": _q_cocitation,
        "q228_vocab_coverage": _q_vocab_coverage,
        "q229_burstiness": _q_burstiness,
        "q230_gini": _q_gini,
        "q231_rfm_segments": _q_rfm,
        "q232_stickiness": _q_stickiness,
        "q233_rank_concordance": _q_rank_concordance,
        "q234_filter_attribution": _q_filter_attribution,
        "q235_assortativity": _q_assortativity,
        "q236_winsorized_mean": _q_winsorized_mean,
        "q237_mmr_rerank": _q_mmr,
        "q238_auc": _q_auc,
        "q239_pr_sweep": _q_pr_sweep,
        "q240_centroid_drift": _q_centroid_drift,
        "q241_daily_autocorr": _q_daily_autocorr,
        "q56_pagerank": _q_pagerank,
        "q243_ess_weights": _q_ess,
        "q244_simpson_diversity": _q_simpson,
        "q245_assoc_rules": _q_assoc_rules,
        "q246_local_clustering": _q_local_clustering,
        "q247_ndcg": _q_ndcg,
        "q248_mrr": _q_mrr,
        "q249_keep_effect_size": _q_keep_effect,
        "q250_zipf_slope": _q_zipf_slope,
        "q251_mcnemar_filters": _q_mcnemar,
        "q59_session_attribution": _q_session_attribution,
        "q253_mann_kendall": _q_mann_kendall,
        "q254_textrank": _q_textrank,
        "q255_psi_drift": _q_psi,
        "q256_conductance": _q_conductance,
        "q257_modularity": _q_modularity,
        "q75_bpe_tokenize": _q_bpe_tokenize,
        "q259_sqrt_mixture": _q_sqrt_mix,
        "q260_prf_expansion": _q_prf,
        "q261_jpeg_profile": _q_jpeg_profile,
        "q262_silhouette": _q_silhouette,
        "q263_hoover": _q_hoover,
        "q264_reencode_dedup": _q_reencode_dedup,
    }


def _minhash_sql(
    n_hashes: int = 8,
    ngram: int = 5,
    seed: int = 1,
    shingle: str = "char",
    src: str = "documents",
) -> str:
    """Shared CTE: shingles + per-doc MinHash mins.

    Twin of operators/dedup.minhash_signatures: ONE md5 per shingle parsed to
    a 60-bit int, then seeded universal-hash permutations (a·h+b mod 2^31−1)
    with the SAME coefficients.  ``shingle='word'`` mirrors the word-n-gram
    production mode (dedup._shingle_df).  ``src`` names the (doc_id, text)
    relation to shingle — a prior CTE when composing (curation v4)."""
    from document_quality_assessment_ocr_spark.operators.dedup import (
        MERSENNE31,
        minhash_coeffs,
    )

    p = MERSENNE31
    mins = ",\n               ".join(
        f"MIN(({a} * hm + {b}) % {p}) AS h{i:02d}"
        for i, (a, b) in enumerate(minhash_coeffs(n_hashes, seed))
    )
    if shingle == "word":
        gram_ctes = f"""
        WITH norm AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                       TRIM(LOWER(COALESCE(text,''))), '{WS}+'),
                       x -> x <> '') AS tk
            FROM {src}
        ), sh AS (
            SELECT doc_id,
                   ARRAY_TO_STRING(LIST_SLICE(tk, CAST(i AS INT),
                       CAST(i AS INT) + {ngram - 1}), ' ') AS g
            FROM (SELECT doc_id, tk,
                         UNNEST(RANGE(1, GREATEST(LEN(tk) - {ngram - 1}, 0) + 1)) AS i
                  FROM norm)
        )"""
    else:
        gram_ctes = f"""
        WITH norm AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   REGEXP_REPLACE(LOWER(COALESCE(text,'')), '{WS}+', ' ', 'g') AS t
            FROM {src}
        ), sh AS (
            SELECT doc_id, SUBSTR(t, CAST(i AS INT), {ngram}) AS g
            FROM (SELECT doc_id, t,
                         UNNEST(RANGE(1, GREATEST(LENGTH(t) - {ngram - 1}, 0) + 1)) AS i
                  FROM norm)
        )"""
    return gram_ctes + f""", shh AS (
            SELECT doc_id,
                   (CAST(('0x' || SUBSTR(MD5(g), 1, 15)) AS BIGINT) % {p}) AS hm
            FROM sh
        ), sig AS (
            SELECT doc_id,
               {mins}
            FROM shh GROUP BY doc_id
        )
    """


def _clusters_comp_sql() -> str:
    """Shared CTE chain for q31/q44: MinHash sig → LSH bands → candidate
    pairs → connected components (recursive CTE) ending at ``comp(did, cid)``.
    Twin of operators/dedup.duplicate_clusters."""
    return _minhash_sql(8).replace("WITH ", "WITH RECURSIVE ", 1) + """
            , bands AS (
                SELECT doc_id, 0 AS band, MD5(CONCAT_WS('#', h00, h01)) AS key FROM sig
                UNION ALL SELECT doc_id, 1, MD5(CONCAT_WS('#', h02, h03)) FROM sig
                UNION ALL SELECT doc_id, 2, MD5(CONCAT_WS('#', h04, h05)) FROM sig
                UNION ALL SELECT doc_id, 3, MD5(CONCAT_WS('#', h06, h07)) FROM sig
            ), cand AS (
                SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
            ), edges AS (
                SELECT id_a AS ea, id_b AS eb FROM cand
                UNION SELECT id_b, id_a FROM cand
            ), reach(n, m) AS (
                SELECT ea, eb FROM edges
                UNION
                SELECT r.n, e.eb FROM reach r JOIN edges e ON e.ea = r.m
                WHERE e.eb <> r.n
            ), comp AS (
                SELECT n AS did, LEAST(n, MIN(m)) AS cid FROM reach GROUP BY n
            )
    """


def _simhash_sql(bits: int = 32) -> str:
    terms = []
    for k in range(bits):
        nib = f"(STRPOS('0123456789abcdef', SUBSTR(MD5(tok), {k // 4 + 1}, 1)) - 1)"
        bit = f"(CAST(FLOOR({nib} / {2 ** (3 - k % 4)}.0) AS INT) % 2)"
        terms.append(f"SUM(CASE WHEN {bit} = 1 THEN 1 ELSE -1 END) AS s{k:02d}")
    acc = " + ".join(
        f"(CASE WHEN s{k:02d} > 0 THEN CAST({2 ** (bits - 1 - k)} AS BIGINT) ELSE 0 END)"
        for k in range(bits)
    )
    return f"""
        WITH toks AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id, tok
            FROM (SELECT doc_id,
                         UNNEST(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(COALESCE(text,''))), '{WS}+')) AS tok
                  FROM documents)
            WHERE tok <> ''
        ), sums AS (
            SELECT doc_id, {", ".join(terms)}
            FROM toks GROUP BY doc_id
        )
        SELECT doc_id, {acc} AS simhash FROM sums
    """


def _text_exprs() -> dict:
    """Shared DuckDB SQL snippets mirroring functions/text.py +
    operators/textstats.py column expressions."""
    from document_quality_assessment_ocr_spark.operators.textstats import LANG_STOPWORDS

    ink = f"LENGTH(REGEXP_REPLACE(COALESCE(text,''), '{WS}', '', 'g'))"
    ntoks = (
        f"LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(COALESCE(text,'')), '{WS}+'),"
        " x -> x <> ''))"
    )
    dens = f"(100.0 * {ink} / GREATEST(LENGTH(COALESCE(text,'')) + {ntoks}, 1))"
    ltoks = (
        f"LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(COALESCE(text,''))), '{WS}+'),"
        " x -> x <> '')"
    )
    toks = (
        f"LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(COALESCE(text,'')), '{WS}+'),"
        " x -> x <> '')"
    )
    # python list repr uses single quotes — a valid DuckDB list literal
    scores = {
        lang: f"LEN(LIST_INTERSECT({ltoks}, {list(words)!r}))"
        for lang, words in LANG_STOPWORDS.items()
    }
    best = "GREATEST(" + ", ".join(scores[l] for l in sorted(scores)) + ")"
    lang_case = "CASE "
    for lang in sorted(scores):
        lang_case += f"WHEN {scores[lang]} > 0 AND {scores[lang]} = {best} THEN '{lang}' "
    lang_case += "ELSE 'und' END"
    n_toks = f"CAST(LEN({toks}) AS BIGINT)"
    mean_wlen = f"(CAST({ink} AS DOUBLE) / CAST(GREATEST({n_toks}, 1) AS DOUBLE))"
    n = "LENGTH(COALESCE(text,''))"
    s_len = f"(CASE WHEN {n} >= 100 AND {n} <= 20000 THEN 1.0 ELSE 0.0 END)"
    s_dens = f"(CASE WHEN {dens} >= 50.0 AND {dens} <= 90.0 THEN 1.0 ELSE 0.0 END)"
    s_wlen = f"(CASE WHEN {mean_wlen} >= 2.0 AND {mean_wlen} <= 12.0 THEN 1.0 ELSE 0.0 END)"
    s_toks = f"(CASE WHEN {n_toks} >= 20 THEN 1.0 ELSE 0.0 END)"
    quality = f"(({s_len} + {s_dens} + {s_wlen} + {s_toks}) / 4.0)"
    fp = f"MD5(TRIM(REGEXP_REPLACE(LOWER(COALESCE(text,'')), '{WS}+', ' ', 'g')))"
    return {
        "ink": ink,
        "dens": dens,
        "n": n,
        "n_toks": n_toks,
        "lang_case": lang_case,
        "quality": quality,
        "fp": fp,
    }


def _doc_stats_sql() -> str:
    e = _text_exprs()
    return f"""
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST({e["n"]} AS BIGINT) AS n_chars_measured,
               {e["n_toks"]} AS n_tokens,
               {e["dens"]} AS density,
               {e["lang_case"]} AS lang_pred,
               {e["quality"]} AS quality
        FROM documents
    """


def _curation_sql() -> str:
    """Composite curation oracle: exact dedup → density band → quality →
    language → MinHash-LSH near-dup demotion (same precedence as
    plans/curation.curate_documents)."""
    e = _text_exprs()
    return (
        _minhash_sql(8)
        + f"""
        , bands AS (
            SELECT doc_id, 0 AS band, MD5(CONCAT_WS('#', h00, h01)) AS key FROM sig
            UNION ALL SELECT doc_id, 1, MD5(CONCAT_WS('#', h02, h03)) FROM sig
            UNION ALL SELECT doc_id, 2, MD5(CONCAT_WS('#', h04, h05)) FROM sig
            UNION ALL SELECT doc_id, 3, MD5(CONCAT_WS('#', h06, h07)) FROM sig
        ), demoted AS (
            SELECT DISTINCT b.doc_id
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
        ), fp AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id, {e["fp"]} AS fpv, text
            FROM documents
        ), keepers AS (
            SELECT fpv, MIN(doc_id) AS keep_id FROM fp GROUP BY fpv
        ), flags AS (
            SELECT f.doc_id, f.text,
                   (f.doc_id = k.keep_id) AS is_first,
                   (d.doc_id IS NOT NULL) AS near_dup
            FROM fp f
            JOIN keepers k USING (fpv)
            LEFT JOIN demoted d ON d.doc_id = f.doc_id
        )
        SELECT doc_id,
               (reason = '') AS kept,
               reason AS drop_reason
        FROM (
            SELECT doc_id,
                   CASE WHEN NOT is_first THEN 'exact_duplicate'
                        WHEN {e["dens"]} < 1.0 OR {e["dens"]} > 80.0 THEN 'density'
                        WHEN {e["quality"]} < 0.5 THEN 'quality'
                        WHEN {e["lang_case"]} NOT IN ('en') THEN 'language'
                        WHEN near_dup THEN 'near_duplicate'
                        ELSE '' END AS reason
            FROM flags
        )
    """
    )


def _bucket_sql(n_planes: int, dim: int, seed: int = 42) -> str:
    """Hyperplane bucket expression with the SAME seeded plane matrix as the
    Spark operator, embedded as list literals (column ``v``)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    terms = []
    for p in range(n_planes):
        lit = "[" + ", ".join(repr(float(x)) for x in planes[p]) + "]"
        terms.append(
            f"(CASE WHEN LIST_DOT_PRODUCT(v, {lit}) > 0 THEN {2 ** p} ELSE 0 END)"
        )
    return " + ".join(terms)


def _lsh_topk_sql(
    n_planes: int = 6,
    dim: int = 64,
    k: int = 5,
    seed: int = 42,
    multiprobe_bits: int = 0,
) -> str:
    bucket = _bucket_sql(n_planes, dim, seed)
    pm = "SELECT probe_id, pv, pb FROM p"
    for i in range(min(multiprobe_bits, n_planes)):
        pm += (
            f"\n            UNION ALL SELECT probe_id, pv,"
            f" xor(pb, CAST({1 << i} AS BIGINT)) FROM p"
        )
    return f"""
        WITH e AS (
            SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ), b AS (
            SELECT vec_id, v, {bucket} AS bucket FROM e
        ), p AS (
            SELECT vec_id AS probe_id, v AS pv, bucket AS pb FROM b WHERE vec_id IN (0,1,2)
        ), pm AS (
            {pm}
        ), s AS (
            SELECT DISTINCT probe_id, b.vec_id AS neighbor_id,
                   ROUND(LIST_DOT_PRODUCT(pv, v)
                         / SQRT(LIST_DOT_PRODUCT(pv, pv) * LIST_DOT_PRODUCT(v, v)), 6) AS cos
            FROM pm JOIN b ON b.bucket = pm.pb AND b.vec_id <> pm.probe_id
        )
        SELECT probe_id, neighbor_id, cos, CAST(rank AS INT) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                           ORDER BY cos DESC, neighbor_id ASC) AS rank
              FROM s)
        WHERE rank <= {k}
    """


def _ivf_sql(
    sf_dir: str | None = None,
    n_centroids: int = 8,
    n_probe: int = 2,
    k: int = 5,
    sample_rows: int = 512,
    seed: int = 42,
) -> str:
    """IVF top-k oracle: recomputes the SAME deterministic k-means centroids
    (seeded, sample = first ``sample_rows`` by vec_id) the Spark operator
    trains, embedded as literals. The driver's correctness run uses sf0.01 —
    centroids are generated for that table."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from document_quality_assessment_ocr_spark.operators.similarity import _kmeans_lite

    # the driver's correctness harness runs at sf0.01; override for local
    # testing at another scale with SPARK_GRAFT_ORACLE_SF
    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.array(tbl.column("vec_id"))
    vecs = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    sample = vecs[order[:sample_rows]]
    cents = _kmeans_lite(sample, n_centroids, seed=seed)
    dists = ", ".join(
        "(-2.0 * LIST_DOT_PRODUCT(v, ["
        + ", ".join(repr(float(x)) for x in c)
        + f"]) + {float((c * c).sum())!r})"
        for c in cents
    )
    cell = f"(LIST_INDEXOF([{dists}], LIST_MIN([{dists}])) - 1)"
    # probe cells mirror the Spark driver-side n_probe-nearest computation
    by_id = {int(i): vecs[j] for j, i in enumerate(ids)}
    probes = []
    for pid in (0, 1, 2):
        order_c = np.argsort(((cents - by_id[pid]) ** 2).sum(1))[:n_probe]
        probes += [f"({pid}, {int(c)})" for c in order_c]
    return f"""
        WITH e AS (
            SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ), assigned AS (
            SELECT vec_id, v, {cell} AS cell FROM e
        ), probe_cells(probe_id, cell) AS (VALUES {", ".join(probes)}),
        p AS (
            SELECT pc.probe_id, e.v AS pv, pc.cell
            FROM probe_cells pc JOIN e ON e.vec_id = pc.probe_id
        ), s AS (
            SELECT p.probe_id, a.vec_id AS neighbor_id,
                   ROUND(LIST_DOT_PRODUCT(pv, a.v)
                         / SQRT(LIST_DOT_PRODUCT(pv, pv) * LIST_DOT_PRODUCT(a.v, a.v)), 6) AS cos
            FROM p JOIN assigned a ON a.cell = p.cell AND a.vec_id <> p.probe_id
        )
        SELECT probe_id, neighbor_id, cos, CAST(rank AS INT) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                           ORDER BY cos DESC, neighbor_id ASC) AS rank
              FROM s)
        WHERE rank <= {k}
    """


def _fmt2_sql(x: str) -> str:
    """Java-exact ``format_string('%.2f', …)`` in DuckDB: double → VARCHAR is
    the shortest decimal repr (same digits Java's Formatter starts from),
    re-parsed as DECIMAL and rounded half-up — reproduces the engine's reason
    strings byte-for-byte (python f-strings round half-even on the binary
    value and disagree on 0.125-style doubles; see oracle._fmt)."""
    return (
        f"CAST(CAST(ROUND(CAST(CAST({x} AS VARCHAR) AS DECIMAL(38,17)), 2)"
        " AS DECIMAL(38,2)) AS VARCHAR)"
    )


def _md5_pick_sql(salt: int, npay: int) -> str:
    """0-based payload index — byte-identical twin of
    ``sources.derive._md5_pick_index`` (first 6 md5 hex nibbles → int)."""
    h = f"MD5(CAST(doc_id AS VARCHAR) || '|{salt}')"
    terms = " + ".join(
        f"(STRPOS('0123456789abcdef', SUBSTR({h}, {i}, 1)) - 1) * {16 ** (6 - i)}"
        for i in range(1, 7)
    )
    return f"(({terms}) % {npay})"


def _payload_scores_cte(_cache={}) -> tuple[list[str], str]:
    """Sorted payload names + a VALUES CTE embedding the seeded catalog's
    kernel scores as literals (the q17 centroid-literal technique): the
    catalog is tiny and deterministic, so the oracle carries the exact
    float64 scores the engine's pandas UDF computes, and the fold/gating
    become plain SQL. Memoized — three flagship oracles share one scoring
    pass."""
    if "v" in _cache:
        return _cache["v"]
    from document_quality_assessment_ocr_spark.config import default_criteria
    from document_quality_assessment_ocr_spark.oracle import score_payloads
    from document_quality_assessment_ocr_spark.sources.fixtures import build_payloads

    pl = build_payloads(seed=42, size=(800, 1000))
    scored = score_payloads(pl)
    names = sorted(scored)
    crit = {c.name: c for c in default_criteria()}
    min_var = float(crit["blur"].threshold.min_variance)
    max_deg = float(crit["skew"].threshold.max_deg)
    max_noise = float(crit["noise"].threshold.max_percent)
    rows = []
    for n in names:
        p = scored[n]
        if p["error"] is not None:
            err = p["error"].replace("'", "''")
            rows.append(
                f"('{n}', '{err}', FALSE, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,"
                f" {float(p['dpi'])!r}, 0.0)"
            )
            continue
        sc = p["scores"]
        surv = (
            sc["lap_var"] >= min_var
            and abs(sc["skew_deg"]) <= max_deg
            and sc["noise_pct"] <= max_noise
        )
        rows.append(
            "('{}', NULL, {}, {!r}, {!r}, {!r}, {!r}, {!r}, {!r}, {!r}, {!r}, {!r})".format(
                n,
                "TRUE" if surv else "FALSE",
                float(sc["content_ratio"]),
                float(sc["brightness"]),
                float(sc["lap_var"]),
                float(abs(sc["skew_deg"])),
                float(sc["watermark"]),
                float(sc["noise_pct"]),
                float(sc["entropy"]),
                float(p["dpi"]),
                float(p["est"]),
            )
        )
    cte = (
        "scores(media_ref, err, survives, content_ratio, brightness, lap_var,"
        " abs_skew, watermark, noise_pct, entropy, p_dpi, est_dpi) AS (VALUES\n            "
        + ",\n            ".join(rows)
        + ")"
    )
    _cache["v"] = (names, cte)
    return names, cte


def _dens_sql(col: str) -> str:
    """text_density over an arbitrary (non-null) string expression — same
    operation order as functions/text.text_density."""
    ink = f"LENGTH(REGEXP_REPLACE({col}, '{WS}', '', 'g'))"
    ntoks = (
        f"LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM({col}), '{WS}+'),"
        " x -> x <> ''))"
    )
    return f"(100.0 * {ink} / GREATEST(LENGTH({col}) + {ntoks}, 1))"


def _extract_oracle_cte() -> str:
    """Shared WITH-body reproducing the flagship pipeline over the DERIVED
    spans corpus: derivation (md5 picks + text thirds), verdict fold in
    config order, and span gating — pure SQL over the score literals.

    The derived corpus has a fixed 5-span shape (c1@0, m1@third, c2@third+1,
    m2@2·third, c3@2·third+1), so page order is always (ref1, ref2) and the
    surviving-text order is always (c1, c2, c3) — no explicit sort needed."""
    names, scores_cte = _payload_scores_cte()
    names_lit = "[" + ", ".join(f"'{n}'" for n in names) + "]"
    d1, d2, d3 = _dens_sql("c1"), _dens_sql("c2"), _dens_sql("c3")
    fmt = _fmt2_sql
    return f"""
        WITH {scores_cte},
        base AS (
            SELECT CAST(doc_id AS VARCHAR) AS doc_id,
                   COALESCE(text, '') AS t,
                   GREATEST(CAST(FLOOR(LENGTH(COALESCE(text, '')) / 3.0) AS INT), 1) AS third
            FROM documents
        ), picks AS (
            SELECT doc_id, t, third,
                   SUBSTR(t, 1, third) AS c1,
                   SUBSTR(t, third + 1, third) AS c2,
                   SUBSTR(t, 2 * third + 1, LENGTH(t)) AS c3,
                   LIST_EXTRACT({names_lit}, {_md5_pick_sql(1, len(names))} + 1) AS ref1,
                   LIST_EXTRACT({names_lit}, {_md5_pick_sql(2, len(names))} + 1) AS ref2
            FROM base
        ), j AS (
            SELECT p.doc_id, p.c1, p.c2, p.c3,
                   COALESCE(s1.err, s2.err) AS err,
                   s1.survives AS surv1, s2.survives AS surv2,
                   (s1.content_ratio + s2.content_ratio) / 2.0 AS avg_ratio,
                   LEAST(s1.content_ratio, s2.content_ratio) AS min_ratio,
                   (s1.brightness + s2.brightness) / 2.0 AS avg_bright,
                   LEAST(s1.lap_var, s2.lap_var) AS min_lap,
                   GREATEST(s1.abs_skew, s2.abs_skew) AS max_abs_skew,
                   GREATEST(s1.watermark, s2.watermark) AS max_wm,
                   GREATEST(s1.noise_pct, s2.noise_pct) AS max_noise,
                   LEAST(s1.entropy, s2.entropy) AS min_ent,
                   LEAST(s1.p_dpi, s2.p_dpi) AS min_dpi,
                   s1.est_dpi AS est1
            FROM picks p
            JOIN scores s1 ON s1.media_ref = p.ref1
            JOIN scores s2 ON s2.media_ref = p.ref2
        ), v AS (
            SELECT doc_id, err, surv1, surv2,
                   CASE
                     WHEN err IS NOT NULL
                       THEN 'Critical error during evaluation: ' || err
                     WHEN max_abs_skew > 5.0 THEN 'Skew angle too large'
                     WHEN NOT (avg_ratio >= 1.0 AND avg_ratio <= 80.0)
                       THEN 'Text density out of range (' || {fmt("avg_ratio")} || '%)'
                     WHEN NOT (avg_ratio < 1.0) AND min_dpi < 72.0 AND est1 < 72.0
                       THEN 'Resolution too low (metadata_dpi: ' || {fmt("min_dpi")}
                            || ', estimated_dpi: ' || {fmt("est1")} || ')'
                     WHEN NOT (avg_bright >= 50.0 AND avg_bright <= 250.0)
                       THEN 'Brightness out of range'
                     WHEN min_lap < 50.0
                       THEN 'Image too blurry (variance: ' || {fmt("min_lap")} || ')'
                     WHEN max_noise > 15.0
                       THEN 'Noise level too high (max: ' || {fmt("max_noise")} || '%)'
                     WHEN max_wm > 10.0
                       THEN 'Watermark interference too high (FFT score: ' || {fmt("max_wm")} || ')'
                     WHEN min_ent < 0.2
                       THEN 'Compression artifact detected (min_entropy: ' || {fmt("min_ent")} || ')'
                     WHEN min_ratio < 1.0
                       THEN 'Page may be missing or blank (content ratio: ' || {fmt("min_ratio")} || '%)'
                     ELSE '' END AS reason,
                   CASE WHEN LENGTH(c1) > 0 AND {d1} >= 1.0 AND {d1} <= 80.0 THEN c1 END AS k1,
                   CASE WHEN LENGTH(c2) > 0 AND {d2} >= 1.0 AND {d2} <= 80.0 THEN c2 END AS k2,
                   CASE WHEN LENGTH(c3) > 0 AND {d3} >= 1.0 AND {d3} <= 80.0 THEN c3 END AS k3
            FROM j
        )
    """


def _extract_full_sql() -> str:
    return (
        _extract_oracle_cte()
        + """
        SELECT doc_id,
               (err IS NULL AND reason = '') AS accepted,
               reason AS reasons,
               CAST(CASE WHEN err IS NOT NULL THEN 0 ELSE
                    (CASE WHEN k1 IS NOT NULL THEN 1 ELSE 0 END)
                  + (CASE WHEN k2 IS NOT NULL THEN 1 ELSE 0 END)
                  + (CASE WHEN k3 IS NOT NULL THEN 1 ELSE 0 END)
                  + (CASE WHEN surv1 THEN 1 ELSE 0 END)
                  + (CASE WHEN surv2 THEN 1 ELSE 0 END) END AS INT) AS n_kept
        FROM v
    """
    )


def _extract_metrics_sql() -> str:
    return (
        _extract_oracle_cte()
        + """
        SELECT reason, COUNT(*) AS n FROM v WHERE reason <> '' GROUP BY reason
    """
    )


def _main_content_sql() -> str:
    return (
        _extract_oracle_cte()
        + """
        SELECT doc_id, accepted, main_text,
               CAST(LENGTH(main_text) AS INT) AS n_chars,
               n_media_kept
        FROM (
            SELECT doc_id,
                   (err IS NULL AND reason = '') AS accepted,
                   CASE WHEN err IS NOT NULL THEN ''
                        ELSE ARRAY_TO_STRING(
                               LIST_FILTER([k1, k2, k3], x -> x IS NOT NULL),
                               CHR(10)) END AS main_text,
                   CAST(CASE WHEN err IS NOT NULL THEN 0 ELSE
                        (CASE WHEN surv1 THEN 1 ELSE 0 END)
                      + (CASE WHEN surv2 THEN 1 ELSE 0 END) END AS INT) AS n_media_kept
            FROM v
        )
    """
    )


def _bpe_sql() -> str:
    """Twin of functions/text.token_count_bpe — identical pattern; DuckDB
    single-quoted literals pass backslashes through to RE2 unmodified, so
    only the apostrophe needs escaping."""
    from document_quality_assessment_ocr_spark.functions.text import BPE_PATTERN

    pat = BPE_PATTERN.replace("'", "''")
    return f"""
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(LEN(REGEXP_EXTRACT_ALL(COALESCE(text,''), '{pat}')) AS BIGINT)
                   AS n_bpe_tokens
        FROM documents
    """


def _nib_sql(h: str, i: int) -> str:
    """0-based value of the i-th (1-based) hex char of ``h`` — the DuckDB
    twin of operators.sketches._nibble / sources.derive nibble arithmetic."""
    return f"(STRPOS('0123456789abcdef', SUBSTR({h}, {i}, 1)) - 1)"


def _md5_u32_sql(h: str, start: int = 1) -> str:
    """Unsigned 32-bit int from 8 hex chars of ``h`` starting at ``start`` —
    byte-identical twin of Spark's CONV(SUBSTRING(h, start, 8), 16, 10)."""
    terms = " + ".join(
        f"{_nib_sql(h, start + j)} * {16 ** (7 - j)}" for j in range(8)
    )
    return f"({terms})"


def _md5_uniform_sql(id_expr: str, salt: int = 0) -> str:
    """Deterministic uniform in [0,1) — twin of operators.sampling.md5_uniform
    (first 32 md5 bits / 2^32; division by a power of two is exact)."""
    h = f"MD5(CAST({id_expr} AS VARCHAR) || '|{salt}')"
    return f"(CAST({_md5_u32_sql(h)} AS DOUBLE) / 4294967296.0)"


def _hll_sql() -> str:
    """HLL oracle: identical md5 register/rho arithmetic as
    operators.sketches (m=256, p=8); BIN() renders minimal-width on both
    engines so the leading-zero count is LENGTH-based on both."""
    from document_quality_assessment_ocr_spark.operators.sketches import ALPHA_M, M

    h = "hh"
    reg = f"({_nib_sql(h, 1)} * 16 + {_nib_sql(h, 2)})"
    v = _md5_u32_sql(h, 3)
    num = repr(ALPHA_M * M * M)
    return f"""
        WITH src AS (
            SELECT event_type, CAST(user_id AS BIGINT) AS user_id,
                   MD5(CAST(CAST(user_id AS BIGINT) AS VARCHAR)) AS hh
            FROM events
        ), rr AS (
            SELECT event_type, user_id, {reg} AS reg, {v} AS v FROM src
        ), rt AS (
            SELECT event_type, user_id, reg,
                   CASE WHEN v = 0 THEN 33
                        ELSE 33 - LENGTH(LTRIM(BIN(v), '0')) END AS rho
            FROM rr
        ), per_reg AS (
            SELECT event_type, reg, MAX(rho) AS max_rho,
                   COUNT(DISTINCT user_id) AS n_items
            FROM rt GROUP BY 1, 2
        )
        SELECT event_type,
               CAST(COUNT(*) AS INT) AS n_hit_registers,
               CAST({M} - COUNT(*) AS INT) AS n_zero_registers,
               SUM(POWER(2.0, -max_rho)) + CAST({M} - COUNT(*) AS DOUBLE)
                   AS harmonic_sum,
               {num} / (SUM(POWER(2.0, -max_rho)) + CAST({M} - COUNT(*) AS DOUBLE))
                   AS raw_estimate,
               CAST(SUM(n_items) AS BIGINT) AS exact_distinct
        FROM per_reg GROUP BY 1
    """


def _repetition_sql() -> str:
    toks = (
        f"LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(t)), '{WS}+'),"
        " x -> x <> '')"
    )
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id, COALESCE(text,'') AS t
            FROM documents
        ), lines0 AS (
            SELECT doc_id,
                   UNNEST(LIST_FILTER(STRING_SPLIT(t, CHR(10)), x -> x <> '')) AS line
            FROM d
        ), lcnt AS (
            SELECT doc_id, line, COUNT(*) AS c, LENGTH(line) AS len
            FROM lines0 GROUP BY 1, 2
        ), lstat AS (
            SELECT doc_id,
                   CAST(SUM(c) AS INT) AS n_lines,
                   1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
                       AS dup_line_frac,
                   CASE WHEN SUM(c * len) = 0 THEN 0.0
                        ELSE CAST(COALESCE(SUM(CASE WHEN c > 1 THEN c * len END), 0) AS DOUBLE)
                             / CAST(SUM(c * len) AS DOUBLE) END AS dup_line_char_frac
            FROM lcnt GROUP BY 1
        ), tk AS (
            SELECT doc_id, {toks} AS a FROM d
        ), grams0 AS (
            SELECT doc_id,
                   a[CAST(i AS INT)] || ' ' || a[CAST(i AS INT) + 1] AS gram
            FROM (SELECT doc_id, a,
                         UNNEST(RANGE(1, GREATEST(LEN(a) - 1, 0) + 1)) AS i
                  FROM tk)
        ), gcnt AS (
            SELECT doc_id, gram, COUNT(*) AS cnt FROM grams0 GROUP BY 1, 2
        ), gagg AS (
            SELECT doc_id,
                   COALESCE(SUM(CASE WHEN cnt > 1 THEN cnt * LENGTH(gram) END), 0) AS dup_chars,
                   COALESCE(SUM(cnt * LENGTH(gram)), 0) AS all_chars
            FROM gcnt GROUP BY 1
        ), gtop AS (
            SELECT doc_id, gram, cnt FROM (
                SELECT doc_id, gram, cnt,
                       ROW_NUMBER() OVER (PARTITION BY doc_id
                                          ORDER BY cnt DESC, gram ASC) AS rn
                FROM gcnt) WHERE rn = 1
        )
        SELECT d.doc_id,
               COALESCE(lstat.n_lines, 0) AS n_lines,
               COALESCE(lstat.dup_line_frac, 0.0) AS dup_line_frac,
               COALESCE(lstat.dup_line_char_frac, 0.0) AS dup_line_char_frac,
               gtop.gram AS top_gram,
               CAST(COALESCE(gtop.cnt, 0) AS BIGINT) AS top_cnt,
               CASE WHEN COALESCE(gagg.all_chars, 0) = 0 THEN 0.0
                    ELSE CAST(gagg.dup_chars AS DOUBLE) / CAST(gagg.all_chars AS DOUBLE)
               END AS dup_gram_char_frac
        FROM d
        LEFT JOIN lstat USING (doc_id)
        LEFT JOIN gagg USING (doc_id)
        LEFT JOIN gtop USING (doc_id)
    """


def _decontam_sql() -> str:
    toks = (
        f"LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(COALESCE(text,''))), '{WS}+'),"
        " x -> x <> '')"
    )
    gram5 = " || ' ' || ".join(f"a[CAST(i AS INT) + {j}]" for j in range(5))
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id, {toks} AS a FROM documents
        ), sh AS (
            SELECT DISTINCT doc_id, MD5({gram5}) AS shingle
            FROM (SELECT doc_id, a,
                         UNNEST(RANGE(1, GREATEST(LEN(a) - 4, 0) + 1)) AS i
                  FROM d)
        ), ev AS (
            SELECT DISTINCT shingle FROM sh WHERE doc_id % 89 = 0
        )
        SELECT s.doc_id, COUNT(*) AS n_shared_shingles
        FROM sh s JOIN ev USING (shingle)
        WHERE s.doc_id % 89 <> 0
        GROUP BY 1
    """


def _pq_sql(
    sf_dir: str | None = None,
    dim: int = 64,
    m: int = 4,
    ks: int = 16,
    k: int = 5,
    sample_rows: int = 512,
    seed: int = 42,
    probe_ids: tuple = (0, 1, 2),
    refine: bool = False,
    final_k: int = 5,
) -> str:
    """PQ top-k oracle: recomputes the SAME per-subspace seeded codebooks the
    Spark operator trains (sample = first ``sample_rows`` by vec_id), encodes
    in SQL with identical argmin expressions, and embeds each probe's L2²
    lookup table as list literals — float operation order matches the engine
    exactly (q17 centroid-literal technique)."""
    import numpy as np
    import pyarrow.parquet as pq

    from document_quality_assessment_ocr_spark.operators.similarity import pq_codebooks

    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.array(tbl.column("vec_id"))
    vecs = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    sample = vecs[order[:sample_rows]]
    books = pq_codebooks(sample, m, ks, seed)
    sub = dim // m

    codes = []
    for j in range(m):
        sl = f"LIST_SLICE(v, {j * sub + 1}, {(j + 1) * sub})"
        dists = ", ".join(
            f"(-2.0 * LIST_DOT_PRODUCT({sl}, ["
            + ", ".join(repr(float(x)) for x in c)
            + f"]) + {float((c * c).sum())!r})"
            for c in books[j]
        )
        codes.append(
            f"(LIST_INDEXOF([{dists}], LIST_MIN([{dists}])) - 1) AS c{j}"
        )

    by_id = {int(i): vecs[idx] for idx, i in enumerate(ids)}
    parts = []
    for pid in probe_ids:
        v = by_id[pid]
        terms = []
        for j in range(m):
            lut = ", ".join(
                repr(float(x))
                for x in ((books[j] - v[j * sub : (j + 1) * sub]) ** 2).sum(1)
            )
            terms.append(f"([{lut}])[c{j} + 1]")
        parts.append(
            f"SELECT {pid} AS probe_id, vec_id AS neighbor_id, "
            f"ROUND({' + '.join(terms)}, 6) AS approx_dist "
            f"FROM enc WHERE vec_id <> {pid}"
        )

    base = f"""
        WITH e AS (
            SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ), enc AS (
            SELECT vec_id, {", ".join(codes)} FROM e
        ), scored AS (
            {" UNION ALL ".join(parts)}
        ), adc AS (
            SELECT probe_id, neighbor_id, approx_dist, CAST(rank AS INT) AS rank
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                               ORDER BY approx_dist ASC, neighbor_id ASC) AS rank
                  FROM scored)
            WHERE rank <= {k}
        )"""
    if not refine:
        return base + "\n        SELECT * FROM adc"
    return (
        base
        + f"""
        , ex AS (
            SELECT a.probe_id, a.neighbor_id,
                   ROUND(LIST_DOT_PRODUCT(p.v, n.v)
                         / SQRT(LIST_DOT_PRODUCT(p.v, p.v)
                                * LIST_DOT_PRODUCT(n.v, n.v)), 6) AS cos
            FROM adc a
            JOIN e p ON p.vec_id = a.probe_id
            JOIN e n ON n.vec_id = a.neighbor_id
        )
        SELECT probe_id, neighbor_id, cos, CAST(rank AS INT) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                           ORDER BY cos DESC, neighbor_id ASC) AS rank
              FROM ex)
        WHERE rank <= {final_k}
    """
    )


def _rp_sql(dim: int = 64, out_dim: int = 8, seed: int = 42) -> str:
    """JL-projection oracle: the SAME seeded Gaussian matrix as literals;
    LIST_DOT_PRODUCT's sequential fold matches the engine's zip_with
    aggregate (multiplication commutes exactly in IEEE)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    R = rng.standard_normal((out_dim, dim)) / np.sqrt(out_dim)
    cols = ", ".join(
        "ROUND(LIST_DOT_PRODUCT(v, ["
        + ", ".join(repr(float(x)) for x in R[j])
        + f"]), 6) AS p{j:02d}"
        for j in range(out_dim)
    )
    return f"""
        WITH e AS (
            SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        )
        SELECT vec_id, {cols} FROM e
    """


_SQ_DIFF = "LIST_TRANSFORM(v, x -> x - FLOOR(x / s + 0.5) * s)"

_SQ_INT8_SQL = f"""
    WITH e AS (
        SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings
    ), sc AS (
        SELECT vec_id, v,
               LIST_MAX(LIST_TRANSFORM(v, x -> ABS(x))) / 127.0 AS s
        FROM e
    )
    SELECT vec_id,
           ROUND(s, 9) AS scale,
           CAST(CASE WHEN s = 0 THEN 0
                ELSE LIST_MAX(LIST_TRANSFORM(v,
                         x -> ABS(CAST(FLOOR(x / s + 0.5) AS INT))))
                END AS INT) AS max_code,
           CASE WHEN s = 0 THEN 0.0
                ELSE ROUND(SQRT(LIST_DOT_PRODUCT({_SQ_DIFF}, {_SQ_DIFF})), 6)
                END AS recon_err
    FROM sc
"""


def _pr_unrolled_ctes(iters: int) -> tuple[list[str], str]:
    """Fixed-point PageRank iterations as CTE text over generic
    ``edges(src,dst)`` / ``nodes(id)`` / ``deg(src,outdeg)`` / ``r0`` —
    shared by the q56 (doc near-dup graph) and q131 (host link graph)
    oracles; BIGINT `//` on non-negatives matches Spark's DIV exactly."""
    its = []
    prev = "r0"
    for i in range(1, iters + 1):
        its.append(f"""
            s{i} AS (
                SELECT e.dst AS id, SUM(r.pr // d.outdeg) AS m
                FROM edges e
                JOIN {prev} r ON r.id = e.src
                JOIN deg d ON d.src = e.src
                GROUP BY 1
            ), r{i} AS (
                SELECT n.id,
                       CAST(150000000 + (85 * COALESCE(s.m, 0)) // 100 AS BIGINT) AS pr
                FROM nodes n LEFT JOIN s{i} s USING (id)
            )""")
        prev = f"r{i}"
    return its, prev


def _pagerank_sql(iters: int = 3) -> str:
    """q56 oracle: the same LSH pair graph (q10 SQL), PageRank unrolled
    ``iters`` times in fixed-point BIGINT arithmetic — `//` floor division
    on non-negatives matches Spark's DIV exactly."""
    its, prev = _pr_unrolled_ctes(iters)
    return (
        _minhash_sql(8)
        + f"""
            , bands AS (
                SELECT doc_id, 0 AS band, MD5(CONCAT_WS('#', h00, h01)) AS key FROM sig
                UNION ALL SELECT doc_id, 1, MD5(CONCAT_WS('#', h02, h03)) FROM sig
                UNION ALL SELECT doc_id, 2, MD5(CONCAT_WS('#', h04, h05)) FROM sig
                UNION ALL SELECT doc_id, 3, MD5(CONCAT_WS('#', h06, h07)) FROM sig
            ), pairs AS (
                SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
            ), edges AS (
                SELECT id_a AS src, id_b AS dst FROM pairs
                UNION ALL SELECT id_b, id_a FROM pairs
            ), nodes AS (
                SELECT CAST(doc_id AS BIGINT) AS id FROM documents
            ), deg AS (
                SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY 1
            ), r0 AS (
                SELECT id, CAST(1000000000 AS BIGINT) AS pr FROM nodes
            ), {", ".join(its)}
            SELECT id AS doc_id, pr FROM {prev}
        """
    )


def _phash_sql() -> str:
    """q57 oracle: the seeded payload catalog's average-hashes as literals
    (computed by the SAME ahash64 the engine's mapInPandas calls),
    derived media picks via the md5-nibble twin, pair join in SQL.
    Undecodable payloads have no row — matching the engine's error-row
    exclusion."""
    from document_quality_assessment_ocr_spark import png as _png
    from document_quality_assessment_ocr_spark.operators.multimodal import ahash_hex
    from document_quality_assessment_ocr_spark.sources.fixtures import (
        build_payloads,
        payload_names,
    )

    pl = build_payloads(seed=42, size=(800, 1000))
    names = sorted(payload_names())
    vals = []
    for n in names:
        try:
            arr, _ = _png.decode_gray(bytes(pl[n]["png"]))
            vals.append(f"('{n}', '{ahash_hex(arr)}')")
        except Exception:
            pass  # engine emits an error row with NULL phash — excluded
    names_lit = "[" + ", ".join(f"'{n}'" for n in names) + "]"
    return f"""
        WITH ph(media_ref, phash) AS (VALUES {", ".join(vals)}),
        picks AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   LIST_EXTRACT({names_lit}, {_md5_pick_sql(1, len(names))} + 1) AS r1,
                   LIST_EXTRACT({names_lit}, {_md5_pick_sql(2, len(names))} + 1) AS r2
            FROM documents
        ), m AS (
            SELECT doc_id, r1 AS media_ref FROM picks
            UNION ALL SELECT doc_id, r2 FROM picks
        ), dp AS (
            SELECT DISTINCT m.doc_id, ph.phash
            FROM m JOIN ph ON m.media_ref = ph.media_ref
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.phash
        FROM dp a JOIN dp b ON a.phash = b.phash AND a.doc_id < b.doc_id
    """


def _audio_rms_sql(frame: int = 512) -> str:
    """q137 oracle: the seeded WAV catalog's per-frame RMS as literals
    (computed by the SAME wav_frame_rms_values the engine's mapInPandas
    calls — float ops identical by construction), derived media picks via
    the md5-nibble twin. The corrupt container has no rows — matching the
    engine's undecodable-payload exclusion."""
    from document_quality_assessment_ocr_spark.operators.multimodal import (
        wav_frame_rms_values,
    )
    from document_quality_assessment_ocr_spark.sources.fixtures import (
        build_wav_payloads,
        wav_payload_names,
    )

    cat = build_wav_payloads()
    names = sorted(wav_payload_names())
    vals = []
    for n in names:
        try:
            rms = wav_frame_rms_values(cat[n], frame)
        except Exception:
            continue  # engine emits no rows for undecodable payloads
        for i, v in enumerate(rms):
            # exponent form: DuckDB lexes plain decimal literals as
            # DECIMAL(17,16) first (1-ulp drift vs the double); 17 sig
            # digits + exponent parses straight to the exact DOUBLE
            vals.append(f"('{n}', {i}, {v:.17e})")
    names_lit = "[" + ", ".join(f"'{n}'" for n in names) + "]"
    return f"""
        WITH fr(media_ref, frame_idx, rms) AS (VALUES {", ".join(vals)}),
        picks AS (
            SELECT DISTINCT doc_id, media_ref FROM (
                SELECT CAST(doc_id AS BIGINT) AS doc_id,
                       LIST_EXTRACT({names_lit}, {_md5_pick_sql(1, len(names))} + 1) AS media_ref
                FROM documents
                UNION ALL
                SELECT CAST(doc_id AS BIGINT),
                       LIST_EXTRACT({names_lit}, {_md5_pick_sql(2, len(names))} + 1)
                FROM documents)
        )
        SELECT p.doc_id, p.media_ref, fr.frame_idx, fr.rms
        FROM picks p JOIN fr USING (media_ref)
    """


def _video_frames_sql(every_k: int = 5, max_frames: int = 8) -> str:
    """q138 oracle: the seeded Y4M catalog's stride-sampled frame stats as
    literals (computed by the SAME video_frame_stats_values the engine's
    mapInPandas calls — float ops identical by construction), derived media
    picks via the md5-nibble twin at salts 3/4. The corrupt container has
    no rows — matching the q137 undecodable-payload convention."""
    from document_quality_assessment_ocr_spark.operators.multimodal import (
        video_frame_stats_values,
    )
    from document_quality_assessment_ocr_spark.sources.fixtures import (
        build_y4m_payloads,
        y4m_payload_names,
    )

    cat = build_y4m_payloads()
    names = sorted(y4m_payload_names())
    vals = []
    for n in names:
        try:
            stats = video_frame_stats_values(cat[n], every_k, max_frames)
        except Exception:
            continue  # engine query filters error rows (no-rows convention)
        for i, w, h, mg in stats:
            # exponent form for the double literal (DuckDB DECIMAL-lexing trap)
            vals.append(f"('{n}', {i}, {w}, {h}, {mg:.17e})")
    names_lit = "[" + ", ".join(f"'{n}'" for n in names) + "]"
    return f"""
        WITH fr(media_ref, frame_idx, width, height, mean_gray) AS (VALUES {", ".join(vals)}),
        picks AS (
            SELECT DISTINCT doc_id, media_ref FROM (
                SELECT CAST(doc_id AS BIGINT) AS doc_id,
                       LIST_EXTRACT({names_lit}, {_md5_pick_sql(3, len(names))} + 1) AS media_ref
                FROM documents
                UNION ALL
                SELECT CAST(doc_id AS BIGINT),
                       LIST_EXTRACT({names_lit}, {_md5_pick_sql(4, len(names))} + 1)
                FROM documents)
        )
        SELECT p.doc_id, p.media_ref, fr.frame_idx, fr.width, fr.height, fr.mean_gray
        FROM picks p JOIN fr USING (media_ref)
    """


def _curation_v3_sql(max_boiler_frac: float = 0.7, min_tokens: int = 10) -> str:
    """q79 oracle: the whole web pipeline in one SQL chain — shared HTML
    block CTEs (q62/q63 twins) → scrub constants → token/boiler gates →
    first-wins dedup among gate survivors."""
    from document_quality_assessment_ocr_spark.operators.scrub import (
        CONTROLS,
        MULTI_SPACE,
        ZERO_WIDTH,
    )

    return _html_blocks_ctes() + f""", main AS (
            SELECT doc_id,
                   COALESCE(STRING_AGG(text, CHR(10) ORDER BY block_idx)
                            FILTER (WHERE label = 'content'), '') AS main_text,
                   COUNT(*) FILTER (WHERE label = 'content') AS n_content,
                   COALESCE(SUM(n_chars) FILTER (WHERE label = 'content'), 0)
                       AS content_chars,
                   COALESCE(SUM(n_chars) FILTER (WHERE label <> 'content'), 0)
                       AS boiler_chars
            FROM blk GROUP BY doc_id
        ), cln AS (
            SELECT doc_id, n_content, content_chars, boiler_chars,
                   TRIM(REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(
                        main_text, '{ZERO_WIDTH}', '', 'g'),
                        '{CONTROLS}', '', 'g'),
                        '{MULTI_SPACE}', ' ', 'g')) AS clean_text
            FROM main
        ), sig0 AS (
            SELECT doc_id, n_content, clean_text,
                   CAST(LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                        TRIM(COALESCE(clean_text,'')), '{WS}+'),
                        x -> x <> '')) AS BIGINT) AS n_tokens,
                   CASE WHEN content_chars + boiler_chars > 0
                        THEN CAST(boiler_chars AS DOUBLE)
                             / CAST(content_chars + boiler_chars AS DOUBLE)
                        ELSE 0.0 END AS boiler_frac
            FROM cln
        ), sig AS (
            SELECT doc_id, clean_text, n_tokens, boiler_frac,
                   CASE WHEN n_content = 0 OR clean_text = '' THEN 'empty'
                        WHEN boiler_frac > {max_boiler_frac!r}
                             THEN 'boilerplate'
                        WHEN n_tokens < {int(min_tokens)} THEN 'too_short'
                   END AS pre_fate,
                   MD5(clean_text) AS fp
            FROM sig0
        ), winners AS (
            SELECT fp, MIN(doc_id) AS keep_id
            FROM sig WHERE pre_fate IS NULL GROUP BY fp
        )
        SELECT s.doc_id,
               COALESCE(s.pre_fate,
                        CASE WHEN s.doc_id <> w.keep_id THEN 'duplicate'
                             ELSE 'keep' END) AS fate,
               s.n_tokens, s.boiler_frac, s.clean_text
        FROM sig s LEFT JOIN winners w ON s.fp = w.fp
    """


def _semdedup_sql(
    sf_dir: str | None = None,
    tau: float = 0.99,
    n_centroids: int | None = None,
    sample_rows: int | None = None,
    seed: int = 42,
) -> str:
    """q78 oracle: the SAME seeded centroids as literals (q17 technique),
    identical argmin cell expression and rounded-cosine threshold."""
    import numpy as np
    import pyarrow.parquet as pq

    from document_quality_assessment_ocr_spark.operators.similarity import (
        _kmeans_lite,
        scaled_n_centroids,
        scaled_sample_rows,
    )

    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.array(tbl.column("vec_id"))
    vecs = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    # shared corpus-size rule — must mirror the engine query (q78 note)
    n_centroids = n_centroids or scaled_n_centroids(len(ids))
    sample_rows = sample_rows or scaled_sample_rows(n_centroids)
    cents = _kmeans_lite(vecs[order[:sample_rows]], n_centroids, seed=seed)
    dists = ", ".join(
        "(-2.0 * LIST_DOT_PRODUCT(v, ["
        + ", ".join(repr(float(x)) for x in c)
        + f"]) + {float((c * c).sum())!r})"
        for c in cents
    )
    cell = f"(LIST_INDEXOF([{dists}], LIST_MIN([{dists}])) - 1)"
    return f"""
        WITH e AS (
            SELECT CAST(vec_id AS BIGINT) AS vec_id,
                   CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ), assigned AS (
            SELECT vec_id, v, {cell} AS cell FROM e
        ), dup AS (
            SELECT DISTINCT x.vec_id
            FROM assigned x JOIN assigned y
              ON x.cell = y.cell AND y.vec_id < x.vec_id
            WHERE ROUND(LIST_DOT_PRODUCT(x.v, y.v)
                        / SQRT(LIST_DOT_PRODUCT(x.v, x.v)
                               * LIST_DOT_PRODUCT(y.v, y.v)), 6) >= {tau!r}
        )
        SELECT a.vec_id, CAST(a.cell AS INT) AS cell,
               d.vec_id IS NULL AS kept
        FROM assigned a LEFT JOIN dup d ON a.vec_id = d.vec_id
    """


def _mixture_sql(sf_dir: str | None = None, temperature: float = 1.0) -> str:
    """q77/q85 oracle: per-stratum counts read from the parquet, rates via
    the SAME mixture_rates()/temper_weights() arithmetic the engine runs,
    embedded as repr literals (exact double round-trip) over the
    md5-uniform predicate."""
    import os

    import duckdb

    from document_quality_assessment_ocr_spark.operators.sampling import (
        mixture_rates,
        temper_weights,
    )

    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    con = duckdb.connect()
    counts = dict(
        con.execute(
            f"SELECT lang, COUNT(*) FROM '{sf_dir}/documents.parquet' "
            "WHERE lang IS NOT NULL GROUP BY lang"
        ).fetchall()
    )
    con.close()
    rates = mixture_rates(counts, temper_weights(_MIXTURE_WEIGHTS, temperature))
    case = " ".join(
        f"WHEN '{s}' THEN {rates[s]!r}" for s in sorted(rates)
    )
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
                   {_md5_uniform_sql('CAST(doc_id AS BIGINT)')} AS sample_u
            FROM documents
        )
        SELECT doc_id, lang, sample_u FROM d
        WHERE sample_u < CASE lang {case} ELSE 0.0 END
    """


def _phash_near_dup_sql(max_hamming: int = 7, n_bands: int = 8) -> str:
    """q76 oracle: aHash literals for the catalog AND its thumbnails
    (computed by the same decode→thumbnail_fit→ahash chain the engine's
    mapInPandas runs — q57 technique) + the SAME banded-candidate +
    per-nibble-popcount arithmetic in SQL."""
    from document_quality_assessment_ocr_spark import kernels as _kernels
    from document_quality_assessment_ocr_spark import png as _png
    from document_quality_assessment_ocr_spark.operators.multimodal import ahash_hex
    from document_quality_assessment_ocr_spark.sources.fixtures import (
        build_payloads,
        payload_names,
    )

    pl = build_payloads(seed=42, size=(800, 1000))
    vals = []
    for n in sorted(payload_names()):
        try:
            arr, _ = _png.decode_gray(bytes(pl[n]["png"]))
            vals.append(f"('{n}', '{ahash_hex(arr)}')")
            th = _kernels.thumbnail_fit(arr, 128)
            vals.append(f"('{n}:t', '{ahash_hex(th)}')")
        except Exception:
            pass
    width = 16 // n_bands
    nib_x = (
        "BIT_COUNT(XOR(CAST(('0x' || SUBSTR(ha, CAST(i AS INT), 1)) AS BIGINT),"
        " CAST(('0x' || SUBSTR(hb, CAST(i AS INT), 1)) AS BIGINT)))"
    )
    return f"""
        WITH ph(media_ref, phash) AS (VALUES {", ".join(vals)}),
        bands AS (
            SELECT media_ref AS ref, phash AS h, k AS band,
                   SUBSTR(phash, 1 + CAST(k AS INT) * {width}, {width}) AS bv
            FROM (SELECT media_ref, phash, UNNEST(RANGE(0, {n_bands})) AS k
                  FROM ph)
        ), cand AS (
            SELECT DISTINCT a.ref AS ref_a, b.ref AS ref_b,
                   a.h AS ha, b.h AS hb
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.bv = b.bv AND a.ref < b.ref
        ), scored AS (
            SELECT ref_a, ref_b,
                   CAST(LIST_SUM(LIST_TRANSFORM(RANGE(1, 17),
                        i -> {nib_x})) AS BIGINT) AS hamming
            FROM cand
        )
        SELECT ref_a, ref_b, hamming FROM scored
        WHERE hamming <= {max_hamming}
    """


def _profile_sql(cols: tuple = ("doc_id", "text", "lang", "source", "n_chars")) -> str:
    parts = []
    for c in cols:
        parts.append(f"""
            SELECT '{c}' AS "column", COUNT(*) AS n_rows,
                   COUNT(*) - COUNT({c}) AS n_nulls,
                   CASE WHEN COUNT(*) = 0 THEN 0.0
                        ELSE CAST(COUNT(*) - COUNT({c}) AS DOUBLE)
                             / CAST(COUNT(*) AS DOUBLE) END AS null_frac,
                   CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
                   MIN(CAST({c} AS VARCHAR)) AS min_str,
                   MAX(CAST({c} AS VARCHAR)) AS max_str,
                   AVG(LENGTH(CAST({c} AS VARCHAR))) AS avg_len
            FROM documents""")
    return " UNION ALL ".join(parts)


def _scrub_sqls() -> tuple[str, str]:
    """DuckDB twins of operators/scrub — the SAME pattern constants feed
    both engines (\\x{..} hex escapes mean the same in Java regex and RE2);
    DuckDB needs the explicit 'g' flag to match Spark's replace-all."""
    from document_quality_assessment_ocr_spark.operators.scrub import (
        CONTROLS,
        EMAIL,
        IPV4,
        MULTI_SPACE,
        PHONE,
        ZERO_WIDTH,
    )

    norm = f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CASE WHEN CAST(doc_id AS BIGINT) % 11 = 0
                        THEN COALESCE(text,'') || ' x' || CHR(8203) || CHR(1)
                             || 'y  tail'
                        ELSE COALESCE(text,'') END AS t
            FROM documents
        )
        SELECT doc_id,
               TRIM(REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(
                    t, '{ZERO_WIDTH}', '', 'g'), '{CONTROLS}', '', 'g'),
                    '{MULTI_SPACE}', ' ', 'g')) AS clean_text,
               CAST(LEN(REGEXP_EXTRACT_ALL(t, '{ZERO_WIDTH}')) AS BIGINT)
                   AS n_zero_width,
               CAST(LEN(REGEXP_EXTRACT_ALL(t, '{CONTROLS}')) AS BIGINT)
                   AS n_controls
        FROM d
    """
    pii = f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CASE WHEN CAST(doc_id AS BIGINT) % 7 = 0
                        THEN COALESCE(text,'') || ' contact u'
                             || CAST(CAST(doc_id AS BIGINT) AS VARCHAR)
                             || '@example.com or +1415'
                             || LPAD(CAST(CAST(doc_id AS BIGINT) % 10000 AS VARCHAR), 4, '0')
                             || ' at 10.0.'
                             || CAST(CAST(doc_id AS BIGINT) % 256 AS VARCHAR)
                             || '.1'
                        ELSE COALESCE(text,'') END AS t
            FROM documents
        )
        SELECT doc_id,
               REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(
                    t, '{EMAIL}', '<EMAIL>', 'g'), '{IPV4}', '<IP>', 'g'),
                    '{PHONE}', '<PHONE>', 'g') AS scrubbed,
               CAST(LEN(REGEXP_EXTRACT_ALL(t, '{EMAIL}')) AS BIGINT) AS n_emails,
               CAST(LEN(REGEXP_EXTRACT_ALL(t, '{IPV4}')) AS BIGINT) AS n_ips,
               CAST(LEN(REGEXP_EXTRACT_ALL(t, '{PHONE}')) AS BIGINT) AS n_phones
        FROM d
    """
    return norm, pii


def _curation_v2_sql(
    chunk_words: int = 20,
    min_keep_ratio: float = 0.5,
    max_dup_gram_char_frac: float = 0.2,
) -> str:
    """DuckDB twin of plans/curation.curate_documents_v2. The engine's Bloom
    stage needs no SQL model: Bloom has no false negatives and every
    candidate is exact-verified, so contamination reduces to the exact
    shingle intersection."""
    cw = chunk_words
    toks = (
        f"LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(COALESCE({{c}},''))), '{WS}+'),"
        " x -> x <> '')"
    )
    gram5 = " || ' ' || ".join(f"a[CAST(i AS INT) + {j}]" for j in range(5))
    reason = f"""CASE WHEN keep_ratio < {min_keep_ratio}
                     THEN 'boilerplate'
                 WHEN contaminated THEN 'contaminated'
                 WHEN dup_gram_char_frac > {max_dup_gram_char_frac}
                     THEN 'repetition'
                 ELSE '' END"""
    return f"""
        WITH tr AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
            WHERE CAST(doc_id AS BIGINT) % 89 <> 0
        ), t AS (
            SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM tr
        ), n AS (
            SELECT doc_id, w,
                   GREATEST(CAST(CEIL(LEN(w) / {cw}.0) AS BIGINT), 1) AS nch
            FROM t
        ), ch AS (
            SELECT doc_id, i - 1 AS chunk_idx,
                   ARRAY_TO_STRING(LIST_SLICE(w, (i - 1) * {cw} + 1, i * {cw}), ' ') AS chunk
            FROM (SELECT doc_id, w, UNNEST(RANGE(1, nch + 1)) AS i FROM n)
        ), keep AS (
            SELECT doc_id, chunk_idx, chunk FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY MD5(chunk) ORDER BY doc_id, chunk_idx) AS rn
                FROM ch
            ) WHERE rn = 1
        ), asm AS (
            SELECT doc_id, COUNT(*) AS n_kept,
                   STRING_AGG(chunk, ' ' ORDER BY chunk_idx) AS clean_text
            FROM keep GROUP BY doc_id
        ), cleaned AS (
            SELECT n.doc_id, n.nch AS n_total,
                   COALESCE(asm.n_kept, 0) AS n_kept,
                   COALESCE(asm.clean_text, '') AS clean_text
            FROM n LEFT JOIN asm ON n.doc_id = asm.doc_id
        ), tk AS (
            SELECT doc_id, {toks.format(c='clean_text')} AS a FROM cleaned
        ), grams0 AS (
            SELECT doc_id,
                   a[CAST(i AS INT)] || ' ' || a[CAST(i AS INT) + 1] AS gram
            FROM (SELECT doc_id, a,
                         UNNEST(RANGE(1, GREATEST(LEN(a) - 1, 0) + 1)) AS i
                  FROM tk)
        ), gcnt AS (
            SELECT doc_id, gram, COUNT(*) AS cnt FROM grams0 GROUP BY 1, 2
        ), gagg AS (
            SELECT doc_id,
                   COALESCE(SUM(CASE WHEN cnt > 1 THEN cnt * LENGTH(gram) END), 0) AS dup_chars,
                   COALESCE(SUM(cnt * LENGTH(gram)), 0) AS all_chars
            FROM gcnt GROUP BY 1
        ), sh AS (
            SELECT DISTINCT doc_id, MD5({gram5}) AS shingle
            FROM (SELECT doc_id, a,
                         UNNEST(RANGE(1, GREATEST(LEN(a) - 4, 0) + 1)) AS i
                  FROM tk)
        ), evtk AS (
            SELECT {toks.format(c='text')} AS a FROM documents
            WHERE CAST(doc_id AS BIGINT) % 89 = 0
        ), ev AS (
            SELECT DISTINCT MD5({gram5}) AS shingle
            FROM (SELECT a, UNNEST(RANGE(1, GREATEST(LEN(a) - 4, 0) + 1)) AS i
                  FROM evtk)
        ), cont AS (
            SELECT DISTINCT s.doc_id FROM sh s JOIN ev USING (shingle)
        ), m AS (
            SELECT c.doc_id, c.n_total, c.n_kept,
                   CAST(c.n_kept AS DOUBLE) / CAST(c.n_total AS DOUBLE) AS keep_ratio,
                   CASE WHEN COALESCE(g.all_chars, 0) = 0 THEN 0.0
                        ELSE CAST(g.dup_chars AS DOUBLE) / CAST(g.all_chars AS DOUBLE)
                   END AS dup_gram_char_frac,
                   (cont.doc_id IS NOT NULL) AS contaminated
            FROM cleaned c
            LEFT JOIN gagg g USING (doc_id)
            LEFT JOIN cont USING (doc_id)
        )
        SELECT doc_id, n_total, n_kept, keep_ratio, dup_gram_char_frac,
               contaminated,
               ({reason} = '') AS kept,
               {reason} AS drop_reason
        FROM m
    """


def _bloom_decontam_sql(n_words: int = 64, k: int = 3) -> str:
    """DuckDB twin of operators/bloom.bloom_prefilter_contamination: same
    md5-slice positions, same 32-bit-per-BIGINT-word bitmap, BIT_OR build,
    bitwise-AND probe."""
    m = 32 * n_words
    toks = (
        f"LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(COALESCE(text,''))), '{WS}+'),"
        " x -> x <> '')"
    )
    gram5 = " || ' ' || ".join(f"a[CAST(i AS INT) + {j}]" for j in range(5))
    ks = ", ".join(str(j) for j in range(k))
    pos = f"CAST('0x' || SUBSTR(MD5(shingle), 1 + 8 * j, 8) AS BIGINT) % {m}"
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id, {toks} AS a FROM documents
        ), sh AS (
            SELECT DISTINCT doc_id, MD5({gram5}) AS shingle
            FROM (SELECT doc_id, a,
                         UNNEST(RANGE(1, GREATEST(LEN(a) - 4, 0) + 1)) AS i
                  FROM d)
        ), ev AS (
            SELECT DISTINCT shingle FROM sh WHERE doc_id % 89 = 0
        ), evpos AS (
            SELECT {pos} AS pos FROM ev, (SELECT UNNEST([{ks}]) AS j)
        ), bloom AS (
            SELECT CAST(pos // 32 AS INT) AS word_idx,
                   BIT_OR(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits
            FROM evpos GROUP BY 1
        ), tr AS (
            SELECT doc_id, shingle FROM sh WHERE doc_id % 89 <> 0
        ), trpos AS (
            SELECT doc_id, shingle, {pos} AS pos
            FROM tr, (SELECT UNNEST([{ks}]) AS j)
        ), probed AS (
            SELECT doc_id, shingle,
                   SUM(CASE WHEN COALESCE(b.bits, 0)
                                 & (CAST(1 AS BIGINT) << CAST(t.pos % 32 AS INT))
                                 <> 0 THEN 1 ELSE 0 END) AS nhit
            FROM trpos t LEFT JOIN bloom b ON CAST(t.pos // 32 AS INT) = b.word_idx
            GROUP BY 1, 2
        )
        SELECT p.doc_id,
               COUNT(*) AS n_shingles,
               CAST(SUM(CASE WHEN p.nhit = {k} THEN 1 ELSE 0 END) AS BIGINT)
                   AS bloom_candidates,
               CAST(SUM(CASE WHEN e.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS exact_matches
        FROM probed p LEFT JOIN ev e ON p.shingle = e.shingle
        GROUP BY 1
    """


def _count_min_sql(width: int = 256, depth: int = 4) -> str:
    """DuckDB twin of operators/sketches.count_min_estimate (audit mode)."""
    toks = (
        f"LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(COALESCE(text,''))), '{WS}+'),"
        " x -> x <> '')"
    )
    js = ", ".join(str(j) for j in range(depth))
    pos = f"CAST('0x' || SUBSTR(MD5(term), 1 + 8 * j, 8) AS BIGINT) % {width}"
    probes = "('table'), ('spark'), ('vector'), ('the'), ('zzz_absent')"
    return f"""
        WITH tok AS (
            SELECT UNNEST({toks}) AS term FROM documents
        ), cells AS (
            SELECT j, {pos} AS pos FROM tok, (SELECT UNNEST([{js}]) AS j)
        ), cms AS (
            SELECT j, pos, COUNT(*) AS c FROM cells GROUP BY 1, 2
        ), probes AS (
            SELECT * FROM (VALUES {probes}) AS t(term)
        ), ppos AS (
            SELECT term, j, {pos} AS pos
            FROM probes, (SELECT UNNEST([{js}]) AS j)
        ), est AS (
            SELECT term, CAST(MIN(COALESCE(c, 0)) AS BIGINT) AS est
            FROM ppos LEFT JOIN cms USING (j, pos) GROUP BY 1
        ), exact AS (
            SELECT term, COUNT(*) AS exact FROM tok GROUP BY 1
        )
        SELECT est.term, est.est,
               CAST(COALESCE(exact.exact, 0) AS BIGINT) AS exact
        FROM est LEFT JOIN exact USING (term)
    """


def _top_terms_sql() -> str:
    toks = (
        f"LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(COALESCE(text,''))), '{WS}+'),"
        " x -> x <> '')"
    )
    return f"""
        WITH tok AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id, UNNEST({toks}) AS term
            FROM documents
        ), tf AS (
            SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
        ), df AS (
            SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
        )
        SELECT doc_id, term,
               CAST(tf AS BIGINT) AS tf,
               CAST(df AS BIGINT) AS df,
               CAST(rn AS INT) AS rank
        FROM (SELECT tf.doc_id, tf.term, tf.tf, df.df,
                     ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                        ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rn
              FROM tf JOIN df USING (term))
        WHERE rn <= 3
    """


def _vis_sql(x: str) -> str:
    """DuckDB twin of operators/html._visible_text (tag-strip →
    entity-decode → whitespace-collapse → trim)."""
    from document_quality_assessment_ocr_spark.operators.html import ENTITIES, TAG

    inner = f"REGEXP_REPLACE({x}, '{TAG}', ' ', 'g')"
    for ent, rep in ENTITIES:
        inner = f"REPLACE({inner}, '{ent}', '{rep.replace(chr(39), chr(39) * 2)}')"
    return f"TRIM(REGEXP_REPLACE({inner}, '{WS}+', ' ', 'g'))"


# DuckDB twin of `_synth_html` — the `d AS (...)` CTE shared by q62/q63/q70
_HTML_SYNTH_CTE = """
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   '<html><head><title>Doc ' || CAST(CAST(doc_id AS BIGINT) AS VARCHAR)
                   || '</title><style>p{margin:0}</style><script>var x=1;</script></head><body>'
                   || '<div class="nav"><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></div>'
                   || '<h2>' || SUBSTR(COALESCE(text,''), 1, 30) || ' &amp; more</h2><p>'
                   || REPLACE(COALESCE(text,''), ' data ', '</p><p>') || '</p>'
                   || CASE WHEN CAST(doc_id AS BIGINT) % 4 = 0
                           THEN '<div><a href="/x">' || SUBSTR(COALESCE(text,''), 1, 40)
                                || '</a></div>'
                           ELSE '' END
                   || '<p>See <a href="http://Ref'
                   || CAST(CAST(doc_id AS BIGINT) % 3 + 1 AS VARCHAR)
                   || '.example.net/r/'
                   || CAST(CAST(doc_id AS BIGINT) % 20 AS VARCHAR)
                   || '/">ref ' || CAST(CAST(doc_id AS BIGINT) % 20 AS VARCHAR)
                   || '</a></p>'
                   || '<div class="footer">Copyright <a href="/p">Privacy</a> <a href="/t">Terms</a></div></body></html>'
                       AS html
            FROM documents
        )"""


def _html_blocks_ctes() -> str:
    """The WITH chain ending at ``blk`` (classified blocks) over the
    synthesized HTML corpus — the SAME pattern constants feed both engines
    (Java regex ∩ RE2 subset); the synthesis expression is the
    byte-identical twin of `_synth_html`. Shared by q62/q63/q79."""
    from document_quality_assessment_ocr_spark.operators.html import (
        ANCHOR,
        BLOCK_TAG,
        COMMENT,
        HEADSEC,
        HEAD_OPEN,
        MARKER_CLASS,
        MAX_LINK_DENSITY,
        MIN_GOOD_WORDS,
        MIN_STOP_DENSITY,
        SCRIPT,
        STOPWORDS,
        STYLE,
    )

    vis = _vis_sql
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    prefix = _HTML_SYNTH_CTE + f""", prep AS (
            SELECT doc_id,
                   REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(
                   REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(
                       html, '{MARKER_CLASS}', '', 'g'),
                       '{COMMENT}', ' ', 'g'),
                       '{HEADSEC}', ' ', 'g'),
                       '{SCRIPT}', ' ', 'g'),
                       '{STYLE}', ' ', 'g'),
                       '{HEAD_OPEN}', CHR(30) || CHR(31), 'g'),
                       '{BLOCK_TAG}', CHR(30), 'g') AS prepped
            FROM d
        ), parts AS (
            SELECT doc_id, STR_SPLIT(prepped, CHR(30)) AS ps FROM prep
        ), fr AS (
            SELECT doc_id, ps, UNNEST(RANGE(1, LEN(ps) + 1)) AS i FROM parts
        ), f0 AS (
            SELECT doc_id, CAST(i - 1 AS INT) AS block_idx,
                   STARTS_WITH(ps[CAST(i AS INT)], CHR(31)) AS is_heading,
                   CASE WHEN STARTS_WITH(ps[CAST(i AS INT)], CHR(31))
                        THEN SUBSTR(ps[CAST(i AS INT)], 2)
                        ELSE ps[CAST(i AS INT)] END AS raw
            FROM fr
        ), f1 AS (
            SELECT doc_id, block_idx, is_heading, raw, {vis('raw')} AS text
            FROM f0
        ), f2 AS (
            SELECT doc_id, block_idx, is_heading, text,
                   CAST(LENGTH(text) AS BIGINT) AS n_chars,
                   CAST(LEN(LIST_FILTER(STR_SPLIT(text, ' '), x -> x <> ''))
                        AS BIGINT) AS n_words,
                   CAST(LEN(LIST_FILTER(LIST_FILTER(STR_SPLIT(text, ' '),
                            x -> x <> ''),
                            x -> LIST_CONTAINS([{stop_list}], LOWER(x))))
                        AS BIGINT) AS stop_hits,
                   CAST(COALESCE(LIST_SUM(LIST_TRANSFORM(
                            REGEXP_EXTRACT_ALL(raw, '{ANCHOR}'),
                            m -> CAST(LENGTH({vis('m')}) AS BIGINT))), 0)
                        AS BIGINT) AS link_chars
            FROM f1
            WHERE LENGTH(text) > 0
        ), f3 AS (
            SELECT doc_id, block_idx, is_heading, text, n_chars, n_words,
                   link_chars,
                   LEAST(CAST(link_chars AS DOUBLE) / CAST(n_chars AS DOUBLE),
                         1.0) AS link_density,
                   CASE WHEN n_words > 0
                        THEN CAST(stop_hits AS DOUBLE) / CAST(n_words AS DOUBLE)
                        ELSE 0.0 END AS stop_density
            FROM f2
        ), pv AS (
            SELECT *,
                   CASE WHEN link_density > {MAX_LINK_DENSITY!r} THEN 'bad'
                        WHEN n_words >= {int(MIN_GOOD_WORDS)}
                             AND stop_density >= {MIN_STOP_DENSITY!r} THEN 'good'
                        ELSE 'short' END AS prov
            FROM f3
        ), lab AS (
            SELECT *,
                   COALESCE(LAG(prov) OVER (PARTITION BY doc_id
                        ORDER BY block_idx) = 'good', FALSE) AS prv,
                   COALESCE(LEAD(prov) OVER (PARTITION BY doc_id
                        ORDER BY block_idx) = 'good', FALSE) AS nxt
            FROM pv
        ), blk AS (
            SELECT doc_id, block_idx, is_heading, text, n_chars, n_words,
                   link_chars, link_density, stop_density,
                   CASE WHEN prov = 'good' THEN 'content'
                        WHEN prov = 'bad' THEN 'boilerplate'
                        WHEN is_heading THEN
                             CASE WHEN nxt THEN 'content' ELSE 'boilerplate' END
                        WHEN prv OR nxt THEN 'content'
                        ELSE 'boilerplate' END AS label
            FROM lab
        )
    """
    return prefix


def _html_sqls() -> tuple[str, str]:
    """DuckDB twins of operators/html.html_blocks/classify_blocks (q62)
    and extract_main_html (q63)."""
    prefix = _html_blocks_ctes()
    blocks = prefix + """
        SELECT doc_id, block_idx, is_heading, text, n_chars, n_words,
               link_chars, link_density, stop_density, label
        FROM blk
    """
    main = prefix + """
        SELECT doc_id,
               COALESCE(STRING_AGG(text, CHR(10) ORDER BY block_idx)
                        FILTER (WHERE label = 'content'), '') AS main_text,
               COUNT(*) AS n_blocks,
               COUNT(*) FILTER (WHERE label = 'content') AS n_content,
               -- CAST: DuckDB SUM(BIGINT)→HUGEINT→float64 in pandas,
               -- which hash-mismatches Spark's int64 (q41 trap class)
               CAST(COALESCE(SUM(n_chars) FILTER (WHERE label = 'content'),
                             0) AS BIGINT) AS content_chars,
               CAST(COALESCE(SUM(n_chars) FILTER (WHERE label <> 'content'),
                             0) AS BIGINT) AS boiler_chars
        FROM blk
        GROUP BY doc_id
    """
    return blocks, main


def _url_parse_ctes(src: str, extra: str = "", prefix: str = "") -> str:
    """DuckDB twin of operators/urls.parse_urls as a reusable CTE chain
    over ``src(doc_id, url)``, ending at ``{prefix}parsed`` — shared
    pattern constants, used by q65/q66/q68 and the q72/q127/q131
    link-graph composites. ``extra`` passes additional ``src`` columns
    through the chain (e.g. ``", anchor_text"``) — the twin of
    parse_urls' ``keep``; ``prefix`` renames the chain's CTEs so TWO
    parses can coexist in one query (q131 parses doc URLs AND hrefs).
    The defaults render byte-identically to the original form."""
    from document_quality_assessment_ocr_spark.operators.urls import (
        QUERY_PART,
        TRACKING_PARAM,
        TRAILING_SLASH,
        URL_PARTS,
        WWW_PREFIX,
    )

    return f"""{prefix}p0 AS (
            SELECT doc_id, url{extra},
                   LOWER(REGEXP_EXTRACT(url, '{URL_PARTS}', 1)) AS scheme,
                   REGEXP_REPLACE(LOWER(REGEXP_EXTRACT(url, '{URL_PARTS}', 2)),
                                  '{WWW_PREFIX}', '') AS h0,
                   REGEXP_REPLACE(REGEXP_EXTRACT(url, '{URL_PARTS}', 3),
                                  '{TRAILING_SLASH}', '') AS path0,
                   COALESCE(ARRAY_TO_STRING(LIST_SORT(LIST_FILTER(
                       STR_SPLIT(REGEXP_EXTRACT(url, '{QUERY_PART}', 1),
                                 '&'),
                       q -> q <> '' AND NOT REGEXP_MATCHES(q, '{TRACKING_PARAM}')
                   )), '&'), '') AS query_clean
            FROM {src}
        ), {prefix}p AS (
            SELECT doc_id, url{extra}, scheme,
                   CASE WHEN scheme = 'http' AND h0 LIKE '%:80'
                        THEN SUBSTR(h0, 1, LENGTH(h0) - 3)
                        WHEN scheme = 'https' AND h0 LIKE '%:443'
                        THEN SUBSTR(h0, 1, LENGTH(h0) - 4)
                        ELSE h0 END AS host,
                   CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path,
                   query_clean
            FROM {prefix}p0
        ), {prefix}parsed AS (
            SELECT doc_id, url{extra}, scheme, host, path, query_clean,
                   CASE WHEN scheme = '' THEN NULL
                        ELSE scheme || '://' || host || path
                             || CASE WHEN query_clean = '' THEN ''
                                     ELSE '?' || query_clean END
                   END AS url_norm
            FROM {prefix}p
        )"""


def _url_sqls() -> tuple[str, str, str]:
    """DuckDB twins of operators/urls — shared pattern constants; URL
    synthesis is the byte-identical twin of `_synth_urls`."""
    prefix = f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, source
            FROM documents
        ), u AS (
            SELECT doc_id,
                   CASE doc_id % 5
                     WHEN 0 THEN 'https://WWW.Example.COM:443/' || source
                          || '/' || CAST(doc_id % 100 AS VARCHAR)
                          || '/?id=' || CAST(doc_id AS VARCHAR)
                          || '&utm_source=feed&q=' || lang || '#top'
                     WHEN 1 THEN 'http://cdn.example.org:80/assets/'
                          || CAST(doc_id AS VARCHAR)
                     WHEN 2 THEN 'https://news.site.net/a/'
                          || CAST(doc_id % 50 AS VARCHAR) || '?ref=tw&z=1&a=2'
                     WHEN 3 THEN 'not a url ' || CAST(doc_id AS VARCHAR)
                     ELSE 'https://example.com/' || source
                          || '?fbclid=xyz' || CAST(doc_id AS VARCHAR)
                   END AS url
            FROM d
        ), {_url_parse_ctes('u')}
    """
    parse = prefix + """
        SELECT doc_id, url, scheme, host, path, query_clean, url_norm
        FROM parsed
    """
    hosts = prefix + """
        SELECT host,
               COUNT(*) AS n_docs,
               COUNT(DISTINCT url_norm) AS n_urls,
               COUNT(*) - COUNT(DISTINCT url_norm) AS n_dup_docs,
               MIN(doc_id) AS first_doc
        FROM parsed
        WHERE host <> ''
        GROUP BY host
    """
    rule_rows = ", ".join(
        f"('{h}', '{p}', '{a}')" for h, p, a in _BLOCK_RULES
    )
    block = prefix + f"""
        , pref AS (
            SELECT doc_id, host,
                   UNNEST(LIST_PREPEND('/', LIST_FILTER(LIST_TRANSFORM(
                       RANGE(1, LEAST(LEN(STR_SPLIT(path, '/')) - 1, 8) + 1),
                       i -> ARRAY_TO_STRING(
                           LIST_SLICE(STR_SPLIT(path, '/'), 1,
                                      CAST(i AS INT) + 1), '/')),
                       x -> x <> ''))) AS pfx
            FROM parsed WHERE host <> ''
        ), rules0(rhost, rpfx, raction) AS (
            VALUES {rule_rows}
        ), rules AS (
            -- twin of prefix_block_join's least-restrictive rule dedup
            SELECT rhost, rpfx, MIN(raction) AS raction
            FROM rules0 GROUP BY 1, 2
        ), hits AS (
            SELECT p.doc_id, r.rpfx, r.raction
            FROM pref p JOIN rules r ON p.host = r.rhost AND p.pfx = r.rpfx
        ), win AS (
            SELECT doc_id, rpfx AS matched_prefix, raction FROM (
                SELECT doc_id, rpfx, raction,
                       ROW_NUMBER() OVER (PARTITION BY doc_id
                           ORDER BY LENGTH(rpfx) DESC, rpfx DESC) AS rn
                FROM hits
            ) WHERE rn = 1
        )
        SELECT parsed.doc_id, url, scheme, host, path, query_clean, url_norm,
               win.matched_prefix,
               COALESCE(win.raction, 'allow') AS action
        FROM parsed LEFT JOIN win ON parsed.doc_id = win.doc_id
    """
    return parse, hosts, block


# policy rules for q68 — shared literal table (engine builds the same rows)
_BLOCK_RULES = [
    ("example.com", "/", "allow"),
    ("example.com", "/src1", "deny"),
    ("example.com", "/src1/5", "allow"),
    ("news.site.net", "/a", "deny"),
    ("cdn.example.org", "/assets", "deny"),
]


def _outlinks_sql() -> str:
    """DuckDB twin of operators/html.extract_links over the synthesized
    HTML corpus (shared ANCHOR_HREF pattern + visible-text chain)."""
    from document_quality_assessment_ocr_spark.operators.html import ANCHOR_HREF

    g2 = f"REGEXP_EXTRACT(ms[CAST(i AS INT)], '{ANCHOR_HREF}', 2)"
    return _HTML_SYNTH_CTE + f""", mt AS (
            SELECT doc_id,
                   REGEXP_EXTRACT_ALL(COALESCE(html,''), '{ANCHOR_HREF}') AS ms
            FROM d
        ), ex AS (
            SELECT doc_id, ms, UNNEST(RANGE(1, LEN(ms) + 1)) AS i FROM mt
        )
        SELECT doc_id, CAST(i - 1 AS INT) AS link_idx,
               REGEXP_EXTRACT(ms[CAST(i AS INT)], '{ANCHOR_HREF}', 1) AS href,
               {_vis_sql(g2)} AS anchor_text
        FROM ex
    """


def _bpe_merges_sql(sf_dir: str | None = None, n_merges: int = 8) -> str:
    """BPE-merge oracle (oracle-literal technique): the pure-python twin
    trainer (operators/bpe.bpe_python — the SAME function the unit tests
    compare the engine against) runs on word counts read from the parquet,
    and its merge table embeds as VALUES."""
    import os

    import duckdb

    from document_quality_assessment_ocr_spark.operators.bpe import bpe_python

    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    con = duckdb.connect()
    wc = dict(
        con.execute(
            f"""
            SELECT w, COUNT(*) FROM (
                SELECT UNNEST(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                    TRIM(LOWER(COALESCE(text,''))), '{WS}+'), x -> x <> '')) AS w
                FROM '{sf_dir}/documents.parquet'
            ) GROUP BY w
            """
        ).fetchall()
    )
    con.close()
    merges = bpe_python(wc, n_merges)
    if not merges:
        return (
            'SELECT CAST(NULL AS INT) AS step, CAST(NULL AS VARCHAR) AS "left",'
            ' CAST(NULL AS VARCHAR) AS "right",'
            " CAST(NULL AS BIGINT) AS pair_count WHERE FALSE"
        )

    def q(x: str) -> str:
        return x.replace("'", "''")

    rows = ", ".join(f"({s}, '{q(l)}', '{q(r)}', {c})" for s, l, r, c in merges)
    return f"""
        SELECT CAST(step AS INT) AS step, l AS "left", r AS "right",
               CAST(pair_count AS BIGINT) AS pair_count
        FROM (VALUES {rows}) AS t(step, l, r, pair_count)
    """


def _bpe_tokenize_sql(sf_dir: str | None = None, n_merges: int = 8) -> str:
    """q75 oracle: python twin trains the merges AND segments the (31-word)
    vocabulary; the (word, seg_text) map embeds as VALUES and joins the
    SQL token stream."""
    import os

    import duckdb

    from document_quality_assessment_ocr_spark.operators.bpe import (
        bpe_python,
        segment_words,
    )

    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    con = duckdb.connect()
    wc = dict(
        con.execute(
            f"""
            SELECT w, COUNT(*) FROM (
                SELECT UNNEST(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                    TRIM(LOWER(COALESCE(text,''))), '{WS}+'), x -> x <> '')) AS w
                FROM '{sf_dir}/documents.parquet'
            ) GROUP BY w
            """
        ).fetchall()
    )
    con.close()
    merges = [(l, r) for _, l, r, _ in bpe_python(wc, n_merges)]
    seg = segment_words(sorted(wc), merges)

    def q(x: str) -> str:
        return x.replace("'", "''")

    rows = ", ".join(f"('{q(w)}', '{q(s)}')" for w, s in seg.items())
    return f"""
        WITH tk AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                       TRIM(LOWER(COALESCE(text,''))), '{WS}+'),
                       x -> x <> '') AS a
            FROM documents
        ), t AS (
            SELECT doc_id, CAST(i AS INT) AS pos,
                   a[CAST(i AS INT) + 1] AS word
            FROM (SELECT doc_id, a, UNNEST(RANGE(0, LEN(a))) AS i FROM tk)
        ), seg(word, seg_text) AS (VALUES {rows})
        SELECT t.doc_id, t.pos, t.word, seg.seg_text
        FROM t JOIN seg USING (word)
    """


def _robots_sql() -> str:
    """q82 oracle: identical robots synthesis + the shared ROBOTS_LINE /
    TRAILING_SLASH constants; group scoping via IGNORE-NULLS carry-forward."""
    from document_quality_assessment_ocr_spark.operators.urls import (
        ROBOTS_LINE,
        TRAILING_SLASH,
    )

    norm = f"REGEXP_REPLACE(val, '{TRAILING_SLASH}', '')"
    return f"""
        WITH s AS (
            SELECT DISTINCT source FROM documents
        ), r AS (
            SELECT source || '.example.com' AS host,
                   '# robots for ' || source || CHR(10)
                   || 'User-agent: badbot' || CHR(10) || 'Disallow: /' || CHR(10)
                   || 'User-agent: *' || CHR(10)
                   || 'Disallow: /private/' || source || '/' || CHR(10)
                   || 'Allow: /private/' || source || '/ok' || CHR(10)
                   || 'Disallow:' || CHR(10)
                   || 'Disallow: /tmp/' AS t
            FROM s
        ), ln AS (
            SELECT host, CAST(i - 1 AS INT) AS line_no,
                   TRIM(parts[CAST(i AS INT)]) AS line
            FROM (SELECT host, STR_SPLIT(t, CHR(10)) AS parts,
                         UNNEST(RANGE(1, LEN(STR_SPLIT(t, CHR(10))) + 1)) AS i
                  FROM r)
        ), kv AS (
            SELECT host, line_no,
                   LOWER(REGEXP_EXTRACT(line, '{ROBOTS_LINE}', 1)) AS key,
                   TRIM(REGEXP_EXTRACT(line, '{ROBOTS_LINE}', 2)) AS val
            FROM ln
        ), g AS (
            SELECT *,
                   LAST_VALUE(CASE WHEN key = 'user-agent' THEN val END
                              IGNORE NULLS)
                       OVER (PARTITION BY host ORDER BY line_no
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS grp
            FROM kv
        ), rules AS (
            SELECT host,
                   CASE WHEN {norm} = '' THEN '/' ELSE {norm} END
                       AS path_prefix,
                   CASE WHEN key = 'allow' THEN 'allow' ELSE 'deny' END
                       AS action
            FROM g
            WHERE key IN ('allow', 'disallow') AND grp = '*' AND val <> ''
        )
        SELECT host, path_prefix, MIN(action) AS action
        FROM rules GROUP BY host, path_prefix
    """


def _link_hosts_sql() -> str:
    """DuckDB twin of the q72 composite: synthesized HTML → outlinks →
    URL parse → host rollup (reuses the shared synth CTE, ANCHOR_HREF
    pattern and the parse CTE chain)."""
    from document_quality_assessment_ocr_spark.operators.html import ANCHOR_HREF

    return _HTML_SYNTH_CTE + f""", mt AS (
            SELECT doc_id,
                   REGEXP_EXTRACT_ALL(COALESCE(html,''), '{ANCHOR_HREF}') AS ms
            FROM d
        ), ex AS (
            SELECT doc_id, ms, UNNEST(RANGE(1, LEN(ms) + 1)) AS i FROM mt
        ), lk AS (
            SELECT doc_id,
                   REGEXP_EXTRACT(ms[CAST(i AS INT)], '{ANCHOR_HREF}', 1) AS url
            FROM ex
        ), {_url_parse_ctes('lk')}
        SELECT host, COUNT(*) AS n_links, COUNT(DISTINCT doc_id) AS n_docs
        FROM parsed WHERE host <> '' GROUP BY host
    """




def _gopher_filter_sql(src: str = "documents") -> str:
    """DuckDB twin of operators/quality.gopher_quality_filter (shared
    GOPHER_* constants; identical ratio op order: sum -> /n -> round).
    ``src`` names the (doc_id, text) relation — a prior CTE when
    composing (curation v4)."""
    from document_quality_assessment_ocr_spark.operators.quality import (
        GOPHER_BULLETS,
        GOPHER_MAX_BULLET_LINE_FRAC,
        GOPHER_MAX_ELLIPSIS_LINE_FRAC,
        GOPHER_MAX_MEAN_WORD_LEN,
        GOPHER_MAX_SYMBOL_WORD_RATIO,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_ALPHA_WORD_FRAC,
        GOPHER_MIN_MEAN_WORD_LEN,
        GOPHER_MIN_STOP_HITS,
        GOPHER_MIN_WORDS,
        GOPHER_STOPWORDS,
    )

    bullets = ", ".join("'" + b + "'" for b in GOPHER_BULLETS)
    stops = ", ".join("'" + w + "'" for w in GOPHER_STOPWORDS)
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   COALESCE(text,'') AS t,
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(COALESCE(text,'')),
                       '{WS}+'), x -> x <> '') AS tk
            FROM {src}
        ), m AS (
            SELECT doc_id,
                   CAST(LEN(tk) AS BIGINT) AS n_words,
                   GREATEST(CAST(LEN(tk) AS BIGINT), 1) AS sn,
                   ROUND(CAST(COALESCE(LIST_SUM(LIST_TRANSFORM(tk,
                         w -> LENGTH(w))), 0) AS DOUBLE)
                         / GREATEST(CAST(LEN(tk) AS BIGINT), 1), 6) AS mean_word_len,
                   ROUND(CAST((LENGTH(t) - LENGTH(REPLACE(t, '#', '')))
                         + (LENGTH(t) - LENGTH(REPLACE(t, '...', ''))) / 3
                         AS DOUBLE) / GREATEST(CAST(LEN(tk) AS BIGINT), 1), 6)
                       AS symbol_word_ratio,
                   LIST_FILTER(STR_SPLIT(t, CHR(10)),
                               l -> TRIM(l) <> '') AS ls,
                   ROUND(CAST(LEN(LIST_FILTER(tk,
                         w -> REGEXP_MATCHES(LOWER(w), '[a-z]'))) AS DOUBLE)
                         / GREATEST(CAST(LEN(tk) AS BIGINT), 1), 6) AS alpha_word_frac,
                   CAST(LEN(LIST_INTERSECT(
                         LIST_DISTINCT(LIST_TRANSFORM(tk, w -> LOWER(w))),
                         [{stops}])) AS BIGINT) AS n_stop_hits
            FROM d
        ), r AS (
            SELECT doc_id, n_words, mean_word_len, symbol_word_ratio,
                   ROUND(CAST(LEN(LIST_FILTER(ls,
                         l -> SUBSTR(TRIM(l), 1, 1) IN ({bullets}))) AS DOUBLE)
                         / GREATEST(LEN(ls), 1), 6) AS bullet_line_frac,
                   ROUND(CAST(LEN(LIST_FILTER(ls,
                         l -> ENDS_WITH(TRIM(l), '...'))) AS DOUBLE)
                         / GREATEST(LEN(ls), 1), 6) AS ellipsis_line_frac,
                   alpha_word_frac, n_stop_hits
            FROM m
        )
        SELECT doc_id, n_words, mean_word_len, symbol_word_ratio,
               bullet_line_frac, ellipsis_line_frac, alpha_word_frac,
               n_stop_hits,
               (CASE WHEN n_words < {GOPHER_MIN_WORDS}
                          OR n_words > {GOPHER_MAX_WORDS} THEN 'word_count'
                     WHEN mean_word_len < {GOPHER_MIN_MEAN_WORD_LEN!r}
                          OR mean_word_len > {GOPHER_MAX_MEAN_WORD_LEN!r}
                          THEN 'mean_word_length'
                     WHEN symbol_word_ratio > {GOPHER_MAX_SYMBOL_WORD_RATIO!r}
                          THEN 'symbol_ratio'
                     WHEN bullet_line_frac > {GOPHER_MAX_BULLET_LINE_FRAC!r}
                          THEN 'bullet_lines'
                     WHEN ellipsis_line_frac > {GOPHER_MAX_ELLIPSIS_LINE_FRAC!r}
                          THEN 'ellipsis_lines'
                     WHEN alpha_word_frac < {GOPHER_MIN_ALPHA_WORD_FRAC!r}
                          THEN 'alpha_words'
                     WHEN n_stop_hits < {GOPHER_MIN_STOP_HITS} THEN 'stopwords'
                END) IS NULL AS keep,
               CASE WHEN n_words < {GOPHER_MIN_WORDS}
                         OR n_words > {GOPHER_MAX_WORDS} THEN 'word_count'
                    WHEN mean_word_len < {GOPHER_MIN_MEAN_WORD_LEN!r}
                         OR mean_word_len > {GOPHER_MAX_MEAN_WORD_LEN!r}
                         THEN 'mean_word_length'
                    WHEN symbol_word_ratio > {GOPHER_MAX_SYMBOL_WORD_RATIO!r}
                         THEN 'symbol_ratio'
                    WHEN bullet_line_frac > {GOPHER_MAX_BULLET_LINE_FRAC!r}
                         THEN 'bullet_lines'
                    WHEN ellipsis_line_frac > {GOPHER_MAX_ELLIPSIS_LINE_FRAC!r}
                         THEN 'ellipsis_lines'
                    WHEN alpha_word_frac < {GOPHER_MIN_ALPHA_WORD_FRAC!r}
                         THEN 'alpha_words'
                    WHEN n_stop_hits < {GOPHER_MIN_STOP_HITS} THEN 'stopwords'
               END AS reason
        FROM r
    """


def _curation_v4_sql(languages: tuple[str, ...] = ("en",)) -> str:
    """DuckDB twin of plans/curation.curate_documents_v4 — composed from
    the SAME builders the per-stage oracles use (``_gopher_filter_sql``,
    ``_c4_filter_sql``, ``_minhash_sql`` re-sourced via their ``src``
    params, ``_text_exprs()['lang_case']``, operators/scrub pattern
    constants), so the composite cannot drift from its stages."""
    from document_quality_assessment_ocr_spark.operators.scrub import (
        EMAIL,
        IPV4,
        PHONE,
    )

    e = _text_exprs()
    langs = ", ".join("'" + l + "'" for l in languages)
    mh = _minhash_sql(16, shingle="word", src="sv").replace("WITH ", ", ", 1)
    return f"""
        WITH v4src AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   REPLACE({_v4_synth_sql()}, '. ', '.' || CHR(10)) AS text
            FROM documents
        ), lg AS (
            SELECT doc_id, {e["lang_case"]} AS lang FROM v4src
        ), gop AS ({_gopher_filter_sql(src="v4src")}
        ), c4x AS ({_c4_filter_sql(src="v4src", derive=False)}
        ), st AS (
            SELECT s.doc_id, lg.lang, c4x.clean_text,
                   CASE WHEN lg.lang NOT IN ({langs}) THEN 'language'
                        WHEN gop.reason IS NOT NULL
                             THEN 'gopher:' || gop.reason
                        WHEN NOT c4x.doc_keep THEN 'c4' END AS pre_fate
            FROM v4src s
            JOIN lg  ON lg.doc_id  = s.doc_id
            JOIN gop ON gop.doc_id = s.doc_id
            JOIN c4x ON c4x.doc_id = s.doc_id
        ), sv AS (
            SELECT doc_id, clean_text AS text FROM st WHERE pre_fate IS NULL
        ){mh}, bands AS (
            SELECT doc_id, 0 AS band,
                   MD5(CONCAT_WS('#', h00, h01, h02, h03)) AS key FROM sig
            UNION ALL SELECT doc_id, 1,
                   MD5(CONCAT_WS('#', h04, h05, h06, h07)) FROM sig
            UNION ALL SELECT doc_id, 2,
                   MD5(CONCAT_WS('#', h08, h09, h10, h11)) FROM sig
            UNION ALL SELECT doc_id, 3,
                   MD5(CONCAT_WS('#', h12, h13, h14, h15)) FROM sig
        ), demoted AS (
            SELECT DISTINCT b.doc_id
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
        ), fin AS (
            SELECT st.doc_id, st.lang, st.clean_text,
                   COALESCE(st.pre_fate,
                            CASE WHEN d.doc_id IS NOT NULL
                                 THEN 'near_duplicate' ELSE 'keep' END) AS fate
            FROM st LEFT JOIN demoted d ON d.doc_id = st.doc_id
        )
        SELECT doc_id, lang, fate, (fate = 'keep') AS kept,
               CAST(LEN(REGEXP_EXTRACT_ALL(clean_text, '{EMAIL}'))
                    + LEN(REGEXP_EXTRACT_ALL(clean_text, '{IPV4}'))
                    + LEN(REGEXP_EXTRACT_ALL(clean_text, '{PHONE}'))
                    AS BIGINT) AS n_pii,
               CASE WHEN fate = 'keep'
                    THEN REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(
                         clean_text, '{EMAIL}', '<EMAIL>', 'g'),
                         '{IPV4}', '<IP>', 'g'),
                         '{PHONE}', '<PHONE>', 'g') END AS final_text
        FROM fin
    """


def _c4_filter_sql(src: str = "documents", derive: bool = True) -> str:
    """DuckDB twin of operators/quality.c4_line_filter over the same
    derived multi-line text (shared C4_* constants).  ``derive=False``
    takes ``src``'s text column as already multi-line (curation v4, whose
    outer CTE derives it once for every stage)."""
    from document_quality_assessment_ocr_spark.operators.quality import (
        C4_MIN_SENTENCES,
        C4_MIN_WORDS,
        C4_TERMINALS,
    )

    terms = ", ".join("'" + t.replace("'", "''") + "'" for t in C4_TERMINALS)
    return f"""
        WITH d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   {("REPLACE(COALESCE(text,''), '. ', '.' || CHR(10))"
                     if derive else "COALESCE(text,'')")} AS t
            FROM {src}
        ), l AS (
            SELECT doc_id,
                   UNNEST(STR_SPLIT(t, CHR(10))) AS line,
                   UNNEST(RANGE(1, LEN(STR_SPLIT(t, CHR(10))) + 1)) AS ln
            FROM d
        ), k AS (
            SELECT doc_id, line, ln,
                   (RIGHT(TRIM(line), 1) IN ({terms})
                    AND LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(line),
                            '{WS}+'), x -> x <> '')) >= {C4_MIN_WORDS}
                    AND NOT CONTAINS(LOWER(TRIM(line)), 'javascript')) AS ok
            FROM l
        ), a AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_lines,
                   CAST(COUNT(*) FILTER (WHERE ok) AS BIGINT) AS n_kept,
                   STRING_AGG(CASE WHEN ok THEN line END,
                              CHR(10) ORDER BY ln) AS clean
            FROM k GROUP BY doc_id
        )
        SELECT a.doc_id, a.n_lines, a.n_kept,
               (a.n_kept >= {C4_MIN_SENTENCES}
                AND NOT CONTAINS(LOWER(d.t), 'lorem ipsum')
                AND NOT CONTAINS(d.t, '{{')) AS doc_keep,
               CASE WHEN a.n_kept >= {C4_MIN_SENTENCES}
                         AND NOT CONTAINS(LOWER(d.t), 'lorem ipsum')
                         AND NOT CONTAINS(d.t, '{{')
                    THEN COALESCE(a.clean, '') ELSE '' END AS clean_text
        FROM a JOIN d ON a.doc_id = d.doc_id
    """


def _zipf_sql() -> str:
    """q221 oracle: token freq → floor-log2 bucket grid (LENGTH(BIN)−1,
    the shared q67 idiom), regression sums as unpartitioned windows ON
    THE GRID in one CTE, sign-split `//` so every division operand is
    non-negative (the DIV-vs-floor rule)."""
    return f"""
        WITH tok AS (
            SELECT UNNEST(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                TRIM(LOWER(COALESCE(text, ''))), '{WS}+'), x -> x <> ''))
                AS term
            FROM documents
        ), f AS (
            SELECT term, CAST(COUNT(*) AS BIGINT) AS freq
            FROM tok GROUP BY term
        ), b AS (
            SELECT CAST(LENGTH(BIN(freq)) - 1 AS BIGINT) AS bucket,
                   CAST(COUNT(*) AS BIGINT) AS n_terms
            FROM f GROUP BY 1
        ), g AS (
            SELECT bucket, n_terms,
                   CAST(LENGTH(BIN(n_terms)) - 1 AS BIGINT) AS log2_terms
            FROM b
        ), s AS (
            SELECT bucket, n_terms, log2_terms,
                   CAST(COUNT(*) OVER () AS BIGINT) AS k,
                   CAST(SUM(bucket) OVER () AS BIGINT) AS sx,
                   CAST(SUM(log2_terms) OVER () AS BIGINT) AS sy,
                   CAST(SUM(bucket * log2_terms) OVER () AS BIGINT) AS sxy,
                   CAST(SUM(bucket * bucket) OVER () AS BIGINT) AS sxx
            FROM g
        )
        SELECT bucket, n_terms, log2_terms,
               CAST(CASE WHEN (k * sxy - sx * sy) < 0
                    THEN -((ABS(k * sxy - sx * sy) * 1000)
                           // GREATEST(k * sxx - sx * sx, 1))
                    ELSE ((ABS(k * sxy - sx * sy) * 1000)
                          // GREATEST(k * sxx - sx * sx, 1))
                    END AS BIGINT) AS slope_milli
        FROM s
        ORDER BY bucket
    """


def _chisq_sql() -> str:
    """q222 oracle: exact BIGINT contingency grid + window marginals;
    the one float step is diff²/(r·c·n)·10⁶ with the engine's exact op
    order, surfaced via TRUNC (the q168 portable float→int path)."""
    return """
        WITH g AS (
            SELECT COALESCE(source, '') AS source, COALESCE(lang, '') AS lang,
                   CAST(COUNT(*) AS BIGINT) AS o
            FROM documents GROUP BY 1, 2
        ), m AS (
            SELECT source, lang, o,
                   CAST(SUM(o) OVER (PARTITION BY source) AS BIGINT) AS r_total,
                   CAST(SUM(o) OVER (PARTITION BY lang) AS BIGINT) AS c_total,
                   CAST(SUM(o) OVER () AS BIGINT) AS n
            FROM g
        )
        SELECT source, lang, o, r_total, c_total, n,
               CAST((r_total * c_total * 1000000) // n AS BIGINT)
                   AS expected_micro,
               CAST(TRUNC(
                   (CAST(o * n - r_total * c_total AS DOUBLE)
                    * CAST(o * n - r_total * c_total AS DOUBLE))
                   / CAST(r_total * c_total * n AS DOUBLE)
                   * CAST(1000000 AS DOUBLE)
               ) AS BIGINT) AS chi2_micro
        FROM m
        ORDER BY source, lang
    """


def _mad_outliers_sql(bin_width: int = 32, k_mad: int = 3) -> str:
    """q223 oracle: |groups|×|bins| grid (read 3× → MATERIALIZED), binned
    median/MAD as smallest bin with 2·cum ≥ n (integer, no percentile
    interpolation), k·MAD fence count; surfaced 0 CAST to BIGINT."""
    return f"""
        WITH grid AS MATERIALIZED (
            SELECT COALESCE(source, '') AS grp,
                   CAST(n_chars AS BIGINT) // {int(bin_width)} AS bin,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM documents
            WHERE CAST(n_chars AS BIGINT) >= 0
            GROUP BY 1, 2
        ), med AS MATERIALIZED (
            SELECT grp, CAST(MIN(bin) AS BIGINT) AS median_bin,
                   CAST(MAX(n) AS BIGINT) AS n
            FROM (
                SELECT grp, bin,
                       CAST(SUM(cnt) OVER (PARTITION BY grp) AS BIGINT) AS n,
                       CAST(SUM(cnt) OVER (PARTITION BY grp ORDER BY bin
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                            AS BIGINT) AS cum
                FROM grid
            ) WHERE 2 * cum >= n GROUP BY grp
        ), dev AS (
            SELECT grp, n, ABS(bin - median_bin) AS dev,
                   CAST(SUM(cnt) AS BIGINT) AS cnt
            FROM grid JOIN med USING (grp)
            GROUP BY 1, 2, 3
        ), mad AS MATERIALIZED (
            SELECT grp, CAST(MIN(dev) AS BIGINT) AS mad_bin
            FROM (
                SELECT grp, n, dev,
                       CAST(SUM(cnt) OVER (PARTITION BY grp ORDER BY dev
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                            AS BIGINT) AS cum
                FROM dev
            ) WHERE 2 * cum >= n GROUP BY grp
        ), outl AS (
            SELECT grp, CAST(SUM(cnt) AS BIGINT) AS n_outliers
            FROM grid JOIN med USING (grp) JOIN mad USING (grp)
            WHERE ABS(bin - median_bin) > {int(k_mad)} * mad_bin
            GROUP BY grp
        )
        SELECT med.grp AS source, med.n, med.median_bin, mad.mad_bin,
               CAST(COALESCE(outl.n_outliers, 0) AS BIGINT) AS n_outliers
        FROM med JOIN mad USING (grp) LEFT JOIN outl USING (grp)
        ORDER BY source
    """


def _pareto_sql() -> str:
    """q224 oracle: identical (xb, yb) bucket derivation (n_chars DIV 64;
    distinct-token-ratio micro DIV 100000 — all operands non-negative so
    `//` == DIV), grid aggregate, WEAK dominance via the same DESC RANGE
    1-PRECEDING window (strictly-greater-x best-y ≥) plus the same-x
    column max (>)."""
    return f"""
        WITH t AS (
            SELECT CAST(n_chars AS BIGINT) AS nc,
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                       TRIM(LOWER(COALESCE(text, ''))), '{WS}+'),
                       x -> x <> '') AS tk
            FROM documents
        ), d AS (
            SELECT nc // 64 AS xb,
                   ((CAST(LENGTH(LIST_DISTINCT(tk)) AS BIGINT) * 1000000
                     // GREATEST(CAST(LENGTH(tk) AS BIGINT), 1)) // 100000)
                       AS yb
            FROM t
        ), g AS (
            SELECT xb AS x_bucket, yb AS y_bucket,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM d GROUP BY 1, 2
        ), m AS (
            SELECT x_bucket, y_bucket, cnt,
                   MAX(y_bucket) OVER (ORDER BY x_bucket DESC
                       RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS maxy_right,
                   MAX(y_bucket) OVER (PARTITION BY x_bucket) AS maxy_same
            FROM g
        )
        SELECT x_bucket, y_bucket, cnt,
               NOT (COALESCE(maxy_right >= y_bucket, FALSE)
                    OR maxy_same > y_bucket) AS on_frontier
        FROM m
        ORDER BY x_bucket, y_bucket
    """


def _year_coverage_sql() -> str:
    """q225 oracle: the 'yr'-tag md5-mod year salt (byte-identical
    `_md5_pick_sql`-family arithmetic), shared YEAR_RE extraction
    (Java∩RE2), |sources|×|years| grid + window share."""
    from document_quality_assessment_ocr_spark.operators.profile import YEAR_RE

    return f"""
        WITH d AS (
            SELECT COALESCE(source, '') AS source,
                   COALESCE(text, '') || ' ' || CAST(
                       1970 + (('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)
                           || '|yr'), 1, 15))::BIGINT % 60) AS VARCHAR)
                       AS text
            FROM documents
        ), y AS (
            SELECT source,
                   UNNEST(REGEXP_EXTRACT_ALL(text, '{YEAR_RE}')) AS ystr
            FROM d
        ), g AS (
            SELECT source, CAST(ystr AS BIGINT) AS year,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM y GROUP BY 1, 2
        ), s AS (
            SELECT source, year, cnt,
                   CAST(SUM(cnt) OVER (PARTITION BY source) AS BIGINT)
                       AS group_total
            FROM g
        )
        SELECT source, year, cnt, group_total,
               CAST((cnt * 1000000) // group_total AS BIGINT) AS share_micro
        FROM s
        ORDER BY source, year
    """


def _quantile_map_sql(bucket_width: int = 16, ref: str = "src0") -> str:
    """q226 oracle: (source, bucket) grid + grid windows, mapped bucket
    via BIGINT cross-multiplied ECDF compare against the MATERIALIZED
    reference grid (read per source-row — must not inline), COALESCE to
    the reference minimum."""
    bw = int(bucket_width)
    return f"""
        WITH base AS (
            SELECT COALESCE(source, '') AS g, CAST(n_chars AS BIGINT) AS v
            FROM documents WHERE CAST(n_chars AS BIGINT) >= 0
        ), grid AS MATERIALIZED (
            SELECT g, v // {bw} AS bucket, CAST(COUNT(*) AS BIGINT) AS n
            FROM base GROUP BY 1, 2
        ), cum AS MATERIALIZED (
            SELECT g, bucket, n,
                   CAST(SUM(n) OVER (PARTITION BY g ORDER BY bucket
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS cum_n,
                   CAST(SUM(n) OVER (PARTITION BY g) AS BIGINT) AS total_n
            FROM grid
        ), ref AS MATERIALIZED (
            SELECT bucket AS rb, cum_n AS rcum, total_n AS rtot
            FROM cum WHERE g = '{ref}'
        ), rmin AS (
            SELECT CAST(MIN(rb) AS BIGINT) AS rm FROM ref
        )
        SELECT c.g AS source, c.bucket, c.n, c.cum_n, c.total_n,
               CAST(COALESCE(MAX(r.rb), rm) AS BIGINT) AS mapped_ref_bucket
        FROM cum c CROSS JOIN rmin
        LEFT JOIN ref r ON r.rcum * c.total_n <= c.cum_n * r.rtot
        GROUP BY c.g, c.bucket, c.n, c.cum_n, c.total_n, rm
        ORDER BY source, bucket
    """


def _cocitation_sql(cap: int = 16, min_support: int = 2) -> str:
    """q227 oracle: the cc1..cc3 md5-mod host salts (byte-identical
    `_md5_pick_sql`-family arithmetic), DISTINCT doc-host incidence,
    per-doc sorted capped host list, pair fan-out inside the list
    (a < b), support filter."""
    picks = ",\n                ".join(
        "('h' || CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)"
        f" || '|cc{i}'), 1, 15))::BIGINT % 12 AS VARCHAR))"
        for i in (1, 2, 3)
    )
    return f"""
        WITH inc AS (
            SELECT doc_id, UNNEST([{picks}]) AS host
            FROM documents
        ), hs AS (
            SELECT DISTINCT doc_id AS dd, host AS h
            FROM inc WHERE host <> ''
        ), arr AS (
            SELECT dd, LIST_SORT(LIST(h))[1:{int(cap)}] AS hl
            FROM hs GROUP BY dd
        ), p1 AS (
            SELECT dd, UNNEST(hl) AS a, hl FROM arr
        ), p2 AS (
            SELECT a, UNNEST(hl) AS b FROM p1
        )
        SELECT a AS host_a, b AS host_b, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM p2 WHERE a < b GROUP BY 1, 2
        HAVING COUNT(*) >= {int(min_support)}
        ORDER BY n_docs DESC, host_a, host_b
    """


def _vocab_coverage_sql(k_max: int = 1024) -> str:
    """q228 oracle: term counts → global ROW_NUMBER rank (the oracle is
    allowed the single-node sort the engine's two-level merge replaces),
    panel cumsum, power-of-two-or-last emission, BIGINT micro ratios."""
    km = int(k_max)
    return f"""
        WITH tok AS (
            SELECT UNNEST(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                TRIM(LOWER(COALESCE(text, ''))), '{WS}+'), x -> x <> ''))
                AS token
            FROM documents
        ), f AS MATERIALIZED (
            SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM tok GROUP BY token
        ), t AS (
            SELECT CAST(SUM(cnt) AS BIGINT) AS total_tokens,
                   CAST(COUNT(*) AS BIGINT) AS total_terms
            FROM f
        ), r AS (
            SELECT cnt,
                   CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token)
                        AS BIGINT) AS k
            FROM f
        ), p AS (
            SELECT k, cnt AS kth_cnt,
                   CAST(SUM(cnt) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED
                        PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens,
                   ROW_NUMBER() OVER (ORDER BY k DESC) AS rev
            FROM r WHERE k <= {km}
        )
        SELECT k, kth_cnt, cum_tokens, total_tokens, total_terms,
               CAST((cum_tokens * 1000000) // GREATEST(total_tokens, 1)
                    AS BIGINT) AS coverage_micro,
               CAST((k * 1000000) // GREATEST(total_terms, 1)
                    AS BIGINT) AS vocab_frac_micro
        FROM p, t
        WHERE (k & (k - 1)) = 0 OR rev = 1
        ORDER BY k
    """


def _burstiness_sql(k: int = 64) -> str:
    """q229 oracle: (doc, term) grid → term rollup (cf = sum tf, df =
    row count), global rank (cf desc, term), top-k panel, BIGINT
    burst_micro."""
    return f"""
        WITH tok AS (
            SELECT doc_id, UNNEST(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                TRIM(LOWER(COALESCE(text, ''))), '{WS}+'), x -> x <> ''))
                AS term
            FROM documents
        ), tf AS (
            SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
            FROM tok GROUP BY 1, 2
        ), s AS (
            SELECT term, CAST(SUM(tf) AS BIGINT) AS cf,
                   CAST(COUNT(*) AS BIGINT) AS df
            FROM tf GROUP BY term
        ), r AS (
            SELECT CAST(ROW_NUMBER() OVER (ORDER BY cf DESC, term) AS INT)
                       AS rank,
                   term, cf, df
            FROM s
        )
        SELECT rank, term, cf, df,
               CAST((cf * 1000000) // GREATEST(df, 1) AS BIGINT)
                   AS burst_micro
        FROM r WHERE rank <= {int(k)}
        ORDER BY rank
    """


def _gini_sql() -> str:
    """q230 oracle: (source, value) grid, cumulative-offset window ON
    THE GRID, consecutive-rank sum per cell, BIGINT Gini micro."""
    return """
        WITH base AS (
            SELECT COALESCE(CAST(source AS VARCHAR), '') AS g,
                   CAST(n_chars AS BIGINT) AS v
            FROM documents WHERE n_chars >= 0
        ), grid AS (
            SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c
            FROM base GROUP BY 1, 2
        ), cells AS (
            SELECT g, v, c,
                   CAST(SUM(c) OVER (PARTITION BY g ORDER BY v) - c
                        AS BIGINT) AS off
            FROM grid
        ), rs AS (
            SELECT g, v, c,
                   CAST(c * off + (c * (c + 1)) // 2 AS BIGINT) AS ranksum
            FROM cells
        ), agg AS (
            SELECT g, CAST(SUM(c) AS BIGINT) AS n_docs,
                   CAST(SUM(v * c) AS BIGINT) AS total_mass,
                   CAST(SUM(v * ranksum) AS BIGINT) AS s1
            FROM rs GROUP BY 1
        )
        SELECT g AS source, n_docs, total_mass,
               CAST(((2 * s1 - (n_docs + 1) * total_mass) * 1000000)
                    // GREATEST(n_docs * total_mass, 1) AS BIGINT)
                   AS gini_micro
        FROM agg ORDER BY source
    """


def _rfm_sql() -> str:
    """q231 oracle: per-user RFM aggregate, 1-row corpus max, fixed
    recency edges + floor-log2 buckets (LENGTH(BIN(n))-1), milli-value
    via the TRUNC float->int portable path."""
    return """
        WITH pu AS MATERIALIZED (
            SELECT user_id AS u,
                   CAST(MAX(EPOCH_US(ts)) AS BIGINT) AS last_us,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CAST(TRUNC(value * CAST(1000 AS DOUBLE))
                                 AS BIGINT)) AS BIGINT) AS value_milli
            FROM events GROUP BY 1
        ), ref AS (
            SELECT CAST(MAX(last_us) AS BIGINT) AS ref_us FROM pu
        ), seg AS (
            SELECT (ref_us - last_us) // 86400000000 AS r_days,
                   n_events,
                   GREATEST(value_milli, CAST(0 AS BIGINT)) AS vm
            FROM pu, ref
        )
        SELECT CAST(CASE WHEN r_days <= 0 THEN 0
                         WHEN r_days <= 1 THEN 1
                         WHEN r_days <= 7 THEN 2
                         WHEN r_days <= 30 THEN 3
                         ELSE 4 END AS BIGINT) AS r_bucket,
               CAST(LENGTH(BIN(n_events)) - 1 AS BIGINT) AS f_bucket,
               CAST(LENGTH(BIN(vm)) - 1 AS BIGINT) AS m_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(n_events) AS BIGINT) AS sum_events,
               CAST(SUM(vm) AS BIGINT) AS sum_value_milli
        FROM seg GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """


def _stickiness_sql(period_days: int = 7) -> str:
    """q232 oracle: distinct (day, user) grain, period = day // N
    (non-negative epochs, // == DIV), grid rollups + grid join."""
    return f"""
        WITH t2 AS MATERIALIZED (
            SELECT DISTINCT
                   (EPOCH_US(ts) // 86400000000) // {int(period_days)}
                       AS period,
                   EPOCH_US(ts) // 86400000000 AS day,
                   user_id AS u
            FROM events
        ), daily AS (
            SELECT period, day, CAST(COUNT(*) AS BIGINT) AS dau
            FROM t2 GROUP BY 1, 2
        ), pp AS (
            SELECT period, CAST(COUNT(*) AS BIGINT) AS n_active_days,
                   CAST(SUM(dau) AS BIGINT) AS sum_dau
            FROM daily GROUP BY 1
        ), pau AS (
            SELECT period, CAST(COUNT(DISTINCT u) AS BIGINT) AS pau
            FROM t2 GROUP BY 1
        )
        SELECT CAST(pp.period AS BIGINT) AS period, n_active_days,
               sum_dau, pau.pau AS pau,
               CAST((sum_dau * 1000000)
                    // GREATEST(n_active_days * pau.pau, 1) AS BIGINT)
                   AS stickiness_micro
        FROM pp JOIN pau ON pp.period = pau.period
        ORDER BY period
    """


def _concordance_core_sql(base_cte: str, n_buckets: int = 16) -> str:
    """Shared concordance tail (q233/q235): given a ``base`` CTE body
    producing (b1, b2) bucket pairs, append the dense-grid 2-D cumsum +
    shifted-join machinery — the engine twin is
    operators/experiment.rank_concordance's post-bucketing stages."""
    B = int(n_buckets)
    return f"""
        WITH base AS ({base_cte}), sparse AS (
            SELECT b1, b2, CAST(COUNT(*) AS BIGINT) AS n
            FROM base WHERE b1 >= 0 AND b2 >= 0 GROUP BY 1, 2
        ), dense AS MATERIALIZED (
            SELECT CAST(g1.i AS BIGINT) AS b1, CAST(g2.i AS BIGINT) AS b2,
                   CAST(COALESCE(sparse.n, 0) AS BIGINT) AS n
            FROM (SELECT UNNEST(RANGE(0, {B})) AS i) g1
            CROSS JOIN (SELECT UNNEST(RANGE(0, {B})) AS i) g2
            LEFT JOIN sparse ON sparse.b1 = g1.i AND sparse.b2 = g2.i
        ), rowcum AS (
            SELECT b1, b2, n,
                   CAST(SUM(n) OVER (PARTITION BY b1 ORDER BY b2)
                        AS BIGINT) AS cy
            FROM dense
        ), t AS MATERIALIZED (
            SELECT b1, b2, n,
                   CAST(SUM(cy) OVER (PARTITION BY b2 ORDER BY b1)
                        AS BIGINT) AS tv
            FROM rowcum
        ), cells AS (
            SELECT c.n AS n,
                   CAST(COALESCE(tll.tv, 0) AS BIGINT) AS ll,
                   CAST(COALESCE(tl.tv, 0) AS BIGINT) AS l,
                   CAST(COALESCE(tul.tv, 0) AS BIGINT) AS ul
            FROM t c
            LEFT JOIN t tll ON tll.b1 = c.b1 - 1 AND tll.b2 = c.b2 - 1
            LEFT JOIN t tl ON tl.b1 = c.b1 - 1 AND tl.b2 = c.b2
            LEFT JOIN t tul ON tul.b1 = c.b1 - 1 AND tul.b2 = {B - 1}
            WHERE c.n > 0
        ), agg AS (
            SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
                   CAST(SUM(n * ll) AS BIGINT) AS concordant,
                   CAST(SUM(n * (ul - l)) AS BIGINT) AS discordant
            FROM cells
        )
        SELECT n_rows, concordant, discordant,
               CAST((concordant * 1000000)
                    // GREATEST(concordant + discordant, 1) AS BIGINT)
                   AS concordance_micro
        FROM agg
    """


def _rank_concordance_sql(
    x_width: int = 32, y_width: int = 8, n_buckets: int = 16
) -> str:
    """q233 oracle: the shared concordance core over the documents
    (n_chars, q02-token-count) bucket pair."""
    B = int(n_buckets)
    ntoks = (
        f"LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(COALESCE(text,'')),"
        f" '{WS}+'), x -> x <> ''))"
    )
    base = f"""
            SELECT LEAST(CAST(n_chars AS BIGINT) // {int(x_width)},
                         CAST({B - 1} AS BIGINT)) AS b1,
                   LEAST(CAST({ntoks} AS BIGINT) // {int(y_width)},
                         CAST({B - 1} AS BIGINT)) AS b2
            FROM documents WHERE n_chars >= 0
    """
    return _concordance_core_sql(base, B)


def _assortativity_sql(n_hosts_src: int = 32, n_hosts_dst: int = 8) -> str:
    """q235 oracle: da1/da2 md5-mod host picks (the q227 salt family)
    synthesize one directed edge per doc; DISTINCT edges, out/in degree
    joins, floor-log2 degree buckets (LENGTH(BIN(d))-1), then the
    SHARED concordance core — log-degree assortativity with zero pair
    enumeration."""
    pick = (
        "('h' || CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)"
        " || '|{tag}'), 1, 15))::BIGINT % {m} AS VARCHAR))"
    )
    src = pick.format(tag="da1", m=int(n_hosts_src))
    dst = pick.format(tag="da2", m=int(n_hosts_dst))
    base = f"""
            WITH e AS (
                SELECT DISTINCT {src} AS s, {dst} AS d FROM documents
            ), od AS (
                SELECT s, CAST(COUNT(*) AS BIGINT) AS odeg
                FROM e GROUP BY s
            ), idg AS (
                SELECT d, CAST(COUNT(*) AS BIGINT) AS ideg
                FROM e GROUP BY d
            )
            SELECT CAST(LENGTH(BIN(od.odeg)) - 1 AS BIGINT) AS b1,
                   CAST(LENGTH(BIN(idg.ideg)) - 1 AS BIGINT) AS b2
            FROM e JOIN od ON e.s = od.s JOIN idg ON e.d = idg.d
    """
    return _concordance_core_sql(base, 16)


def _winsorized_mean_sql(
    lo_pct: int = 10, hi_pct: int = 90, src: str = "documents"
) -> str:
    """q236 oracle: (source, value) grid + grid cumsum, integer
    percentile ranks r = (n*p + 99) // 100, min-value-at-rank
    thresholds, clamp-and-mean in BIGINT micro."""
    return f"""
        WITH base AS (
            SELECT COALESCE(CAST(source AS VARCHAR), '') AS g,
                   CAST(n_chars AS BIGINT) AS v
            FROM {src} WHERE n_chars >= 0
        ), grid AS (
            SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c
            FROM base GROUP BY 1, 2
        ), cum AS MATERIALIZED (
            SELECT g, v, c,
                   CAST(SUM(c) OVER (PARTITION BY g ORDER BY v)
                        AS BIGINT) AS cum_c,
                   CAST(SUM(c) OVER (PARTITION BY g) AS BIGINT) AS n
            FROM grid
        ), thr AS (
            SELECT g,
                   CAST(MIN(CASE WHEN cum_c >= (n * {int(lo_pct)} + 99) // 100
                                 THEN v END) AS BIGINT) AS lo,
                   CAST(MIN(CASE WHEN cum_c >= (n * {int(hi_pct)} + 99) // 100
                                 THEN v END) AS BIGINT) AS hi
            FROM cum GROUP BY g
        )
        SELECT cum.g AS source,
               CAST(MAX(cum.n) AS BIGINT) AS n_docs,
               CAST(MAX(thr.lo) AS BIGINT) AS lo,
               CAST(MAX(thr.hi) AS BIGINT) AS hi,
               CAST(SUM(LEAST(GREATEST(cum.v, thr.lo), thr.hi) * cum.c)
                    AS BIGINT) AS winsorized_mass,
               CAST((SUM(LEAST(GREATEST(cum.v, thr.lo), thr.hi) * cum.c)
                     * 1000000) // GREATEST(MAX(cum.n), 1) AS BIGINT)
                   AS winsorized_mean_micro
        FROM cum JOIN thr ON cum.g = thr.g
        GROUP BY cum.g
        ORDER BY source
    """


def _filter_attribution_sql() -> str:
    """q234 oracle: the q89 gopher filter as a MATERIALIZED CTE, the
    SHARED quality.GOPHER_GATES predicate strings (they parse in both
    engines — the morton16 string-is-the-twin class) re-evaluated over
    its surfaced metrics, one wide aggregate, UNION ALL gate panel."""
    from document_quality_assessment_ocr_spark.operators.quality import (
        GOPHER_GATES,
    )

    n = len(GOPHER_GATES)
    fcols = ",\n                   ".join(
        f"CAST({pred} AS INT) AS f{i}"
        for i, (_, pred) in enumerate(GOPHER_GATES)
    )
    nf = " + ".join(f"f{i}" for i in range(n))
    counters = ",\n                   ".join(
        f"CAST(SUM(f{i}) AS BIGINT) AS fail{i},\n                   "
        f"CAST(SUM(CASE WHEN reason = '{name}' THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS first{i},\n                   "
        f"CAST(SUM(CASE WHEN f{i} = 1 AND {nf} = 1 THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS uniq{i}"
        for i, (name, _) in enumerate(GOPHER_GATES)
    )
    panel = "\n        UNION ALL ".join(
        f"SELECT CAST({i + 1} AS BIGINT) AS pos, '{name}' AS gate,"
        f" fail{i} AS n_fail, first{i} AS n_first_fail,"
        f" uniq{i} AS n_unique_fail, n_docs, n_rejected FROM w"
        for i, (name, _) in enumerate(GOPHER_GATES)
    )
    return f"""
        WITH g AS MATERIALIZED ({_gopher_filter_sql()}),
        per AS (
            SELECT {fcols},
                   reason
            FROM g
        ), w AS MATERIALIZED (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(CASE WHEN {nf} > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_rejected,
                   {counters}
            FROM per
        )
        SELECT * FROM ({panel}) ORDER BY pos
    """


def _mmr_sql(
    probes: tuple[int, ...] = (0, 1, 2, 3, 4),
    k: int = 8,
    lambda_micro: int = 700000,
) -> str:
    """q237 oracle: q13's exact cosine + ROW_NUMBER top-k, micro longs
    via TRUNC (== Spark CAST toward zero), candidate-panel pairwise
    cosines, three unrolled argmax CTEs (score DESC, id ASC ==
    (-score, id) min-struct)."""
    lam = int(lambda_micro)
    com = 1_000_000 - lam
    ids = ",".join(str(int(p)) for p in probes)
    cos = (
        "ROUND(LIST_DOT_PRODUCT({a}, {b}) / SQRT("
        "LIST_DOT_PRODUCT({a}, {a}) * LIST_DOT_PRODUCT({b}, {b})), 6)"
    )
    return f"""
        WITH e AS MATERIALIZED (
            SELECT CAST(vec_id AS BIGINT) AS vec_id,
                   CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ), p AS (
            SELECT vec_id AS probe_id, v AS pv FROM e
            WHERE vec_id IN ({ids})
        ), s AS (
            SELECT probe_id, e.vec_id AS neighbor_id,
                   {cos.format(a='pv', b='v')} AS cos
            FROM p, e WHERE e.vec_id <> probe_id
        ), cand AS MATERIALIZED (
            SELECT probe_id, neighbor_id,
                   CAST(TRUNC(cos * CAST(1000000 AS DOUBLE)) AS BIGINT)
                       AS rel
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                      ORDER BY cos DESC, neighbor_id) AS rank FROM s)
            WHERE rank <= {int(k)}
        ), cv AS MATERIALIZED (
            SELECT c.probe_id, c.neighbor_id, c.rel, e.v
            FROM cand c JOIN e ON e.vec_id = c.neighbor_id
        ), pw AS MATERIALIZED (
            SELECT a.probe_id, a.neighbor_id AS ia, b.neighbor_id AS ib,
                   CAST(TRUNC({cos.format(a='a.v', b='b.v')}
                              * CAST(1000000 AS DOUBLE)) AS BIGINT) AS sim
            FROM cv a JOIN cv b ON a.probe_id = b.probe_id
                 AND a.neighbor_id <> b.neighbor_id
        ), s1 AS MATERIALIZED (
            SELECT probe_id, neighbor_id AS sel1, rel AS rel1,
                   {lam} * rel AS score1
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                      ORDER BY rel DESC, neighbor_id) AS rn FROM cand)
            WHERE rn = 1
        ), sc2 AS (
            SELECT c.probe_id, c.neighbor_id, c.rel,
                   {lam} * c.rel - {com} * pw.sim AS score
            FROM cand c
            JOIN s1 ON s1.probe_id = c.probe_id
                 AND c.neighbor_id <> s1.sel1
            JOIN pw ON pw.probe_id = c.probe_id
                 AND pw.ia = c.neighbor_id AND pw.ib = s1.sel1
        ), s2 AS MATERIALIZED (
            SELECT probe_id, neighbor_id AS sel2, rel AS rel2,
                   score AS score2
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                      ORDER BY score DESC, neighbor_id) AS rn FROM sc2)
            WHERE rn = 1
        ), sc3 AS (
            SELECT c.probe_id, c.neighbor_id, c.rel,
                   {lam} * c.rel
                   - {com} * GREATEST(pa.sim, pb.sim) AS score
            FROM cand c
            JOIN s1 ON s1.probe_id = c.probe_id
                 AND c.neighbor_id <> s1.sel1
            JOIN s2 ON s2.probe_id = c.probe_id
                 AND c.neighbor_id <> s2.sel2
            JOIN pw pa ON pa.probe_id = c.probe_id
                 AND pa.ia = c.neighbor_id AND pa.ib = s1.sel1
            JOIN pw pb ON pb.probe_id = c.probe_id
                 AND pb.ia = c.neighbor_id AND pb.ib = s2.sel2
        ), s3 AS (
            SELECT probe_id, neighbor_id AS sel3, rel AS rel3,
                   score AS score3
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                      ORDER BY score DESC, neighbor_id) AS rn FROM sc3)
            WHERE rn = 1
        )
        SELECT * FROM (
            SELECT probe_id, CAST(1 AS INT) AS round,
                   sel1 AS neighbor_id, CAST(rel1 AS BIGINT) AS rel_micro,
                   CAST(score1 AS BIGINT) AS score_micro
            FROM s1
            UNION ALL
            SELECT probe_id, CAST(2 AS INT), sel2,
                   CAST(rel2 AS BIGINT), CAST(score2 AS BIGINT)
            FROM s2
            UNION ALL
            SELECT probe_id, CAST(3 AS INT), sel3,
                   CAST(rel3 AS BIGINT), CAST(score3 AS BIGINT)
            FROM s3
        ) ORDER BY probe_id, round
    """


def _auc_sql() -> str:
    """q238 oracle: the q89 gopher filter as a MATERIALIZED CTE joined
    back to documents for (source, n_chars), then the value-grid
    rank-trick AUC with mid-rank tie correction — all BIGINT, grid
    windows only."""
    return f"""
        WITH g AS MATERIALIZED ({_gopher_filter_sql()}),
        lab AS (
            SELECT COALESCE(CAST(d.source AS VARCHAR), '') AS grp,
                   CAST(d.n_chars AS BIGINT) AS v,
                   CAST(CASE WHEN g.keep THEN 1 ELSE 0 END AS BIGINT) AS y
            FROM documents d JOIN g ON CAST(d.doc_id AS BIGINT) = g.doc_id
            WHERE d.n_chars >= 0
        ), grid AS (
            SELECT grp, v, CAST(SUM(y) AS BIGINT) AS pos,
                   CAST(COUNT(*) - SUM(y) AS BIGINT) AS neg
            FROM lab GROUP BY 1, 2
        ), cells AS (
            SELECT grp, pos, neg,
                   CAST(SUM(neg) OVER (PARTITION BY grp ORDER BY v) - neg
                        AS BIGINT) AS neg_below
            FROM grid
        ), agg AS (
            SELECT grp, CAST(SUM(pos) AS BIGINT) AS n_pos,
                   CAST(SUM(neg) AS BIGINT) AS n_neg,
                   CAST(SUM(pos * (2 * neg_below + neg)) AS BIGINT) AS u2
            FROM cells GROUP BY 1
        )
        SELECT grp AS source, n_pos, n_neg,
               CAST((u2 * 500000) // GREATEST(n_pos * n_neg, 1)
                    AS BIGINT) AS auc_micro
        FROM agg ORDER BY source
    """


def _pr_sweep_sql() -> str:
    """q239 oracle: gopher keep label, (score) value grid, literal
    threshold fan via UNNEST-in-subselect cross join (the DuckDB-1.0
    lateral-safe idiom), micro ratios // with GREATEST guards."""
    ts = ", ".join(str(t) for t in _PR_THRESHOLDS)
    return f"""
        WITH g AS MATERIALIZED ({_gopher_filter_sql()}),
        lab AS (
            SELECT CAST(d.n_chars AS BIGINT) AS v,
                   CAST(CASE WHEN g.keep THEN 1 ELSE 0 END AS BIGINT) AS y
            FROM documents d JOIN g ON CAST(d.doc_id AS BIGINT) = g.doc_id
            WHERE d.n_chars >= 0
        ), grid AS (
            SELECT v, CAST(SUM(y) AS BIGINT) AS pos,
                   CAST(COUNT(*) - SUM(y) AS BIGINT) AS neg
            FROM lab GROUP BY 1
        ), fan AS (
            SELECT u.t, grid.v, grid.pos, grid.neg
            FROM grid CROSS JOIN
                 (SELECT CAST(UNNEST([{ts}]) AS BIGINT) AS t) u
        ), agg AS (
            SELECT t AS threshold,
                   CAST(SUM(CASE WHEN v >= t THEN pos ELSE 0 END)
                        AS BIGINT) AS tp,
                   CAST(SUM(CASE WHEN v >= t THEN neg ELSE 0 END)
                        AS BIGINT) AS fp,
                   CAST(SUM(CASE WHEN v < t THEN pos ELSE 0 END)
                        AS BIGINT) AS fn
            FROM fan GROUP BY 1
        ), pr AS (
            SELECT threshold, tp, fp, fn,
                   CAST((tp * 1000000) // GREATEST(tp + fp, 1)
                        AS BIGINT) AS precision_micro,
                   CAST((tp * 1000000) // GREATEST(tp + fn, 1)
                        AS BIGINT) AS recall_micro
            FROM agg
        )
        SELECT threshold, tp, fp, fn, precision_micro, recall_micro,
               CAST((2 * precision_micro * recall_micro)
                    // GREATEST(precision_micro + recall_micro, 1)
                    AS BIGINT) AS f1_micro
        FROM pr ORDER BY threshold
    """


def _centroid_drift_sql(scale: int = 64, tag: str = "cd") -> str:
    """q240 oracle: md5-nibble half pick (the _md5_mod twin), the q168
    TRUNC quantization, UNNEST(RANGE) dim fan (the q215 idiom), pivot,
    and the min-shift integer mean — all BIGINT."""
    sc = int(scale)
    return f"""
        WITH q AS (
            SELECT ('0x' || SUBSTR(MD5(CAST(vec_id AS VARCHAR)
                        || '|{tag}'), 1, 15))::BIGINT % 2 AS half,
                   LIST_TRANSFORM(embedding,
                       x -> CAST(TRUNC(CAST(x AS DOUBLE) * {sc})
                                 AS BIGINT)) AS q
            FROM embeddings
        ), f AS (
            SELECT half, CAST(i AS BIGINT) - 1 AS dim,
                   q[CAST(i AS INT)] AS v
            FROM (SELECT half, q, UNNEST(RANGE(1, LEN(q) + 1)) AS i
                  FROM q)
        ), g AS (
            SELECT half, dim, CAST(SUM(v) AS BIGINT) AS s,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM f GROUP BY 1, 2
        ), piv AS (
            SELECT dim,
                   CAST(SUM(CASE WHEN half = 0 THEN s ELSE 0 END)
                        AS BIGINT) AS s0,
                   CAST(SUM(CASE WHEN half = 0 THEN cnt ELSE 0 END)
                        AS BIGINT) AS c0,
                   CAST(SUM(CASE WHEN half = 1 THEN s ELSE 0 END)
                        AS BIGINT) AS s1,
                   CAST(SUM(CASE WHEN half = 1 THEN cnt ELSE 0 END)
                        AS BIGINT) AS c1
            FROM g GROUP BY 1
        ), m AS (
            SELECT dim, c0, c1,
                   CAST(((s0 + {sc} * c0) * 1000000)
                        // GREATEST(c0, 1) - {sc * 1_000_000}
                        AS BIGINT) AS mean0_micro,
                   CAST(((s1 + {sc} * c1) * 1000000)
                        // GREATEST(c1, 1) - {sc * 1_000_000}
                        AS BIGINT) AS mean1_micro
            FROM piv
        )
        SELECT CAST(dim AS BIGINT) AS dim, c0, c1, mean0_micro,
               mean1_micro,
               CAST(mean0_micro - mean1_micro AS BIGINT) AS drift_micro,
               CAST(ABS(mean0_micro - mean1_micro) AS BIGINT)
                   AS abs_drift_micro
        FROM m ORDER BY dim
    """


def _daily_autocorr_sql(max_lag: int = 7) -> str:
    """q241 oracle: daily grid (EPOCH_US // day, non-negative), UNNEST
    lag fan, grid self-join, exact BIGINT moments, the engine's
    fixed-order Pearson double expression with the +0e0 guard."""
    ml = int(max_lag)
    return f"""
        WITH daily AS MATERIALIZED (
            SELECT EPOCH_US(ts) // 86400000000 AS day,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1
        ), fan AS (
            SELECT d.day, d.c AS x, l.lag
            FROM daily d CROSS JOIN
                 (SELECT CAST(UNNEST(RANGE(1, {ml + 1})) AS BIGINT)
                      AS lag) l
        ), j AS (
            SELECT f.lag, f.x, d2.c AS y
            FROM fan f JOIN daily d2 ON f.day + f.lag = d2.day
        ), agg AS (
            SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
                   CAST(SUM(x) AS BIGINT) AS sx,
                   CAST(SUM(y) AS BIGINT) AS sy,
                   CAST(SUM(x * x) AS BIGINT) AS sxx,
                   CAST(SUM(y * y) AS BIGINT) AS syy,
                   CAST(SUM(x * y) AS BIGINT) AS sxy
            FROM j GROUP BY 1
        )
        SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
               CASE WHEN (n_pairs * sxx - sx * sx) > 0
                         AND (n_pairs * syy - sy * sy) > 0 THEN
                   ROUND(CAST(n_pairs * sxy - sx * sy AS DOUBLE)
                         / (SQRT(CAST(n_pairs * sxx - sx * sx AS DOUBLE))
                            * SQRT(CAST(n_pairs * syy - sy * sy
                                        AS DOUBLE))), 6) + 0e0
               END AS r
        FROM agg ORDER BY lag
    """


def _label_prop_sql(rounds: int = 3, u1: int = 48, u2: int = 12) -> str:
    """q242 oracle: the lp1/lp2 edge-synthesis twin, MATERIALIZED
    distinct undirected edges (read every round), and ``rounds``
    unrolled vote/argmax CTE pairs — ROW_NUMBER (cnt DESC, label ASC)
    == the engine's (-cnt, label) min-struct (q213 precedent).  Each
    label CTE is referenced exactly once by the next round (the q149
    single-reference unroll rule)."""
    r = int(rounds)
    body = ""
    prev = "l0"
    for i in range(1, r + 1):
        body += f""", v{i} AS (
            SELECT und.u AS node, l.label, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM und JOIN {prev} l ON und.v = l.node GROUP BY 1, 2
        ), l{i} AS (
            SELECT node, label FROM (
                SELECT node, label,
                       ROW_NUMBER() OVER (PARTITION BY node
                           ORDER BY cnt DESC, label ASC) AS rn
                FROM v{i}) WHERE rn = 1
        )"""
        prev = f"l{i}"
    return f"""
        WITH e0 AS (
            SELECT 'h' || CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)
                       || '|lp1'), 1, 15))::BIGINT % {int(u1)} AS VARCHAR)
                       AS src,
                   'h' || CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)
                       || '|lp2'), 1, 15))::BIGINT % {int(u2)} AS VARCHAR)
                       AS dst
            FROM documents
        ), und AS MATERIALIZED (
            SELECT DISTINCT u, v FROM (
                SELECT src AS u, dst AS v FROM e0 WHERE src <> dst
                UNION ALL
                SELECT dst AS u, src AS v FROM e0 WHERE src <> dst
            )
        ), l0 AS (
            SELECT DISTINCT u AS node, u AS label FROM und
        ){body}
        SELECT node, label FROM {prev} ORDER BY node
    """


def _ndcg_sql(k: int = 5) -> str:
    """q247 oracle: the q119 approx/exact chains (q17 IVF CTE + inline
    exact top-k), graded rel = k+1-rank, and the SHARED
    retrieval.ndcg_discounts_micro integer literals in a CASE discount
    — all BIGINT, one // ratio."""
    from document_quality_assessment_ocr_spark.operators.retrieval import (
        ndcg_discounts_micro,
    )

    kk = int(k)
    d = ndcg_discounts_micro(kk)
    case = (
        "CASE rank "
        + " ".join(f"WHEN {i} THEN {dm}" for i, dm in enumerate(d, 1))
        + " ELSE 0 END"
    )
    acase = (
        "CASE a.rank "
        + " ".join(f"WHEN {i} THEN {dm}" for i, dm in enumerate(d, 1))
        + " ELSE 0 END"
    )
    return f"""
        WITH approx AS (
            {_ivf_sql()}
        ), e2 AS (
            SELECT CAST(vec_id AS BIGINT) AS vec_id,
                   CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ), p2 AS (
            SELECT vec_id AS probe_id, v AS pv FROM e2
            WHERE vec_id IN (0, 1, 2)
        ), s2 AS (
            SELECT probe_id, e2.vec_id AS neighbor_id,
                   ROUND(LIST_DOT_PRODUCT(pv, v)
                         / SQRT(LIST_DOT_PRODUCT(pv, pv)
                                * LIST_DOT_PRODUCT(v, v)), 6) AS cos
            FROM p2, e2 WHERE e2.vec_id <> probe_id
        ), exact AS MATERIALIZED (
            SELECT probe_id, neighbor_id, rank,
                   CAST({kk} + 1 - rank AS BIGINT) AS rel
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                ORDER BY cos DESC, neighbor_id ASC)
                         AS rank
                  FROM s2)
            WHERE rank <= {kk}
        ), dcg AS (
            SELECT a.probe_id,
                   CAST(SUM(COALESCE(e.rel, 0) * ({acase})) AS BIGINT)
                       AS dcg_micro
            FROM (SELECT probe_id, neighbor_id, rank FROM approx
                  WHERE rank <= {kk}) a
            LEFT JOIN exact e ON a.probe_id = e.probe_id
                             AND a.neighbor_id = e.neighbor_id
            GROUP BY 1
        ), idcg AS (
            SELECT probe_id,
                   CAST(SUM(rel * ({case})) AS BIGINT) AS idcg_micro
            FROM exact GROUP BY 1
        )
        SELECT idcg.probe_id AS probe_id,
               CAST(COALESCE(dcg.dcg_micro, 0) AS BIGINT) AS dcg_micro,
               idcg.idcg_micro,
               CAST((COALESCE(dcg.dcg_micro, 0) * 1000000)
                    // GREATEST(idcg.idcg_micro, 1) AS BIGINT)
                   AS ndcg_micro
        FROM idcg LEFT JOIN dcg ON dcg.probe_id = idcg.probe_id
        ORDER BY probe_id
    """


def _mrr_sql(k: int = 5) -> str:
    """q248 oracle: the q247 approx/exact chains (q17 IVF CTE + inline
    exact top-k), first-hit MIN rank over the relevance join,
    ``1e6 // rank`` — all BIGINT, non-negative // only."""
    kk = int(k)
    return f"""
        WITH approx AS (
            {_ivf_sql()}
        ), e2 AS (
            SELECT CAST(vec_id AS BIGINT) AS vec_id,
                   CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ), p2 AS (
            SELECT vec_id AS probe_id, v AS pv FROM e2
            WHERE vec_id IN (0, 1, 2)
        ), s2 AS (
            SELECT probe_id, e2.vec_id AS neighbor_id,
                   ROUND(LIST_DOT_PRODUCT(pv, v)
                         / SQRT(LIST_DOT_PRODUCT(pv, pv)
                                * LIST_DOT_PRODUCT(v, v)), 6) AS cos
            FROM p2, e2 WHERE e2.vec_id <> probe_id
        ), exact AS MATERIALIZED (
            SELECT probe_id, neighbor_id
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                ORDER BY cos DESC, neighbor_id ASC)
                         AS rank
                  FROM s2)
            WHERE rank <= {kk}
        ), hits AS (
            SELECT a.probe_id, CAST(MIN(a.rank) AS BIGINT) AS fr
            FROM (SELECT probe_id, neighbor_id, rank FROM approx
                  WHERE rank <= {kk}) a
            JOIN exact e ON a.probe_id = e.probe_id
                        AND a.neighbor_id = e.neighbor_id
            GROUP BY 1
        ), probes AS (
            SELECT DISTINCT probe_id FROM exact
        )
        SELECT p.probe_id AS probe_id,
               CAST(COALESCE(h.fr, 0) AS BIGINT) AS first_hit_rank,
               CAST(CASE WHEN h.fr IS NOT NULL THEN 1000000 // h.fr
                         ELSE 0 END AS BIGINT) AS rr_micro
        FROM probes p LEFT JOIN hits h ON h.probe_id = p.probe_id
        ORDER BY probe_id
    """


def _keep_effect_sql() -> str:
    """q249 oracle: the q89 gopher filter as a MATERIALIZED CTE joined
    back to documents (the q238 builder shape), exact BIGINT moments
    per (source, keep-side), then the SHARED
    ``experiment.cohens_d_expr()`` text — identical float op order on
    both engines by construction."""
    from document_quality_assessment_ocr_spark.operators.experiment import (
        cohens_d_expr,
    )

    return f"""
        WITH g AS MATERIALIZED ({_gopher_filter_sql()}),
        lab AS (
            SELECT COALESCE(CAST(d.source AS VARCHAR), '') AS grp,
                   CAST(d.n_chars AS BIGINT) AS v,
                   CAST(CASE WHEN g.keep THEN 1 ELSE 0 END AS BIGINT) AS y
            FROM documents d JOIN g ON CAST(d.doc_id AS BIGINT) = g.doc_id
        ), agg AS (
            SELECT grp,
                   CAST(SUM(y) AS BIGINT) AS n1,
                   CAST(COUNT(*) - SUM(y) AS BIGINT) AS n0,
                   CAST(SUM(v * y) AS BIGINT) AS s1,
                   CAST(SUM(v) - SUM(v * y) AS BIGINT) AS s0,
                   CAST(SUM(v * v * y) AS BIGINT) AS q1,
                   CAST(SUM(v * v) - SUM(v * v * y) AS BIGINT) AS q0
            FROM lab GROUP BY 1
        )
        SELECT grp AS source, n1 AS n_pos, n0 AS n_neg,
               {cohens_d_expr()} AS cohens_d
        FROM agg ORDER BY source
    """


def _zipf_slope_sql() -> str:
    """q250 oracle: the shared WS token split, (source, term) grid,
    (source, count) cells with a count-domain grid cumsum, the shared
    ``textstats.POW2_TRIPLES`` literal band fan (closed-form interval
    overlap — no shifts, no powers), exact BIGINT OLS moments, and the
    SHARED ``ZIPF_SLOPE_EXPR`` text."""
    from document_quality_assessment_ocr_spark.operators.textstats import (
        POW2_TRIPLES,
        ZIPF_SLOPE_EXPR,
    )

    vals = ", ".join(f"({k}, {plo}, {phi})" for k, plo, phi in POW2_TRIPLES)
    return f"""
        WITH tok AS (
            SELECT COALESCE(CAST(source AS VARCHAR), '') AS g,
                   UNNEST(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                       TRIM(LOWER(COALESCE(text, ''))), '{WS}+'),
                       x -> x <> '')) AS term
            FROM documents
        ), grid AS (
            SELECT g, term, CAST(COUNT(*) AS BIGINT) AS c
            FROM tok GROUP BY 1, 2
        ), cells AS (
            SELECT g, c, CAST(COUNT(*) AS BIGINT) AS nt
            FROM grid GROUP BY 1, 2
        ), cello AS (
            SELECT g, CAST(LENGTH(BIN(c)) - 1 AS BIGINT) AS y,
                   CAST(COALESCE(SUM(nt) OVER (PARTITION BY g
                            ORDER BY c DESC ROWS BETWEEN UNBOUNDED
                            PRECEDING AND 1 PRECEDING), 0)
                        + 1 AS BIGINT) AS lo,
                   CAST(COALESCE(SUM(nt) OVER (PARTITION BY g
                            ORDER BY c DESC ROWS BETWEEN UNBOUNDED
                            PRECEDING AND 1 PRECEDING), 0)
                        + nt AS BIGINT) AS hi
            FROM cells
        ), fan AS (
            SELECT g, y, CAST(p.k AS BIGINT) AS x,
                   GREATEST(CAST(0 AS BIGINT),
                            LEAST(hi, CAST(p.phi AS BIGINT))
                            - GREATEST(lo, CAST(p.plo AS BIGINT))
                            + 1) AS ov
            FROM cello CROSS JOIN (VALUES {vals}) AS p(k, plo, phi)
        ), agg AS (
            SELECT g, CAST(SUM(ov) AS BIGINT) AS n,
                   CAST(SUM(x * ov) AS BIGINT) AS sx,
                   CAST(SUM(y * ov) AS BIGINT) AS sy,
                   CAST(SUM(x * x * ov) AS BIGINT) AS sxx,
                   CAST(SUM(x * y * ov) AS BIGINT) AS sxy
            FROM fan WHERE ov > 0 GROUP BY 1
        )
        SELECT g AS source, n AS n_types,
               CAST(n * sxy - sx * sy AS BIGINT) AS num,
               CAST(n * sxx - sx * sx AS BIGINT) AS den,
               {ZIPF_SLOPE_EXPR} AS zipf_slope
        FROM agg ORDER BY source
    """


def _mcnemar_sql() -> str:
    """q251 oracle: the q89 gopher CTE and the q88 C4 CTE (both
    MATERIALIZED — each read once but subtree-heavy) joined on doc_id,
    conditional-sum 2×2 cells per source, the SHARED
    ``experiment.mcnemar_expr()`` text, agreement // guard."""
    from document_quality_assessment_ocr_spark.operators.experiment import (
        mcnemar_expr,
    )

    return f"""
        WITH g AS MATERIALIZED ({_gopher_filter_sql()}),
        c AS MATERIALIZED ({_c4_filter_sql()}),
        base AS (
            SELECT COALESCE(CAST(d.source AS VARCHAR), '') AS grp,
                   CAST(CASE WHEN g.keep THEN 1 ELSE 0 END AS BIGINT) AS a,
                   CAST(CASE WHEN c.doc_keep THEN 1 ELSE 0 END AS BIGINT)
                       AS b
            FROM documents d
            JOIN g ON CAST(d.doc_id AS BIGINT) = g.doc_id
            JOIN c ON CAST(d.doc_id AS BIGINT) = c.doc_id
        ), agg AS (
            SELECT grp,
                   CAST(SUM(a * b) AS BIGINT) AS n11,
                   CAST(SUM(a * (1 - b)) AS BIGINT) AS n10,
                   CAST(SUM((1 - a) * b) AS BIGINT) AS n01,
                   CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00
            FROM base GROUP BY 1
        )
        SELECT grp AS source, n11, n10, n01, n00,
               CAST(((n00 + n11) * 1000000)
                    // GREATEST(n00 + n01 + n10 + n11, 1) AS BIGINT)
                   AS agreement_micro,
               {mcnemar_expr()} AS mcnemar_chi2
        FROM agg ORDER BY source
    """


def _km_sql(horizon: int = 64, sf_dir: str | None = None) -> str:
    """q252 oracle: the duration grid replicated in SQL (per-user
    whole-day min/max, last-day censoring — // on non-negative epochs),
    n_risk via the grid-bounded cumulative window, and ``s_micro`` as a
    literal CASE computed by the SHARED ``sessions.kaplan_meier_fold``
    over cells the builder reads from the SAME parquet (q201 class:
    duckdb in the builder, grid bounded by the horizon-day domain, not
    the corpus)."""
    import duckdb

    from document_quality_assessment_ocr_spark.operators.sessions import (
        kaplan_meier_fold,
    )

    sf_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01"
    )
    day = 86_400_000_000
    hz = int(horizon)
    grid_sql = f"""
        WITH pu AS (
            SELECT user_id,
                   MIN(EPOCH_US(ts)) // {day} AS fd,
                   MAX(EPOCH_US(ts)) // {day} AS ld
            FROM {{src}} GROUP BY 1
        ), m AS (
            SELECT MAX(ld) AS md FROM pu
        ), durs AS (
            SELECT LEAST(ld - fd, {hz}) AS dur,
                   CAST(CASE WHEN ld < md THEN 1 ELSE 0 END AS BIGINT)
                       AS ev
            FROM pu, m
        ), grid AS (
            SELECT dur, CAST(SUM(ev) AS BIGINT) AS n_events,
                   CAST(COUNT(*) - SUM(ev) AS BIGINT) AS n_censored
            FROM durs GROUP BY 1
        )"""
    con = duckdb.connect()
    cells = [
        (int(t), int(d), int(c))
        for t, d, c in con.execute(
            grid_sql.format(src=f"read_parquet('{sf_dir}/events.parquet')")
            + " SELECT dur, n_events, n_censored FROM grid ORDER BY dur"
        ).fetchall()
    ]
    con.close()
    folded = kaplan_meier_fold(cells)
    tot = sum(d + c for _, d, c in cells)
    scase = (
        "CASE dur "
        + " ".join(f"WHEN {t} THEN {s}" for t, _, _, _, s in folded)
        + " ELSE 0 END"
    )
    return (
        grid_sql.format(src="events")
        + f"""
        SELECT dur AS dur_days,
               CAST({tot} - COALESCE(SUM(n_events + n_censored)
                        OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED
                              PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS n_risk,
               n_events, n_censored,
               CAST({scase} AS BIGINT) AS s_micro
        FROM grid ORDER BY dur_days
    """
    )


def _mann_kendall_sql() -> str:
    """q253 oracle: daily grid (// on non-negative epochs), pair sum on
    the grid self-join, tie correction, and the SHARED
    ``sessions.mann_kendall_expr()`` z text."""
    from document_quality_assessment_ocr_spark.operators.sessions import (
        mann_kendall_expr,
    )

    day = 86_400_000_000
    return f"""
        WITH daily AS (
            SELECT EPOCH_US(ts) // {day} AS d,
                   CAST(COUNT(*) AS BIGINT) AS c
            FROM events GROUP BY 1
        ), p AS (
            SELECT CAST(COALESCE(SUM(CASE WHEN b.c > a.c THEN 1
                                          WHEN b.c < a.c THEN -1
                                          ELSE 0 END), 0) AS BIGINT)
                       AS s_stat
            FROM daily a JOIN daily b ON a.d < b.d
        ), t AS (
            SELECT CAST(SUM(tt) AS BIGINT) AS n,
                   CAST(COALESCE(SUM(tt * (tt - 1) * (2 * tt + 5)), 0)
                        AS BIGINT) AS tie_sum
            FROM (SELECT c, CAST(COUNT(*) AS BIGINT) AS tt
                  FROM daily GROUP BY 1)
        ), f AS (
            SELECT n AS n_days, s_stat,
                   CAST(n * (n - 1) * (2 * n + 5) - tie_sum AS BIGINT)
                       AS var18
            FROM p, t
        )
        SELECT n_days, s_stat, var18,
               {mann_kendall_expr()} AS z_mk
        FROM f
    """


def _textrank_sql(k: int = 20, iters: int = 3) -> str:
    """q254 oracle: the shared WS token split, adjacent-pair edges via
    the LIST_TRANSFORM index idiom (the DSIR-builder bigram shape),
    self-loops dropped, both directions UNION-deduped, edges
    MATERIALIZED, then the SHARED ``_pr_unrolled_ctes`` fixed-point
    rounds; final ROW_NUMBER (pr DESC, term ASC) == the engine's
    (-pr, term) min-struct (q213)."""
    its, prev = _pr_unrolled_ctes(int(iters))
    tk = (
        "LIST_FILTER(REGEXP_SPLIT_TO_ARRAY("
        f"TRIM(LOWER(COALESCE(text,''))), '{WS}+'), x -> x <> '')"
    )
    return f"""
        WITH tok AS (
            SELECT {tk} AS tk FROM documents
        ), pp AS (
            SELECT UNNEST(CASE WHEN LEN(tk) >= 2
                   THEN LIST_TRANSFORM(RANGE(1, LEN(tk)),
                        i -> [tk[CAST(i AS INT)], tk[CAST(i AS INT) + 1]])
                   ELSE []::VARCHAR[][] END) AS pr
            FROM tok
        ), und AS (
            SELECT pr[1] AS a, pr[2] AS b FROM pp WHERE pr[1] <> pr[2]
        ), edges AS MATERIALIZED (
            SELECT a AS src, b AS dst FROM und
            UNION
            SELECT b AS src, a AS dst FROM und
        ), nodes AS (
            SELECT DISTINCT src AS id FROM edges
        ), deg AS (
            SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY 1
        ), r0 AS (
            SELECT id, CAST(1000000000 AS BIGINT) AS pr FROM nodes
        ), {", ".join(its)}
        SELECT id AS term, CAST(pr AS BIGINT) AS pr,
               CAST(ROW_NUMBER() OVER (ORDER BY pr DESC, id ASC) AS INT)
                   AS rank
        FROM {prev}
        ORDER BY rank LIMIT {int(k)}
    """


def _psi_sql(tag: str = "psi") -> str:
    """q255 oracle: md5-nibble half split (the _md5_mod twin), whole-bit
    value buckets via BIN, grid-bounded unpartitioned windows for the
    totals and psi_total — same non-negative bits-product algebra."""
    pick = (
        f"CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR) || '|{tag}'),"
        f" 1, 15)) AS BIGINT) % 2"
    )
    return f"""
        WITH base AS (
            SELECT {pick} AS h,
                   CAST(LENGTH(BIN(GREATEST(CAST(n_chars AS BIGINT), 0)
                        + 1)) - 1 AS BIGINT) AS bucket
            FROM documents
        ), grid AS (
            SELECT bucket,
                   CAST(COUNT(*) FILTER (WHERE h = 0) AS BIGINT) AS n_a,
                   CAST(COUNT(*) FILTER (WHERE h = 1) AS BIGINT) AS n_b
            FROM base GROUP BY 1
        ), wp AS (
            SELECT bucket, n_a, n_b,
                   CAST((n_a * 1000000)
                        // GREATEST(SUM(n_a) OVER (), 1) AS BIGINT)
                       AS p_micro,
                   CAST((n_b * 1000000)
                        // GREATEST(SUM(n_b) OVER (), 1) AS BIGINT)
                       AS q_micro
            FROM grid
        ), t AS (
            SELECT bucket, n_a, n_b, p_micro, q_micro,
                   CAST((p_micro - q_micro)
                        * (CAST(LENGTH(BIN(p_micro)) - 1 AS BIGINT)
                           - CAST(LENGTH(BIN(q_micro)) - 1 AS BIGINT))
                        AS BIGINT) AS psi_term
            FROM wp
        )
        SELECT bucket, n_a, n_b, p_micro, q_micro, psi_term,
               CAST(SUM(psi_term) OVER () AS BIGINT) AS psi_total
        FROM t ORDER BY bucket
    """


def _conductance_sql(groups: int = 4, tag: str = "cond") -> str:
    """q256 oracle: the shared q131/q149 host-graph prefix, DISTINCT
    canonical undirected edges MATERIALIZED, md5-mod group assignment
    (the _md5_mod twin), endpoint-explode volumes, cut to both sides,
    // with min-side guard."""

    def pick(col: str) -> str:
        return (
            f"CAST(('0x' || SUBSTR(MD5({col} || '|{tag}'), 1, 15))"
            f" AS BIGINT) % {int(groups)}"
        )

    return _host_graph_ctes() + f""", und AS MATERIALIZED (
            SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
            FROM edges
        ), ge AS (
            SELECT {pick('a')} AS ga, {pick('b')} AS gb FROM und
        ), tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM ge
        ), vol AS (
            SELECT grp, CAST(COUNT(*) AS BIGINT) AS vol
            FROM (SELECT ga AS grp FROM ge
                  UNION ALL SELECT gb FROM ge)
            GROUP BY 1
        ), cut AS (
            SELECT grp, CAST(COUNT(*) AS BIGINT) AS cut_edges
            FROM (SELECT ga AS grp FROM ge WHERE ga <> gb
                  UNION ALL SELECT gb FROM ge WHERE ga <> gb)
            GROUP BY 1
        )
        SELECT v.grp, v.vol,
               CAST(COALESCE(c.cut_edges, 0) AS BIGINT) AS cut_edges,
               t.n_edges,
               CAST((COALESCE(c.cut_edges, 0) * 1000000)
                    // GREATEST(LEAST(v.vol, 2 * t.n_edges - v.vol), 1)
                    AS BIGINT) AS conductance_micro
        FROM vol v LEFT JOIN cut c ON c.grp = v.grp CROSS JOIN tot t
        ORDER BY v.grp
    """


def _fertility_sql(n_merges: int = 8) -> str:
    """q258 oracle: the q75 python-twin segmentation VALUES map joined
    to the SQL token stream, rolled up per documents.lang - subtoken
    count is LEN(STR_SPLIT(seg_text,' ')), // on non-negatives."""
    import duckdb as _dd

    from document_quality_assessment_ocr_spark.operators.bpe import (
        bpe_python,
        segment_words,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    con = _dd.connect()
    wc = dict(
        con.execute(
            f"""
            SELECT w, COUNT(*) FROM (
                SELECT UNNEST(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                    TRIM(LOWER(COALESCE(text,''))), '{WS}+'), x -> x <> '')) AS w
                FROM '{sf_dir}/documents.parquet'
            ) GROUP BY w
            """
        ).fetchall()
    )
    con.close()
    merges = [(l, r) for _, l, r, _ in bpe_python(wc, int(n_merges))]
    seg = segment_words(sorted(wc), merges)

    def q(x: str) -> str:
        return x.replace("'", "''")

    rows = ", ".join(f"('{q(w)}', '{q(s)}')" for w, s in seg.items())
    return f"""
        WITH tk AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
                   LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                       TRIM(LOWER(COALESCE(text,''))), '{WS}+'),
                       x -> x <> '') AS a
            FROM documents
        ), t AS (
            SELECT doc_id, lang, UNNEST(a) AS word FROM tk
        ), seg(word, seg_text) AS (VALUES {rows}),
        j AS (
            SELECT t.lang,
                   CAST(LEN(STR_SPLIT(seg.seg_text, ' ')) AS BIGINT) AS ns
            FROM t JOIN seg ON seg.word = t.word
        ), agg AS (
            SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_words,
                   CAST(SUM(ns) AS BIGINT) AS n_subtokens
            FROM j GROUP BY 1
        )
        SELECT lang, n_words, n_subtokens,
               CAST((n_subtokens * 1000) // GREATEST(n_words, 1)
                    AS BIGINT) AS fertility_milli
        FROM agg ORDER BY lang
    """


def _modularity_sql(groups: int = 4, tag: str = "cond") -> str:
    """q257 oracle: the q256 shared prefix (host graph + MATERIALIZED
    canonical und + md5-mod groups), within-group edge counts, the
    4m2-scaled integer identity, one // at the end."""

    def pick(col: str) -> str:
        return (
            f"CAST(('0x' || SUBSTR(MD5({col} || '|{tag}'), 1, 15))"
            f" AS BIGINT) % {int(groups)}"
        )

    return _host_graph_ctes() + f""", und AS MATERIALIZED (
            SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
            FROM edges
        ), ge AS MATERIALIZED (
            SELECT {pick('a')} AS ga, {pick('b')} AS gb FROM und
        ), tot AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS m FROM ge
        ), vol AS (
            SELECT grp, CAST(COUNT(*) AS BIGINT) AS vol
            FROM (SELECT ga AS grp FROM ge
                  UNION ALL SELECT gb FROM ge)
            GROUP BY 1
        ), win AS (
            SELECT ga AS grp, CAST(COUNT(*) AS BIGINT) AS within_edges
            FROM ge WHERE ga = gb GROUP BY 1
        ), per AS (
            SELECT v.grp, v.vol,
                   CAST(COALESCE(w.within_edges, 0) AS BIGINT)
                       AS within_edges,
                   t.m,
                   CAST(4 * t.m * COALESCE(w.within_edges, 0)
                        - v.vol * v.vol AS BIGINT) AS q_num
            FROM vol v LEFT JOIN win w ON w.grp = v.grp CROSS JOIN tot t
        )
        SELECT grp, vol, within_edges, q_num,
               CAST(((SUM(q_num) OVER () + 4 * m * m) * 1000000)
                    // GREATEST(4 * m * m, 1) - 1000000 AS BIGINT)
                   AS q_micro
        FROM per ORDER BY grp
    """


def _prf_sql(k_docs: int = 5, m: int = 5) -> str:
    """q260 oracle: the q98 BM25 chain MATERIALIZED, rank<=k_docs pools,
    pool tf anti-joined against the shared panel VALUES, DISTINCT-doc
    corpus df semi-joined to the pool vocabulary, same integer score,
    ROW_NUMBER (score DESC, token ASC)."""
    from document_quality_assessment_ocr_spark.operators.retrieval import (
        IDF_MILLI,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    terms = _bm25_panel_terms(sf_dir)
    panel = ", ".join(
        f"({q + 1}, '{t}')" for q in range(3) for t in terms[3 * q : 3 * q + 3]
    )
    ltoks = (
        "LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(COALESCE(text,''))),"
        f" '{WS}+'), x -> x <> '')"
    )
    return f"""
        WITH bm AS MATERIALIZED ({_bm25_sql()}),
        pool AS (
            SELECT query_id, doc_id FROM bm WHERE rank <= {int(k_docs)}
        ), d AS (
            SELECT CAST(doc_id AS BIGINT) AS doc_id, {ltoks} AS tk
            FROM documents
        ), toks AS (
            SELECT doc_id, UNNEST(tk) AS token FROM d
        ), qt(query_id, token) AS (VALUES {panel}),
        ptf AS (
            SELECT p.query_id, t.token,
                   CAST(COUNT(*) AS BIGINT) AS tf_pool
            FROM toks t JOIN pool p USING (doc_id)
            GROUP BY 1, 2
        ), ptfx AS (
            SELECT ptf.* FROM ptf
            LEFT JOIN qt ON qt.query_id = ptf.query_id
                        AND qt.token = ptf.token
            WHERE qt.token IS NULL
        ), cand AS (
            SELECT DISTINCT token FROM ptfx
        ), dfx AS (
            SELECT token, CAST(COUNT(*) AS BIGINT) AS df
            FROM (SELECT DISTINCT doc_id, token FROM toks)
            WHERE token IN (SELECT token FROM cand)
            GROUP BY 1
        ), stats AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM d
        ), scored AS (
            SELECT query_id, p.token, tf_pool, df,
                   CAST(tf_pool * (((n_docs - df) * {IDF_MILLI}) // df)
                        AS BIGINT) AS score
            FROM ptfx p JOIN dfx USING (token) CROSS JOIN stats
        )
        SELECT CAST(query_id AS INT) AS query_id, token, tf_pool, df,
               score, CAST(rank AS INT) AS rank
        FROM (SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY query_id
                  ORDER BY score DESC, token ASC) AS rank
              FROM scored)
        WHERE rank <= {int(m)}
        ORDER BY query_id, rank
    """


def _sqrt_mixture_sql() -> str:
    """q259 oracle: same grid, FLOOR(SQRT(CAST(... AS DOUBLE))) exact
    below 1e13, grid windows, // on non-negatives."""
    return """
        WITH grid AS (
            SELECT COALESCE(CAST(lang AS VARCHAR), '') AS g,
                   CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY 1
        ), shares AS (
            SELECT g, n_docs,
                   CAST((n_docs * 1000000)
                        // GREATEST(SUM(n_docs) OVER (), 1) AS BIGINT)
                       AS share_micro
            FROM grid
        ), w AS (
            SELECT g, n_docs, share_micro,
                   CAST(FLOOR(SQRT(CAST(share_micro * 1000000 AS DOUBLE)))
                        AS BIGINT) AS w_raw
            FROM shares
        )
        SELECT g AS lang, n_docs, share_micro,
               CAST((w_raw * 1000000) // GREATEST(SUM(w_raw) OVER (), 1)
                    AS BIGINT) AS weight_micro
        FROM w ORDER BY lang
    """


def _simpson_sql() -> str:
    """q244 oracle: the shared WS token split, (source, term) grid,
    one rollup, BIGINT Simpson ratios with GREATEST guards."""
    return f"""
        WITH tok AS (
            SELECT COALESCE(CAST(source AS VARCHAR), '') AS g,
                   UNNEST(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                       TRIM(LOWER(COALESCE(text, ''))), '{WS}+'),
                       x -> x <> '')) AS term
            FROM documents
        ), grid AS (
            SELECT g, term, CAST(COUNT(*) AS BIGINT) AS c
            FROM tok GROUP BY 1, 2
        ), agg AS (
            SELECT g, CAST(SUM(c) AS BIGINT) AS n_tokens,
                   CAST(COUNT(*) AS BIGINT) AS n_types,
                   CAST(SUM(c * (c - 1)) AS BIGINT) AS d2
            FROM grid GROUP BY 1
        )
        SELECT g AS source, n_tokens, n_types,
               CAST(((n_tokens * (n_tokens - 1) - d2) * 1000000)
                    // GREATEST(n_tokens * (n_tokens - 1), 1)
                    AS BIGINT) AS gini_simpson_micro,
               CAST((n_tokens * (n_tokens - 1) * 1000)
                    // GREATEST(d2, 1) AS BIGINT) AS inv_simpson_milli
        FROM agg ORDER BY source
    """


def _assoc_rules_sql(min_support: int = 2) -> str:
    """q245 oracle: distinct (user, type) grain (MATERIALIZED — read by
    both pair join sides and the support rollup), directed pair counts,
    grid joins, BIGINT confidence/lift micro ratios."""
    return f"""
        WITH ut AS MATERIALIZED (
            SELECT DISTINCT user_id AS u,
                   CAST(event_type AS VARCHAR) AS t
            FROM events WHERE event_type IS NOT NULL
        ), n AS (
            SELECT CAST(COUNT(DISTINCT u) AS BIGINT) AS n_users FROM ut
        ), s AS MATERIALIZED (
            SELECT t, CAST(COUNT(*) AS BIGINT) AS st FROM ut GROUP BY 1
        ), p AS (
            SELECT a.t AS ante, b.t AS conseq,
                   CAST(COUNT(*) AS BIGINT) AS n_both
            FROM ut a JOIN ut b ON a.u = b.u AND a.t <> b.t
            GROUP BY 1, 2
        )
        SELECT p.ante, p.conseq, p.n_both,
               sa.st AS n_ante, sb.st AS n_conseq, n.n_users,
               CAST((p.n_both * 1000000) // GREATEST(sa.st, 1)
                    AS BIGINT) AS confidence_micro,
               CAST((p.n_both * n.n_users * 1000)
                    // GREATEST(sa.st * sb.st, 1) AS BIGINT) AS lift_milli
        FROM p
        JOIN s sa ON sa.t = p.ante
        JOIN s sb ON sb.t = p.conseq
        CROSS JOIN n
        WHERE p.n_both >= {int(min_support)}
        ORDER BY ante, conseq
    """


def _local_clustering_sql() -> str:
    """q246 oracle: the q160 triangle chain as a MATERIALIZED CTE plus
    the exact micro clustering ratio."""
    return f"""
        WITH t AS MATERIALIZED ({_triangles_sql()})
        SELECT host, degree, tri,
               CAST((2 * tri * 1000000)
                    // GREATEST(degree * (degree - 1), 1) AS BIGINT)
                   AS cc_micro
        FROM t ORDER BY host
    """


def _ess_sql() -> str:
    """q243 oracle: the q100 soft-dedup weight chain as a MATERIALIZED
    CTE, milli prescale (// 1e6), exact BIGINT sums, ONE double
    expression per surfaced ratio in the engine's op order, +0e0
    guard."""
    return f"""
        WITH w AS MATERIALIZED ({_soft_dedup_sql()}),
        lab AS (
            SELECT COALESCE(CAST(d.source AS VARCHAR), '') AS g,
                   w.weight_nano // 1000000 AS wm
            FROM w JOIN documents d
              ON w.doc_id = CAST(d.doc_id AS BIGINT)
        ), agg AS (
            SELECT g, CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(wm) AS BIGINT) AS sum_w,
                   CAST(SUM(wm * wm) AS BIGINT) AS sum_w2
            FROM lab WHERE wm >= 0 GROUP BY 1
        )
        SELECT g AS source, n_rows, sum_w, sum_w2,
               ROUND(CAST(sum_w AS DOUBLE) * CAST(sum_w AS DOUBLE)
                     / CAST(GREATEST(sum_w2, 1) AS DOUBLE), 6) + 0e0
                   AS ess,
               ROUND(CAST(n_rows AS DOUBLE) * CAST(sum_w2 AS DOUBLE)
                     / (CAST(GREATEST(sum_w, 1) AS DOUBLE)
                        * CAST(GREATEST(sum_w, 1) AS DOUBLE)), 6) + 0e0
                   AS deff
        FROM agg ORDER BY source
    """


def oracle_sql() -> dict[str, str]:
    ink = f"LENGTH(REGEXP_REPLACE(COALESCE(text,''), '{WS}', '', 'g'))"
    ntoks = (
        f"LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(COALESCE(text,'')), '{WS}+'),"
        " x -> x <> ''))"
    )
    dens = f"(100.0 * {ink} / GREATEST(LENGTH(COALESCE(text,'')) + {ntoks}, 1))"
    return {
        "q01_text_density": f"""
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   {dens} AS density,
                   ({dens} >= 1.0 AND {dens} <= 80.0) AS keep
            FROM documents
        """,
        "q02_token_count": f"""
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(COALESCE(text,'')), '{WS}+'),
                                        x -> x <> '')) AS BIGINT) AS n_tokens
            FROM documents
        """,
        "q03_fingerprint_dedup": f"""
            SELECT MD5(TRIM(REGEXP_REPLACE(LOWER(COALESCE(text,'')), '{WS}+', ' ', 'g'))) AS fp,
                   MIN(CAST(doc_id AS BIGINT)) AS keep_doc_id,
                   COUNT(*) AS n_dups
            FROM documents GROUP BY 1
        """,
        "q04_agg_modes": """
            SELECT l_returnflag, l_linestatus,
                   MIN(l_quantity) AS min_qty,
                   MAX(l_quantity) AS max_qty,
                   AVG(l_quantity) AS avg_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS sum_price,
                   COUNT(*) AS n_rows
            FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "q05_verdict_fold": f"""
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   (NOT (n_chars < 50) AND NOT (NOT ({dens} >= 1.0 AND {dens} <= 80.0))) AS accepted,
                   CASE WHEN n_chars < 50 THEN 'too short'
                        WHEN NOT ({dens} >= 1.0 AND {dens} <= 80.0) THEN 'density out of range'
                        WHEN lang <> 'en' THEN 'non-english'
                        ELSE '' END AS reasons
            FROM documents
        """,
        "q06_dedup_last_wins": """
            SELECT CAST(user_id AS BIGINT) AS user_id,
                   CAST(event_id AS BIGINT) AS last_event_id,
                   event_type AS last_type
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                               ORDER BY ts DESC, event_id DESC) AS rn
                  FROM events) WHERE rn = 1
        """,
        "q07_reassembly": """
            SELECT CAST(user_id AS BIGINT) AS user_id,
                   CAST(event_id AS BIGINT) AS event_id,
                   CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                           ORDER BY ts ASC, event_id ASC) - 1 AS INT) AS ord
            FROM events
        """,
        "q08_metrics_rollup": """
            SELECT event_type AS reason, COUNT(*) AS n
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "q09_minhash_signatures": _minhash_sql(8) + "SELECT * FROM sig",
        "q10_minhash_lsh_pairs": _minhash_sql(8)
        + """
            , bands AS (
                SELECT doc_id, 0 AS band, MD5(CONCAT_WS('#', h00, h01)) AS key FROM sig
                UNION ALL SELECT doc_id, 1, MD5(CONCAT_WS('#', h02, h03)) FROM sig
                UNION ALL SELECT doc_id, 2, MD5(CONCAT_WS('#', h04, h05)) FROM sig
                UNION ALL SELECT doc_id, 3, MD5(CONCAT_WS('#', h06, h07)) FROM sig
            )
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
        """,
        "q11_ngram_jaccard": f"""
            WITH norm AS (
                SELECT CAST(doc_id AS BIGINT) AS doc_id,
                       REGEXP_REPLACE(LOWER(COALESCE(text,'')), '{WS}+', ' ', 'g') AS t
                FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id, SUBSTR(t, CAST(i AS INT), 5) AS g
                FROM (SELECT doc_id, t,
                             UNNEST(RANGE(1, GREATEST(LENGTH(t) - 4, 0) + 1)) AS i
                      FROM norm)
            ), sizes AS (
                SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id
            ), inter AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
                FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   ROUND(CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) >= 0.05
        """,
        "q12_simhash": _simhash_sql(32),
        # connected components via recursive CTE — WITH must become
        # WITH RECURSIVE for the reach() member
        "q31_dup_clusters": _clusters_comp_sql()
        + """
            SELECT d.doc_id,
                   COALESCE(comp.cid, d.doc_id) AS cluster_id,
                   (COALESCE(comp.cid, d.doc_id) = d.doc_id) AS is_cluster_head
            FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents) d
            LEFT JOIN comp ON comp.did = d.doc_id
        """,
        # keep-best policy on top of the q31 components: one representative
        # per cluster by (n_chars desc, doc_id asc) — min-struct argmax
        "q44_dedup_keep_best": _clusters_comp_sql()
        + """
            , mem AS (
                SELECT d.doc_id, COALESCE(comp.cid, d.doc_id) AS cluster_id,
                       d.n_chars
                FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                             CAST(n_chars AS BIGINT) AS n_chars FROM documents) d
                LEFT JOIN comp ON comp.did = d.doc_id
            ), win AS (
                SELECT cluster_id,
                       MIN({'negs': -n_chars, 'kid': doc_id}) AS w,
                       COUNT(*) AS n_members
                FROM mem GROUP BY cluster_id
            )
            SELECT cluster_id, (w).kid AS keep_id, -(w).negs AS best_n_chars,
                   n_members
            FROM win
        """,
        "q25_lsh_jaccard": _minhash_sql(16, shingle="word")
        + """
            , bands AS (
                SELECT doc_id, 0 AS band,
                       MD5(CONCAT_WS('#', h00, h01, h02, h03)) AS key FROM sig
                UNION ALL SELECT doc_id, 1,
                       MD5(CONCAT_WS('#', h04, h05, h06, h07)) FROM sig
                UNION ALL SELECT doc_id, 2,
                       MD5(CONCAT_WS('#', h08, h09, h10, h11)) FROM sig
                UNION ALL SELECT doc_id, 3,
                       MD5(CONCAT_WS('#', h12, h13, h14, h15)) FROM sig
            ), cand AS (
                SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
            ), shd AS (
                SELECT DISTINCT doc_id, g FROM sh
            ), sizes AS (
                SELECT doc_id, COUNT(*) AS sz FROM shd GROUP BY doc_id
            ), inter AS (
                SELECT c.id_a, c.id_b, COUNT(*) AS i
                FROM cand c
                JOIN shd a ON a.doc_id = c.id_a
                JOIN shd b ON b.doc_id = c.id_b AND b.g = a.g
                GROUP BY 1, 2
            )
            SELECT id_a, id_b,
                   ROUND(CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) >= 0.8
        """,
        "q13_cosine_topk": """
            WITH e AS (
                SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings
            ), p AS (
                SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id IN (0,1,2,3,4)
            ), s AS (
                SELECT probe_id, e.vec_id AS neighbor_id,
                       ROUND(LIST_DOT_PRODUCT(pv, v)
                             / SQRT(LIST_DOT_PRODUCT(pv, pv) * LIST_DOT_PRODUCT(v, v)), 6) AS cos
                FROM p, e WHERE e.vec_id <> probe_id
            )
            SELECT probe_id, neighbor_id, cos, CAST(rank AS INT) AS rank
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                               ORDER BY cos DESC, neighbor_id ASC) AS rank
                  FROM s)
            WHERE rank <= 5
        """,
        "q14_doc_stats": _doc_stats_sql(),
        "q16_lsh_topk": _lsh_topk_sql(),
        "q30_lsh_multiprobe": _lsh_topk_sql(multiprobe_bits=2),
        "q17_ivf_topk": _ivf_sql(),
        "q19_curation": _curation_sql(),
        "q23_embedding_near_dups": f"""
            WITH e AS (
                SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(embedding AS DOUBLE[]) AS v
                FROM embeddings
            ), b AS (
                SELECT vec_id, v, {_bucket_sql(6, 64)} AS bucket FROM e
            )
            SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
                   ROUND(LIST_DOT_PRODUCT(a.v, b2.v)
                         / SQRT(LIST_DOT_PRODUCT(a.v, a.v) * LIST_DOT_PRODUCT(b2.v, b2.v)),
                         6) AS cos
            FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
            WHERE ROUND(LIST_DOT_PRODUCT(a.v, b2.v)
                        / SQRT(LIST_DOT_PRODUCT(a.v, a.v) * LIST_DOT_PRODUCT(b2.v, b2.v)),
                        6) >= 0.2
        """,
        "q24_rollup": """
            SELECT COALESCE(lang, 'ALL') AS lang,
                   COALESCE(source, 'ALL') AS source,
                   COUNT(*) AS n_docs,
                   CAST(SUM(n_chars) AS BIGINT) AS total_chars,
                   AVG(n_chars) AS avg_chars
            FROM documents GROUP BY ROLLUP (lang, source)
        """,
        "q20_join_topk": """
            SELECT l_orderkey AS orderkey, c_mktsegment AS mktsegment,
                   CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
                        AS DECIMAL(28,4)) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            GROUP BY 1, 2
            ORDER BY revenue DESC, orderkey ASC
            LIMIT 20
        """,
        "q21_semi_join": """
            SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_mktsegment
            FROM customer
            WHERE EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 200000)
        """,
        "q22_anti_join": """
            SELECT CAST(p_partkey AS BIGINT) AS p_partkey, p_brand
            FROM part
            WHERE NOT EXISTS (SELECT 1 FROM lineitem
                              WHERE l_partkey = p_partkey AND l_quantity > 45)
        """,
        "q18_window_agg": """
            SELECT CAST(EPOCH(DATE_TRUNC('hour', ts)) AS BIGINT) AS hour_epoch,
                   event_type,
                   COUNT(*) AS n,
                   ROUND(SUM(value), 6) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "q15_rolling_fingerprint": f"""
            WITH norm AS (
                SELECT CAST(doc_id AS BIGINT) AS doc_id,
                       REGEXP_REPLACE(LOWER(COALESCE(text,'')), '{WS}+', ' ', 'g') AS t
                FROM documents
            ), w AS (
                SELECT doc_id, t,
                       GREATEST(CAST(FLOOR((LENGTH(t) - 32) / 16.0) AS INT) + 1, 0) AS cnt
                FROM norm
            ), f AS (
                SELECT doc_id, MD5(SUBSTR(t, CAST(i * 16 + 1 AS INT), 32)) AS fp
                FROM (SELECT doc_id, t, UNNEST(RANGE(0, CAST(cnt AS BIGINT))) AS i FROM w)
            ), agg AS (
                SELECT doc_id, MIN(fp) AS min_fp, COUNT(*) AS n_w FROM f GROUP BY doc_id
            )
            SELECT w.doc_id, agg.min_fp, CAST(COALESCE(agg.n_w, 0) AS INT) AS n_windows
            FROM w LEFT JOIN agg USING (doc_id)
        """,
        "q29_bpe_tokens": _bpe_sql(),
        "q28_cube": """
            SELECT COALESCE(lang, 'ALL') AS lang,
                   COALESCE(source, 'ALL') AS source,
                   COUNT(*) AS n_docs,
                   AVG(n_chars) AS avg_chars
            FROM documents GROUP BY CUBE (lang, source)
        """,
        "q32_value_quartiles": """
            SELECT CAST(event_id AS BIGINT) AS event_id,
                   event_type,
                   CAST(NTILE(4) OVER w AS INT) AS quartile,
                   ROUND(PERCENT_RANK() OVER w, 9) AS pct_rank
            FROM events
            WINDOW w AS (PARTITION BY event_type ORDER BY value ASC, event_id ASC)
        """,
        "q27_sessionize": """
            WITH l AS (
                SELECT CAST(user_id AS BIGINT) AS user_id,
                       EPOCH_US(ts) AS tus, value,
                       LAG(EPOCH_US(ts)) OVER (PARTITION BY user_id
                                               ORDER BY ts ASC, event_id ASC) AS prev,
                       ts, event_id
                FROM events
            ), f AS (
                SELECT *, CASE WHEN prev IS NULL OR tus - prev > 1800000000
                               THEN 1 ELSE 0 END AS new_s
                FROM l
            ), s AS (
                SELECT user_id, tus, value,
                       SUM(new_s) OVER (PARTITION BY user_id
                                        ORDER BY ts ASC, event_id ASC
                                        ROWS UNBOUNDED PRECEDING) AS sid
                FROM f
            )
            SELECT user_id, CAST(sid AS INT) AS session_idx,
                   MIN(tus) AS session_start_us,
                   MAX(tus) AS session_end_us,
                   COUNT(*) AS n_events,
                   ROUND(SUM(value), 6) AS sum_value
            FROM s GROUP BY 1, 2
        """,
        "q26_batch_reattach": f"""
            WITH v AS (
                SELECT CAST(doc_id AS BIGINT) AS did,
                       (NOT (n_chars < 50) AND ({dens} >= 1.0 AND {dens} <= 80.0)) AS accepted,
                       CASE WHEN n_chars < 50 THEN 'too short'
                            WHEN NOT ({dens} >= 1.0 AND {dens} <= 80.0) THEN 'density out of range'
                            ELSE '' END AS reasons
                FROM documents
            ), m AS (
                SELECT did % 50 AS b, 0 AS role, did FROM v
                UNION ALL
                SELECT (did + 1) % 50 AS b, 1 AS role, did FROM v
            ), o AS (
                SELECT b, did,
                       CAST(ROW_NUMBER() OVER (PARTITION BY b ORDER BY role, did) - 1 AS INT) AS pos
                FROM m
            )
            SELECT 'c' || CAST(b AS VARCHAR) AS customerID,
                   't' || CAST(b AS VARCHAR) AS transactionID,
                   pos,
                   CAST(did AS VARCHAR) AS documentID,
                   v.accepted, v.reasons
            FROM o JOIN v USING (did)
        """,
        "q33_repetition": _repetition_sql(),
        "q34_decontam": _decontam_sql(),
        "q35_hll_distinct": _hll_sql(),
        "q36_asof_join": """
            WITH p AS (
                SELECT CAST(user_id AS BIGINT) AS user_id, ts,
                       MAX(CAST(event_id AS BIGINT)) AS pe,
                       ARG_MAX(value, CAST(event_id AS BIGINT)) AS pv
                FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
            ), c AS (
                SELECT CAST(event_id AS BIGINT) AS event_id,
                       CAST(user_id AS BIGINT) AS user_id, ts
                FROM events WHERE event_type = 'click'
            )
            SELECT c.event_id, c.user_id, EPOCH_US(c.ts) AS ts_us,
                   p.pe AS purchase_event_id, p.pv AS purchase_value,
                   EPOCH_US(c.ts) - EPOCH_US(p.ts) AS gap_us
            FROM c ASOF LEFT JOIN p
              ON c.user_id = p.user_id AND p.ts <= c.ts
        """,
        "q37_stratified_sample": f"""
            WITH d AS (
                SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
                       {_md5_uniform_sql('CAST(doc_id AS BIGINT)')} AS sample_u
                FROM documents
            )
            SELECT doc_id, lang, sample_u FROM d
            WHERE sample_u < CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.75
                                       WHEN 'fr' THEN 0.25 WHEN 'es' THEN 0.125
                                       WHEN 'zh' THEN 1.0 ELSE 0.0625 END
        """,
        "q38_source_cap": f"""
            WITH d AS (
                SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
                       {_md5_uniform_sql('CAST(doc_id AS BIGINT)')} AS sample_u
                FROM documents
            )
            SELECT source, doc_id, sample_u FROM (
                SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                             ORDER BY sample_u ASC, doc_id ASC) AS rn
                FROM d
            ) WHERE rn <= 5
        """,
        "q39_top_terms": _top_terms_sql(),
        "q40_chunk_dedup": """
            WITH t AS (
                SELECT CAST(doc_id AS BIGINT) AS doc_id,
                       STRING_SPLIT(text, ' ') AS w
                FROM documents
            ), n AS (
                SELECT doc_id, w,
                       GREATEST(CAST(CEIL(LEN(w) / 20.0) AS BIGINT), 1) AS nch
                FROM t
            ), ch AS (
                SELECT doc_id, i - 1 AS chunk_idx,
                       ARRAY_TO_STRING(LIST_SLICE(w, (i - 1) * 20 + 1, i * 20), ' ') AS chunk
                FROM (SELECT doc_id, w, UNNEST(RANGE(1, nch + 1)) AS i FROM n)
            ), keep AS (
                SELECT doc_id, chunk_idx, chunk FROM (
                    SELECT *, ROW_NUMBER() OVER (
                        PARTITION BY MD5(chunk) ORDER BY doc_id, chunk_idx) AS rn
                    FROM ch
                ) WHERE rn = 1
            ), asm AS (
                SELECT doc_id, COUNT(*) AS n_kept,
                       STRING_AGG(chunk, ' ' ORDER BY chunk_idx) AS clean_text
                FROM keep GROUP BY doc_id
            )
            SELECT n.doc_id, n.nch AS n_total,
                   COALESCE(asm.n_kept, 0) AS n_kept,
                   COALESCE(asm.clean_text, '') AS clean_text
            FROM n LEFT JOIN asm ON n.doc_id = asm.doc_id
        """,
        "q41_quantile_sketch": """
            WITH v AS (
                SELECT lang,
                       LEAST(GREATEST(CAST(FLOOR(n_chars * 64 / 1024.0) AS BIGINT), 0),
                             63) AS bin
                FROM documents
            ), hist AS (
                SELECT lang, bin, COUNT(*) AS c FROM v GROUP BY lang, bin
            ), tot AS (
                SELECT lang, SUM(c) AS n FROM hist GROUP BY lang
            ), cum AS (
                SELECT lang, bin,
                       SUM(c) OVER (PARTITION BY lang ORDER BY bin) AS cumc
                FROM hist
            ), q AS (SELECT * FROM (VALUES (50), (90), (99)) AS t(p)),
            sel AS (
                SELECT cum.lang, q.p, MIN(cum.bin) AS est_bin
                FROM cum JOIN tot ON cum.lang = tot.lang
                         JOIN q ON cum.cumc * 100 >= tot.n * q.p
                GROUP BY cum.lang, q.p
            )
            SELECT sel.lang, CAST(sel.p AS INT) AS p,
                   CAST(tot.n AS BIGINT) AS n, sel.est_bin,
                   sel.est_bin * 16 AS est_lo, (sel.est_bin + 1) * 16 AS est_hi
            FROM sel JOIN tot ON sel.lang = tot.lang
        """,
        "q42_bloom_decontam": _bloom_decontam_sql(),
        "q45_curation_v2": _curation_v2_sql(),
        "q46_pq_topk": _pq_sql(),
        "q51_pq_refined": _pq_sql(k=20, refine=True, final_k=5),
        "q52_normalize_text": _scrub_sqls()[0],
        "q62_html_blocks": _html_sqls()[0],
        "q63_html_main": _html_sqls()[1],
        "q65_url_normalize": _url_sqls()[0],
        "q66_host_stats": _url_sqls()[1],
        "q68_prefix_block": _url_sqls()[2],
        "q70_outlinks": _outlinks_sql(),
        "q72_link_hosts": _link_hosts_sql(),
        "q74_bpe_merges": _bpe_merges_sql(),
        "q75_bpe_tokenize": _bpe_tokenize_sql(),
        "q76_phash_near_dup": _phash_near_dup_sql(),
        "q77_mixture_sample": _mixture_sql(),
        "q78_semdedup": _semdedup_sql(tau=0.35),
        "q79_curation_v3": _curation_v3_sql(min_tokens=40),
        "q82_robots_rules": _robots_sql(),
        "q83_host_policy": """
            WITH j AS ({Q68})
            SELECT host, COUNT(*) AS n_docs,
                   COUNT(*) FILTER (WHERE action = 'deny') AS n_denied,
                   CAST(COUNT(*) FILTER (WHERE action = 'deny') AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE) AS denied_frac
            FROM j WHERE host <> '' GROUP BY host
        """.replace("{Q68}", _url_sqls()[2]),
        "q84_quality_classifier": _quality_classifier_sql(),
        "q85_temperature_mixture": _mixture_sql(temperature=2.0),
        "q87_line_dedup": """
            WITH d AS (
                SELECT CAST(doc_id AS BIGINT) AS doc_id,
                       REPLACE(COALESCE(text,''), '. ', '.' || CHR(10)) AS t
                FROM documents
            ), l AS (
                SELECT doc_id,
                       UNNEST(STR_SPLIT(t, CHR(10))) AS line,
                       UNNEST(RANGE(1, LEN(STR_SPLIT(t, CHR(10))) + 1)) AS ln
                FROM d
            ), k AS (
                SELECT doc_id, line, ln,
                       ROW_NUMBER() OVER (PARTITION BY doc_id, line
                                          ORDER BY ln) AS rn
                FROM l
            )
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_lines,
                   CAST(COUNT(*) FILTER (WHERE rn > 1) AS BIGINT) AS n_removed,
                   COALESCE(STRING_AGG(CASE WHEN rn = 1 THEN line END,
                                       CHR(10) ORDER BY ln), '') AS clean_text
            FROM k GROUP BY doc_id
        """,
        "q88_c4_filter": _c4_filter_sql(),
        "q89_gopher_filter": _gopher_filter_sql(),
        "q93_curation_v4": _curation_v4_sql(),
        "q94_dsir_resample": _dsir_sql(),
        "q95_ccnet_perplexity": _ccnet_sql(),
        "q96_split_assign": _split_assign_sql(),
        "q97_corpus_card": _corpus_card_sql(),
        "q98_bm25_search": _bm25_sql(),
        "q99_chunk_manifest": _chunk_manifest_sql(),
        "q100_soft_dedup": _soft_dedup_sql(),
        "q101_winnow_overlap": _winnow_sql(),
        "q102_rrf_hybrid": _rrf_sql(),
        "q103_chunk_profile": _chunk_profile_sql(),
        "q104_corpus_line_dedup": _corpus_line_dedup_sql(),
        "q105_simhash_pairs": _simhash_pairs_sql(),
        "q106_unimax_sample": _unimax_sql(),
        "q107_prototype_prune": _prototype_prune_sql(),
        "q108_domain_quality": _domain_quality_sql(),
        "q109_ngram_novelty": _ngram_novelty_sql(),
        "q110_fim_split": _fim_split_sql(),
        "q111_d4_prune": _d4_prune_sql(),
        "q112_k_anonymize": _k_anon_sql(),
        "q113_hard_negatives": _hard_negatives_sql(),
        "q114_fuzzy_decontam": _fuzzy_decontam_sql(),
        "q115_cluster_holdout": _cluster_holdout_sql(),
        "q116_readability": _READABILITY_SQL,
        "q117_dedup_report": _dedup_report_sql(),
        "q118_window_chunks": _window_chunks_sql(),
        "q119_ann_recall": _ann_recall_sql(),
        "q120_phrase_search": _phrase_sql(_PHRASE),
        "q121_bigram_lm": _bigram_lm_sql(700, 3.0, 8.0),
        "q122_edit_pairs": _edit_pairs_sql(200, 800),
        "q123_incremental_dedup": _incremental_dedup_sql(16, 4, 5, 12),
        "q124_heavy_hitters": _heavy_hitters_sql(700),
        "q125_vocab_growth": _vocab_growth_sql(10),
        "q126_curriculum": _curriculum_sql(4),
        "q127_anchor_index": _anchor_index_sql(3),
        "q128_exact_k_sample": _exact_k_sample_sql(25),
        "q129_shard_checksums": _shard_checksums_sql(100),
        "q130_stopgram_blocklist": _stopgram_sql(3, 10),
        "q131_host_pagerank": _host_pagerank_sql(3),
        "q132_budget_select": _budget_select_sql(15_000),
        "q133_chat_spans": _CHAT_SPANS_SQL,
        "q134_preference_pairs": _preference_pairs_sql(),
        "q135_trim_repeats": _trim_repeats_sql(3),
        "q136_ict_pairs": _ict_pairs_sql(10),
        "q137_audio_rms": _audio_rms_sql(512),
        "q138_video_frames": _video_frames_sql(),
        "q139_blocklist_gate": _blocklist_gate_sql(2),
        "q140_weighted_sample": _weighted_sample_sql(25),
        "q141_hll_overlap": _hll_overlap_sql(),
        "q142_span_corruption": _span_corruption_sql(20, 3),
        "q143_bt_strength": _bt_strength_sql(3),
        "q144_kneser_ney": _kneser_ney_sql(750, 3.0, 8.0),
        "q145_rho1_select": _rho1_select_sql(300),
        "q146_binary_topk": _binary_topk_sql(48, 64, 5, 24),
        "q147_zorder_layout": _zorder_sql(64),
        "q148_matryoshka_topk": _matryoshka_sql(16, 5, 24),
        "q149_hits": _hits_sql(3),
        "q150_borda_ensemble": _borda_sql(1000),
        "q151_fragment_stitch": _fragment_stitch_sql(8, 16),
        "q152_template_expand": _template_expand_sql(30, 20, 7),
        "q153_group_percentile": _group_percentile_sql(1_000_000),
        "q154_png_chunks": _png_chunks_sql(),
        "q155_mw_weights": _mw_weights_sql(3, 200),
        "q156_token_drift": _token_drift_sql(20),
        "q157_video_scenes": _video_scenes_sql(16),
        "q158_zone_map": _zone_map_sql(16),
        "q159_distinct_n": _distinct_n_sql(),
        "q160_triangles": _triangles_sql(),
        "q161_containment": _containment_sql(600_000),
        "q162_skew_audit": _skew_audit_sql((8, 32, 128)),
        "q163_pmi": _pmi_sql(5, 30),
        "q164_funnel": _funnel_sql(("signup", "view", "click", "purchase")),
        "q165_retention": _retention_sql(21_600_000_000),
        "q166_transitions": _transitions_sql(),
        "q167_posting_size": _posting_size_sql(2, 400),
        "q168_emb_profile": _emb_profile_sql(1_000_000),
        "q169_audio_quality": _audio_quality_sql(512),
        "q170_join_explain": _join_explain_sql(20),
        "q171_encoding_advisor": _encoding_advisor_sql(("lang", "source", "text")),
        "q172_reciprocity": _reciprocity_sql(),
        "q173_kcore": _kcore_sql(),
        "q174_calibration": _calibration_sql(),
        "q175_tfidf_keywords": _tfidf_sql(),
        "q176_degree_hist": _degree_hist_sql(),
        "q177_gap_hist": _gap_hist_sql(),
        "q178_source_overlap": _source_overlap_sql(),
        "q179_prefix_compression": _prefix_compression_sql(),
        "q180_quality_joint": _quality_joint_sql(),
        "q181_char_classes": _char_classes_sql(),
        "q182_anchor_diversity": _anchor_diversity_sql(),
        "q183_event_bursts": _event_bursts_sql(),
        "q184_props_stats": _props_stats_sql(),
        "q185_rendezvous": _rendezvous_sql(),
        "q186_dup_closure": _dup_closure_sql(),
        "q187_url_depth": _url_depth_sql(),
        "q188_two_hop": _two_hop_sql(),
        "q189_field_consistency": _field_consistency_sql(),
        "q190_source_surprisal": _source_surprisal_sql(),
        "q191_l_diversity": _l_diversity_sql(),
        "q192_boilerplate": _boilerplate_sql(),
        "q194_annotator_agreement": _agreement_sql(),
        "q195_vocab_health": _vocab_health_sql(),
        "q196_mirror_hosts": _mirrors_sql(),
        "q197_event_transitions": _transitions2_sql(),
        "q198_snapshot_churn": _snapshot_churn_sql(),
        "q199_span_integrity": _span_integrity_sql(),
        "q200_ab_lift": _ab_lift_sql(),
        "q201_compression_quality": _compression_sql(),
        "q202_ks_drift": _ks_drift_sql(),
        "q203_bootstrap_ci": _bootstrap_ci_sql(),
        "q204_html_tables": _html_tables_sql(),
        "q205_kcenter_coreset": _kcenter_sql(),
        "q206_rr_release": _rr_release_sql(),
        "q207_pca_project": _pca_sql(),
        "q208_lang_confusion": _lang_confusion_sql(),
        "q209_threshold_sweep": _threshold_sweep_sql(),
        "q210_text_segments": _text_segments_sql(),
        "q211_concentration": _concentration_sql(),
        "q212_entity_extract": _entities_sql(),
        "q213_bitext_margin": _bitext_margin_sql(),
        "q214_banding_selectivity": _banding_selectivity_sql(),
        "q215_isotropy": _isotropy_sql(),
        "q216_cuped_lift": _cuped_lift_sql(),
        "q217_encoding_quality": _encoding_quality_sql(),
        "q218_quota_apportion": _quota_apportion_sql(),
        "q219_benford": _benford_sql(),
        "q220_scrub_effect": _scrub_effectiveness_sql(),
        "q221_zipf_fit": _zipf_sql(),
        "q222_chisq_grid": _chisq_sql(),
        "q223_mad_outliers": _mad_outliers_sql(),
        "q224_pareto_frontier": _pareto_sql(),
        "q225_year_coverage": _year_coverage_sql(),
        "q226_quantile_map": _quantile_map_sql(),
        "q227_cocitation": _cocitation_sql(),
        "q228_vocab_coverage": _vocab_coverage_sql(),
        "q229_burstiness": _burstiness_sql(),
        "q230_gini": _gini_sql(),
        "q231_rfm_segments": _rfm_sql(),
        "q232_stickiness": _stickiness_sql(),
        "q233_rank_concordance": _rank_concordance_sql(),
        "q234_filter_attribution": _filter_attribution_sql(),
        "q235_assortativity": _assortativity_sql(),
        "q236_winsorized_mean": _winsorized_mean_sql(),
        "q237_mmr_rerank": _mmr_sql(),
        "q238_auc": _auc_sql(),
        "q239_pr_sweep": _pr_sweep_sql(),
        "q240_centroid_drift": _centroid_drift_sql(),
        "q241_daily_autocorr": _daily_autocorr_sql(),
        "q242_label_prop": _label_prop_sql(),
        "q243_ess_weights": _ess_sql(),
        "q244_simpson_diversity": _simpson_sql(),
        "q245_assoc_rules": _assoc_rules_sql(),
        "q246_local_clustering": _local_clustering_sql(),
        "q247_ndcg": _ndcg_sql(),
        "q248_mrr": _mrr_sql(),
        "q249_keep_effect_size": _keep_effect_sql(),
        "q250_zipf_slope": _zipf_slope_sql(),
        "q251_mcnemar_filters": _mcnemar_sql(),
        "q252_kaplan_meier": _km_sql(),
        "q253_mann_kendall": _mann_kendall_sql(),
        "q254_textrank": _textrank_sql(),
        "q255_psi_drift": _psi_sql(),
        "q256_conductance": _conductance_sql(),
        "q257_modularity": _modularity_sql(),
        "q258_bpe_fertility": _fertility_sql(),
        "q259_sqrt_mixture": _sqrt_mixture_sql(),
        "q260_prf_expansion": _prf_sql(),
        "q261_jpeg_profile": _jpeg_profile_sql(),
        "q262_silhouette": _silhouette_sql(),
        "q263_hoover": _hoover_sql(),
        "q264_reencode_dedup": _reencode_sql(),
        "q86_snapshot_diff": """
            WITH d AS (
                SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, source
                FROM documents
            ), oldv AS (
                SELECT * FROM d
            ), newv AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 5 = 0 THEN 'xx' ELSE lang END AS lang,
                       source
                FROM d WHERE doc_id % 7 <> 0
                UNION ALL
                SELECT doc_id + 1000000, lang, 'clone' FROM d WHERE doc_id % 11 = 0
            ), j AS (
                SELECT o.doc_id AS okey, n.doc_id AS nkey,
                       o.lang AS olang, o.source AS osrc,
                       n.lang AS nlang, n.source AS nsrc
                FROM oldv o FULL OUTER JOIN newv n ON o.doc_id = n.doc_id
            ), cls AS (
                SELECT *,
                       CASE WHEN nkey IS NOT NULL AND okey IS NULL THEN 'I'
                            WHEN okey IS NOT NULL AND nkey IS NULL THEN 'D'
                            WHEN olang IS DISTINCT FROM nlang
                                 OR osrc IS DISTINCT FROM nsrc THEN 'U'
                       END AS op
                FROM j
            )
            SELECT COALESCE(nkey, okey) AS doc_id, op,
                   CASE WHEN op = 'D' THEN olang ELSE nlang END AS lang,
                   CASE WHEN op = 'D' THEN osrc ELSE nsrc END AS source
            FROM cls WHERE op IS NOT NULL
        """,
        "q81_hash_embedding": f"""
            WITH d AS (
                SELECT CAST(doc_id AS BIGINT) AS doc_id,
                       LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                           TRIM(LOWER(COALESCE(text,''))), '{WS}+'),
                           x -> x <> '') AS a
                FROM documents
            ), hx AS (
                SELECT doc_id, MD5(UNNEST(a)) AS h FROM d
            ), s AS (
                SELECT doc_id,
                       CAST(CAST(('0x' || SUBSTR(h, 1, 4)) AS BIGINT) % 64
                            AS INT) AS dim_idx,
                       CASE WHEN CAST(('0x' || SUBSTR(h, 5, 1)) AS BIGINT) % 2 = 0
                            THEN 1 ELSE -1 END AS sg
                FROM hx
            )
            SELECT doc_id, dim_idx, CAST(SUM(sg) AS BIGINT) AS weight
            FROM s GROUP BY doc_id, dim_idx HAVING SUM(sg) <> 0
        """,
        "q80_bpe_fertility": f"""
            WITH seg AS ({{Q75}}), agg AS (
                SELECT d.lang, COUNT(*) AS n_words,
                       CAST(SUM(LEN(STR_SPLIT(seg.seg_text, ' '))) AS BIGINT)
                           AS n_subwords
                FROM seg JOIN (SELECT CAST(doc_id AS BIGINT) AS doc_id, lang
                               FROM documents) d USING (doc_id)
                GROUP BY d.lang
            )
            SELECT lang, n_words, n_subwords,
                   CAST(n_subwords AS DOUBLE) / CAST(n_words AS DOUBLE)
                       AS fertility
            FROM agg
        """.replace("{Q75}", _bpe_tokenize_sql()),
        "q73_exact_substring": f"""
            WITH d AS (
                SELECT CAST(doc_id AS BIGINT) AS doc_id,
                       LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                           TRIM(LOWER(COALESCE(text,''))), '{WS}+'),
                           x -> x <> '') AS a
                FROM documents
            ), t AS (
                SELECT doc_id, a, CAST(LEN(a) AS BIGINT) AS n FROM d
            ), wi AS (
                SELECT doc_id, i AS s,
                       MD5(ARRAY_TO_STRING(LIST_SLICE(a, CAST(i AS INT) + 1,
                           CAST(i AS INT) + 8), ' ')) AS h
                FROM (SELECT doc_id, a,
                             UNNEST(RANGE(0, GREATEST(n - 8 + 1, 0))) AS i
                      FROM t)
            ), dup AS (
                SELECT h FROM wi GROUP BY h HAVING COUNT(*) > 1
            ), ds AS (
                SELECT doc_id, LIST_SORT(LIST(s)) AS dws
                FROM wi JOIN dup USING (h) GROUP BY doc_id
            ), j AS (
                SELECT t.doc_id, a, n,
                       COALESCE(ds.dws, []::BIGINT[]) AS dws
                FROM t LEFT JOIN ds USING (doc_id)
            ), k AS (
                SELECT doc_id, n, CAST(LEN(dws) AS BIGINT) AS n_dup_windows,
                       LIST_FILTER(LIST_TRANSFORM(RANGE(0, n),
                           i -> CASE WHEN LEN(LIST_FILTER(dws,
                                s -> s <= i AND i < s + 8)) = 0
                                THEN a[CAST(i AS INT) + 1] END),
                           x -> x IS NOT NULL) AS kept
                FROM j
            )
            SELECT doc_id, n AS n_tokens, n_dup_windows,
                   n - CAST(LEN(kept) AS BIGINT) AS n_removed,
                   COALESCE(ARRAY_TO_STRING(kept, ' '), '') AS clean_text
            FROM k
        """,
        "q71_inverted_index": f"""
            WITH d AS (
                SELECT CAST(doc_id AS BIGINT) AS doc_id,
                       LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                           TRIM(LOWER(COALESCE(text,''))), '{WS}+'),
                           x -> x <> '') AS a
                FROM documents
            ), tk AS (
                SELECT doc_id, UNNEST(a) AS token FROM d
            ), tf AS (
                SELECT token, doc_id, COUNT(*) AS tf
                FROM tk GROUP BY token, doc_id
            ), dfx AS (
                SELECT token, COUNT(*) AS df FROM tf GROUP BY token
            )
            SELECT tf.token, dfx.df, tf.doc_id, tf.tf
            FROM tf JOIN dfx USING (token)
            WHERE dfx.df >= 2
        """,
        "q69_compaction_plan": """
            WITH m AS (
                SELECT CAST(doc_id AS BIGINT) AS file_id,
                       CAST(n_chars AS BIGINT) AS size_bytes
                FROM documents
            )
            SELECT file_id, size_bytes,
                   CAST(COALESCE(SUM(size_bytes) OVER (ORDER BY file_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS start_byte,
                   CAST(COALESCE(SUM(size_bytes) OVER (ORDER BY file_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        // 4096 AS BIGINT) AS group_id
            FROM m
        """,
        "q67_surprisal": f"""
            WITH d AS (
                SELECT CAST(doc_id AS BIGINT) AS doc_id,
                       LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(
                           TRIM(LOWER(COALESCE(text,''))), '{WS}+'),
                           x -> x <> '') AS a
                FROM documents
            ), tk AS (
                SELECT doc_id, UNNEST(a) AS tok FROM d
            ), c AS (
                SELECT tok, COUNT(*) AS c FROM tk GROUP BY tok
            ), n AS (
                SELECT CAST(SUM(c) AS BIGINT) AS n_total FROM c
            ), s AS (
                SELECT tk.doc_id,
                       CAST(LENGTH(BIN(n.n_total // c.c)) - 1 AS BIGINT) AS bits
                FROM tk JOIN c USING (tok) CROSS JOIN n
            ), a AS (
                SELECT doc_id, COUNT(*) AS n_tokens,
                       CAST(SUM(bits) AS BIGINT) AS sum_bits
                FROM s GROUP BY doc_id
            )
            SELECT d.doc_id,
                   COALESCE(a.n_tokens, 0) AS n_tokens,
                   COALESCE(a.sum_bits, 0) AS sum_bits,
                   CAST(a.sum_bits AS DOUBLE) / CAST(a.n_tokens AS DOUBLE)
                       AS avg_bits,
                   COALESCE(CAST(a.sum_bits AS DOUBLE)
                            / CAST(a.n_tokens AS DOUBLE) BETWEEN 3.0 AND 9.0,
                            FALSE) AS keep
            FROM d LEFT JOIN a USING (doc_id)
        """,
        "q64_cdc_upsert": """
            WITH d AS (
                SELECT CAST(doc_id AS BIGINT) AS doc_id, text, lang
                FROM documents
            ), base AS (
                SELECT * FROM d WHERE doc_id % 10 <> 9
            ), ch AS (
                SELECT doc_id, 1 AS seq, 'U' AS op,
                       'updated ' || SUBSTR(COALESCE(text,''), 1, 50) AS text,
                       lang
                FROM d WHERE doc_id % 7 = 0 AND doc_id % 10 <> 9
                UNION ALL
                SELECT doc_id, 1, 'I', COALESCE(text,''), lang
                FROM d WHERE doc_id % 10 = 9
                UNION ALL
                SELECT doc_id, 1, 'D', NULL, NULL
                FROM d WHERE doc_id % 13 = 0 AND doc_id % 7 <> 0
                           AND doc_id % 10 <> 9
                UNION ALL
                SELECT doc_id, 2, 'U', 'updated twice', lang
                FROM d WHERE doc_id % 14 = 0 AND doc_id % 10 <> 9
            ), coll AS (
                SELECT doc_id, op, text, lang FROM (
                    SELECT *, ROW_NUMBER() OVER (
                        PARTITION BY doc_id ORDER BY seq DESC) AS rn
                    FROM ch
                ) WHERE rn = 1
            )
            SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
                   CASE WHEN c.doc_id IS NOT NULL THEN c.text
                        ELSE b.text END AS text,
                   CASE WHEN c.doc_id IS NOT NULL THEN c.lang
                        ELSE b.lang END AS lang
            FROM base b FULL OUTER JOIN coll c ON b.doc_id = c.doc_id
            WHERE c.op IS NULL OR c.op <> 'D'
        """,
        "q54_tokenize_ids": f"""
            WITH tk AS (
                SELECT CAST(doc_id AS BIGINT) AS doc_id,
                       LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(COALESCE(text,''))),
                                   '{WS}+'), x -> x <> '') AS a
                FROM documents
            ), t AS (
                SELECT doc_id, CAST(i AS INT) AS pos, a[CAST(i AS INT) + 1] AS token
                FROM (SELECT doc_id, a, UNNEST(RANGE(0, LEN(a))) AS i FROM tk)
            ), cnt AS (
                SELECT token, COUNT(*) AS cnt FROM t GROUP BY 1
            ), vocab AS (
                SELECT token,
                       CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token ASC) - 1
                        AS INT) AS token_id
                FROM cnt ORDER BY cnt DESC, token ASC LIMIT 500
            )
            SELECT t.doc_id, t.pos,
                   CAST(COALESCE(v.token_id, -1) AS INT) AS token_id
            FROM t LEFT JOIN vocab v USING (token)
        """,
        "q53_pii_scrub": _scrub_sqls()[1],
        "q55_profile_table": _profile_sql(),
        "q56_pagerank": _pagerank_sql(),
        "q61_length_batches": f"""
            WITH d AS (
                SELECT CAST(doc_id AS BIGINT) AS doc_id,
                       CAST({ntoks} AS BIGINT) AS n_tokens
                FROM documents
            ), bk AS (
                SELECT doc_id, n_tokens,
                       CAST(n_tokens // 64 AS INT) AS bucket,
                       ROW_NUMBER() OVER (PARTITION BY n_tokens // 64
                                          ORDER BY doc_id ASC) - 1 AS idx
                FROM d
            )
            SELECT doc_id, n_tokens, bucket,
                   CAST(idx // 16 AS BIGINT) AS batch_idx,
                   CAST(idx % 16 AS INT) AS pos_in_batch
            FROM bk
        """,
        "q60_deterministic_shuffle": """
            WITH d AS (
                SELECT CAST(doc_id AS BIGINT) AS doc_id,
                       CAST('0x' || SUBSTR(MD5(CAST(CAST(doc_id AS BIGINT) AS VARCHAR)
                                               || '|0'), 1, 8) AS BIGINT) AS k
                FROM documents
            )
            SELECT doc_id, CAST(k % 8 AS INT) AS shard,
                   CAST(ROW_NUMBER() OVER (PARTITION BY k % 8
                                           ORDER BY k ASC, doc_id ASC) - 1
                        AS BIGINT) AS pos_in_shard
            FROM d
        """,
        # naive BETWEEN join as the SPEC; the engine runs the bucketed
        # interval join (operators/intervals.py) with identical results
        "q59_session_attribution": """
            WITH clicks AS (
                SELECT CAST(user_id AS BIGINT) AS user_id,
                       EPOCH_US(ts) AS tus, ts, CAST(event_id AS BIGINT) AS event_id
                FROM events WHERE event_type = 'click'
            ), l AS (
                SELECT user_id, tus,
                       LAG(tus) OVER (PARTITION BY user_id
                                      ORDER BY ts ASC, event_id ASC) AS prev,
                       ts, event_id
                FROM clicks
            ), f AS (
                SELECT *, CASE WHEN prev IS NULL OR tus - prev > 1800000000
                               THEN 1 ELSE 0 END AS new_s
                FROM l
            ), s AS (
                SELECT user_id, tus,
                       SUM(new_s) OVER (PARTITION BY user_id
                                        ORDER BY ts ASC, event_id ASC
                                        ROWS UNBOUNDED PRECEDING) AS sid
                FROM f
            ), sessions AS (
                SELECT user_id, CAST(sid AS INT) AS session_idx,
                       MIN(tus) - 7200000000 AS w_start_us,
                       MAX(tus) + 7200000000 AS w_end_us
                FROM s GROUP BY 1, 2
            ), purchases AS (
                SELECT CAST(event_id AS BIGINT) AS event_id,
                       CAST(user_id AS BIGINT) AS user_id,
                       EPOCH_US(ts) AS ts_us
                FROM events WHERE event_type = 'purchase'
            )
            SELECT p.event_id, p.user_id, p.ts_us, se.session_idx,
                   se.w_start_us
            FROM purchases p
            JOIN sessions se
              ON p.user_id = se.user_id
             AND p.ts_us BETWEEN se.w_start_us AND se.w_end_us
        """,
        "q58_filtered_topk": """
            WITH e AS (
                SELECT CAST(vec_id AS BIGINT) AS vec_id,
                       CAST(embedding AS DOUBLE[]) AS v,
                       CAST(label AS INT) AS label
                FROM embeddings
            ), p AS (
                SELECT vec_id AS probe_id, v AS pv, label AS pl
                FROM e WHERE vec_id IN (0, 1, 2)
            ), s AS (
                SELECT probe_id, e.vec_id AS neighbor_id,
                       ROUND(LIST_DOT_PRODUCT(pv, v)
                             / SQRT(LIST_DOT_PRODUCT(pv, pv) * LIST_DOT_PRODUCT(v, v)),
                             6) AS cos
                FROM p JOIN e ON e.label = p.pl AND e.vec_id <> p.probe_id
            )
            SELECT probe_id, neighbor_id, cos, CAST(rank AS INT) AS rank
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                               ORDER BY cos DESC, neighbor_id ASC) AS rank
                  FROM s)
            WHERE rank <= 5
        """,
        "q57_phash_dedup": _phash_sql(),
        "q47_random_projection": _rp_sql(),
        "q48_sq_int8": _SQ_INT8_SQL,
        "q50_regional_revenue": """
            SELECT r_name, n_name,
                   CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                            * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
                        AS DECIMAL(28,4)) AS DOUBLE) AS revenue,
                   COUNT(DISTINCT o_orderkey) AS n_orders
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name IN ('ASIA', 'EUROPE')
            GROUP BY 1, 2
        """,
        # single global SUM OVER here is the SPEC; the engine computes the
        # same result as a distributed two-level prefix sum (range buckets +
        # bounded per-bucket windows) — see operators/packing.py
        "q49_sequence_packing": f"""
            WITH d AS (
                SELECT CAST(doc_id AS BIGINT) AS doc_id,
                       CAST({ntoks} AS BIGINT) AS n_tokens
                FROM documents
            ), o AS (
                SELECT doc_id, n_tokens,
                       CAST(COALESCE(SUM(n_tokens) OVER (
                           ORDER BY doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS start_token
                FROM d
            )
            SELECT doc_id, n_tokens, start_token,
                   start_token + n_tokens AS end_token,
                   start_token // 512 AS first_seq,
                   CASE WHEN n_tokens > 0
                        THEN (start_token + n_tokens - 1) // 512
                        ELSE start_token // 512 END AS last_seq,
                   (CASE WHEN n_tokens > 0
                         THEN (start_token + n_tokens - 1) // 512
                         ELSE start_token // 512 END
                    > start_token // 512) AS straddles
            FROM o
        """,
        "q43_count_min": _count_min_sql(),
        # flagship extraction: kernels aren't SQL-expressible, but the payload
        # catalog is tiny and seeded — its scores ride along as literals and
        # the derivation + fold + gating are exact SQL (md5 picks)
        "q90_extract_full": _extract_full_sql(),
        "q91_extract_metrics": _extract_metrics_sql(),
        "q92_main_content": _main_content_sql(),
    }
