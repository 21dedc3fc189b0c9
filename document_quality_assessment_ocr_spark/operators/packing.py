"""Sequence packing for LLM pre-training: assign every document its global
token offset (doc_id order) and the fixed-length training sequences it lands
in (GPT-style concatenate-then-split-at-L packing).

The naive formulation is a single global running sum — `SUM OVER (ORDER BY
doc_id)` — which on Spark is a one-partition Window: the whole corpus
funnels through one reducer. This operator computes the SAME result as a
**distributed two-level prefix sum**:

1. range-bucket by doc_id (buckets preserve global order: every id in
   bucket k sorts before every id in bucket k+1);
2. one hash aggregate for per-bucket token totals — a few hundred rows —
   collected and prefix-summed on the driver (bounded by n_buckets, never
   by corpus size);
3. per-bucket cumulative sum (Window partitioned BY BUCKET — ~1/n_buckets
   of the data per task) plus the broadcast bucket-prefix offset.

At 100 TB the only full-data movements are one hash exchange for the
bucketing window and the scan itself; no single task ever sees more than a
bucket. n_buckets scales with the cluster (set it ≈ 2–4× executor count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def length_bucketed_batches(
    docs: DataFrame,
    batch_size: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    bucket_width: int = 64,
) -> DataFrame:
    """Padding-efficient batch assignment: documents group into
    ``bucket_width``-token length buckets, and each bucket fills fixed
    ``batch_size`` batches in deterministic ``id_col`` order — the
    pad-to-longest waste inside any batch is bounded by ``bucket_width``
    tokens instead of the corpus max length.

    Output: (id_col, n_tokens, bucket, batch_idx, pos_in_batch). Pure
    integer arithmetic (oracle-exact); the only window partitions by
    length bucket — bounded, no global ordering."""
    b = F.expr(f"{tokens_col} DIV {bucket_width}")
    w = Window.partitionBy("bucket").orderBy(F.col(id_col).asc())
    return (
        docs.select(
            F.col(id_col), F.col(tokens_col).cast("long").alias("n_tokens"),
            b.cast("int").alias("bucket"),
        )
        .withColumn("_idx", (F.row_number().over(w) - 1).cast("long"))
        .select(
            id_col,
            "n_tokens",
            "bucket",
            F.expr(f"_idx DIV {batch_size}").alias("batch_idx"),
            F.pmod("_idx", F.lit(batch_size)).cast("int").alias("pos_in_batch"),
        )
    )


def pack_offsets(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_buckets: int = 64,
) -> DataFrame:
    """Global token offsets + sequence assignment in ``id_col`` order.

    Output per input row: (id_col, n_tokens, start_token, end_token,
    first_seq, last_seq, straddles) where ``[start_token, end_token)`` is
    the doc's slice of the concatenated token stream, ``first_seq``/
    ``last_seq`` the zero-based ``seq_len``-sized training sequences it
    touches (empty docs take ``first_seq == last_seq`` at their offset),
    and ``straddles`` flags documents crossing a sequence boundary."""
    # range-bucketing: contiguous id spans so bucket order == global order
    bounds = docs.select(
        F.min(id_col).alias("lo"), F.max(id_col).alias("hi")
    ).first()
    if bounds["lo"] is None:
        span = 1
    else:
        span = max(1, (int(bounds["hi"]) - int(bounds["lo"])) // n_buckets + 1)
    lo = int(bounds["lo"] or 0)
    b = ((F.col(id_col) - lo) / span).cast("long").alias("_bucket")
    d = docs.select(F.col(id_col), F.col(tokens_col), b)

    totals = {
        int(r["_bucket"]): int(r["t"])
        for r in d.groupBy("_bucket").agg(F.sum(tokens_col).alias("t")).collect()
    }
    prefix, acc = {}, 0
    for k in sorted(totals):
        prefix[k] = acc
        acc += totals[k]
    pre = F.create_map(
        *[F.lit(x) for kv in prefix.items() for x in kv]
    )  # tiny literal map, broadcast with the plan

    w = (
        Window.partitionBy("_bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = (
        pre[F.col("_bucket")] + F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    ).cast("long")
    out = d.select(
        F.col(id_col),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        start.alias("start_token"),
    )
    # integer DIV, not double division — exact past 2^53 token offsets
    end = F.col("start_token") + F.col("n_tokens")
    first_seq = F.expr(f"start_token DIV {seq_len}")
    last_seq = F.when(
        F.col("n_tokens") > 0,
        F.expr(f"(start_token + n_tokens - 1) DIV {seq_len}"),
    ).otherwise(first_seq)
    return out.select(
        id_col,
        "n_tokens",
        "start_token",
        end.alias("end_token"),
        first_seq.alias("first_seq"),
        last_seq.alias("last_seq"),
        (last_seq > first_seq).alias("straddles"),
    )


def chunk_manifest(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_buckets: int = 64,
) -> DataFrame:
    """Shard-writer view of the packed token stream: one row per
    (training sequence, document slice) — the manifest a tokenize-and-pack
    job hands to the shard writer so each fixed-``seq_len`` training
    sequence knows exactly which document byte-ranges compose it (and,
    inverted, where every document's tokens ended up: full lineage).

    Built on :func:`pack_offsets` (same two-level prefix sum; no new
    all-to-all). Each non-empty document explodes into its
    ``first_seq..last_seq`` windows — ~``n_tokens/seq_len`` rows per doc,
    linear in the corpus, never quadratic. ``F.sequence`` is guarded by
    construction here (``last_seq >= first_seq`` whenever ``n_tokens >
    0`` — the CLAUDE.md counts-DOWN trap can't fire).

    Output: (seq_id, id_col, doc_offset, seq_offset, n_slice) where the
    slice is tokens ``[doc_offset, doc_offset+n_slice)`` of the document
    landing at position ``seq_offset`` of training sequence ``seq_id``.
    """
    off = pack_offsets(docs, seq_len, id_col, tokens_col, n_buckets)
    exploded = off.where(F.col("n_tokens") > 0).select(
        F.col(id_col),
        "start_token",
        "end_token",
        F.explode(F.sequence("first_seq", "last_seq")).alias("seq_id"),
    )
    s0 = F.col("seq_id") * F.lit(int(seq_len))
    lo = F.greatest(F.col("start_token"), s0)
    hi = F.least(F.col("end_token"), s0 + F.lit(int(seq_len)))
    return exploded.select(
        "seq_id",
        F.col(id_col),
        (lo - F.col("start_token")).cast("long").alias("doc_offset"),
        (lo - s0).cast("long").alias("seq_offset"),
        (hi - lo).cast("long").alias("n_slice"),
    )
