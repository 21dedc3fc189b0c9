"""Small-file compaction planning — the Iceberg ``rewrite_data_files``
maintenance analog for the checkpointed corpus tables.

Streaming/CDC ingest (``streaming/extract``, ``operators/cdc``) leaves
many small files; a compaction pass groups them into ~``target_bytes``
rewrite tasks. Grouping rule: files in manifest order, each group a
contiguous run, cut at every ``target_bytes`` boundary of the running
byte total — ``group_id = floor(start_byte / target_bytes)``. A group
overshoots the target by less than one file, and contiguity preserves
any sort-order clustering the table already has (why Iceberg's binpack
strategy also packs adjacent files).

The running sum is the single-reducer anti-pattern if written as a
global ``SUM OVER (ORDER BY …)`` window; this reuses
``operators/packing.pack_offsets`` — the distributed two-level prefix
sum (range buckets + bounded per-bucket windows) — so no task ever
holds more than one bucket of the manifest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .packing import pack_offsets


def plan_compaction(
    manifest: DataFrame,
    target_bytes: int,
    id_col: str = "file_id",
    size_col: str = "size_bytes",
    n_buckets: int = 64,
) -> DataFrame:
    """File manifest → per-file compaction-group assignment.

    ``manifest`` rows are ``(id_col: numeric manifest ordinal,
    size_col: bytes)``. Output: (id_col, size_bytes, start_byte,
    group_id). Integer-exact past 2^53 total bytes.
    """
    packed = pack_offsets(
        manifest,
        seq_len=int(target_bytes),
        id_col=id_col,
        tokens_col=size_col,
        n_buckets=n_buckets,
    )
    return packed.select(
        F.col(id_col),
        F.col("n_tokens").alias("size_bytes"),
        F.col("start_token").alias("start_byte"),
        F.col("first_seq").alias("group_id"),
    )


def compaction_summary(plan: DataFrame) -> DataFrame:
    """Per-group rollup of a compaction plan: file count, total bytes —
    the rewrite task list. One hash aggregate."""
    return plan.groupBy("group_id").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("size_bytes").cast("long").alias("total_bytes"),
        F.min("start_byte").cast("long").alias("group_start"),
    )


def rendezvous_reshard(
    docs: DataFrame,
    n_old: int = 8,
    n_new: int = 9,
    id_col: str = "doc_id",
    salt: str = "rv",
) -> DataFrame:
    """Rendezvous (highest-random-weight) reshard movement matrix — the
    placement planner consulted before growing a sharded store: under
    HRW hashing, growing ``n_old`` → ``n_new`` shards moves only
    ~1/n_new of the keys (each key moves iff the NEW shard wins its
    rendezvous), versus ~100% under naive ``hash % n``. This operator
    computes the exact (from_shard, to_shard) movement matrix so the
    re-shard's network bill is known before it is paid.

    A key's shard is ``argmax over s of md5(id || '|salt' || s)`` — the
    winner is picked by GREATEST over per-shard strings
    ``md5hex || '|' || shard`` (md5 hex is fixed 32 lowercase chars, so
    lexicographic compare decides on the hash and the shard suffix is
    carried, the q160 sortable-key idiom; both engines share the exact
    string). Ties are impossible in practice and still deterministic
    (shard digits break them).

    Scale shape: pure map-side projection (``2·n`` literal md5
    expressions per row, zero explode, zero shuffle) + ONE aggregate on
    the ≤ ``n_old·n_new`` cell grid.

    Output: (from_shard, to_shard, n_docs, moved) ordered by
    (from_shard, to_shard).
    """
    if not (1 <= n_old and 1 <= n_new):
        raise ValueError("shard counts must be >= 1")

    def pick(n: int) -> F.Column:
        keys = [
            F.concat_ws(
                "|",
                F.md5(
                    F.concat(
                        F.col(id_col).cast("string"),
                        F.lit(f"|{salt}{s}"),
                    )
                ),
                F.lit(str(s)),
            )
            for s in range(int(n))
        ]
        win = keys[0] if len(keys) == 1 else F.greatest(*keys)
        return F.substring(win, 34, 20).cast("long")

    base = docs.select(
        pick(int(n_old)).alias("from_shard"),
        pick(int(n_new)).alias("to_shard"),
    )
    return (
        base.groupBy("from_shard", "to_shard")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .select(
            "from_shard",
            "to_shard",
            "n_docs",
            (F.col("from_shard") != F.col("to_shard")).alias("moved"),
        )
        .orderBy("from_shard", "to_shard")
    )


def snapshot_churn(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "content_hash",
    group_col: str = "source",
) -> DataFrame:
    """Corpus snapshot churn report: per-group added / removed / changed /
    unchanged counts between two crawl (or pipeline) snapshots, plus a
    churn rate — the recrawl-scheduler input and the "did this
    pipeline release rewrite half the corpus?" audit that the row-level diff
    (cdc.snapshot_diff, q86) emits as rows but never aggregates.

    Both sides reduce to (id, hash, group) first, so the diff join
    carries fingerprints, never payloads. Status is decided by the
    full-outer join's null pattern; ``changed`` compares the content
    hashes. The group label prefers the NEW side (a doc that moved
    sources counts under where it lives now). ``churn_micro =
    (added + removed + changed)·1e6 DIV n_union`` — non-negative DIV ==
    DuckDB ``//``.

    Scale shape: two map-side projections, ONE full-outer equi-join on
    the id (both sides hash-partition on the same key), one grid-
    bounded rollup (|groups| × 4). No window, no collect.

    Output: (group_col, n_old, n_new, added, removed, changed,
    unchanged, churn_micro) ordered by group.
    """
    g = F.coalesce(F.col(group_col).cast("string"), F.lit(""))
    o = old.select(
        F.col(id_col).alias("_id"),
        F.col(hash_col).alias("_ho"),
        g.alias("_go"),
    )
    n = new.select(
        F.col(id_col).alias("_id"),
        F.col(hash_col).alias("_hn"),
        g.alias("_gn"),
    )
    j = o.join(n, "_id", "full_outer").select(
        F.coalesce("_gn", "_go").alias("grp"),
        F.col("_ho").isNotNull().alias("in_old"),
        F.col("_hn").isNotNull().alias("in_new"),
        (
            F.col("_ho").isNotNull()
            & F.col("_hn").isNotNull()
            & (F.col("_ho") != F.col("_hn"))
        ).alias("is_changed"),
    )
    agg = j.groupBy("grp").agg(
        F.sum(F.col("in_old").cast("long")).cast("long").alias("n_old"),
        F.sum(F.col("in_new").cast("long")).cast("long").alias("n_new"),
        F.sum((F.col("in_new") & ~F.col("in_old")).cast("long"))
        .cast("long")
        .alias("added"),
        F.sum((F.col("in_old") & ~F.col("in_new")).cast("long"))
        .cast("long")
        .alias("removed"),
        F.sum(F.col("is_changed").cast("long")).cast("long").alias("changed"),
        F.sum(
            (F.col("in_old") & F.col("in_new") & ~F.col("is_changed")).cast(
                "long"
            )
        )
        .cast("long")
        .alias("unchanged"),
        F.count(F.lit(1)).cast("long").alias("n_union"),
    )
    return agg.select(
        F.col("grp").alias(group_col),
        "n_old",
        "n_new",
        "added",
        "removed",
        "changed",
        "unchanged",
        F.expr(
            "((added + removed + changed) * 1000000L) DIV greatest(n_union, 1L)"
        ).cast("long").alias("churn_micro"),
    ).orderBy(group_col)
