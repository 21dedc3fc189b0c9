"""Chat-template rendering with loss-mask spans — the SFT-side sibling of
the pretraining packing ops: multi-turn conversations render into one
training string, and the trainer needs the character spans of the
ASSISTANT contents (the only tokens that take loss; user turns and
template markup are masked out).

Template (fixed, both engines):

    <|user|>{content}<|end|>\n<|assistant|>{content}<|end|>\n...

Every span is pure integer arithmetic over per-turn chunk lengths — a
prefix sum PARTITIONED BY conversation (bounded by turns-per-doc, never a
global window), so the oracle matches bit-for-bit.

Scale shape: one conversation-keyed exchange total — the turn window and
the per-conversation render aggregate share the same hash partitioning on
``id_col``, and the render join-back is co-partitioned on it (AQE reuses
the exchange). Everything else is codegen string/integer projections.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TURN_END = "<|end|>\n"


def chat_render_spans(
    turns: DataFrame,
    id_col: str = "doc_id",
    turn_col: str = "turn",
    role_col: str = "role",
    content_col: str = "content",
) -> DataFrame:
    """Render ``(id, turn, role, content)`` rows into the chat template
    and emit one row per ASSISTANT turn with its content's 0-based
    character span in the rendered string.

    ``turn_col`` must be a 1-based dense order within each conversation;
    ``role_col`` values are template-interpolated verbatim (normally
    'user'/'assistant'; only 'assistant' rows emit spans).

    Output: (id_col, turn_col, span_start, span_end, render_md5) —
    render_md5 is the md5 of the FULL rendered conversation (repeated on
    every span row), the cross-engine witness that the rendered bytes
    themselves agree, not just the offsets.
    """
    chunk = F.concat(
        F.lit("<|"),
        F.col(role_col),
        F.lit("|>"),
        F.col(content_col),
        F.lit(TURN_END),
    )
    # both windows share (partition, order): one exchange + one sort in
    # the physical plan — the render md5 rides the cumsum's shuffle
    # instead of a second aggregate branch + join-back
    w = (
        Window.partitionBy(id_col)
        .orderBy(F.col(turn_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wfull = (
        Window.partitionBy(id_col)
        .orderBy(F.col(turn_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    ch = turns.select(
        F.col(id_col),
        F.col(turn_col),
        F.col(role_col),
        F.col(content_col),
        chunk.alias("_chunk"),
    )
    cs = ch.withColumn(
        "_cum", F.sum(F.length("_chunk")).over(w).cast("long")
    ).withColumn(
        "render_md5",
        F.md5(F.array_join(F.collect_list("_chunk").over(wfull), "")),
    )
    start = (
        F.col("_cum")
        - F.length("_chunk")
        + F.length(F.concat(F.lit("<|"), F.col(role_col), F.lit("|>")))
    ).cast("long")
    return cs.where(F.col(role_col) == F.lit("assistant")).select(
        F.col(id_col),
        F.col(turn_col),
        start.alias("span_start"),
        (start + F.length(F.col(content_col)).cast("long")).alias("span_end"),
        "render_md5",
    )


def preference_pairs(
    clustered: DataFrame,
    scored: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Preference-pair mining from near-duplicate clusters: within each
    cluster of ≥2 documents, (chosen, rejected) = the best- and
    worst-quality members — the cheap preference signal near-dup groups
    carry (same content, different quality), the DPO-style pair
    construction a curation pipeline feeds to preference training.

    Ties break deterministically: chosen = highest score then SMALLEST
    id; rejected = lowest score then LARGEST id. Clusters whose members
    all share one score carry no signal and emit nothing; chosen and
    rejected are therefore always distinct documents.

    Scale shape: one join on ``id_col`` (cluster assignment × scores)
    and ONE cluster-keyed aggregate whose state is two fixed structs +
    a count per cluster — never a per-cluster window or collect.

    Output: (cluster_col, n_docs, chosen_id, chosen_score, rejected_id,
    rejected_score).
    """
    j = clustered.select(F.col(id_col), F.col(cluster_col)).join(
        scored.select(F.col(id_col), F.col(score_col)), id_col
    )
    # struct ordering: (score, -id) — max → best score then smallest id,
    # min → worst score then largest id
    st = F.struct(
        F.col(score_col).alias("s"),
        (-F.col(id_col)).alias("nid"),
        F.col(id_col).alias("i"),
    )
    agg = j.groupBy(cluster_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.max(st).alias("ch"),
        F.min(st).alias("rj"),
    )
    return agg.where(
        (F.col("n_docs") >= 2) & (F.col("ch.s") > F.col("rj.s"))
    ).select(
        F.col(cluster_col),
        F.col("n_docs"),
        F.col("ch.i").alias("chosen_id"),
        F.col("ch.s").alias("chosen_score"),
        F.col("rj.i").alias("rejected_id"),
        F.col("rj.s").alias("rejected_score"),
    )


def turns_from_lines(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Derive alternating user/assistant turns from multi-line text: each
    non-blank line is one turn, 1-based order preserved, odd turns are
    'user' and even turns 'assistant' (conversations start with the
    user). The oracle mirrors this synthesis exactly."""
    lines = docs.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("_ln", "content"),
    ).where(F.trim(F.col("content")) != F.lit(""))
    w = Window.partitionBy(id_col).orderBy(F.col("_ln").asc())
    return lines.select(
        F.col(id_col),
        F.row_number().over(w).cast("long").alias("turn"),
        "content",
    ).withColumn(
        "role",
        F.when(F.pmod(F.col("turn"), F.lit(2)) == 1, F.lit("user")).otherwise(
            F.lit("assistant")
        ),
    )
