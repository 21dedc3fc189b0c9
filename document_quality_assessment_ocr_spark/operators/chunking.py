"""Content-defined chunking (CDC) at token granularity and the chunk-hash
duplication profile on top — the insertion-robust alternative to
fixed-window chunk dedup (q40): a FIXED 100-token grid shifts every
window after an edit, so one inserted sentence invalidates the whole
tail; content-defined cut points (cut where a token's own hash satisfies
a predicate — the Gear/FastCDC idea at token granularity) re-synchronize
immediately after the edit, so all untouched chunks keep their hashes.

Spark shape: chunk assembly is ARRAY-LOCAL — boundary positions are a
filtered index sequence over the token array, chunks are slices between
consecutive boundaries, all inside one projection (zero shuffle, no
per-doc window, no posexplode+window prefix sum). The only exchange is
the final chunk-hash aggregate, which map-side combines.

Determinism/cross-engine: the cut predicate is md5-NIBBLE arithmetic
(first 4 hex chars as an integer, mod ``divisor`` — the repo-standard
md5-pick idiom, NOT F.hash), identical in DuckDB. Expected chunk length =
``divisor`` tokens. (FastCDC's min/max chunk-size clamps are a boundary-
list post-filter if ever needed; the token-granularity cut already bounds
chunk size distribution tightly enough for a dedup profile.)

Reference parity note: the reference has no chunk store; this extends the
dedup family (SURVEY.md §2 LLM-pipeline additions) beside q40's fixed
grid and q73's ExactSubstr.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import WS_CLASS

#: md5-nibble cut predicate: int(md5(token)[:4], 16) % CDC_DIVISOR == 0.
#: Expected chunk length == CDC_DIVISOR tokens. Shared with the oracle
#: builder — never fork.
CDC_DIVISOR = 16


def _token_array(text):
    return F.filter(
        F.split(F.trim(F.lower(F.coalesce(text, F.lit("")))), WS_CLASS + "+"),
        lambda x: x != F.lit(""),
    )


def content_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    divisor: int = CDC_DIVISOR,
) -> DataFrame:
    """Exploded content-defined chunks: ``(id_col, chunk_idx, n_tokens,
    chunk_hash)`` — one row per chunk, ``chunk_idx`` 0-based in document
    order, ``chunk_hash`` = md5 of the space-joined chunk tokens.

    A cut is placed BEFORE token i (i ≥ 1, 0-based) when
    ``int(md5(token_i)[:4], 16) % divisor == 0``; chunk 0 always starts at
    token 0. Empty documents emit no rows.
    """
    tk = _token_array(F.col(text_col))
    n = F.size(F.col("_tk"))
    # boundary starts: position 1 plus every 1-based i>1 whose token cuts
    cuts = F.filter(
        F.sequence(F.lit(2), F.greatest(n, F.lit(2))),
        lambda i: (i <= n)
        & (
            F.conv(
                F.substring(F.md5(F.element_at(F.col("_tk"), i)), 1, 4), 16, 10
            ).cast("long")
            % F.lit(int(divisor))
            == 0
        ),
    )
    starts = F.concat(F.array(F.lit(1)), cuts)
    chunks = F.transform(
        F.col("_st"),
        lambda s, j: F.struct(
            j.cast("long").alias("chunk_idx"),
            (
                F.coalesce(
                    F.try_element_at(F.col("_st"), j + 2),
                    F.size(F.col("_tk")) + 1,
                )
                - s
            )
            .cast("long")
            .alias("n_tokens"),
            F.md5(
                F.array_join(
                    F.slice(
                        F.col("_tk"),
                        s,
                        F.coalesce(
                            F.try_element_at(F.col("_st"), j + 2),
                            F.size(F.col("_tk")) + 1,
                        )
                        - s,
                    ),
                    " ",
                )
            ).alias("chunk_hash"),
        ),
    )
    return (
        docs.select(F.col(id_col), tk.alias("_tk"))
        .where(F.size("_tk") > 0)
        .select(F.col(id_col), F.col("_tk"), starts.alias("_st"))
        .select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(
            F.col(id_col),
            F.col("c.chunk_idx"),
            F.col("c.n_tokens"),
            F.col("c.chunk_hash"),
        )
    )


def chunk_dup_profile(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    divisor: int = CDC_DIVISOR,
    min_occ: int = 2,
) -> DataFrame:
    """Corpus-level duplication profile over content-defined chunks:
    ``(chunk_hash, n_occ, n_docs, n_tokens)`` for every chunk hash seen at
    least ``min_occ`` times — the boilerplate/shingle mass a storage-level
    or RefinedWeb-style chunk dedup pass would reclaim, robust to
    insertions (see module docstring).

    One hash aggregate (map-side combined); n_tokens is the per-occurrence
    token count (identical for identical hashes, surfaced via max).
    """
    ch = content_chunks(docs, id_col, text_col, divisor)
    return (
        ch.groupBy("chunk_hash")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occ"),
            F.countDistinct(id_col).cast("long").alias("n_docs"),
            F.max("n_tokens").cast("long").alias("n_tokens"),
        )
        .where(F.col("n_occ") >= int(min_occ))
    )


def window_chunks(
    docs: DataFrame,
    window: int = 128,
    stride: int = 96,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed-stride sliding-window chunking — the standard long-document
    prep for context-window training (split each doc into ``window``-token
    pieces advancing ``stride`` tokens, so consecutive chunks overlap by
    ``window − stride`` tokens of context).  Complements
    :func:`content_chunks` (CDC, dedup-oriented) with the
    training-oriented grid: every token lands in ≥1 chunk, the final
    chunk may be short, zero-token docs emit NO chunks.

    Chunk count is pure integer arithmetic shared with the oracle:
    ``n_chunks = 1 + (max(0, n − window) + stride − 1) DIV stride`` —
    non-negative operands only.

    Scale shape: one projection builds the token array, one posexplode of
    the bounded index sequence fans out chunks — no shuffle at all until
    whatever consumes the chunks aggregates them; lineage (doc id, chunk
    index, start token) rides along for re-assembly.

    Output: (id_col, chunk_idx, start_tok, n_chunk_tokens, chunk_text).
    """
    assert window >= 1 and 1 <= stride <= window
    toks = _token_array(F.col(text_col))
    base = docs.select(F.col(id_col), toks.alias("tk")).where(F.size("tk") >= 1)
    n = F.size("tk").cast("long")
    n_chunks = (
        F.lit(1).cast("long")
        + F.expr(
            f"(GREATEST(size(tk) - {int(window)}, 0) + {int(stride)} - 1)"
            f" DIV {int(stride)}"
        ).cast("long")
    )
    fanned = base.select(
        F.col(id_col),
        F.col("tk"),
        F.posexplode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
            "chunk_idx", "_i"
        ),
    )
    start = (F.col("_i") * F.lit(int(stride))).cast("int") + 1
    piece = F.slice(F.col("tk"), start, F.lit(int(window)))
    return fanned.select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        start.cast("long").alias("start_tok"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def text_segments(
    docs: DataFrame,
    w: int = 10,
    threshold_micro: int = 100_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """TextTiling-style topical segmentation (Hearst 1997, simplified):
    split each document into consecutive w-token blocks, score every
    adjacent block pair by exact set-Jaccard of their token vocabularies
    (integer micro — ``(1e6·|∩|) DIV |∪|``), and place a segment
    boundary wherever cohesion drops below ``threshold_micro``.  The
    chunking front-end for long-document training data that must not
    cut mid-topic (content_chunks above packs by SIZE; this cuts by
    TOPIC SHIFT).

    Set semantics are the cross-engine contract: Spark
    ``array_intersect``/``array_union`` deduplicate, as do DuckDB
    ``LIST_INTERSECT`` / ``LIST_DISTINCT(a || b)`` — only SIZES are
    compared, so element order never matters.

    Output per doc: (id_col, n_tokens, n_blocks, n_boundaries,
    n_segments, min_sim_micro, boundaries) — ``boundaries`` is the
    comma-joined 1-based list of left-block indexes whose cohesion with
    the next block broke ('' when none); ``min_sim_micro`` is NULL for
    docs with < 2 blocks; ``n_segments`` is 0 for empty docs.

    At 100 TB: pure map-side projection — every array lives inside its
    own row (block count is doc-length-bounded; the SCALE.md §3 mega-doc
    salting guard applies upstream); no exchange, no UDF.
    """
    if w < 1:
        raise ValueError("w must be >= 1")
    thr = int(threshold_micro)
    tk = _token_array(F.col(text_col))
    base = docs.select(
        F.col(id_col),
        tk.alias("_tk"),
        F.size(tk).cast("long").alias("n_tokens"),
        F.expr(f"CAST((size({'_tk'}) + {w - 1}) DIV {w} AS LONG)").alias("_nb"),
    )

    def blk(var: str) -> str:
        return f"slice(_tk, {var} * {w} + 1, {w})"

    sim = (
        f"CAST((1000000L * size(array_intersect({blk('i')}, {blk('(i + 1)')}))) "
        f"DIV greatest(size(array_union({blk('i')}, {blk('(i + 1)')})), 1L) "
        "AS LONG)"
    )
    sims = F.expr(
        "CASE WHEN _nb >= 2 THEN "
        f"transform(sequence(0, CAST(_nb AS INT) - 2), i -> {sim}) END"
    )
    scored = base.select(
        id_col, "n_tokens", F.col("_nb").alias("n_blocks"), sims.alias("_sims")
    )
    bnds = F.expr(
        f"filter(sequence(1, size(_sims)), j -> element_at(_sims, j) < {thr}L)"
    )
    return scored.select(
        id_col,
        "n_tokens",
        "n_blocks",
        bnds.alias("_bnds"),
        F.expr("array_min(_sims)").cast("long").alias("min_sim_micro"),
    ).select(
        id_col,
        "n_tokens",
        "n_blocks",
        F.coalesce(F.size("_bnds"), F.lit(0)).cast("long").alias("n_boundaries"),
        F.when(
            F.col("n_blocks") >= 1,
            F.coalesce(F.size("_bnds"), F.lit(0)) + 1,
        )
        .otherwise(0)
        .cast("long")
        .alias("n_segments"),
        "min_sim_micro",
        F.coalesce(
            F.array_join(F.expr("transform(_bnds, b -> CAST(b AS STRING))"), ","),
            F.lit(""),
        ).alias("boundaries"),
    ).orderBy(id_col)
