"""BM25 ranked retrieval over the corpus — the lookup side of a curation
stack (decontamination forensics, "find training docs like this eval
prompt", quality-by-retrievability audits).

Everything is FIXED-POINT integer arithmetic so the engine and the DuckDB
oracle hash-match bitwise:

- **idf** uses the Robertson–Spärck-Jones odds surrogate in milli units,
  ``idf_milli = (N − df)·1000 DIV df`` — exact-integer, monotone in 1/df,
  and (unlike the floor-log2 whole-bits form, which floors to 0 for any
  df > N/2) still discriminates on dense vocabularies where every term
  appears in most documents.
- **tf normalization** with the standard k1=6/5, b=3/4 becomes an exact
  integer rational: multiplying numerator and denominator of
  ``tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))`` by ``20·total`` (where
  ``avgdl = total/N``) gives

      num = 44·tf·total          den = 20·tf·total + 6·total + 18·dl·N

  and the per-term score is ``idf_milli · (num·1e6 DIV den)`` in
  milli·micro fixed-point units (``score_fx``) — integer division is
  exact and identical on both engines for non-negative operands (the
  CLAUDE.md DIV invariant).
- Summing int64 fixed-point scores over query terms is order-independent.

int64 headroom: ``num·1e6 = 44·tf·total·1e6`` caps total ≈ 2·10¹¹ tokens
per scoring scope before overflow, and ``idf_milli·ratio ≈ 2.2e6·(N−df)
·1000/df`` stays under 2^63 for df ≥ N/4·10⁶ — at 100 TB compute BM25 per
shard/partition-group (df/total are mergeable integer stats) or widen to
DECIMAL; the plan shape is unchanged.

Plan at scale: one tf aggregate restricted to the (tiny, broadcast) query
panel — the token IN (...) predicate pushes into the scan, so postings are
built for panel terms only, never the whole vocabulary; df for those terms
derives from the already-shrunk tf rows; N/total ride along as a broadcast
single-row cross join (no driver collect); top-k per query is the
two-level pattern (salted partial top-k → final top-k), never a global
sort.

Reference parity note: the reference engine has no retrieval stage; this
extends the LLM-pipeline family (inverted index q71 is the generalist
structure; BM25 is the ranked query on top).
"""

from __future__ import annotations

from typing import Dict, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import WS_CLASS

#: tf-normalization constants k1=6/5, b=3/4 folded into exact integers
#: (see module docstring): num = 44·tf·total, den = 20·tf·total + 6·total
#: + 18·dl·N. Shared with the oracle builder — never fork.
BM25_NUM_C = 44
BM25_DEN_TF = 20
BM25_DEN_TOTAL = 6
BM25_DEN_DL = 18
MICRO = 1_000_000
#: RSJ idf scale: idf_milli = (N - df) * IDF_MILLI DIV df
IDF_MILLI = 1_000


def _tokens(text):
    return F.filter(
        F.split(F.trim(F.lower(F.coalesce(text, F.lit("")))), WS_CLASS + "+"),
        lambda x: x != F.lit(""),
    )


def bm25_top_terms(
    docs: DataFrame, n: int, text_col: str = "text"
) -> list:
    """Deterministic query-panel seed: the ``n`` highest-document-frequency
    tokens with df < N (the RSJ idf of an everywhere-term is 0, so it's
    excluded), total-ordered by (df DESC, token ASC). One zipf-bounded
    aggregate + a bounded ``n``-row collect; the oracle builder computes
    the SAME list in DuckDB — identical tokenization, cap and order."""
    n_docs = docs.count()
    rows = (
        docs.select(F.explode(F.array_distinct(_tokens(F.col(text_col)))).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") < F.lit(int(n_docs)))
        .orderBy(F.col("df").desc(), F.col("t").asc())
        .limit(int(n))
        .collect()
    )
    return [r["t"] for r in rows]


def bm25_search(
    docs: DataFrame,
    queries: Dict[int, Sequence[str]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt_buckets: int = 32,
    _base: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` documents per query by fixed-point BM25.

    ``queries`` maps query_id → term list (a tiny driver-side panel —
    literal rows, broadcast). Output ``(query_id, doc_id, score_fx,
    rank)`` with rank 1-based by (score_fx DESC, doc_id ASC) — the
    deterministic tie-break both engines share.
    """
    spark = docs.sparkSession
    panel = spark.createDataFrame(
        [(int(q), str(t)) for q, terms in queries.items() for t in terms],
        "query_id int, token string",
    )
    all_terms = sorted({str(t) for terms in queries.values() for t in terms})

    base = _base if _base is not None else docs.select(
        F.col(id_col), _tokens(F.col(text_col)).alias("tk")
    ).localCheckpoint()  # read by dl/stats/toks branches — tokenize once (r6)
    dl = base.select(F.col(id_col), F.size("tk").cast("long").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total"),
    )

    toks = base.select(F.col(id_col), F.explode("tk").alias("token")).where(
        F.col("token").isin(all_terms)  # literal IN — pushes into the scan
    )
    tf = toks.groupBy("token", id_col).agg(F.count(F.lit(1)).cast("long").alias("tf"))
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("df"))

    idf_milli = F.expr(f"((n_docs - df) * {IDF_MILLI}) DIV df")
    term_score = idf_milli * F.expr(
        f"(({BM25_NUM_C} * tf * total) * {MICRO}) DIV "
        f"({BM25_DEN_TF} * tf * total + {BM25_DEN_TOTAL} * total"
        f" + {BM25_DEN_DL} * dl * n_docs)"
    )

    scored = (
        tf.join(F.broadcast(panel), "token")
        .join(df_, "token")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select("query_id", F.col(id_col), term_score.alias("s"))
        .groupBy("query_id", id_col)
        .agg(F.sum("s").cast("long").alias("score_fx"))
    )

    # two-level top-k: salted partial winners, then the final k per query
    order = [F.col("score_fx").desc(), F.col(id_col).asc()]
    w1 = Window.partitionBy(
        "query_id", F.pmod(F.hash(F.col(id_col)), F.lit(int(salt_buckets)))
    ).orderBy(*order)
    w2 = Window.partitionBy("query_id").orderBy(*order)
    return (
        scored.withColumn("_r", F.row_number().over(w1))
        .where(F.col("_r") <= k)
        .withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", id_col, "score_fx", "rank")
    )


def hash_dot_topk(
    docs: DataFrame,
    queries: Dict[int, Sequence[str]],
    dim: int = 64,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt_buckets: int = 32,
) -> DataFrame:
    """Dense-side retrieval twin of :func:`bm25_search`: rank documents by
    the INTEGER dot product between feature-hashed text vectors
    (textstats.hash_embedding arithmetic: md5 index + ±1 sign, signed
    token counts) and the query panel hashed the same way — model-free
    "dense" retrieval that is bit-exact on both engines.

    Query vectors are built IN the plan from the literal panel (no driver
    collect); the panel side is tiny (≤ |terms| coordinate rows) and
    broadcast, so the dim_idx join is map-side. A small ``dim`` makes this
    a near-brute-force scan by design (every doc with mass in a query
    dimension scores) — the candidate-bounded path at scale is IVF/LSH
    (operators/similarity); this operator exists as the hybrid-fusion
    baseline that :func:`rrf_fuse` combines with BM25.

    Output ``(query_id, doc_id, score_fx, rank)``, rank 1-based by
    (score_fx DESC, doc_id ASC); docs sharing no dimension with the query
    are absent (their dot product is an empty sum, not 0 — matching the
    sparse join on both engines).
    """
    from .textstats import hash_embedding

    spark = docs.sparkSession
    panel = spark.createDataFrame(
        [(int(q), str(t)) for q, terms in queries.items() for t in terms],
        "query_id int, token string",
    )
    h = F.md5(F.col("token"))
    idx = (F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % F.lit(int(dim))).alias(
        "dim_idx"
    )
    sign = F.when(
        F.conv(F.substring(h, 5, 1), 16, 10).cast("int") % 2 == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    qvec = (
        panel.select("query_id", idx, sign.alias("s"))
        .groupBy("query_id", "dim_idx")
        .agg(F.sum("s").cast("long").alias("qw"))
        .where(F.col("qw") != 0)
    )
    dvec = hash_embedding(docs, id_col=id_col, text_col=text_col, dim=dim)
    scored = (
        dvec.join(F.broadcast(qvec), "dim_idx")
        .groupBy("query_id", id_col)
        .agg(F.sum(F.col("weight") * F.col("qw")).cast("long").alias("score_fx"))
    )
    order = [F.col("score_fx").desc(), F.col(id_col).asc()]
    w1 = Window.partitionBy(
        "query_id", F.pmod(F.hash(F.col(id_col)), F.lit(int(salt_buckets)))
    ).orderBy(*order)
    w2 = Window.partitionBy("query_id").orderBy(*order)
    return (
        scored.withColumn("_r", F.row_number().over(w1))
        .where(F.col("_r") <= k)
        .withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", id_col, "score_fx", "rank")
    )


#: RRF constant (Cormack & Clarke 2009's k=60) and the fixed-point scale:
#: each system contributes MICRO DIV (RRF_K + rank). Shared with the
#: oracle builder — never fork.
RRF_K = 60


def rrf_fuse(
    rankings: Sequence[DataFrame],
    k: int = 10,
    id_col: str = "doc_id",
    salt_buckets: int = 32,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack & Clarke 2009) of per-query rank
    lists: ``rrf_fx = Σ_systems MICRO DIV (60 + rank)`` — integer, so the
    fused score is order-independent and bit-exact cross-engine. Systems
    only contribute for documents they returned (standard RRF).

    Each input needs columns ``(query_id, id_col, rank)``. The union is
    rows = Σ per-system top-k — tiny relative to the corpus — and the
    fuse is one aggregate + the two-level top-k.

    Output ``(query_id, doc_id, rrf_fx, rank)`` with the (rrf_fx DESC,
    doc_id ASC) total order.
    """
    contrib = None
    for r in rankings:
        c = r.select(
            "query_id",
            F.col(id_col),
            F.expr(f"{MICRO} DIV ({RRF_K} + rank)").cast("long").alias("c"),
        )
        contrib = c if contrib is None else contrib.unionByName(c)
    fused = contrib.groupBy("query_id", id_col).agg(
        F.sum("c").cast("long").alias("rrf_fx")
    )
    order = [F.col("rrf_fx").desc(), F.col(id_col).asc()]
    w1 = Window.partitionBy(
        "query_id", F.pmod(F.hash(F.col(id_col)), F.lit(int(salt_buckets)))
    ).orderBy(*order)
    w2 = Window.partitionBy("query_id").orderBy(*order)
    return (
        fused.withColumn("_r", F.row_number().over(w1))
        .where(F.col("_r") <= k)
        .withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", id_col, "rrf_fx", "rank")
    )


def recall_at_k(
    approx: DataFrame,
    exact: DataFrame,
    k: int = 5,
    probe_col: str = "probe_id",
    neighbor_col: str = "neighbor_id",
) -> DataFrame:
    """Index-health audit: per-probe recall@k of an approximate ranking
    against the exact one — the number every ANN deployment watches when
    tuning n_probe / bands / code size.  Generic over any two (probe,
    neighbor, rank) rankings: IVF vs brute force, LSH vs brute force,
    PQ vs re-ranked, truncated-dim vs full.

    ``recall`` is one IEEE division of two exact integer counts —
    deterministic and identical on both engines.  Probes the approximate
    index missed entirely still get a row (recall 0), and the
    denominator is the EXACT side's row count (< k when the corpus
    itself has fewer than k eligible neighbors), so the metric never
    flatters truncation.

    Scale shape: rank filters are map-side; both group-bys are keyed by
    the bounded probe panel, so every aggregate and the final join are
    broadcast-sized.

    Output: (probe_col, n_hit, n_exact, recall).
    """
    a = approx.where(F.col("rank") <= k).select(probe_col, neighbor_col)
    e = exact.where(F.col("rank") <= k).select(probe_col, neighbor_col)
    hit = a.join(e, [probe_col, neighbor_col]).groupBy(probe_col).agg(
        F.count(F.lit(1)).alias("n_hit")
    )
    ex = e.groupBy(probe_col).agg(F.count(F.lit(1)).alias("n_exact"))
    return ex.join(hit, probe_col, "left").select(
        probe_col,
        F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
        F.col("n_exact").cast("long").alias("n_exact"),
        (
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("double")
            / F.col("n_exact").cast("double")
        ).alias("recall"),
    )


def posting_list_size(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """Inverted-index size planner: per-term compressed posting-list cost
    under delta + Elias-gamma coding — the capacity estimate an index
    build runs BEFORE materializing the index (γ(g) = 2·⌊log2 g⌋ + 1
    bits per doc-id gap; Witten/Moffat/Bell "Managing Gigabytes" ch.3).
    Terms outside the [min_df, max_df] document-frequency band are
    excluded, exactly as the index build itself would drop hapaxes and
    stopwords — and max_df is ALSO the scale guard: it caps every
    per-term partition the gap window touches, so no task ever sorts a
    stopword's corpus-sized posting list.

    INTEGER-exact: gaps are ``id − prev_id`` on the per-term sorted
    DISTINCT postings (first posting costs γ(id + 1) — ids are
    non-negative, the +1 keeps γ's operand ≥ 1); ⌊log2⌋ is the
    LENGTH(BIN(x))−1 idiom; ``bytes_est = (bits + 7) DIV 8``.

    Shape: one (term, doc_id) DISTINCT projection, a df aggregate whose
    band filter prunes BEFORE the window pass, then ONE
    (term; doc_id) window partitioning (max_df-bounded per task) and a
    per-term rollup. Output: one row per banded term —
    (term, df, total_bits, bytes_est).
    """
    from pyspark.sql import Window

    post = (
        docs.select(F.col(id_col).alias("did"), F.explode(_tokens(F.col(text_col))).alias("term"))
        .select("term", F.col("did").cast("long").alias("did"))
        .distinct()
    )
    dfreq = post.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    band = dfreq.where(F.col("df") >= F.lit(int(min_df)))
    if max_df is not None:
        band = band.where(F.col("df") <= F.lit(int(max_df)))
    w = Window.partitionBy("term").orderBy(F.col("did").asc())
    gaps = (
        post.join(band, "term")
        .select(
            "term",
            "df",
            (F.col("did") - F.coalesce(F.lag("did").over(w), F.lit(-1)))
            .cast("long")
            .alias("gap"),
        )
    )
    gamma = (F.lit(2) * (F.length(F.bin(F.col("gap"))) - F.lit(1)) + F.lit(1)).cast(
        "long"
    )
    return (
        gaps.select("term", "df", gamma.alias("bits"))
        .groupBy("term", "df")
        .agg(F.sum("bits").cast("long").alias("total_bits"))
        .select(
            "term",
            "df",
            "total_bits",
            F.expr("(total_bits + 7) DIV 8").cast("long").alias("bytes_est"),
        )
    )


def tfidf_keywords(
    docs: DataFrame,
    k: int = 3,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document TF-IDF keyword extraction — the top-``k`` most
    corpus-distinctive terms of every document (the keyword/tag stage of
    a curation pipeline: dedup keys, topic routing, index hints).

    Fixed-point contract: the FUSED RSJ form ``score_milli =
    (tf·(N − df)·1000) DIV df`` — one truncating division at the end
    (more precise than tf·(idf DIV df), and `*`/`DIV` are
    same-precedence left-associative, so the fused spelling is the only
    one both engines parse identically); everywhere-terms (df == N)
    score 0 and are dropped with ``df < N``. Ranking ties break
    (score DESC, term ASC) — the deterministic total order both
    engines share.

    Scale shape: two hash aggregates ((doc,term) tf and a zipf-bounded
    term df), one shuffle join on term (df table is vocab-sized — at
    real scale either side may broadcast under AQE), and a per-doc
    window BOUNDED by document length — never a global window. ``N``
    is one driver count (the bm25 pattern).

    Output: (id_col, term, tf, score_milli, rk) with rk 1..k.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    n_docs = docs.count()
    base = docs.select(F.col(id_col), _tokens(F.col(text_col)).alias("tk"))
    tf = (
        base.select(F.col(id_col), F.explode("tk").alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    scored = (
        tf.join(
            df_.where(
                (F.col("df") < F.lit(int(n_docs)))
                & (F.col("df") >= F.lit(int(min_df)))
            ),
            "term",
        )
        .select(
            F.col(id_col),
            "term",
            "tf",
            F.expr(
                f"(tf * ({int(n_docs)}L - df) * {IDF_MILLI}L) DIV df"
            ).cast("long").alias("score_milli"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score_milli").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= F.lit(int(k)))
        .select(id_col, "term", "tf", "score_milli", "rk")
    )


def ndcg_discounts_micro(k: int) -> list[int]:
    """The 1-indexed micro rank discounts ``round(10^6 / log2(i + 1))``
    for i = 1..k — computed ONCE in Python and interpolated as integer
    literals into BOTH engines (the BENFORD_MICRO shared-DATA-constant
    class), so nDCG needs no cross-engine logarithm."""
    import math

    return [round(1_000_000 / math.log2(i + 1)) for i in range(1, int(k) + 1)]


def ndcg_at_k(
    approx: DataFrame,
    exact: DataFrame,
    k: int = 5,
    probe_col: str = "probe_id",
    neighbor_col: str = "neighbor_id",
) -> DataFrame:
    """Per-probe nDCG@k of an approximate ranking against the exact one
    — the graded, position-discounted companion to :func:`recall_at_k`
    (recall says WHETHER the true neighbors surfaced; nDCG says WHERE):
    a hit at approx rank 1 is worth more than the same hit at rank k,
    and nearer true neighbors carry more gain.

    Graded relevance ``rel = k + 1 − exact_rank`` (exact top-1 worth k,
    beyond-k worth 0); ``DCG = Σ rel(item at approx rank i) · D_i`` with
    the :func:`ndcg_discounts_micro` integer literals; the ideal DCG
    re-discounts the exact ranking itself.  ``ndcg_micro = DCG · 10^6
    DIV IDCG`` — ALL arithmetic is exact BIGINT (no float log, no float
    sum-order hazard), and IDCG uses the exact side's own row count so
    truncated corpora aren't flattered (the recall_at_k convention).

    Scale shape: rank filters map-side; one (probe, neighbor)
    broadcast-sized join and two probe-panel-keyed aggregates — every
    relation is bounded by |probes|·k.

    Output: (probe_col, dcg_micro, idcg_micro, ndcg_micro).
    """
    kk = int(k)
    d = ndcg_discounts_micro(kk)
    dmap = F.create_map(
        *[
            x
            for i, dm in enumerate(d, 1)
            for x in (F.lit(i).cast("long"), F.lit(dm).cast("long"))
        ]
    )
    a = approx.where(F.col("rank") <= kk).select(
        probe_col, neighbor_col, F.col("rank").cast("long").alias("arank")
    )
    e = exact.where(F.col("rank") <= kk).select(
        probe_col,
        neighbor_col,
        (F.lit(kk + 1).cast("long") - F.col("rank").cast("long")).alias(
            "rel"
        ),
        F.col("rank").cast("long").alias("erank"),
    )
    dcg = (
        a.join(
            e.select(probe_col, neighbor_col, "rel"),
            [probe_col, neighbor_col],
            "left",
        )
        .select(
            probe_col,
            (
                F.coalesce(F.col("rel"), F.lit(0).cast("long"))
                * dmap[F.col("arank")]
            ).alias("contrib"),
        )
        .groupBy(probe_col)
        .agg(F.sum("contrib").cast("long").alias("dcg_micro"))
    )
    idcg = (
        e.select(probe_col, (F.col("rel") * dmap[F.col("erank")]).alias("ic"))
        .groupBy(probe_col)
        .agg(F.sum("ic").cast("long").alias("idcg_micro"))
    )
    return (
        idcg.join(dcg, probe_col, "left")
        .select(
            probe_col,
            F.coalesce(F.col("dcg_micro"), F.lit(0).cast("long")).alias(
                "dcg_micro"
            ),
            "idcg_micro",
            F.expr(
                "(coalesce(dcg_micro, 0L) * 1000000L)"
                " DIV greatest(idcg_micro, 1L)"
            )
            .cast("long")
            .alias("ndcg_micro"),
        )
        .orderBy(probe_col)
    )


def mrr_at_k(
    approx: DataFrame,
    exact: DataFrame,
    k: int = 5,
    probe_col: str = "probe_id",
    neighbor_col: str = "neighbor_id",
) -> DataFrame:
    """Per-probe reciprocal rank of the FIRST true neighbor in the
    approximate ranking — the "how deep must a user scroll" companion
    to :func:`recall_at_k` (coverage) and :func:`ndcg_at_k` (graded
    position quality): MRR only cares where the first hit lands.

    Relevance set = the exact top-k (the recall_at_k convention);
    ``first_hit_rank`` = MIN approx rank whose neighbor is relevant
    (0 when the approx list misses every true neighbor);
    ``rr_micro = 10^6 DIV first_hit_rank`` — exact BIGINT, no floats,
    so the corpus mean (``Σ rr_micro DIV n`` downstream) is order-free.

    Scale shape: rank filters map-side; one probe-panel-bounded join +
    one MIN aggregate — every relation is bounded by |probes| · k.

    Output: (probe_col, first_hit_rank, rr_micro) ordered by probe.
    """
    kk = int(k)
    a = approx.where(F.col("rank") <= kk).select(
        probe_col, neighbor_col, F.col("rank").cast("long").alias("arank")
    )
    e = exact.where(F.col("rank") <= kk).select(probe_col, neighbor_col)
    first = (
        a.join(e, [probe_col, neighbor_col])
        .groupBy(probe_col)
        .agg(F.min("arank").alias("fr"))
    )
    probes = exact.select(probe_col).distinct()
    return (
        probes.join(first, probe_col, "left")
        .select(
            probe_col,
            F.coalesce(F.col("fr"), F.lit(0).cast("long")).alias(
                "first_hit_rank"
            ),
            F.when(
                F.col("fr").isNotNull(),
                F.expr("1000000L DIV fr"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("rr_micro"),
        )
        .orderBy(probe_col)
    )


def prf_expansion(
    docs: DataFrame,
    queries: Dict[int, Sequence[str]],
    k_docs: int = 5,
    m: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pseudo-relevance-feedback query expansion (Rocchio-lite): run the
    fixed-point :func:`bm25_search`, pool each query's top ``k_docs``
    documents, and surface the ``m`` highest-scoring NEW terms from the
    pool — score = pool term frequency × the same RSJ milli-idf BM25
    uses, so a term that is common in the feedback docs but rare in the
    corpus wins (the classic PRF signal).  Original query terms are
    anti-joined out.

    EXACT BIGINT: pool tf and corpus df are counts; ``idf_milli =
    (n_docs − df)·1000 DIV df`` is non-negative (df ≤ n_docs);
    score = tf_pool · idf_milli.  Rank = ROW_NUMBER (score DESC, term
    ASC) per query — the candidate set is the POOL vocabulary
    (panel-bounded), so the window is grid-sized, not corpus-sized.

    Scale shape: one corpus pass for BM25 (already two-level top-k),
    one broadcast of the |queries|·k_docs pool, one token pass filtered
    by the pool join, one corpus DISTINCT-doc pass semi-joined to the
    pool vocabulary (broadcast), grid windows only.

    Output: (query_id, token, tf_pool, df, score, rank), rank <= m.
    """
    spark = docs.sparkSession
    base = docs.select(
        F.col(id_col), _tokens(F.col(text_col)).alias("tk")
    ).localCheckpoint()  # ONE tokenize pass shared with bm25_search (r6)
    ranked = bm25_search(docs, queries, k=int(k_docs), id_col=id_col,
                         text_col=text_col, _base=base)
    pool = ranked.select("query_id", id_col)
    toks = base.select(F.col(id_col), F.explode("tk").alias("token"))
    ptoks = toks.join(F.broadcast(pool), id_col)
    qpanel = spark.createDataFrame(
        [(int(q), str(t)) for q, terms in queries.items() for t in terms],
        "query_id int, token string",
    )
    ptf = (
        ptoks.groupBy("query_id", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf_pool"))
        .join(F.broadcast(qpanel), ["query_id", "token"], "left_anti")
    )
    cand = ptf.select("token").distinct()
    # semi-join to the pool vocabulary BEFORE the distinct: the corpus
    # (id, token) distinct exchange then carries only pool-term hits
    # instead of the full token stream (filter/distinct commute; measured
    # wall-neutral at bench scale, structurally right at corpus scale)
    dfx = (
        toks.join(F.broadcast(cand), "token")
        .select(F.col(id_col), "token")
        .distinct()
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    stats = base.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    scored = (
        ptf.join(dfx, "token")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "token",
            "tf_pool",
            "df",
            (
                F.col("tf_pool")
                * F.expr(f"((n_docs - df) * {IDF_MILLI}) DIV df")
            )
            .cast("long")
            .alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(m))
        .select(
            "query_id",
            "token",
            "tf_pool",
            "df",
            "score",
            F.col("rank").cast("int").alias("rank"),
        )
        .orderBy("query_id", "rank")
    )
