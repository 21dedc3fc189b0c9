"""Fixed-point interpolated bigram language model (Jelinek–Mercer), the
KenLM/CCNet-shaped step up from unigram surprisal (textstats.unigram_surprisal):
train bigram statistics on the corpus itself, score every document's mean
per-bigram surprisal in whole bits, and bracket the healthy band.

Model (Chen & Goodman 1998, interpolated form, all-integer micro-probs):

    p_micro(w2|w1) = (lam * ((c12 * 1e6) DIV c1)
                      + (1000 - lam) * ((c2 * 1e6) DIV N)) DIV 1000

where c12 = bigram count, c1 = count of w1 as a left context, c2 = count
of w2 as a right continuation, N = total bigram tokens, lam in milli.
Integer division keeps both engines bit-identical (the fixed-point-oracle
invariant: float log-sums are order-dependent and can never hash-match);
surprisal is whole-bit ``floor(log2(1e6 / p_micro))`` via the binary-length
trick shared with q67.

Plan shape (and why it scales):
- bigrams form MAP-SIDE from the token array (slice + zip_with — no
  posexplode self-join);
- ONE hash aggregate builds the c12 table; c1/c2/N all derive from that
  already-Zipf-shrunk table (two tiny aggregates + a 1-row total that
  rides along as a broadcast cross join);
- scoring joins the per-token bigram stream to the model on the bigram
  key (the same Zipf-bounded dimension as q67's token join) and ends in
  one per-doc aggregate.
No driver collect anywhere; the model stays distributed (it is only
vocab² bounded, and in practice Zipf-sparse).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textstats import _tokens


def _bigrams(text_col) -> F.Column:
    """Array of 'w1 w2' bigram strings from the shared tokenizer."""
    tk = _tokens(text_col)
    return F.when(
        F.size(tk) >= 2,
        F.zip_with(
            F.slice(tk, F.lit(1), F.size(tk) - 1),
            F.slice(tk, F.lit(2), F.size(tk) - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _bigram_base(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, bgs: array<string>) — the per-doc bigram array, materialized
    ONCE via ``localCheckpoint``: every LM in this module reads the bigram
    stream from at least two plan branches (the c12 model chain and the
    per-token scoring join), and without the barrier the tokenizer +
    zip_with re-run per branch (the r6 tokenize-once idiom — checkpoint
    the narrow per-doc ARRAY table, never the exploded stream)."""
    return docs.select(
        F.col(id_col), _bigrams(F.col(text_col)).alias("bgs")
    ).localCheckpoint()


def bigram_lm_bits(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam_milli: int = 700,
    keep_lo_bits: float = 3.0,
    keep_hi_bits: float = 8.0,
) -> DataFrame:
    """Per-document mean bigram surprisal under the corpus's own
    interpolated bigram LM.

    Output: (id_col, n_bigrams, sum_bits, avg_bits, keep) — avg_bits is
    one exact BIGINT/BIGINT double division (NULL for docs with <2
    tokens), keep = avg in [keep_lo_bits, keep_hi_bits] (false for NULL).
    """
    lam = int(lam_milli)
    base = _bigram_base(docs, id_col, text_col)
    big = base.select(F.col(id_col), F.explode("bgs").alias("bg"))
    c12 = big.groupBy("bg").agg(F.count(F.lit(1)).cast("long").alias("c12")).localCheckpoint()
    w1 = F.split(F.col("bg"), " ").getItem(0)
    w2 = F.split(F.col("bg"), " ").getItem(1)
    c1 = c12.groupBy(w1.alias("w1")).agg(F.sum("c12").cast("long").alias("c1"))
    c2 = c12.groupBy(w2.alias("w2")).agg(F.sum("c12").cast("long").alias("c2"))
    tot = c12.agg(F.sum("c12").cast("long").alias("nb"))

    model = (
        c12.select("bg", "c12", w1.alias("w1"), w2.alias("w2"))
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "bg",
            F.expr(
                f"({lam} * ((c12 * 1000000L) DIV c1)"
                f" + {1000 - lam} * ((c2 * 1000000L) DIV nb)) DIV 1000"
            ).alias("p_micro"),
        )
        .select(
            "bg",
            (
                F.length(F.bin(F.expr("1000000L DIV GREATEST(p_micro, 1L)"))) - 1
            )
            .cast("long")
            .alias("bits"),
        )
    )

    per_doc = (
        big.join(model.hint("shuffle_hash"), "bg")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("bits").cast("long").alias("sum_bits"),
        )
        .select(
            F.col(id_col),
            "n_bigrams",
            "sum_bits",
            (
                F.col("sum_bits").cast("double") / F.col("n_bigrams").cast("double")
            ).alias("avg_bits"),
        )
    )
    return (
        base.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce(F.col("sum_bits"), F.lit(0)).cast("long").alias("sum_bits"),
            F.col("avg_bits"),
            F.coalesce(
                F.col("avg_bits").between(
                    F.lit(float(keep_lo_bits)), F.lit(float(keep_hi_bits))
                ),
                F.lit(False),
            ).alias("keep"),
        )
    )


def kneser_ney_bits(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    discount_milli: int = 750,
    keep_lo_bits: float = 3.0,
    keep_hi_bits: float = 8.0,
) -> DataFrame:
    """Per-document mean bigram surprisal under an interpolated
    KNESER–NEY bigram LM (Chen & Goodman 1998 §4.1.6 — the smoother
    KenLM defaults to, and the step up from :func:`bigram_lm_bits`'
    Jelinek–Mercer mix): the continuation distribution counts DISTINCT
    left contexts, not raw frequency, so boilerplate bigrams whose w2
    only ever follows one w1 stop looking cheap.

    All-integer micro-prob recipe (D = ``discount_milli``/1000):

        main_micro = (max(c12·1000 − D_milli, 0) · 1000) DIV c1
        lam_micro  = (D_milli · 1000 · N1L(w1)) DIV c1
        pcont_micro= (N1R(w2) · 1e6) DIV N1T
        p_micro    = main_micro + (lam_micro · pcont_micro) DIV 1e6

    where N1L(w1) = distinct continuations of w1, N1R(w2) = distinct
    left contexts of w2, N1T = distinct bigrams — ALL three are row
    counts over the already-built c12 table. Whole-bit surprisal via the
    shared binary-length floor-log2; magnitudes ≤ ~7.5·10^11, far
    inside BIGINT.

    Plan shape = q121's exactly: bigrams map-side, ONE c12 hash
    aggregate, every model statistic derived from that Zipf-shrunk
    table, scoring via one bigram-keyed join + one per-doc aggregate.

    Output: (id_col, n_bigrams, sum_bits, avg_bits, keep).
    """
    D = int(discount_milli)
    base = _bigram_base(docs, id_col, text_col)
    big = base.select(F.col(id_col), F.explode("bgs").alias("bg"))
    c12 = big.groupBy("bg").agg(F.count(F.lit(1)).cast("long").alias("c12")).localCheckpoint()
    w1 = F.split(F.col("bg"), " ").getItem(0)
    w2 = F.split(F.col("bg"), " ").getItem(1)
    c1 = c12.groupBy(w1.alias("w1")).agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n1l"),
    )
    n1r = c12.groupBy(w2.alias("w2")).agg(
        F.count(F.lit(1)).cast("long").alias("n1r")
    )
    n1t = c12.agg(F.count(F.lit(1)).cast("long").alias("n1t"))

    model = (
        c12.select("bg", "c12", w1.alias("w1"), w2.alias("w2"))
        .join(c1, "w1")
        .join(n1r, "w2")
        .crossJoin(F.broadcast(n1t))
        .select(
            "bg",
            F.expr(
                f"(greatest(c12 * 1000 - {D}, 0L) * 1000) DIV c1"
                f" + ((({D} * 1000 * n1l) DIV c1)"
                f"    * ((n1r * 1000000L) DIV n1t)) DIV 1000000"
            ).alias("p_micro"),
        )
        .select(
            "bg",
            (
                F.length(F.bin(F.expr("1000000L DIV GREATEST(p_micro, 1L)"))) - 1
            )
            .cast("long")
            .alias("bits"),
        )
    )

    per_doc = (
        big.join(model.hint("shuffle_hash"), "bg")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("bits").cast("long").alias("sum_bits"),
        )
        .select(
            F.col(id_col),
            "n_bigrams",
            "sum_bits",
            (
                F.col("sum_bits").cast("double") / F.col("n_bigrams").cast("double")
            ).alias("avg_bits"),
        )
    )
    return (
        base.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce(F.col("sum_bits"), F.lit(0)).cast("long").alias("sum_bits"),
            F.col("avg_bits"),
            F.coalesce(
                F.col("avg_bits").between(
                    F.lit(float(keep_lo_bits)), F.lit(float(keep_hi_bits))
                ),
                F.lit(False),
            ).alias("keep"),
        )
    )


def rho1_excess_select(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rho_milli: int = 300,
) -> DataFrame:
    """RHO-1-style selective-token scoring (Lin et al. 2024, "Rho-1: Not
    All Tokens Are What You Need"): score every token position by its
    EXCESS surprisal -- reference-model bits minus training-model bits --
    and select the per-document top ``rho_milli``/1000 fraction. Here the
    reference model is the corpus unigram-continuation LM and the
    training model is the corpus MLE bigram LM (both trained on the input
    itself, both in the shared all-integer micro-prob recipe), so a high
    excess marks a token the context makes much cheaper than its raw
    frequency suggests -- exactly the structured, learnable positions
    RHO-1 keeps.

    All-integer recipe (bits via the shared binary-length floor-log2):

        p_big_micro = (c12 * 1e6) DIV c1      (MLE bigram)
        p_uni_micro = (c2  * 1e6) DIV N       (unigram continuation)
        excess      = bits(p_uni) - bits(p_big)   (may be negative)
        k           = (rho_milli * n + 999) DIV 1000   (ceil, >=1 when n>=1)

    selected = the k positions with the highest excess (ties broken by
    earliest position) -- a per-document row_number window, bounded by
    document length, never a global window.

    Plan shape: q121's exactly -- bigrams map-side via posexplode, ONE c12
    hash aggregate, c1/c2/N derived from that Zipf-shrunk table, scoring
    one bigram-keyed join, then ONE (partition=doc) window exchange and
    one per-doc aggregate. No collect, nothing quadratic.

    Output: (id_col, n_bigrams, n_selected, sum_excess_sel, top_pos) --
    top_pos is the 1-based bigram position of the single highest-excess
    token (NULL for docs with <2 tokens).
    """
    from pyspark.sql import Window

    rho = int(rho_milli)
    base = _bigram_base(docs, id_col, text_col)
    big = base.select(
        F.col(id_col), F.posexplode("bgs").alias("pos0", "bg")
    ).select(F.col(id_col), (F.col("pos0") + 1).cast("long").alias("pos"), "bg")
    c12 = big.groupBy("bg").agg(F.count(F.lit(1)).cast("long").alias("c12")).localCheckpoint()
    w1 = F.split(F.col("bg"), " ").getItem(0)
    w2 = F.split(F.col("bg"), " ").getItem(1)
    c1 = c12.groupBy(w1.alias("w1")).agg(F.sum("c12").cast("long").alias("c1"))
    c2 = c12.groupBy(w2.alias("w2")).agg(F.sum("c12").cast("long").alias("c2"))
    tot = c12.agg(F.sum("c12").cast("long").alias("nb"))

    bits_of = lambda p_expr: (  # noqa: E731
        F.length(F.bin(F.expr(f"1000000L DIV GREATEST({p_expr}, 1L)"))) - 1
    ).cast("long")
    model = (
        c12.select("bg", "c12", w1.alias("w1"), w2.alias("w2"))
        .join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "bg",
            (
                bits_of("(c2 * 1000000L) DIV nb")
                - bits_of("(c12 * 1000000L) DIV c1")
            ).alias("excess"),
        )
    )

    part = Window.partitionBy(id_col)
    order = part.orderBy(F.col("excess").desc(), F.col("pos").asc())
    tok = (
        big.join(model.hint("shuffle_hash"), "bg")
        .select(F.col(id_col), "pos", "excess")
        .withColumn("n", F.count(F.lit(1)).over(part).cast("long"))
        .withColumn("rnk", F.row_number().over(order).cast("long"))
    )
    sel = F.col("rnk") <= F.expr(f"({rho} * n + 999) DIV 1000")
    per_doc = tok.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum(sel.cast("long")).cast("long").alias("n_selected"),
        F.sum(F.when(sel, F.col("excess")).otherwise(F.lit(0)))
        .cast("long")
        .alias("sum_excess_sel"),
        F.min(F.when(F.col("rnk") == 1, F.col("pos")))
        .cast("long")
        .alias("top_pos"),
    )
    return (
        base.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce(F.col("n_selected"), F.lit(0)).cast("long").alias("n_selected"),
            F.coalesce(F.col("sum_excess_sel"), F.lit(0))
            .cast("long")
            .alias("sum_excess_sel"),
            F.col("top_pos"),
        )
    )
