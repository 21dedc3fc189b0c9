"""Text-analysis operators for training-data curation: language-ID,
quality scoring, fingerprinting, token stats — all native Column
expressions with exact DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import WS_CLASS, ink_chars, text_density, token_count

# tiny per-language stopword lists (n-gram heuristic scale-model: real
# pipelines swap in fastText/CLD — the *dataflow* is the deliverable)
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "en", "por", "que"],
    "zh": ["de", "shi", "le", "bu", "wo", "zai", "you", "he", "ren", "ta"],
}


def _tokens(text: Column) -> Column:
    return F.filter(
        F.split(F.trim(F.lower(F.coalesce(text, F.lit("")))), WS_CLASS + "+"),
        lambda x: x != F.lit(""),
    )


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-hit count (distinct hits, like an n-gram
    profile intersection)."""
    toks = _tokens(text)
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_STOPWORDS.items()
    }


def lang_id(text: Column) -> Column:
    """argmax language by stopword hits; ties and zero-hit → 'und'
    (deterministic: languages compared in fixed order)."""
    scores = lang_scores(text)
    best_score = F.greatest(*scores.values())
    # fold reversed so the OUTERMOST when is the alphabetically-first
    # language → deterministic first-max-wins tie-break
    expr = F.lit("und")
    for lang in sorted(LANG_STOPWORDS, reverse=True):
        expr = F.when((scores[lang] > 0) & (scores[lang] == best_score), F.lit(lang)).otherwise(
            expr
        )
    return expr


def quality_score(text: Column) -> Column:
    """Composite quality in [0,1]: length band, ink-density band, mean word
    length band, token count band — the text analog of the reference's
    multi-criteria accept score (each sub-score is 1 inside its band, 0
    outside; average of 4)."""
    t = F.coalesce(text, F.lit(""))
    n = F.length(t)
    toks = token_count(t)
    dens = text_density(t)
    mean_wlen = ink_chars(t).cast("double") / F.greatest(toks, F.lit(1)).cast("double")
    s_len = F.when((n >= 100) & (n <= 20000), 1.0).otherwise(0.0)
    s_dens = F.when((dens >= 50.0) & (dens <= 90.0), 1.0).otherwise(0.0)
    s_wlen = F.when((mean_wlen >= 2.0) & (mean_wlen <= 12.0), 1.0).otherwise(0.0)
    s_toks = F.when(toks >= 20, 1.0).otherwise(0.0)
    return ((s_len + s_dens + s_wlen + s_toks) / F.lit(4.0)).alias("quality")


def doc_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        F.length(F.coalesce(t, F.lit(""))).cast("long").alias("n_chars_measured"),
        token_count(t).alias("n_tokens"),
        text_density(t).alias("density"),
        lang_id(t).alias("lang_pred"),
        quality_score(t).alias("quality"),
    )


def top_terms(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """TF-IDF-style keyword extraction: each document's top-k terms ranked
    by (tf desc, df asc, term asc) — term frequency first, rarer-in-corpus
    breaking ties, exactly the ordering tf·idf induces for monotone idf,
    computed in **pure integer arithmetic** so the DuckDB oracle matches
    bit-for-bit (a float idf needs ``ln``, whose last-bit rounding is
    libm-specific).

    Plan shape at scale: explode tokens → ``groupBy(doc, term)`` count
    (map-side combine collapses within-doc repeats) → df per term via a
    second aggregate over *distinct doc-term rows* (never re-reads the
    corpus) → broadcast-or-shuffle join back → per-doc top-k as a bounded
    ``slice(sort_array(collect_list))`` (state ≤ doc vocabulary, one merge
    per doc — not a global window)."""
    terms = docs.select(F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("term"))
    tf = terms.groupBy(id_col, "term").agg(F.count("term").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(id_col).alias("df"))
    scored = tf.join(df_, "term")
    item = F.struct(
        (-F.col("tf")).alias("ntf"),
        F.col("df").alias("df"),
        F.col("term").alias("term"),
        F.col("tf").alias("tf"),
    )
    return (
        scored.groupBy(id_col)
        .agg(F.slice(F.sort_array(F.collect_list(item)), 1, k).alias("top"))
        .select(F.col(id_col), F.posexplode("top").alias("r", "t"))
        .select(
            F.col(id_col),
            F.col("t.term").alias("term"),
            F.col("t.tf").cast("long").alias("tf"),
            F.col("t.df").cast("long").alias("df"),
            (F.col("r") + 1).cast("int").alias("rank"),
        )
    )


def build_vocab(
    docs: DataFrame,
    vocab_size: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
    fanout: int = 32,
) -> DataFrame:
    """Corpus vocabulary: the globally most frequent ``vocab_size`` tokens,
    ranked (count desc, token asc), assigned dense ids 0..V-1 in rank order.

    Scale shape: token counts are one hash aggregate (map-side combine
    collapses repeats before the exchange); the global top-V is the
    two-level merge — per-hash-bucket top-V (bounded ``sort_array`` state),
    then one merge of ≤ fanout·V survivors — never a global sort or a
    one-reducer window over the full term dictionary.

    Output: (token, token_id, cnt)."""
    counts = (
        docs.select(F.explode(_tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    item = F.struct(
        (-F.col("cnt")).alias("nc"), F.col("token").alias("token"),
        F.col("cnt").alias("cnt"),
    )
    topv = lambda c: F.slice(F.sort_array(F.collect_list(c)), 1, vocab_size)  # noqa: E731
    lvl1 = counts.groupBy(
        F.pmod(F.hash("token"), F.lit(fanout)).alias("b")
    ).agg(topv(item).alias("top"))
    merged = lvl1.select(F.explode("top").alias("t")).agg(topv(F.col("t")).alias("top"))
    return merged.select(F.posexplode("top").alias("r", "t")).select(
        F.col("t.token").alias("token"),
        F.col("r").cast("int").alias("token_id"),
        F.col("t.cnt").cast("long").alias("cnt"),
    )


def tokenize_to_ids(
    docs: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    oov_id: int = -1,
) -> DataFrame:
    """Tokens → integer ids against a (broadcast) vocabulary; out-of-vocab
    tokens map to ``oov_id``. Output one row per token position —
    (id_col, pos, token_id) — the materialized form a sequence-packing /
    training-shard writer consumes. The corpus side never shuffles: the
    vocabulary (≤ V rows) broadcasts into the scan."""
    toks = docs.select(
        F.col(id_col), F.posexplode(_tokens(F.col(text_col))).alias("pos", "token")
    )
    return toks.join(
        F.broadcast(vocab.select("token", "token_id")), "token", "left"
    ).select(
        F.col(id_col),
        F.col("pos").cast("int").alias("pos"),
        F.coalesce(F.col("token_id"), F.lit(oov_id)).cast("int").alias("token_id"),
    )


def rolling_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 32,
    stride: int = 16,
) -> DataFrame:
    """Document fingerprint sketch: md5 of each fixed-stride window of the
    normalized text (rolling-hash analog with engine-portable hashing),
    keeping the lexicographic min per doc ('winnowing lite'). Exploded form
    for SQL checkability."""
    norm = F.regexp_replace(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))), WS_CLASS + "+", " "
    )
    cnt = F.greatest(
        F.floor((F.length(norm) - F.lit(window)) / F.lit(stride)).cast("int") + 1, F.lit(0)
    )
    wins = F.when(cnt <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), cnt - 1),
            lambda i: F.md5(norm.substr(i * stride + 1, F.lit(window))),
        )
    )
    return docs.select(
        F.col(id_col),
        F.array_min(wins).alias("min_fp"),
        F.size(wins).alias("n_windows"),
    )


def unigram_surprisal(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_lo_bits: float = 3.0,
    keep_hi_bits: float = 9.0,
) -> DataFrame:
    """KenLM-lite perplexity filter: mean per-token surprisal under the
    corpus's OWN unigram model, in whole bits —
    ``floor(log2(N / count(tok)))`` via integer division + binary length,
    so both engines are bit-identical (the fixed-point-oracle invariant:
    float log-sums are order-dependent and can never hash-match). The
    DOUBLE mean is one exact division of two BIGINTs.

    Gibberish/rare-token documents score high, boilerplate/repetitive
    documents score low; ``keep`` brackets the healthy band (the
    CCNet/KenLM recipe shape).

    Plan: explode → token-count aggregate (map-side partial combine) →
    token equi-join (token dim is zipf-bounded, partial agg shrank it) →
    per-doc aggregate → broadcast-join back to docs. No driver collect;
    the corpus total rides along as a broadcast single-row cross join.

    Output: (id_col, n_tokens, sum_bits, avg_bits, keep).
    """
    toks = docs.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("tok")
    )
    # checkpoint the Zipf-shrunk count table (r6, the lm.py c12 idiom):
    # total/scoring both read it without re-running the corpus aggregate,
    # and its accurate materialized size lets the scoring join broadcast
    # the vocab side instead of shuffling the token stream
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c")).localCheckpoint()
    total = counts.agg(F.sum("c").cast("long").alias("n_total"))
    bits = (F.length(F.bin(F.expr("n_total DIV c"))) - 1).cast("long")
    per_doc = (
        toks.join(counts, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(bits).cast("long").alias("sum_bits"),
        )
    )
    avg = F.col("sum_bits").cast("double") / F.col("n_tokens").cast("double")
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(F.col("sum_bits"), F.lit(0)).cast("long").alias("sum_bits"),
            avg.alias("avg_bits"),
            F.coalesce(
                avg.between(F.lit(float(keep_lo_bits)), F.lit(float(keep_hi_bits))),
                F.lit(False),
            ).alias("keep"),
        )
    )


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> DataFrame:
    """Positional-free inverted index: one row per (token, document)
    posting with term frequency and the token's document frequency —
    the retrieval/decontamination lookup structure.

    Plan: explode → hash aggregate on (token, doc) for tf → token-keyed
    df aggregate over the (already shrunk) posting rows → equi-join back.
    Three exchanges, each over data no bigger than the postings (df rows
    ≤ distinct tokens — zipf-bounded); at broadcastable df sizes AQE
    turns the join into a broadcast.

    Output: (token, df, id_col, tf).
    """
    toks = docs.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("token")
    )
    tf = toks.groupBy("token", id_col).agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    return (
        tf.join(df_, "token")
        .where(F.col("df") >= F.lit(int(min_df)))
        .select("token", "df", F.col(id_col), "tf")
    )


def hash_embedding(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
) -> DataFrame:
    """Feature-hashing ("hashing trick", Weinberger et al. 2009) text
    vectors: each token lands in ``md5(token) mod dim`` with a ±1 sign
    from the next md5 nibble; a document's coordinate is the SIGNED TOKEN
    COUNT — integers, so the embedding is bit-exact and mergeable
    (chunked documents sum transparently), and it feeds the similarity
    family (cosine/LSH/IVF/PQ) without a model.

    Exploded sparse form (one row per NONZERO coordinate —
    cancellations drop out): (id_col, dim_idx, weight). One hash
    aggregate on (doc, dim); map-side combine does the summing.
    """
    toks = docs.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("tok")
    )
    h = F.md5(F.col("tok"))
    idx = (F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % F.lit(int(dim))).alias(
        "dim_idx"
    )
    sign = F.when(
        F.conv(F.substring(h, 5, 1), 16, 10).cast("int") % 2 == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    return (
        toks.select(F.col(id_col), idx, sign.alias("s"))
        .groupBy(id_col, "dim_idx")
        .agg(F.sum("s").cast("long").alias("weight"))
        .where(F.col("weight") != 0)
    )


def corpus_card(
    docs: DataFrame,
    lang_col: str = "lang",
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-(lang, source) corpus datasheet — the rollup behind a dataset
    card (Gebru 2021 "Datasheets for Datasets"): doc/char/token tallies
    plus empty/short/long composition counts.

    ONE hash aggregate over the scan (map-side combine collapses each
    partition to |lang|x|source| rows, so the shuffle is a few hundred
    rows at any corpus size). All surfaced aggregates are integer SUM/
    COUNTs cast to BIGINT -- a float AVG is order-dependent and can never
    hash-match across engines; callers derive means downstream from the
    sums (the q41 HUGEINT lesson applies: the oracle casts too)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n = F.length(t)
    return (
        docs.groupBy(
            F.coalesce(F.col(lang_col), F.lit("")).alias("lang"),
            F.coalesce(F.col(source_col), F.lit("")).alias("source"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(n.cast("long")).cast("long").alias("n_chars"),
            F.sum(token_count(t)).cast("long").alias("n_tokens"),
            F.sum(F.when(n == 0, 1).otherwise(0)).cast("long").alias("n_empty"),
            F.sum(F.when((n > 0) & (n < 100), 1).otherwise(0)).cast("long").alias("n_short"),
            F.sum(F.when(n > 10000, 1).otherwise(0)).cast("long").alias("n_long"),
        )
    )


def ngram_novelty(
    docs: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document n-gram novelty — the memorization-risk profile: the
    fraction of a document's DISTINCT word n-grams that are corpus-unique
    (document frequency 1). Boilerplate-heavy or templated documents score
    near 0; genuinely novel text scores near 1 — the inverse signal of
    :mod:`dedup`'s pair finders, useful for sampling toward novelty or
    auditing a cleaned corpus for residual template mass.

    Exact spec: grams are space-joined lowercase word n-grams
    (quality.ngrams_from_tokens), DISTINCT within a document before
    counting; df counts distinct documents; ``novelty = n_unique /
    n_distinct`` (one exact double division of int64s; docs with no grams
    surface 0.0).

    Scale shape: the (doc, gram-hash) pairs shuffle ONCE on gram hash —
    the df aggregate and the df join are co-partitioned on that key so the
    exchange is reused — then one doc-keyed rollup. Grams travel as md5
    hashes (32 bytes), never as text; no window, no all-pairs anything.

    Output: (id_col, n_distinct, n_unique, novelty).
    """
    from .quality import ngrams_from_tokens

    toks = docs.select(F.col(id_col), _tokens(F.col(text_col)).alias("tk"))
    pairs = toks.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(ngrams_from_tokens(F.col("tk"), n))
        ).alias("g"),
    ).select(F.col(id_col), F.md5("g").alias("gh"))
    dfreq = pairs.groupBy("gh").agg(F.count(F.lit(1)).cast("long").alias("df"))
    per = (
        pairs.join(dfreq, "gh")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_unique"),
        )
    )
    nd = F.coalesce(F.col("n_distinct"), F.lit(0).cast("long"))
    nu = F.coalesce(F.col("n_unique"), F.lit(0).cast("long"))
    return (
        docs.select(F.col(id_col))
        .join(per, id_col, "left")
        .select(
            F.col(id_col),
            nd.alias("n_distinct"),
            nu.alias("n_unique"),
            F.when(nd > 0, nu.cast("double") / nd)
            .otherwise(F.lit(0.0))
            .alias("novelty"),
        )
    )


def flesch_readability(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Fixed-point Flesch reading-ease (Flesch 1948; the Kincaid 1975 Navy
    recalibration's sibling, still a standard cheap readability gate):

        score = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)

    computed entirely in MILLI units with non-negative integer floor
    divisions — the only division exact across Spark (`DIV`) and DuckDB
    (`//`) — so the oracle matches bit-for-bit where a float pipeline
    could differ in the last ulp:

        flesch_milli = 206835 − (1015·W) DIV S − (84600·Y) DIV W

    with W = max(words, 1), S = max(sentences, 1).  Heuristics (documented
    approximations, identical on both engines): a sentence is a maximal
    ``[.!?]+`` run; a syllable is a maximal ``[aeiouy]+`` run in the
    lowercased text — the classic vowel-group counter, applied to the
    whole text rather than per-word (identical totals, one regex pass).

    Scale shape: three regex counters + integer arithmetic fused into one
    codegen projection — zero shuffle, zero UDF.

    Output: (id_col, n_words, n_sents, n_syll, flesch_milli) — all int64.
    """
    t = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    counted = docs.select(
        F.col(id_col),
        F.size(
            F.filter(
                F.split(F.trim(t), WS_CLASS + "+"), lambda x: x != F.lit("")
            )
        )
        .cast("long")
        .alias("n_words"),
        F.size(F.regexp_extract_all(t, F.lit("[.!?]+"), F.lit(0)))
        .cast("long")
        .alias("n_sents"),
        F.size(F.regexp_extract_all(t, F.lit("[aeiouy]+"), F.lit(0)))
        .cast("long")
        .alias("n_syll"),
    )
    return counted.select(
        F.col(id_col),
        "n_words",
        "n_sents",
        "n_syll",
        F.expr(
            "206835 - ((1015 * GREATEST(n_words, 1)) DIV GREATEST(n_sents, 1))"
            " - ((84600 * n_syll) DIV GREATEST(n_words, 1))"
        ).alias("flesch_milli"),
    )


def vocab_growth(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10,
    ngram: int = 1,
) -> DataFrame:
    """Vocabulary-growth (Heaps'-law) profile: how many NEW token types
    each successive slice of the corpus (in ``id_col`` order) introduces,
    plus the running vocabulary size — the curve a corpus datasheet plots
    to show lexical saturation (Heaps 1978).

    A token type belongs to the slice where it FIRST appears, so the
    whole curve reduces to ONE min-aggregate (first_doc per type) over
    the exploded token stream plus a bucket count; the cumulative sum
    runs on the driver over ``n_buckets`` rows (the two-level-prefix-sum
    rule: never a global window, and here the bucketed relation is
    FIXED-SIZE by construction — n_buckets is a constant, not a function
    of corpus size).

    Output: (bucket, new_types, cum_types), bucket = equal-width id
    ranges 0..n_buckets-1 (empty buckets emit nothing). ``ngram > 1``
    profiles word-n-gram types (the shared quality.ngrams_from_tokens
    grams) — unigram vocabularies saturate fast; n-gram type growth is
    the curve that stays informative.
    """
    bounds = docs.select(
        F.min(id_col).alias("lo"), F.max(id_col).alias("hi")
    ).first()
    lo = int(bounds["lo"] or 0)
    hi = int(bounds["hi"] or 0)
    span = (hi - lo) // int(n_buckets) + 1
    tk = docs.select(F.col(id_col), _tokens(F.col(text_col)).alias("_tk"))
    if int(ngram) <= 1:
        toks = tk.select(F.col(id_col), F.explode("_tk").alias("tok"))
    else:
        from .quality import ngrams_from_tokens

        toks = tk.select(
            F.col(id_col),
            F.explode(ngrams_from_tokens(F.col("_tk"), int(ngram))).alias("tok"),
        )
    first = toks.groupBy("tok").agg(F.min(id_col).cast("long").alias("fd"))
    per = (
        first.groupBy(
            F.expr(f"(fd - {lo}L) DIV {span}L").cast("long").alias("bucket")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("new_types"))
    )
    totals = {int(r["bucket"]): int(r["new_types"]) for r in per.collect()}
    cum, acc = {}, 0
    for k in sorted(totals):
        acc += totals[k]
        cum[k] = acc
    cmap = F.create_map(*[F.lit(x) for kv in sorted(cum.items()) for x in kv])
    return per.select(
        "bucket",
        "new_types",
        F.element_at(cmap, F.col("bucket").cast("int")).cast("long").alias(
            "cum_types"
        ),
    )


DRIFT_SCALE = 1_000_000  # unigram probabilities in micro-units


def token_drift(
    a_docs: DataFrame,
    b_docs: DataFrame,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    fanout: int = 32,
) -> DataFrame:
    """Corpus drift monitor: total-variation distance between two
    corpora's unigram token distributions, plus the top-``k`` drifting
    tokens — the crawl-over-crawl / shard-over-shard distribution check a
    production pipeline runs before mixing a new snapshot in (the
    drift-detection shape of Rabanser 2019, "Failing Loudly").

    FIXED-POINT: per-side micro-probabilities ``(c·SCALE) DIV N`` and the
    L1 contribution ``ABS(pa − pb)`` are exact integers (TVD needs no
    logarithm — unlike KL it has an integer-exact form, which is why it
    is the drift statistic here; the subtraction feeds only ABS, so the
    negative-operand DIV trap never applies). ``tv_micro = ΣL1 / 2`` in
    micro-units rides every row.

    Scale shape: ONE pass over each corpus (explode → per-side token
    count with map-side combine), a token-dimension full-outer merge
    (Zipf-bounded — partial aggs already shrank it), two broadcast 1-row
    totals, then the q13 two-level top-k merge for the drifted-token
    panel (no task ever sorts the whole vocabulary).

    Output: top-k rows (token, ca, cb, pa_micro, pb_micro, l1_micro,
    tv_micro, rank) ordered by (l1_micro DESC, token ASC).
    """
    ca = (
        a_docs.select(F.explode(_tokens(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("ca"))
    )
    cb = (
        b_docs.select(F.explode(_tokens(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("cb"))
    )
    m = (
        ca.join(cb, "tok", "full_outer")
        .select(
            "tok",
            F.coalesce("ca", F.lit(0)).cast("long").alias("ca"),
            F.coalesce("cb", F.lit(0)).cast("long").alias("cb"),
        )
    )
    na = m.agg(F.sum("ca").cast("long").alias("na"))
    nb = m.agg(F.sum("cb").cast("long").alias("nb"))
    probs = (
        m.crossJoin(F.broadcast(na))
        .crossJoin(F.broadcast(nb))
        .select(
            "tok",
            "ca",
            "cb",
            F.expr(f"(ca * {DRIFT_SCALE}L) DIV greatest(na, 1L)").alias(
                "pa_micro"
            ),
            F.expr(f"(cb * {DRIFT_SCALE}L) DIV greatest(nb, 1L)").alias(
                "pb_micro"
            ),
        )
        .withColumn("l1_micro", F.abs(F.col("pa_micro") - F.col("pb_micro")))
    )
    tv = probs.agg(
        F.expr("sum(l1_micro) DIV 2").cast("long").alias("tv_micro")
    )
    item = F.struct(
        (-F.col("l1_micro")).alias("nl1"),
        F.col("tok").alias("tok"),
        F.col("ca").alias("ca"),
        F.col("cb").alias("cb"),
        F.col("pa_micro").alias("pa_micro"),
        F.col("pb_micro").alias("pb_micro"),
        F.col("l1_micro").alias("l1_micro"),
    )
    topk = lambda c: F.slice(F.sort_array(F.collect_list(c)), 1, int(k))  # noqa: E731
    lvl1 = probs.groupBy(
        F.pmod(F.hash("tok"), F.lit(int(fanout))).alias("b")
    ).agg(topk(item).alias("top"))
    merged = (
        lvl1.select(F.explode("top").alias("t"))
        .groupBy()
        .agg(topk(F.col("t")).alias("top"))
        .select(F.posexplode("top").alias("i", "t"))
    )
    return merged.crossJoin(F.broadcast(tv)).select(
        F.col("t.tok").alias("token"),
        F.col("t.ca").alias("ca"),
        F.col("t.cb").alias("cb"),
        F.col("t.pa_micro").alias("pa_micro"),
        F.col("t.pb_micro").alias("pb_micro"),
        F.col("t.l1_micro").alias("l1_micro"),
        F.col("tv_micro"),
        (F.col("i") + 1).cast("int").alias("rank"),
    )


DIVERSITY_SCALE = 1_000_000  # distinct-n ratios in micro-units


def distinct_ngram_diversity(
    docs: DataFrame,
    ns: tuple[int, ...] = (1, 2, 3),
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-group distinct-n diversity (Li et al. 2016): for each n in
    ``ns``, the number of DISTINCT word n-grams over the TOTAL n-gram
    occurrences in the group, in integer micro-units — the corpus-health
    dual of :func:`ngram_novelty` (that one profiles each document against
    the corpus; this one scores whole sources/slices, the
    mixture-dashboard number a curation run watches as it swaps sources in
    and out). Low distinct-2/3 flags templated or looping text.

    FIXED-POINT: ``distinct_micro = distinct·10⁶ DIV total`` — both
    operands are non-negative int64 counts, so Spark ``DIV`` == DuckDB
    ``//`` exactly.

    Scale shape: ONE token-array projection feeds every n (the n-gram
    arrays are built per-row and concatenated as (n, gram) structs — one
    explode, one scan, no per-n re-tokenization); grams travel as md5
    hashes, never text; the (group, n, gram-hash) partial aggregate
    shrinks Zipf-style before the per-(group, n) rollup. Output is
    |groups|·|ns| rows: (group, n, total_ngrams, distinct_ngrams,
    distinct_micro).
    """
    from .quality import ngrams_from_tokens

    toks = docs.select(
        F.col(group_col).alias("grp"), _tokens(F.col(text_col)).alias("tk")
    )
    def _tag(n: int):
        # one-arg lambda ONLY: a second lambda arg would make F.transform
        # pass the element index into it (positional (x, i) contract)
        return lambda g: F.struct(
            F.lit(int(n)).cast("int").alias("n"), g.alias("g")
        )

    tagged = F.concat(
        *[
            F.transform(ngrams_from_tokens(F.col("tk"), n), _tag(n))
            for n in ns
        ]
    )
    pairs = toks.select(
        "grp", F.explode(tagged).alias("t")
    ).select("grp", F.col("t.n").alias("n"), F.md5(F.col("t.g")).alias("gh"))
    counts = pairs.groupBy("grp", "n", "gh").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return (
        counts.groupBy("grp", "n")
        .agg(
            F.sum("c").cast("long").alias("total_ngrams"),
            F.count(F.lit(1)).cast("long").alias("distinct_ngrams"),
        )
        .withColumn(
            "distinct_micro",
            F.expr(
                f"(distinct_ngrams * {DIVERSITY_SCALE}L)"
                " DIV greatest(total_ngrams, 1L)"
            ),
        )
        .select(
            F.col("grp").alias(group_col),
            "n",
            "total_ngrams",
            "distinct_ngrams",
            "distinct_micro",
        )
    )


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 30,
    fanout: int = 32,
) -> DataFrame:
    """Top-k collocations by pointwise mutual information over adjacent
    word pairs (Church & Hanks 1990) — the phrase-mining signal a
    tokenizer-vocab or synthetic-data run uses to find multi-word units
    ("new york", "machine learning") worth treating as atoms. High PMI +
    decent count = a true collocation; high count alone = function-word
    noise (PMI's denominator kills it).

    FIXED-POINT: whole-bit log2 via the floor-log2 idiom
    (``bits(x) = LENGTH(BIN(x)) − 1``, the q67 surprisal trick):
    ``pmi_bits = bits(c_xy) + bits(N) − bits(c_x) − bits(c_y)`` — the
    sum-of-floors form (each floor taken BEFORE the subtraction) keeps
    every operand inside int64 at any corpus size, where the textbook
    ``bits(c_xy·N)`` product overflows at web scale (c_xy·N can reach
    10²⁴ at 10¹² tokens); within ±3 bits of true PMI, monotone enough
    for a ranking panel (deviation documented here like kernels.py's).
    The result may be NEGATIVE — it is only surfaced and max'd, never
    divided, so the negative-DIV cross-engine trap never applies.

    Scale shape: one token projection feeds both the unigram and the
    adjacent-bigram counts (map-side combine shrinks each Zipf-style);
    the bigram→unigram joins run on the Zipf-shrunk count tables, never
    on token occurrences; ``min_count`` prunes the long tail BEFORE the
    joins; the final panel is the q13 two-level top-k merge (no task
    sorts the whole bigram vocabulary). Output: k rows —
    (bigram, c_xy, c_x, c_y, pmi_bits, rank) ordered by
    (pmi_bits DESC, c_xy DESC, bigram ASC).
    """
    from .quality import ngrams_from_tokens

    toks = docs.select(_tokens(F.col(text_col)).alias("tk"))
    uni = (
        toks.select(F.explode("tk").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    big = (
        toks.select(F.explode(ngrams_from_tokens(F.col("tk"), 2)).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).cast("long").alias("c_xy"))
        .where(F.col("c_xy") >= F.lit(int(min_count)))
    )
    n_tot = uni.agg(F.sum("c").cast("long").alias("n_tok"))
    bits = lambda c: (F.length(F.bin(c)) - F.lit(1)).cast("long")  # noqa: E731
    first = F.element_at(F.split(F.col("g"), " ", 2), 1)
    second = F.element_at(F.split(F.col("g"), " ", 2), 2)
    cx = uni.select(F.col("w").alias("_x"), F.col("c").alias("c_x"))
    cy = uni.select(F.col("w").alias("_y"), F.col("c").alias("c_y"))
    scored = (
        big.select("g", "c_xy", first.alias("_x"), second.alias("_y"))
        .join(cx, "_x")
        .join(cy, "_y")
        .crossJoin(F.broadcast(n_tot))
        .select(
            F.col("g").alias("bigram"),
            "c_xy",
            "c_x",
            "c_y",
            (bits(F.col("c_xy")) + bits(F.col("n_tok"))
             - bits(F.col("c_x")) - bits(F.col("c_y"))).alias("pmi_bits"),
        )
    )
    item = F.struct(
        (-F.col("pmi_bits")).alias("np"),
        (-F.col("c_xy")).alias("nc"),
        F.col("bigram").alias("bigram"),
        F.col("c_xy").alias("c_xy"),
        F.col("c_x").alias("c_x"),
        F.col("c_y").alias("c_y"),
        F.col("pmi_bits").alias("pmi_bits"),
    )
    topk = lambda c: F.slice(F.sort_array(F.collect_list(c)), 1, int(k))  # noqa: E731
    lvl1 = scored.groupBy(
        F.pmod(F.hash("bigram"), F.lit(int(fanout))).alias("b")
    ).agg(topk(item).alias("top"))
    merged = (
        lvl1.select(F.explode("top").alias("t"))
        .groupBy()
        .agg(topk(F.col("t")).alias("top"))
        .select(F.posexplode("top").alias("i", "t"))
    )
    return merged.select(
        F.col("t.bigram").alias("bigram"),
        F.col("t.c_xy").alias("c_xy"),
        F.col("t.c_x").alias("c_x"),
        F.col("t.c_y").alias("c_y"),
        F.col("t.pmi_bits").alias("pmi_bits"),
        (F.col("i") + 1).cast("int").alias("rank"),
    )


def char_class_profile(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source character-class composition — the cheap data-health
    dashboard (a source whose digit or control share jumps between
    snapshots is emitting serial numbers, minified blobs, or binary
    spill, long before any model-based quality score notices).

    Counting idiom: ``length(s) − length(regexp_replace(s, class, ''))``
    — pure codegen, no explode, one pass per class over the same string.
    Classes are ASCII-explicit (alpha, digit, whitespace via the shared
    WS_CLASS, control via the shared ``scrub.CONTROLS`` \\x{..}-escape
    class — the cross-engine regex contract; never fork it); ``other``
    is the arithmetic remainder so the four shares sum to the total by
    construction. Ratios in integer micro
    (``cnt·1e6 DIV max(total,1)``) computed AFTER the per-source sums —
    one rollup, exact on both engines.

    Scale shape: one map-side projection + ONE aggregate keyed by
    source (|sources| rows out).

    Output: (source, total_chars, alpha, digit, ws, ctrl, other,
    alpha_micro, digit_micro, ws_micro, ctrl_micro) ordered by source.
    """
    from .scrub import CONTROLS

    t = F.coalesce(F.col(text_col), F.lit(""))

    def cnt(cls: str) -> Column:
        return (
            F.length(t) - F.length(F.regexp_replace(t, cls, ""))
        ).cast("long")

    base = docs.select(
        F.coalesce(F.col(group_col), F.lit("")).alias("source"),
        F.length(t).cast("long").alias("_tot"),
        cnt("[a-zA-Z]").alias("_alpha"),
        cnt("[0-9]").alias("_digit"),
        cnt(WS_CLASS).alias("_ws"),
        cnt(CONTROLS).alias("_ctrl"),
    )
    agg = base.groupBy("source").agg(
        F.sum("_tot").cast("long").alias("total_chars"),
        F.sum("_alpha").cast("long").alias("alpha"),
        F.sum("_digit").cast("long").alias("digit"),
        F.sum("_ws").cast("long").alias("ws"),
        F.sum("_ctrl").cast("long").alias("ctrl"),
    )
    micro = "({c} * 1000000L) DIV greatest(total_chars, 1L)"
    return agg.select(
        "source",
        "total_chars",
        "alpha",
        "digit",
        "ws",
        "ctrl",
        (
            F.col("total_chars") - F.col("alpha") - F.col("digit")
            - F.col("ws") - F.col("ctrl")
        ).cast("long").alias("other"),
        F.expr(micro.format(c="alpha")).cast("long").alias("alpha_micro"),
        F.expr(micro.format(c="digit")).cast("long").alias("digit_micro"),
        F.expr(micro.format(c="ws")).cast("long").alias("ws_micro"),
        F.expr(micro.format(c="ctrl")).cast("long").alias("ctrl_micro"),
    ).orderBy("source")


def source_surprisal(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source mean unigram surprisal — the corpus-quality dashboard
    row built on the q67 whole-bit model (``floor(log2(N/count))`` via
    integer division + binary length, bit-identical cross-engine): a
    source drifting LOW is going repetitive/boilerplate, drifting HIGH
    is going gibberish/rare-token. The model is CORPUS-global (all
    sources pooled), so sources are comparable on one scale.

    ``avg_centibits = (sum_bits·100) DIV n_tokens`` — integer
    centi-bits, no float crosses the oracle boundary.

    Plan: the unigram_surprisal aggregate chain with the rollup keyed by
    source instead of doc — explode → token counts (map-side combined)
    → token equi-join → ONE source-keyed aggregate. |sources| rows out.

    Output: (source, n_docs, n_tokens, sum_bits, avg_centibits) ordered
    by source.
    """
    base = docs.select(
        F.coalesce(F.col(group_col), F.lit("")).alias("source"),
        _tokens(F.col(text_col)).alias("tk"),
    ).localCheckpoint()  # read by ndocs + both token passes (r6)
    ndocs = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    toks = base.select("source", F.explode("tk").alias("tok"))
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c")).localCheckpoint()
    total = counts.agg(F.sum("c").cast("long").alias("n_total"))
    bits = (F.length(F.bin(F.expr("n_total DIV c"))) - 1).cast("long")
    per_src = (
        toks.join(counts, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(bits).cast("long").alias("sum_bits"),
        )
    )
    return (
        ndocs.join(per_src, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("sum_bits", F.lit(0)).cast("long").alias("sum_bits"),
            F.expr(
                "(coalesce(sum_bits, 0L) * 100L) DIV greatest(coalesce(n_tokens, 0L), 1L)"
            ).cast("long").alias("avg_centibits"),
        )
        .orderBy("source")
    )


def vocab_health_by_source(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Heaps-law / vocabulary-health audit per source: token mass, type
    count, hapax share and type-token ratio — the drift row that
    separates REPETITIVE corpora (low TTR, low hapax) from GIBBERISH or
    OCR-noise corpora (hapax share approaching 1) long before a model
    sees either. A new crawl snapshot whose hapax_micro jumps is
    spilling unique junk tokens; one whose ttr_micro collapses is
    boilerplate-flooded.

    Plan: one (source, token) hash aggregate (map-side combine absorbs
    the Zipf head) + one source rollup; |sources| rows out. All-integer
    micros: every division is ``non-negative DIV`` (== DuckDB ``//``).

    Output: (source, n_docs, n_tokens, n_types, n_hapax, ttr_micro,
    hapax_micro) ordered by source.
    """
    base = docs.select(
        F.coalesce(F.col(group_col), F.lit("")).alias("source"),
        _tokens(F.col(text_col)).alias("tk"),
    )
    ndocs = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    wc = base.select("source", F.explode("tk").alias("tok")).groupBy(
        "source", "tok"
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    per_src = wc.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum((F.col("c") == 1).cast("long")).cast("long").alias("n_hapax"),
    )
    return (
        ndocs.join(per_src, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_types", F.lit(0)).cast("long").alias("n_types"),
            F.coalesce("n_hapax", F.lit(0)).cast("long").alias("n_hapax"),
            F.expr(
                "(coalesce(n_types, 0L) * 1000000L)"
                " DIV greatest(coalesce(n_tokens, 0L), 1L)"
            ).cast("long").alias("ttr_micro"),
            F.expr(
                "(coalesce(n_hapax, 0L) * 1000000L)"
                " DIV greatest(coalesce(n_types, 0L), 1L)"
            ).cast("long").alias("hapax_micro"),
        )
        .orderBy("source")
    )


def lang_confusion(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Language-ID confusion matrix: the heuristic classifier
    (:func:`lang_id`) scored against the corpus's labeled language —
    the classifier-eval leg of the lang family (q14 surfaces the
    prediction; this grades it).

    Exactness: the grid is (label, pred) counts — BIGINT; per-cell
    share of the LABEL row and per-label recall are non-negative
    integer micros (DIV == //).  ``is_correct`` marks the diagonal.

    Output: (label, pred, n, row_share_micro, label_n, recall_micro,
    is_correct) ordered by (label, pred), where recall_micro repeats per
    label row (the diagonal share of the label's mass).

    At 100 TB: one hash aggregate to the |labels|×|preds| grid
    (map-side combine), marginals joined ON THE GRID — the q194/q197
    grid-bounded family; the corpus never shuffles.
    """
    lab = F.coalesce(F.col(label_col).cast("string"), F.lit("")).alias("label")
    grid = (
        docs.select(lab, lang_id(F.col(text_col)).alias("pred"))
        .groupBy("label", "pred")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    marg = grid.groupBy("label").agg(
        F.sum("n").cast("long").alias("label_n"),
        F.sum(F.when(F.col("pred") == F.col("label"), F.col("n")).otherwise(0))
        .cast("long")
        .alias("diag_n"),
    )
    return (
        grid.join(marg, "label")
        .select(
            "label",
            "pred",
            "n",
            F.expr("(1000000 * n) DIV greatest(label_n, 1)")
            .cast("long")
            .alias("row_share_micro"),
            "label_n",
            F.expr("(1000000 * diag_n) DIV greatest(label_n, 1)")
            .cast("long")
            .alias("recall_micro"),
            (F.col("pred") == F.col("label")).alias("is_correct"),
        )
        .orderBy("label", "pred")
    )


def vocab_coverage_curve(
    docs: DataFrame,
    k_max: int = 1024,
    text_col: str = "text",
    fanout: int = 32,
) -> DataFrame:
    """Vocabulary coverage curve: for k = 1, 2, 4, ... k_max, the share
    of TOTAL token mass covered by the k most frequent terms — the
    plot a tokenizer-vocab-size decision reads (how much of the corpus
    does a V-entry vocabulary cover; everything else becomes UNK/bytes).

    Ranking is (count desc, token asc) — identical to ``build_vocab``.
    INTEGER-exact: ``coverage_micro = cum_tokens*10^6 DIV total_tokens``
    and ``vocab_frac_micro = k*10^6 DIV total_terms``.

    Scale shape: token counts are one hash aggregate; the global top-k
    is the two-level merge (per-hash-bucket top-k, then one merge of
    <= fanout*k survivors — the build_vocab shape); the cumulative sum
    runs on the <= k_max PANEL (grid-window rule), and the 1-row corpus
    totals broadcast onto it.  Panel rows where k is a power of two
    (or the final rank) are emitted.

    Output: (k, kth_cnt, cum_tokens, total_tokens, total_terms,
    coverage_micro, vocab_frac_micro) ordered by k.
    """
    km = int(k_max)
    counts = (
        docs.select(F.explode(_tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    totals = counts.agg(
        F.sum("cnt").cast("long").alias("total_tokens"),
        F.count(F.lit(1)).cast("long").alias("total_terms"),
    )
    item = F.struct(
        (-F.col("cnt")).alias("nc"),
        F.col("token").alias("token"),
        F.col("cnt").alias("cnt"),
    )
    topv = lambda c: F.slice(F.sort_array(F.collect_list(c)), 1, km)  # noqa: E731
    lvl1 = counts.groupBy(
        F.pmod(F.hash("token"), F.lit(int(fanout))).alias("b")
    ).agg(topv(item).alias("top"))
    merged = lvl1.select(F.explode("top").alias("t")).agg(
        topv(F.col("t")).alias("top")
    )
    panel = merged.select(F.posexplode("top").alias("r", "t")).select(
        (F.col("r") + 1).cast("long").alias("k"),
        F.col("t.cnt").cast("long").alias("kth_cnt"),
    )
    wcum = Window.orderBy("k").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wlast = Window.orderBy(F.desc("k"))
    curve = panel.select(
        "k",
        "kth_cnt",
        F.sum("kth_cnt").over(wcum).cast("long").alias("cum_tokens"),
        F.row_number().over(wlast).alias("_rev"),
    ).where((F.expr("(k & (k - 1)) = 0")) | (F.col("_rev") == 1))
    return (
        curve.crossJoin(F.broadcast(totals))
        .select(
            "k",
            "kth_cnt",
            "cum_tokens",
            "total_tokens",
            "total_terms",
            F.expr("(cum_tokens * 1000000L) DIV greatest(total_tokens, 1L)")
            .cast("long")
            .alias("coverage_micro"),
            F.expr("(k * 1000000L) DIV greatest(total_terms, 1L)")
            .cast("long")
            .alias("vocab_frac_micro"),
        )
        .orderBy("k")
    )


def term_burstiness(
    docs: DataFrame,
    k: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    fanout: int = 32,
) -> DataFrame:
    """Term burstiness panel (Church & Gale 1995): for the k most
    frequent terms, ``burst = cf/df`` — mean occurrences per document
    that CONTAINS the term.  Function words sit near the corpus mean;
    bursty content words (and boilerplate artifacts) repeat heavily
    inside few documents, which is exactly what repetition-quality
    gates and idf weighting need to distinguish.

    INTEGER-exact: ``burst_micro = cf*10^6 DIV df``.  Ranking is
    (cf desc, term asc).

    Scale shape: ONE (doc, term) hash aggregate (map-side combine
    collapses within-doc repeats), ONE term rollup of its output
    (cf = sum tf, df = row count — never a countDistinct over the
    corpus), then the two-level top-k merge on the term grid.

    Output: (rank, term, cf, df, burst_micro) ordered by rank.
    """
    tf = (
        docs.select(
            F.col(id_col).alias("d"),
            F.explode(_tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("d", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    stats = tf.groupBy("term").agg(
        F.sum("tf").cast("long").alias("cf"),
        F.count(F.lit(1)).cast("long").alias("df"),
    )
    item = F.struct(
        (-F.col("cf")).alias("ncf"),
        F.col("term").alias("term"),
        F.col("cf").alias("cf"),
        F.col("df").alias("df"),
    )
    topv = lambda c: F.slice(F.sort_array(F.collect_list(c)), 1, int(k))  # noqa: E731
    lvl1 = stats.groupBy(
        F.pmod(F.hash("term"), F.lit(int(fanout))).alias("b")
    ).agg(topv(item).alias("top"))
    merged = lvl1.select(F.explode("top").alias("t")).agg(
        topv(F.col("t")).alias("top")
    )
    return merged.select(F.posexplode("top").alias("r", "t")).select(
        (F.col("r") + 1).cast("int").alias("rank"),
        F.col("t.term").alias("term"),
        F.col("t.cf").cast("long").alias("cf"),
        F.col("t.df").cast("long").alias("df"),
        F.expr("(t.cf * 1000000L) DIV greatest(t.df, 1L)")
        .cast("long")
        .alias("burst_micro"),
    )


def simpson_diversity(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Gini-Simpson and inverse-Simpson token diversity per group — the
    log-free diversity index (probability two random tokens differ) that
    complements the whole-bit surprisal panels (q67/q190) and the vocab
    coverage curve (q228) with an EXACT statistic: unlike Shannon
    entropy, Simpson needs no logarithm, so it is pure BIGINT
    cross-engine arithmetic with no fixed-point estimator caveat.

    ``gini_simpson_micro = (n(n−1) − Σc(c−1)) · 10^6 DIV n(n−1)`` —
    numerator non-negative since Σc(c−1) <= n(n−1) (c sums to n);
    ``inv_simpson_milli = n(n−1)·1000 DIV Σc(c−1)`` (the effective
    number of equally-common types, ×1000).  Overflow cap (q230 class):
    n(n−1)·10^6 needs n <= ~3e6 tokens per group; past that, pre-scale
    term counts ``c DIV 2^k`` on both engines — the bucketed index is
    the documented estimator.

    Scale shape: ONE (group, term) hash aggregate (map-side combined;
    the only corpus-sized exchange), ONE rollup to groups.  Tokens:
    the shared lowercase WS_CLASS split.

    Output: (group_col, n_tokens, n_types, gini_simpson_micro,
    inv_simpson_milli) ordered by group.
    """
    base = docs.select(
        F.coalesce(F.col(group_col).cast("string"), F.lit("")).alias("g"),
        F.explode(_tokens(F.col(text_col))).alias("term"),
    )
    grid = base.groupBy("g", "term").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    agg = grid.groupBy("g").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.col("c") * (F.col("c") - F.lit(1).cast("long")))
        .cast("long")
        .alias("d2"),
    )
    return agg.select(
        F.col("g").alias(group_col),
        "n_tokens",
        "n_types",
        F.expr(
            "((n_tokens * (n_tokens - 1L) - d2) * 1000000L)"
            " DIV greatest(n_tokens * (n_tokens - 1L), 1L)"
        )
        .cast("long")
        .alias("gini_simpson_micro"),
        F.expr(
            "(n_tokens * (n_tokens - 1L) * 1000L) DIV greatest(d2, 1L)"
        )
        .cast("long")
        .alias("inv_simpson_milli"),
    ).orderBy(group_col)


# (k, 2^k, 2^(k+1)-1) whole-bit rank bands, k = 0..62 — a shared DATA
# constant (the BENFORD_MICRO class): computed ONCE here and
# interpolated as integer literals into the DuckDB oracle, so neither
# engine ever evaluates a shift or power.
POW2_TRIPLES: list[tuple[int, int, int]] = [
    (k, 1 << k, (1 << (k + 1)) - 1) for k in range(62)
]


# Slope expression TEXT over the exact BIGINT moments (n, sx, sy, sxx,
# sxy) — the morton16 string-is-the-twin class: passed verbatim to
# Spark F.expr AND interpolated into the DuckDB oracle.
ZIPF_SLOPE_EXPR = (
    "CASE WHEN (n * sxx - sx * sx) > 0"
    " THEN ROUND(CAST(n * sxy - sx * sy AS DOUBLE)"
    " / CAST(n * sxx - sx * sx AS DOUBLE), 6) + 0e0"
    " ELSE 0e0 END"
)


def zipf_slope(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Whole-bit Zipf rank-frequency slope per group — the "does this
    corpus look like natural language" audit (natural text fits
    log-count ≈ a − s·log-rank with s ≈ 1; templated/spammy corpora
    bend the line).  OLS of y = floor(log2 count) on x = floor(log2
    rank) over EVERY term, with no per-term rank ever materialized:

    - value-grid rank trick (q230/q236 family): terms collapse to
      (group, count) cells; a cell with nt terms after ``off``
      predecessors (counts DESC) holds ranks off+1..off+nt;
    - whole-bit log2 (the q67 ``LENGTH(BIN(n))-1`` idiom) needs only
      how many of those ranks fall in each power-of-two band
      [2^k, 2^(k+1)-1] — a closed-form interval overlap fanned over the
      shared :data:`POW2_TRIPLES` literals (q158 explode-fan class);
    - Pearson-class finish: exact BIGINT moments (n, Σx, Σy, Σx², Σxy),
      ONE fixed-order double division, ROUND(·,6) + 0e0 guard
      (num may be negative — it is never integer-divided).

    Scale shape: ONE corpus-sized (group, term) hash aggregate, ONE
    (group, count) rollup, a count-domain-bounded grid window for the
    offsets, a ≤62× literal fan on the grid, ONE rollup to groups.

    Output: (group_col, n_types, num, den, zipf_slope) ordered by
    group.
    """
    base = docs.select(
        F.coalesce(F.col(group_col).cast("string"), F.lit("")).alias("g"),
        F.explode(_tokens(F.col(text_col))).alias("term"),
    )
    grid = base.groupBy("g", "term").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    cells = grid.groupBy("g", "c").agg(
        F.count(F.lit(1)).cast("long").alias("nt")
    )
    woff = (
        Window.partitionBy("g")
        .orderBy(F.col("c").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cello = cells.select(
        "g",
        (F.length(F.bin("c")) - 1).cast("long").alias("y"),
        (
            F.coalesce(F.sum("nt").over(woff), F.lit(0).cast("long"))
            + F.lit(1).cast("long")
        ).alias("lo"),
        (
            F.coalesce(F.sum("nt").over(woff), F.lit(0).cast("long"))
            + F.col("nt")
        ).alias("hi"),
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(k).cast("long").alias("k"),
                F.lit(plo).cast("long").alias("plo"),
                F.lit(phi).cast("long").alias("phi"),
            )
            for k, plo, phi in POW2_TRIPLES
        ]
    )
    fan = cello.select(
        "g", "y", "lo", "hi", F.explode(bands).alias("p")
    ).select(
        "g",
        "y",
        F.col("p.k").alias("x"),
        F.greatest(
            F.lit(0).cast("long"),
            F.least(F.col("hi"), F.col("p.phi"))
            - F.greatest(F.col("lo"), F.col("p.plo"))
            + F.lit(1).cast("long"),
        ).alias("ov"),
    ).where(F.col("ov") > 0)
    agg = fan.groupBy("g").agg(
        F.sum("ov").cast("long").alias("n"),
        F.sum(F.col("x") * F.col("ov")).cast("long").alias("sx"),
        F.sum(F.col("y") * F.col("ov")).cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x") * F.col("ov"))
        .cast("long")
        .alias("sxx"),
        F.sum(F.col("x") * F.col("y") * F.col("ov"))
        .cast("long")
        .alias("sxy"),
    )
    return (
        agg.select(
            F.col("g").alias(group_col),
            F.col("n").alias("n_types"),
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            .cast("long")
            .alias("num"),
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            .cast("long")
            .alias("den"),
            F.expr(ZIPF_SLOPE_EXPR).alias("zipf_slope"),
        )
        .orderBy(group_col)
    )


def textrank_keywords(
    docs: DataFrame,
    k: int = 20,
    iters: int = 3,
    text_col: str = "text",
    fanout: int = 32,
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004) — PageRank
    over the adjacent-token co-occurrence graph: the unsupervised
    keyword panel a corpus card or dataset search index wants beside
    the TF-IDF one (TF-IDF rewards local frequency; TextRank rewards
    CENTRALITY — a word that bridges many contexts ranks even when its
    raw count is modest).

    Graph: word bigrams (the shared :func:`pmi_collocations` adjacency)
    → self-loops dropped → BOTH directions → DISTINCT — an UNWEIGHTED
    co-occurrence graph (documented simplification, the hits_fixed
    deviation class: ranking fixpoint preserved, no weight bookkeeping).
    Edges collapse ONCE and localCheckpoint before iterating (the q143
    lineage lesson).  Ranks: the shared :func:`graph.pagerank_fixed`
    fixed-point nano-rank rounds — bit-exact cross-engine, no float
    sums.  Panel: the q13 two-level top-k merge ((-pr, term)
    min-struct == ROW_NUMBER (pr DESC, term ASC), the q213
    equivalence) — no task ever sorts the whole vocabulary.

    Scale shape: one token projection, one bigram DISTINCT (the only
    corpus-sized exchanges — both Zipf-shrunk by map-side combine);
    each PageRank round joins the vocab-sized edge table against the
    vocab-sized rank table; panel merges are fanout-bounded.

    Output: k rows — (term, pr, rank) by (pr DESC, term ASC).
    """
    from .graph import pagerank_fixed
    from .quality import ngrams_from_tokens

    toks = docs.select(_tokens(F.col(text_col)).alias("tk"))
    big = toks.select(
        F.explode(ngrams_from_tokens(F.col("tk"), 2)).alias("g")
    )
    w1 = F.element_at(F.split(F.col("g"), " ", 2), 1)
    w2 = F.element_at(F.split(F.col("g"), " ", 2), 2)
    und = big.select(w1.alias("a"), w2.alias("b")).where(
        F.col("a") != F.col("b")
    )
    edges = (
        und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(
            und.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    nodes = edges.select(F.col("src").alias("id")).distinct()
    pr = pagerank_fixed(nodes, edges, iters=iters)
    item = F.struct(
        (-F.col("pr")).alias("npr"),
        F.col("id").alias("term"),
        F.col("pr").alias("pr"),
    )
    topk = lambda c: F.slice(  # noqa: E731
        F.sort_array(F.collect_list(c)), 1, int(k)
    )
    lvl1 = pr.groupBy(
        F.pmod(F.hash("id"), F.lit(int(fanout))).alias("b")
    ).agg(topk(item).alias("top"))
    merged = (
        lvl1.select(F.explode("top").alias("t"))
        .groupBy()
        .agg(topk(F.col("t")).alias("top"))
        .select(F.posexplode("top").alias("i", "t"))
    )
    return merged.select(
        F.col("t.term").alias("term"),
        F.col("t.pr").alias("pr"),
        (F.col("i") + 1).cast("int").alias("rank"),
    )
