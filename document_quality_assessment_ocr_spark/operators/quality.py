"""Repetition-based quality filters for training-data curation.

The published web-corpus quality filters (Gopher / MassiveText, Rae et al.
2021, §A1.1 "repetition removal") drop documents dominated by repeated
lines or n-grams. Re-expressed Spark-first:

* **Line-level stats are columnar** — `split` + higher-order array
  functions per row, zero shuffle, whole-stage codegen.
* **N-gram stats are a two-level aggregation** — explode token n-grams →
  ``groupBy(doc_id, gram)`` count (map-side partial aggregation collapses
  within-doc repeats before the exchange) → ``groupBy(doc_id)`` fold. At
  100 TB the shuffle carries one row per *distinct* (doc, gram), never the
  raw token stream, and no key is hotter than a single document's
  vocabulary (mega-docs pre-split by operators/salting merge transparently
  because every doc-level result here is an algebraic aggregate).

Definitions (exact, so the DuckDB oracle can mirror them):

* ``dup_line_frac``     = 1 − (distinct lines / lines); 0 when no lines.
* ``dup_line_char_frac``= Σ len(line) over lines occurring >1× ÷ Σ len(line).
* ``top_gram_cnt/gram`` = occurrence count of the most frequent word n-gram
  (ties → lexicographically smallest gram) and the gram itself.
* ``dup_gram_char_frac``= Σ cnt·len(gram) over grams with cnt>1 ÷
  Σ cnt·len(gram) over all grams (the standard overlap-ignoring
  approximation of "characters inside duplicated n-grams").

Tokens are lowercase whitespace-split words (functions/text.WS_CLASS), the
same normalization the dedup family uses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import WS_CLASS


def _words(text: Column) -> Column:
    return F.filter(
        F.split(F.trim(F.lower(F.coalesce(text, F.lit("")))), WS_CLASS + "+"),
        lambda x: x != F.lit(""),
    )


def ngrams_from_tokens(toks: Column, n: int) -> Column:
    """Space-joined word n-grams from an ALREADY-MATERIALIZED token-array
    column (empty array when < n words).

    ``toks`` must be a plain attribute (project ``_words(text)`` to a column
    first): passing the tokenization *expression* would inline it once per
    ``element_at`` reference — n+2 re-tokenizations per row — because a
    single Column tree has no common-subexpression boundary. A separate
    projection is that boundary (Catalyst's CollapseProject refuses to
    duplicate non-cheap expressions referenced more than once)."""
    cnt = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    return F.when(cnt <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), cnt),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + F.lit(j)) for j in range(n)]
            ),
        )
    )


def word_ngrams(text: Column, n: int) -> Column:
    """Array of space-joined word n-grams straight from text — convenience
    form for single-use expressions; hot paths should project ``_words``
    and use :func:`ngrams_from_tokens` (see its docstring)."""
    return ngrams_from_tokens(_words(text), n)


def repetition_line_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", delim: str = "\n"
) -> DataFrame:
    """Per-document duplicate-line statistics — pure Column expressions
    (zero shuffle). The line array is materialized by its own projection so
    the split runs once per row, not once per referencing aggregate."""
    docs = docs.select(
        F.col(id_col),
        F.filter(
            F.split(F.coalesce(F.col(text_col), F.lit("")), delim),
            lambda x: x != F.lit(""),
        ).alias("_lines"),
    )
    lines = F.col("_lines")
    n_lines = F.size(lines)
    n_distinct = F.size(F.array_distinct(lines))
    dup_lines = F.filter(
        lines, lambda l: F.size(F.filter(lines, lambda x: x == l)) > 1
    )
    chars = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    total_chars = chars(lines)
    return docs.select(
        F.col(id_col),
        n_lines.cast("int").alias("n_lines"),
        F.when(n_lines == 0, F.lit(0.0))
        .otherwise(F.lit(1.0) - n_distinct.cast("double") / n_lines.cast("double"))
        .alias("dup_line_frac"),
        F.when(total_chars == 0, F.lit(0.0))
        .otherwise(chars(dup_lines).cast("double") / total_chars.cast("double"))
        .alias("dup_line_char_frac"),
    )


def top_ngram_stats(
    docs: DataFrame, n: int = 2, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document most-frequent word n-gram + duplicated-gram character
    fraction. Two-level aggregate over exploded grams (see module doc);
    documents with < n words yield (NULL gram, 0 cnt, 0 frac)."""
    grams = docs.select(
        F.col(id_col), _words(F.col(text_col)).alias("_toks")
    ).select(
        F.col(id_col),
        F.explode_outer(ngrams_from_tokens(F.col("_toks"), n)).alias("gram"),
    )
    per_gram = grams.groupBy(id_col, "gram").agg(F.count("gram").alias("cnt"))
    gram_chars = F.col("cnt") * F.length("gram")
    return per_gram.groupBy(id_col).agg(
        # (cnt desc, gram asc) via min over (-cnt, gram); NULL gram (empty
        # doc) sorts after real grams because -cnt=NULL orders last in min
        F.min(F.when(F.col("gram").isNotNull(), F.struct((-F.col("cnt")).alias("nc"), F.col("gram").alias("g")))).alias("top"),
        F.coalesce(F.sum(F.when(F.col("cnt") > 1, gram_chars)), F.lit(0)).alias("dup_chars"),
        F.coalesce(F.sum(gram_chars), F.lit(0)).alias("all_chars"),
    ).select(
        F.col(id_col),
        F.col("top.g").alias("top_gram"),
        F.coalesce(-F.col("top.nc"), F.lit(0)).cast("long").alias("top_cnt"),
        F.when(F.col("all_chars") == 0, F.lit(0.0))
        .otherwise(F.col("dup_chars").cast("double") / F.col("all_chars").cast("double"))
        .alias("dup_gram_char_frac"),
    )


def repetition_report(
    docs: DataFrame,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Line stats ⋈ n-gram stats — the composite repetition-filter input a
    curation pipeline thresholds on. One shuffle pair for the gram side; the
    line side rides along columnar and joins on the doc key (AQE broadcasts
    whichever side is small after filtering)."""
    lines = repetition_line_stats(docs, id_col, text_col)
    grams = top_ngram_stats(docs, n, id_col, text_col)
    return lines.join(grams, id_col, "inner")


def dedup_lines_within_doc(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """WITHIN-document exact line dedup (the boilerplate-menu/footer case the
    cross-doc chunk dedup cannot see): keep the FIRST occurrence of every
    line, preserve order, reassemble with newlines. Exact spec (oracle
    mirrors it): lines = split on '\\n', duplicate = byte-identical earlier
    line in the SAME document; blank lines dedup like any other line.

    Pure array-local Column work — zero shuffle, zero UDF; the per-doc
    quadratic first-occurrence scan is bounded by line count (lines per
    web doc are few; mega-docs are pre-split by operators/salting)."""
    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
    base = docs.select(F.col(id_col), lines.alias("ls"))
    kept = F.filter(
        F.col("ls"),
        lambda x, i: F.array_position(F.slice(F.col("ls"), 1, i), x) == 0,
    )
    return base.select(
        F.col(id_col),
        F.size("ls").cast("long").alias("n_lines"),
        (F.size("ls") - F.size(kept)).cast("long").alias("n_removed"),
        F.array_join(kept, "\n").alias("clean_text"),
    )


#: C4 line-filter constants (Raffel et al. 2020 §2.2 "we retained lines that
#: ended in a terminal punctuation mark … at least 5 words … removed any line
#: with the word Javascript … any page containing lorem ipsum or a curly
#: brace") — shared with the DuckDB oracle builder.
C4_TERMINALS = (".", "!", "?", '"')
C4_MIN_WORDS = 5
C4_MIN_SENTENCES = 3


def c4_line_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = C4_MIN_WORDS,
    min_sentences: int = C4_MIN_SENTENCES,
) -> DataFrame:
    """The C4 cleaning rules as one map-side projection.

    Line kept iff its trimmed form ends in a terminal punctuation mark,
    has ≥ ``min_words`` whitespace words, and does not contain
    'javascript' (case-insensitive). Document kept iff ≥ ``min_sentences``
    kept lines ("sentences" = kept lines, the documented approximation)
    and the full text contains neither 'lorem ipsum' (case-insensitive)
    nor '{'. Output: (id, n_lines, n_kept, doc_keep, clean_text) with
    clean_text the kept lines joined by '\\n' (empty when doc_keep is
    false — dropped pages contribute no text downstream)."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    base = docs.select(F.col(id_col), txt.alias("_t"), F.split(txt, "\n").alias("ls"))
    cols = c4_cols(min_words, min_sentences)
    return base.select(F.col(id_col), *[c.alias(n) for n, c in cols.items()])


def c4_cols(
    min_words: int = C4_MIN_WORDS, min_sentences: int = C4_MIN_SENTENCES
) -> dict[str, "Column"]:
    """The C4 gate columns over a pre-projected frame carrying ``_t``
    (coalesced text) and ``ls`` (line array) — shared by
    :func:`c4_line_filter` and the curation-v4 composite so both build the
    byte-identical expressions."""

    def line_ok(x):
        t = F.trim(x)
        ends = F.substring(t, -1, 1).isin(*C4_TERMINALS)
        words = F.size(
            F.filter(F.split(t, WS_CLASS + "+"), lambda w: w != F.lit(""))
        )
        return (
            ends
            & (words >= F.lit(int(min_words)))
            & ~F.lower(t).contains("javascript")
        )

    kept = F.filter(F.col("ls"), line_ok)
    low = F.lower(F.col("_t"))
    doc_keep = (
        (F.size(kept) >= F.lit(int(min_sentences)))
        & ~low.contains("lorem ipsum")
        & ~F.col("_t").contains("{")
    )
    return {
        "n_lines": F.size("ls").cast("long"),
        "n_kept": F.size(kept).cast("long"),
        "doc_keep": doc_keep,
        "clean_text": F.when(doc_keep, F.array_join(kept, "\n")).otherwise(
            F.lit("")
        ),
    }


#: Gopher quality-filter constants (Rae et al. 2021, Table A1) — shared with
#: the DuckDB oracle builder; rule names are the first-failing `reason`.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_WORD_RATIO = 0.1
GOPHER_MAX_BULLET_LINE_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_LINE_FRAC = 0.3
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8
GOPHER_MIN_STOP_HITS = 2
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_BULLETS = ("•", "-", "*")


def gopher_quality_filter(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The Gopher/MassiveText document quality rules as ONE map-side
    projection (word-count band, mean word length band, #/… symbol-to-word
    ratio, bullet-line and ellipsis-line fractions, alphabetic-word
    fraction, minimum distinct stopword hits). ``reason`` is the FIRST
    failing rule in the order above (NULL when kept) — the same
    first-wins convention the extraction verdict fold uses.

    All ratios are rounded to 6 dp with the identical operation order on
    both engines (sum → /words → round); zero-word documents fail
    ``word_count`` and emit 0.0 ratios rather than NULLs/NaNs."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.filter(F.split(F.trim(txt), WS_CLASS + "+"), lambda x: x != F.lit(""))
    base = docs.select(F.col(id_col), txt.alias("_t"), toks.alias("tk"))
    cols = gopher_cols()
    return base.select(F.col(id_col), *[c.alias(n) for n, c in cols.items()])


def gopher_labeled(
    docs: DataFrame, extra_cols: list[str], text_col: str = "text"
) -> DataFrame:
    """The Gopher ``keep`` verdict plus passthrough columns in ONE
    map-side projection — the zero-join label source for classifier
    audits (q238 AUC, q239 PR sweep) that score a cheap column against
    the gate verdict.  Shares :func:`gopher_cols` (and therefore every
    GOPHER_* constant and the ratio op order) with
    :func:`gopher_quality_filter`."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    toks = F.filter(
        F.split(F.trim(txt), WS_CLASS + "+"), lambda x: x != F.lit("")
    )
    base = docs.select(
        *[F.col(c) for c in extra_cols], txt.alias("_t"), toks.alias("tk")
    )
    return base.select(*extra_cols, gopher_cols()["keep"].alias("keep"))


def gopher_cols() -> dict[str, Column]:
    """The Gopher rule columns over a pre-projected frame carrying ``_t``
    (coalesced text) and ``tk`` (token array) — shared by
    :func:`gopher_quality_filter` and the curation-v4 composite. Keys:
    the eight metrics plus ``keep``/``reason``."""
    n_words = F.size("tk").cast("long")
    safe_n = F.greatest(n_words, F.lit(1).cast("long"))
    mean_len = F.round(
        F.aggregate(
            F.transform("tk", lambda w: F.length(w).cast("long")),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).cast("double")
        / safe_n,
        6,
    )
    n_hash = F.length("_t") - F.length(F.replace(F.col("_t"), F.lit("#"), F.lit("")))
    n_ell = (
        F.length("_t") - F.length(F.replace(F.col("_t"), F.lit("..."), F.lit("")))
    ) / F.lit(3)
    sym_ratio = F.round((n_hash + n_ell).cast("double") / safe_n, 6)
    lines = F.filter(
        F.split(F.col("_t"), "\n"), lambda l: F.trim(l) != F.lit("")
    )
    n_lines = F.size(lines)
    safe_l = F.greatest(n_lines, F.lit(1))
    bullet_frac = F.round(
        F.size(
            F.filter(
                lines,
                lambda l: F.substring(F.trim(l), 1, 1).isin(*GOPHER_BULLETS),
            )
        ).cast("double")
        / safe_l,
        6,
    )
    ell_frac = F.round(
        F.size(F.filter(lines, lambda l: F.endswith(F.trim(l), F.lit("...")))).cast(
            "double"
        )
        / safe_l,
        6,
    )
    alpha_frac = F.round(
        F.size(F.filter("tk", lambda w: F.lower(w).rlike("[a-z]"))).cast("double")
        / safe_n,
        6,
    )
    stops = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(F.transform("tk", F.lower)), stops
        )
    ).cast("long")
    reason = (
        F.when(
            (n_words < GOPHER_MIN_WORDS) | (n_words > GOPHER_MAX_WORDS),
            F.lit("word_count"),
        )
        .when(
            (mean_len < GOPHER_MIN_MEAN_WORD_LEN)
            | (mean_len > GOPHER_MAX_MEAN_WORD_LEN),
            F.lit("mean_word_length"),
        )
        .when(sym_ratio > GOPHER_MAX_SYMBOL_WORD_RATIO, F.lit("symbol_ratio"))
        .when(bullet_frac > GOPHER_MAX_BULLET_LINE_FRAC, F.lit("bullet_lines"))
        .when(ell_frac > GOPHER_MAX_ELLIPSIS_LINE_FRAC, F.lit("ellipsis_lines"))
        .when(alpha_frac < GOPHER_MIN_ALPHA_WORD_FRAC, F.lit("alpha_words"))
        .when(stop_hits < GOPHER_MIN_STOP_HITS, F.lit("stopwords"))
    )
    return {
        "n_words": n_words,
        "mean_word_len": mean_len,
        "symbol_word_ratio": sym_ratio,
        "bullet_line_frac": bullet_frac,
        "ellipsis_line_frac": ell_frac,
        "alpha_word_frac": alpha_frac,
        "n_stop_hits": stop_hits,
        "keep": reason.isNull(),
        "reason": reason,
    }


def stopgram_blocklist(
    docs: DataFrame,
    n: int = 3,
    min_df_permille: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Boilerplate n-gram blocklist miner: word n-grams whose DOCUMENT
    frequency exceeds ``min_df_permille`` of the corpus — the corpus-level
    "common lines" detector (the CCNet shard-common-paragraph idea at gram
    granularity) whose output feeds ``ngram_jaccard_pairs(max_doc_freq=)``
    as a stop-shingle list and boilerplate strippers as a phrase
    blocklist.

    All integer: ``df_permille = (1000·df) DIV n_docs`` (the shared
    non-negative DIV). Plan: per-doc DISTINCT grams map-side (array_
    distinct before the explode), ONE gram hash aggregate for df, and the
    corpus doc count rides along as a broadcast single-row cross join —
    the gram dimension is Zipf-bounded, nothing else shuffles.

    Output: (gram, df, df_permille) for grams at/above the threshold.
    """
    from .textstats import _tokens

    tk = docs.select(F.col(id_col), _tokens(F.col(text_col)).alias("_tk"))
    grams = tk.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(ngrams_from_tokens(F.col("_tk"), int(n)))
        ).alias("gram"),
    )
    total = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    df_ = grams.groupBy("gram").agg(F.count(F.lit(1)).cast("long").alias("df"))
    return (
        df_.crossJoin(F.broadcast(total))
        .select(
            "gram",
            "df",
            F.expr("(1000L * df) DIV n_docs").alias("df_permille"),
        )
        .where(F.col("df_permille") >= F.lit(int(min_df_permille)))
    )


def trim_repeated_windows(
    docs: DataFrame,
    w: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """WITHIN-document self-repetition trim: every non-first occurrence of
    a ``w``-token window is removed — the looped-generation / template-echo
    pathology (a doc repeating its own paragraphs) that corpus-level dedup
    never sees and Gopher's stats only SCORE; this operator produces the
    cleaned token stream.

    Exact spec (oracle-mirrored): tokens = whitespace split (original
    case); window at 1-based position i covers tokens [i, i+w); position
    i is a REPEAT iff an equal window (md5 of the space-joined w tokens)
    starts at some j < i in the same document; a token is removed iff any
    repeat window covers it; kept tokens rejoin with single spaces.

    Scale shape: windows hash map-side (slice + md5 per position); one
    (doc, window-hash) aggregate finds first occurrences (map-side combine
    collapses within-doc repeats), one doc-keyed aggregate collects the
    repeat-start list (bounded by doc length), and the cover test is
    array-local arithmetic. Cost is linear in corpus tokens; per-doc state
    is the doc's own repeat list — mega-docs are the q39 justification.

    Output: (id_col, n_tokens, n_repeat_windows, n_tokens_removed,
    clean_md5) — clean_md5 is md5 of the cleaned text (witness of the
    cleaned bytes without shipping them through the result compare).
    """
    w = int(w)
    tk = F.filter(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), WS_CLASS + "+"),
        lambda x: x != F.lit(""),
    )
    d = docs.select(F.col(id_col), tk.alias("_tk"))
    # 1-based window starts; sequence() counts DOWN for an upper bound
    # < 1, so guard short docs to an empty array
    starts = F.when(
        F.size("_tk") >= w,
        F.expr(f"sequence(1, size(_tk) - {w} + 1)"),
    ).otherwise(F.expr("CAST(array() AS array<int>)"))
    grams = d.select(
        F.col(id_col),
        F.explode(starts).alias("i"),
        F.col("_tk"),
    ).select(
        F.col(id_col),
        F.col("i").cast("long").alias("i"),
        F.md5(F.expr(f"array_join(slice(_tk, i, {w}), ' ')")).alias("h"),
    )
    firsts = grams.groupBy(id_col, "h").agg(
        F.min("i").alias("f"), F.collect_list("i").alias("ii")
    )
    rep = firsts.select(
        F.col(id_col),
        F.explode(F.filter("ii", lambda x: x > F.col("f"))).alias("r"),
    )
    rs = rep.groupBy(id_col).agg(F.sort_array(F.collect_list("r")).alias("_rs"))
    joined = d.join(rs, id_col, "left").select(
        F.col(id_col),
        "_tk",
        F.coalesce(F.col("_rs"), F.expr("CAST(array() AS array<bigint>)")).alias(
            "_rs"
        ),
    )
    kept = F.expr(
        f"""transform(filter(
                transform(_tk, (t135, i135) -> named_struct(
                    'tok', t135,
                    'keep', NOT exists(_rs,
                        r135 -> i135 + 1 >= r135 AND i135 + 1 < r135 + {w}))),
                s135 -> s135.keep),
            k135 -> k135.tok)"""
    )
    return joined.select(
        F.col(id_col),
        F.size("_tk").cast("long").alias("n_tokens"),
        F.size("_rs").cast("long").alias("n_repeat_windows"),
        (F.size("_tk") - F.size(kept)).cast("long").alias("n_tokens_removed"),
        F.md5(F.array_join(kept, " ")).alias("clean_md5"),
    )


def blocklist_gate(
    docs: DataFrame,
    words: list[str],
    min_bad_tokens: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Bad-word blocklist document gate — the C4 / UT1-blocklist stage
    (Raffel et al. 2020 §2.2 "List of Dirty, Naughty ... Words";
    FineWeb/CCNet run the same shape against the UT1 adult list).

    Token-exact matching over the shared lowercase whitespace tokens
    (`_words`) — never a substring regex, which flags innocent words
    (the classic "Scunthorpe" false positive). A document is ``blocked``
    when it contains at least ``min_bad_tokens`` blocklisted token
    occurrences; ``bad_permille`` (integer, ``1000·bad DIV tokens``) is
    surfaced so callers can run density policies instead.

    Scale shape (100 TB): ZERO shuffle — one codegen projection. The
    blocklist rides as a literal IN-set (Catalyst compiles >10 literals
    to an O(1) hash-set `InSet`), so even the ~10^5-word UT1 list stays a
    broadcast-free map-side filter; the corpus never explodes to token
    rows.

    Output: (id_col, n_tokens, n_bad_tokens, bad_permille, blocked).
    """
    if not words:
        raise ValueError("blocklist_gate needs a non-empty word list")
    qs = ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(set(words)))
    d = docs.select(
        F.col(id_col), _words(F.col(text_col)).alias("_tk")
    ).select(
        F.col(id_col),
        F.size("_tk").cast("long").alias("n_tokens"),
        F.expr(f"size(filter(_tk, t139 -> t139 IN ({qs})))")
        .cast("long")
        .alias("n_bad_tokens"),
    )
    permille = F.when(F.col("n_tokens") == 0, F.lit(0).cast("long")).otherwise(
        F.expr("(1000L * n_bad_tokens) DIV n_tokens")
    )
    return d.select(
        id_col,
        "n_tokens",
        "n_bad_tokens",
        permille.alias("bad_permille"),
        (F.col("n_bad_tokens") >= F.lit(int(min_bad_tokens))).alias("blocked"),
    )


def boilerplate_share(
    docs: DataFrame,
    n: int = 5,
    min_df: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document templated-ness score — what fraction of a document's
    distinct word ``n``-grams also appear in ≥ ``min_df`` OTHER contexts
    (documents)?  High share means the page is assembled from corpus-
    common boilerplate (navigation, legal footers, product-page
    templates) rather than original prose — the document-level
    complement of line dedup, catching templates that vary too much for
    exact line matching.

    Shingles are the module's shared word-n-gram contract (md5 of the
    space-joined lowercase gram); ``df`` counts DISTINCT documents per
    shingle, and a shingle is "common" when ``df ≥ min_df`` (the doc
    itself included — a constant offset both engines share).
    ``common_micro = n_common·1e6 DIV max(n_shingles,1)``.

    Plan: distinct (doc, shingle) explode → shingle-df aggregate
    (zipf-bounded) → equi-join back → per-doc aggregate → left join to
    the doc table so shingle-less (short) docs surface 0. Never a
    pair join — the df table IS the cross-document signal.

    Output: (id_col, n_shingles, n_common, common_micro).
    """
    sh = docs.select(
        F.col(id_col), _words(F.col(text_col)).alias("_toks")
    ).select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.transform(ngrams_from_tokens(F.col("_toks"), n), F.md5)
            )
        ).alias("shingle"),
    )
    df_ = sh.groupBy("shingle").agg(F.count(F.lit(1)).cast("long").alias("df"))
    per_doc = (
        sh.join(df_, "shingle")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum((F.col("df") >= F.lit(int(min_df))).cast("long"))
            .cast("long")
            .alias("n_common"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
            F.expr(
                "(coalesce(n_common, 0L) * 1000000L)"
                " DIV greatest(coalesce(n_shingles, 0L), 1L)"
            ).cast("long").alias("common_micro"),
        )
    )


def zlib_profile_values(texts):
    """(raw_utf8_bytes, zlib_level6_bytes) per text — the SHARED function
    called by the engine's Arrow-batched UDF (`compression_profile`) AND
    the q201 oracle-literal builder, so both engines carry byte-identical
    integers (the wav_frame_rms_values contract). The zlib LEVEL (6) is
    part of the contract — changing it re-keys every literal."""
    import zlib

    out = []
    for t in texts:
        b = (t or "").encode("utf-8")
        out.append((len(b), len(zlib.compress(b, 6))))
    return out


def compression_profile(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Compression-ratio quality signal (the Gopher-era zlib heuristic):
    per document, UTF-8 byte length, zlib(level 6) compressed length, and
    ``ratio_micro = comp·1e6 DIV max(raw, 1)``. Very LOW ratios flag
    template/repetition junk (compresses away); ratios near 1e6 flag
    already-compressed or random-noise payloads masquerading as text.
    Both tails are what quality classifiers miss — the compressor is an
    assumption-free model.

    Scale shape: ONE mapInPandas pass (Arrow-batched, stdlib zlib —
    CPU-bound per batch, no shuffle; text bytes stay in their partitions
    and only three integers per doc leave the scan). Run it on the
    deterministic md5 audit panel, not the full corpus, when it rides a
    dashboard.

    Output: (doc_id, raw_bytes, comp_bytes, ratio_micro) ordered by id.
    """

    def gen(it):
        import pandas as pd

        for pdf in it:
            vals = zlib_profile_values(pdf[text_col].tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "raw_bytes": pd.Series(
                        [r for r, _ in vals], dtype="int64"
                    ),
                    "comp_bytes": pd.Series(
                        [c for _, c in vals], dtype="int64"
                    ),
                }
            )

    prof = docs.select(
        F.col(id_col).cast("long").alias(id_col), text_col
    ).mapInPandas(gen, "doc_id long, raw_bytes long, comp_bytes long")
    return prof.select(
        "doc_id",
        "raw_bytes",
        "comp_bytes",
        F.expr("(comp_bytes * 1000000L) DIV greatest(raw_bytes, 1L)")
        .cast("long")
        .alias("ratio_micro"),
    ).orderBy("doc_id")


# Ordered (gate, predicate) pairs over gopher_quality_filter's SURFACED
# metric columns. The predicate strings parse identically in Spark SQL
# (F.expr) and DuckDB (the layout.morton16_sql "string IS the twin"
# technique) — float constants ride repr() exactly like the q89 oracle
# builder, so gate semantics can never drift between engines. Order
# matches the filter's first-wins reason chain.
GOPHER_GATES: list[tuple[str, str]] = [
    (
        "word_count",
        f"n_words < {GOPHER_MIN_WORDS} OR n_words > {GOPHER_MAX_WORDS}",
    ),
    (
        "mean_word_length",
        f"mean_word_len < {GOPHER_MIN_MEAN_WORD_LEN!r}"
        f" OR mean_word_len > {GOPHER_MAX_MEAN_WORD_LEN!r}",
    ),
    (
        "symbol_ratio",
        f"symbol_word_ratio > {GOPHER_MAX_SYMBOL_WORD_RATIO!r}",
    ),
    ("bullet_lines", f"bullet_line_frac > {GOPHER_MAX_BULLET_LINE_FRAC!r}"),
    (
        "ellipsis_lines",
        f"ellipsis_line_frac > {GOPHER_MAX_ELLIPSIS_LINE_FRAC!r}",
    ),
    ("alpha_words", f"alpha_word_frac < {GOPHER_MIN_ALPHA_WORD_FRAC!r}"),
    ("stopwords", f"n_stop_hits < {GOPHER_MIN_STOP_HITS}"),
]


def filter_attribution(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-gate rejection attribution over the Gopher rule chain — the
    filter-ablation audit every curation pipeline owner eventually asks
    for: ``n_fail`` (docs failing the gate at all), ``n_first_fail``
    (docs whose FIRST failing gate this is — the filter's reported
    reason share), and ``n_unique_fail`` (docs failing ONLY this gate —
    the marginal docs this gate alone removes; drop the gate and
    exactly these come back).

    first-fail counts reuse the filter's own ``reason`` column
    (definitionally identical — no re-derivation drift); any-fail and
    unique-fail evaluate the shared ``GOPHER_GATES`` predicate strings
    over the filter's surfaced metric columns.

    Scale shape: gopher_quality_filter's map-side projection + ONE
    single-row aggregate (all 3x7 counters in one pass, map-side
    combined), unpivoted to the 7-row gate panel driver-side-free (the
    profile_table idiom). Nothing shuffles but the 1-row combine.

    Output: (pos, gate, n_fail, n_first_fail, n_unique_fail, n_docs,
    n_rejected) — one row per gate in chain order; the corpus totals
    repeat on every row (panel-bounded).
    """
    g = gopher_quality_filter(docs, id_col, text_col)
    nf = None
    per_cols = []
    for i, (_, pred) in enumerate(GOPHER_GATES):
        c = F.expr(pred).cast("long").alias(f"f{i}")
        per_cols.append(c)
    per = g.select(*per_cols, F.col("reason"))
    nf = sum((F.col(f"f{i}") for i in range(len(GOPHER_GATES))), F.lit(0))
    per = per.withColumn("nf", nf.cast("long"))
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum((F.col("nf") > 0).cast("long")).cast("long").alias(
            "n_rejected"
        ),
    ]
    for i, (name, _) in enumerate(GOPHER_GATES):
        aggs += [
            F.sum(F.col(f"f{i}")).cast("long").alias(f"fail{i}"),
            F.sum((F.col("reason") == name).cast("long"))
            .cast("long")
            .alias(f"first{i}"),
            F.sum(
                ((F.col(f"f{i}") == 1) & (F.col("nf") == 1)).cast("long")
            )
            .cast("long")
            .alias(f"uniq{i}"),
        ]
    wide = per.agg(*aggs)
    entries = [
        F.struct(
            F.lit(i + 1).cast("long").alias("pos"),
            F.lit(name).alias("gate"),
            F.col(f"fail{i}").alias("n_fail"),
            F.col(f"first{i}").alias("n_first_fail"),
            F.col(f"uniq{i}").alias("n_unique_fail"),
            F.col("n_docs").alias("n_docs"),
            F.col("n_rejected").alias("n_rejected"),
        )
        for i, (name, _) in enumerate(GOPHER_GATES)
    ]
    return (
        wide.select(F.explode(F.array(*entries)).alias("e"))
        .select("e.*")
        .orderBy("pos")
    )
