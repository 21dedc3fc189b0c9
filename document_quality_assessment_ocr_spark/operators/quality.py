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
