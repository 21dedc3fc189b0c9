"""Text-span scalar functions — native Column expressions only.

The text analog of the reference's K1 content-ratio kernel
(``criteria.py:134-137``): 'ink' = non-whitespace characters, density =
100·ink/len. Everything here is pure ``pyspark.sql.functions`` so Catalyst
folds it into whole-stage codegen, and every function has a direct ANSI-SQL
equivalent for the DuckDB oracle (``__spark_entry__.oracle_sql``).

Whitespace is the explicit ASCII class ``[ \\t\\n\\r\\f\\x0b]`` everywhere
(Spark/Java and Python disagree on unicode ``\\s`` semantics; pinning the
class keeps the engine, the DuckDB oracle, and the pure-Python oracle
byte-aligned).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WS_CLASS = "[ \\t\\n\\r\\f\\x0b]"


def ink_chars(text: Column) -> Column:
    """Count of non-whitespace characters."""
    return F.length(F.regexp_replace(text, WS_CLASS, ""))


def text_density(text: Column) -> Column:
    """Ink coverage of the span's character grid with a one-cell advance per
    token: ``100·ink/(len + n_tokens)``; empty/null → 0.0.

    The K1 analog for text spans, calibrated so the band semantics carry
    over: natural prose lands ~60–75% (inside the shipped (1, 80) band,
    measured 65–74% on the sf corpora), solid glyph runs →~100 (dropped
    high), whitespace padding →~0 (dropped low). A plain non-ws/len ratio
    puts real English at 79–86% — straddling the 80 cap — so the implicit
    inter-word advance is load-bearing, not cosmetic."""
    t = F.coalesce(text, F.lit(""))
    return (
        F.lit(100.0)
        * ink_chars(t)
        / F.greatest(F.length(t) + token_count(t), F.lit(1))
    ).cast("double")


def text_keep(text: Column, min_percent: float = 1.0, max_percent: float = 80.0) -> Column:
    """Boilerplate gate: keep iff density within the text_density band
    (reference ``config/criteria_config.json:18-23``). Below = sparse
    boilerplate (nav chrome / padding), above = dense glyph runs."""
    d = text_density(text)
    return (d >= F.lit(float(min_percent))) & (d <= F.lit(float(max_percent)))


def token_count(text: Column) -> Column:
    """Whitespace token count (non-empty tokens)."""
    t = F.trim(F.coalesce(text, F.lit("")))
    toks = F.filter(F.split(t, WS_CLASS + "+"), lambda x: x != F.lit(""))
    return F.size(toks).cast("long")


#: BPE-ish pre-tokenizer pattern (GPT-2-style word/number/punct split,
#: ASCII-scoped so Java regex and RE2 agree exactly): a letter run with an
#: optional apostrophe suffix, a digit run, or a punctuation run.
BPE_PATTERN = "[A-Za-z]+(?:'[A-Za-z]+)?|[0-9]+|[^A-Za-z0-9 \\t\\n\\r\\f\\x0b]+"


def bpe_tokens(text: Column) -> Column:
    """Array of BPE-ish pre-tokens (the regex split a byte-pair tokenizer
    applies before merges). Native regexp_extract_all — JVM-side, and the
    DuckDB oracle runs the identical pattern."""
    return F.regexp_extract_all(F.coalesce(text, F.lit("")), F.lit(BPE_PATTERN), 0)


def token_count_bpe(text: Column) -> Column:
    """Pre-token count under the BPE-ish pattern — the proxy a training-data
    pipeline uses for byte-pair token budgeting (exact BPE merges need the
    vocab; the pre-token count is the scale-stable upper-bound signal)."""
    return F.size(bpe_tokens(text)).cast("long")


def char_ngrams(text: Column, n: int = 5) -> Column:
    """Array of character n-gram shingles of the whitespace-normalized text.

    Built with sequence+transform (no UDF): shingle i = substring(i, n).
    """
    norm = F.regexp_replace(F.lower(F.coalesce(text, F.lit(""))), WS_CLASS + "+", " ")
    cnt = F.greatest(F.length(norm) - F.lit(n - 1), F.lit(0))
    return F.when(cnt <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(F.sequence(F.lit(1), cnt), lambda i: norm.substr(i, F.lit(n)))
    )


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of lowercased whitespace-collapsed text.

    md5 is bit-identical between Spark and DuckDB → exact dedup keys and the
    SQL oracle agree.
    """
    return F.md5(
        F.trim(F.regexp_replace(F.lower(F.coalesce(text, F.lit(""))), WS_CLASS + "+", " "))
    )
