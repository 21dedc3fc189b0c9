"""Text hygiene for pre-training corpora: Unicode/whitespace normalization
and PII scrubbing — the mandatory cleanup pass between raw extraction and
tokenization.

Everything is native `regexp_replace`/`regexp_extract_all` Column
expressions (JVM regex, whole-stage codegen, zero shuffle). Patterns stick
to the syntax subset Java regex and RE2 (DuckDB) interpret identically —
plain character classes, no lookaround — and non-ASCII characters are
embedded as literal code points built in Python, so both engines compile
the SAME pattern bytes; that is what lets each scrub column pass a
hash-exact DuckDB gate.

At 100 TB both operators are pure map-side projections: they pipeline into
the scan with zero exchanges, and the emitted match counts make the scrub
auditable (how much PII was there?) instead of silent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# \x{...} hex escapes — the one syntax Java regex (JDK 7+) and RE2 (DuckDB)
# both accept with identical meaning; the SAME pattern strings feed both
# engines (the oracle SQL imports these constants)
ZERO_WIDTH = "[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}]"
CONTROLS = "[\\x{00}-\\x{08}\\x{0E}-\\x{1F}\\x{7F}]"  # keeps \t \n \r \f \x0b
MULTI_SPACE = "  +"  # runs of 2+ literal spaces → one

EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
IPV4 = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
PHONE = "\\+[0-9]{7,15}"  # international-format; bare digit runs left alone


def _count(text: Column, pat: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0))).cast("long")


def normalize_text(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Strip zero-width characters and C0 control codes, collapse space
    runs, trim — with per-document counts of what was removed.

    Output: (id_col, clean_text, n_zero_width, n_controls)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.regexp_replace(t, ZERO_WIDTH, ""), CONTROLS, ""),
            MULTI_SPACE,
            " ",
        )
    )
    return docs.select(
        F.col(id_col),
        cleaned.alias("clean_text"),
        _count(t, ZERO_WIDTH).alias("n_zero_width"),
        _count(t, CONTROLS).alias("n_controls"),
    )


def scrub_pii(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Redact emails, IPv4 addresses and international phone numbers with
    typed placeholder tokens, counting each kind. Order matters and is
    fixed (email → ip → phone) so the redaction is deterministic.

    Output: (id_col, scrubbed, n_emails, n_ips, n_phones)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL, "<EMAIL>"), IPV4, "<IP>"
        ),
        PHONE,
        "<PHONE>",
    )
    return docs.select(
        F.col(id_col),
        scrubbed.alias("scrubbed"),
        _count(t, EMAIL).alias("n_emails"),
        _count(t, IPV4).alias("n_ips"),
        _count(t, PHONE).alias("n_phones"),
    )


#: Typed-entity patterns for extraction (same Java-regex ∩ RE2 subset as
#: the scrub constants above; the q212 oracle SQL imports THIS dict —
#: never fork it).  Dict order is the emission order contract.
ENTITY_PATTERNS = {
    "email": EMAIL,
    "ipv4": IPV4,
    "phone": PHONE,
}


def extract_entities(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Typed entity EXTRACTION — the information-extraction counterpart
    of :func:`scrub_pii` (which masks): every email / IPv4 / phone match
    becomes its own row with its 1-based match ordinal, the relation an
    entity-linking or PII-inventory stage consumes.

    Output: (id_col, etype, pos, value) ordered by (id, etype, pos).

    At 100 TB: a per-type map-side regexp_extract_all + posexplode
    union — fan-out bounded by the document's own match count; no
    exchange, no UDF (the final orderBy is presentation-only).
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    parts = []
    for etype, pat in ENTITY_PATTERNS.items():
        parts.append(
            docs.select(
                F.col(id_col),
                F.lit(etype).alias("etype"),
                F.posexplode(
                    F.regexp_extract_all(t, F.lit(pat), F.lit(0))
                ).alias("p", "value"),
            ).select(
                id_col,
                "etype",
                (F.col("p") + 1).cast("long").alias("pos"),
                "value",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy(id_col, "etype", "pos")


# Encoding-corruption artifact patterns (Java regex ∩ RE2, non-ASCII via
# \x{..} hex escapes — the module contract). Imported by the q217 oracle
# builder; never fork.
MOJIBAKE_UTF8 = "[\\x{C2}\\x{C3}][\\x{80}-\\x{BF}]"  # UTF-8 read as Latin-1
REPLACEMENT_CHAR = "\\x{FFFD}"  # decoder already gave up
C1_CONTROLS = "[\\x{80}-\\x{9F}]"  # C1 block: classic cp1252/Latin-1 confusion


def encoding_quality_profile(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Mojibake / encoding-corruption audit — per-source rates of the
    three canonical decode-failure artifacts: UTF-8-bytes-read-as-Latin-1
    pairs (``Ã©``-style), U+FFFD replacement characters, and stray C1
    controls. A crawl shard whose rate spikes was decoded with the wrong
    charset and should be re-ingested, not quality-filtered.

    Exactness: per-doc artifact counts are regexp match counts (shared
    MOJIBAKE_UTF8 / REPLACEMENT_CHAR / C1_CONTROLS constants, Java∩RE2
    syntax); ``score_micro = artifacts·10⁶ DIV max(chars,1)`` and the
    per-group ``mean_score_micro = Σscore DIV n`` are non-negative
    integer divisions (Spark ``DIV`` == DuckDB ``//``). The C1 class
    OVERLAPS the mojibake pair class by design (a ``Â`` + C1 pair trips
    both) — the channels are independent detectors, not a partition.

    Scale shape: three codegen regexp counts in the scan projection +
    ONE map-side-combined aggregate to |groups| rows. Output: (group,
    n_docs, n_flagged, moji_pairs, repl_chars, c1_chars,
    mean_score_micro) ordered by group.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    per = docs.select(
        F.coalesce(F.col(group_col).cast("string"), F.lit("")).alias("grp"),
        _count(t, MOJIBAKE_UTF8).alias("m1"),
        _count(t, REPLACEMENT_CHAR).alias("m2"),
        _count(t, C1_CONTROLS).alias("m3"),
        F.length(t).cast("long").alias("nc"),
    ).select(
        "grp",
        "m1",
        "m2",
        "m3",
        F.expr(
            "((m1 + m2 + m3) * 1000000L) DIV greatest(nc, 1L)"
        ).cast("long").alias("score"),
    )
    return (
        per.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("m1") + F.col("m2") + F.col("m3") > 0, 1).otherwise(0))
            .cast("long")
            .alias("n_flagged"),
            F.sum("m1").cast("long").alias("moji_pairs"),
            F.sum("m2").cast("long").alias("repl_chars"),
            F.sum("m3").cast("long").alias("c1_chars"),
            F.expr("CAST(sum(score) DIV count(1) AS LONG)").alias(
                "mean_score_micro"
            ),
        )
        .withColumnRenamed("grp", group_col)
        .orderBy(group_col)
    )


def scrub_effectiveness(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Defense-in-depth audit of :func:`scrub_pii`: re-run the typed
    entity detectors over the SCRUBBED text and report, per entity type,
    how much survived — the check a privacy review actually wants
    (masking code can drift from detection code; this catches it).

    Per type: ``before_cnt`` (matches in raw text), ``after_cnt``
    (matches in scrubbed text), ``docs_with_residual``, and
    ``removed_micro = max(before−after, 0)·10⁶ DIV max(before, 1)`` —
    clamped because a replacement can in principle create a new match
    (none of the current placeholder tokens can, but the audit must not
    crash if one ever does). All counts BIGINT; DIV non-negative.

    Scale shape: the scrub chain + six codegen regexp counts in ONE scan
    projection, ONE 1-row aggregate, then a 3-row stack — no joins, no
    second scan. Output: (etype, before_cnt, after_cnt,
    docs_with_residual, removed_micro) in ENTITY_PATTERNS dict order.
    """
    per = scrub_pii(docs, id_col, text_col)
    s = F.col("scrubbed")
    wide = per.select(
        "n_emails",
        "n_ips",
        "n_phones",
        _count(s, EMAIL).alias("a_email"),
        _count(s, IPV4).alias("a_ipv4"),
        _count(s, PHONE).alias("a_phone"),
    )
    agg = wide.agg(
        F.sum("n_emails").cast("long").alias("b_email"),
        F.sum("n_ips").cast("long").alias("b_ipv4"),
        F.sum("n_phones").cast("long").alias("b_phone"),
        F.sum("a_email").cast("long").alias("a_email"),
        F.sum("a_ipv4").cast("long").alias("a_ipv4"),
        F.sum("a_phone").cast("long").alias("a_phone"),
        F.sum(F.when(F.col("a_email") > 0, 1).otherwise(0))
        .cast("long")
        .alias("r_email"),
        F.sum(F.when(F.col("a_ipv4") > 0, 1).otherwise(0))
        .cast("long")
        .alias("r_ipv4"),
        F.sum(F.when(F.col("a_phone") > 0, 1).otherwise(0))
        .cast("long")
        .alias("r_phone"),
    )
    rows = agg.select(
        F.expr(
            "stack(3, "
            "'email', b_email, a_email, r_email, "
            "'ipv4', b_ipv4, a_ipv4, r_ipv4, "
            "'phone', b_phone, a_phone, r_phone"
            ") AS (etype, before_cnt, after_cnt, docs_with_residual)"
        )
    )
    return rows.select(
        "etype",
        "before_cnt",
        "after_cnt",
        "docs_with_residual",
        F.expr(
            "(greatest(before_cnt - after_cnt, 0L) * 1000000L) "
            "DIV greatest(before_cnt, 1L)"
        )
        .cast("long")
        .alias("removed_micro"),
    ).orderBy("etype")
