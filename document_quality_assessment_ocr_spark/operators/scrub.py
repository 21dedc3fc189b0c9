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
