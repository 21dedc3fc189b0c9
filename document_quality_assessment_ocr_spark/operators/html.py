"""HTML boilerplate strip / DOM heuristics — the north rule's third parse
family alongside the span gate and the binary raster front-end.

A jusText/Boilerpipe-flavoured block model (public algorithms: Pomikálek
2011, Kohlschütter et al. WSDM 2010), re-expressed as pure Column
expressions:

1. **Decompose** raw HTML into text blocks: drop the ``<head>`` section,
   ``<script>``/``<style>`` bodies and comments; replace every block-level
   tag with a separator byte; split. Inline tags (``<a>``, ``<b>``, …)
   stay inside their block and are stripped during text normalisation.
2. **Featurise** each block: visible text (tags stripped, core entities
   decoded, whitespace collapsed), word count, anchor-text share
   (link density), stopword density, heading flag.
3. **Classify** with the jusText-style rule ladder: link-dense → bad;
   long + stopword-dense → good; everything else is *short* and is decided
   by context — promoted to content when an adjacent block is good
   (headings look forward only, like jusText's headline handling).
4. **Assemble** the surviving blocks, in order, into the document's main
   text.

Cross-engine contract: every pattern below sticks to the Java-regex ∩ RE2
subset (no lookaround, no backreferences; inline ``(?is)`` flags and
non-greedy ``.*?`` are in both), and the oracle SQL in
``__spark_entry__`` interpolates THESE constants — never fork them.

Scale notes (100 TB): decompose+featurise+classify-provisional are
map-side projections that pipeline into the scan (zero exchanges). The
context pass needs each document's blocks on one partition — one hash
exchange on doc_id with bounded per-doc windows (blocks per document are
bounded by document size, the same invariant the span pipeline relies
on); assembly reuses that exchange's clustering for its groupBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import WS_CLASS
from .textstats import LANG_STOPWORDS

# --- separator bytes (stripped from input first, so they are unambiguous)
SEP = "\x1e"  # record separator: block boundary
HMARK = "\x1f"  # unit separator: fragment is a heading
MARKER_CLASS = "[\\x{1E}\\x{1F}]"

# --- patterns (Java regex ∩ RE2; oracle SQL imports these)
COMMENT = "(?s)<!--.*?-->"
# <head ...>…</head> — the ({WS}[^>]*)? attr branch keeps <header> safe
HEADSEC = f"(?is)<head({WS_CLASS}[^>]*)?>.*?</head{WS_CLASS}*>"
SCRIPT = f"(?is)<script({WS_CLASS}[^>]*)?>.*?</script{WS_CLASS}*>"
STYLE = f"(?is)<style({WS_CLASS}[^>]*)?>.*?</style{WS_CLASS}*>"
HEAD_OPEN = f"(?i)<h[1-6]({WS_CLASS}[^>]*)?/?>"
_BLOCK_ALTS = (
    "p|div|h[1-6]|ul|ol|li|dl|dt|dd|table|thead|tbody|tr|td|th|br|hr"
    "|article|section|header|footer|nav|aside|main|figure|figcaption"
    "|blockquote|pre|form|fieldset|body|html"
)
BLOCK_TAG = f"(?i)</?({_BLOCK_ALTS})({WS_CLASS}[^>]*)?/?>"
ANCHOR = f"(?is)<a({WS_CLASS}[^>]*)?>.*?</a{WS_CLASS}*>"
TAG = "(?s)<[^>]*>"

# HTML entity subset decoded after tag-strip; &amp; LAST (standard order)
ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]

STOPWORDS = LANG_STOPWORDS["en"]

# classification thresholds (jusText-flavoured defaults)
MAX_LINK_DENSITY = 1.0 / 3.0
MIN_GOOD_WORDS = 12
MIN_STOP_DENSITY = 0.05


def _decode_entities(col: Column) -> Column:
    for ent, rep in ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(rep))
    return col


def _visible_text(raw: Column) -> Column:
    """Tag-strip → entity-decode → whitespace-collapse → trim."""
    return F.trim(
        F.regexp_replace(
            _decode_entities(F.regexp_replace(raw, TAG, " ")),
            WS_CLASS + "+",
            " ",
        )
    )


def _prepped(html: Column) -> Column:
    """Raw HTML → separator-delimited block stream."""
    x = F.coalesce(html, F.lit(""))
    x = F.regexp_replace(x, MARKER_CLASS, "")
    x = F.regexp_replace(x, COMMENT, " ")
    x = F.regexp_replace(x, HEADSEC, " ")
    x = F.regexp_replace(x, SCRIPT, " ")
    x = F.regexp_replace(x, STYLE, " ")
    x = F.regexp_replace(x, HEAD_OPEN, SEP + HMARK)
    return F.regexp_replace(x, BLOCK_TAG, SEP)


def html_blocks(
    docs: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """HTML documents → one row per non-empty text block with DOM features.

    Output: (id_col, block_idx, is_heading, text, n_chars, n_words,
    link_chars, link_density, stop_density). ``block_idx`` is the
    fragment's position in the tag-split stream (gaps where markup-only
    fragments fell out — a stable order key, not a dense rank).

    Pure map-side: no exchange, no UDF.
    """
    frag = F.col("frag")
    is_heading = F.startswith(frag, F.lit(HMARK))
    raw = F.when(is_heading, F.substring(frag, 2, 2147483647)).otherwise(frag)
    text = _visible_text(raw)
    words = F.filter(F.split(text, " "), lambda x: x != F.lit(""))
    n_words = F.size(words).cast("long")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    stop_hits = F.size(
        F.filter(words, lambda x: F.array_contains(stop_arr, F.lower(x)))
    ).cast("long")
    link_chars = F.aggregate(
        F.transform(
            F.regexp_extract_all(raw, F.lit(ANCHOR), F.lit(0)),
            lambda m: F.length(_visible_text(m)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n_chars = F.length(text).cast("long")
    return (
        docs.select(
            F.col(id_col),
            F.posexplode(F.split(_prepped(F.col(html_col)), SEP)).alias(
                "block_idx", "frag"
            ),
        )
        .select(
            F.col(id_col),
            F.col("block_idx").cast("int").alias("block_idx"),
            is_heading.alias("is_heading"),
            text.alias("text"),
            n_chars.alias("n_chars"),
            n_words.alias("n_words"),
            link_chars.alias("link_chars"),
            stop_hits.alias("stop_hits"),
        )
        .where(F.col("n_chars") > 0)
        .withColumn(
            "link_density",
            F.least(
                F.col("link_chars").cast("double")
                / F.col("n_chars").cast("double"),
                F.lit(1.0),
            ),
        )
        .withColumn(
            "stop_density",
            F.when(
                F.col("n_words") > 0,
                F.col("stop_hits").cast("double")
                / F.col("n_words").cast("double"),
            ).otherwise(F.lit(0.0)),
        )
        .drop("stop_hits")
    )


def classify_blocks(
    blocks: DataFrame,
    id_col: str = "doc_id",
    max_link_density: float = MAX_LINK_DENSITY,
    min_good_words: int = MIN_GOOD_WORDS,
    min_stop_density: float = MIN_STOP_DENSITY,
) -> DataFrame:
    """jusText-style two-pass classification → ``label`` column.

    Pass 1 (map-side): bad (link-dense) / good (long + stopword-dense) /
    short. Pass 2 (one doc_id exchange, bounded window): short blocks
    adjacent to a good block become content; headings look forward only.
    """
    prov = (
        F.when(F.col("link_density") > F.lit(float(max_link_density)), "bad")
        .when(
            (F.col("n_words") >= F.lit(int(min_good_words)))
            & (F.col("stop_density") >= F.lit(float(min_stop_density))),
            "good",
        )
        .otherwise("short")
    )
    w = Window.partitionBy(id_col).orderBy("block_idx")
    b = blocks.withColumn("prov", prov)
    prev_good = F.lag("prov").over(w) == F.lit("good")
    next_good = F.lead("prov").over(w) == F.lit("good")
    label = (
        F.when(F.col("prov") == "good", "content")
        .when(F.col("prov") == "bad", "boilerplate")
        .when(
            F.col("is_heading"),
            F.when(F.coalesce(next_good, F.lit(False)), "content").otherwise(
                "boilerplate"
            ),
        )
        .otherwise(
            F.when(
                F.coalesce(prev_good, F.lit(False))
                | F.coalesce(next_good, F.lit(False)),
                "content",
            ).otherwise("boilerplate")
        )
    )
    return b.withColumn("label", label).drop("prov")


def extract_main_html(
    docs: DataFrame, id_col: str = "doc_id", html_col: str = "html", **thresholds
) -> DataFrame:
    """HTML → per-document main content: surviving blocks joined in order.

    Output: (id_col, main_text, n_blocks, n_content, content_chars,
    boiler_chars). The groupBy reuses the classify window's
    HashPartitioning(doc_id) — one exchange end-to-end.
    """
    labeled = classify_blocks(html_blocks(docs, id_col, html_col), id_col, **thresholds)
    is_content = F.col("label") == F.lit("content")
    kept = F.when(
        is_content, F.struct(F.col("block_idx"), F.col("text"))
    )
    return labeled.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(kept)), lambda s: s["text"]
            ),
            "\n",
        ).alias("main_text"),
        F.count(F.lit(1)).alias("n_blocks"),
        F.count(F.when(is_content, 1)).alias("n_content"),
        F.coalesce(
            F.sum(F.when(is_content, F.col("n_chars"))), F.lit(0)
        ).alias("content_chars"),
        F.coalesce(
            F.sum(F.when(~is_content, F.col("n_chars"))), F.lit(0)
        ).alias("boiler_chars"),
    )


# href-carrying anchors; double-quoted hrefs only (the dominant form —
# unquoted/single-quoted hrefs are skipped, not mis-parsed)
ANCHOR_HREF = (
    f'(?is)<a{WS_CLASS}[^>]*?href{WS_CLASS}*={WS_CLASS}*"([^"]*)"[^>]*>'
    f"(.*?)</a{WS_CLASS}*>"
)


def extract_links(
    docs: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """HTML → one row per outlink: (id, link_idx, href, anchor_text) —
    the web-graph construction pass (compose with
    ``operators/urls.parse_urls`` to canonicalize absolute hrefs, and
    ``operators/graph.pagerank_fixed`` for link-based ranking).

    Map-side only: one regexp_extract_all + posexplode; anchor text goes
    through the same visible-text normalization as block text.
    """
    matches = F.regexp_extract_all(
        F.coalesce(F.col(html_col), F.lit("")), F.lit(ANCHOR_HREF), F.lit(0)
    )
    return docs.select(
        F.col(id_col),
        F.posexplode(matches).alias("link_idx", "m"),
    ).select(
        F.col(id_col),
        F.col("link_idx").cast("int").alias("link_idx"),
        F.regexp_extract(F.col("m"), ANCHOR_HREF, 1).alias("href"),
        _visible_text(F.regexp_extract(F.col("m"), ANCHOR_HREF, 2)).alias(
            "anchor_text"
        ),
    )


def anchor_index(
    parsed_links: DataFrame,
    k: int = 3,
    host_col: str = "host",
    anchor_col: str = "anchor_text",
) -> DataFrame:
    """Anchor-text index: the top-``k`` anchor texts pointing at each
    host, by link count — the classic link-based topicality/spam signal
    (what the web calls a site, independent of what the site calls
    itself). Input is :func:`extract_links` output joined with its
    parsed hosts (``operators/urls.parse_urls(..., keep=('anchor_text',))``).

    Plan: one (host, anchor) hash aggregate — map-side combine shrinks
    the exchange to distinct pairs — then a row_number window
    PARTITIONED BY HOST over the already-aggregated rows (per-host
    distinct anchors are Zipf-bounded, the same justification as the
    per-doc window in textstats.top_terms). Ties break (count DESC,
    anchor ASC) so the rank is total and replayable.

    Output: (host, anchor_text, n_links, rank), rank 1-based ≤ k.
    """
    from pyspark.sql import Window

    counts = (
        parsed_links.where(
            (F.col(host_col) != "") & (F.col(anchor_col) != "")
        )
        .groupBy(F.col(host_col).alias("host"), F.col(anchor_col).alias("anchor_text"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_links"))
    )
    w = Window.partitionBy("host").orderBy(
        F.col("n_links").desc(), F.col("anchor_text").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= F.lit(int(k)))
    )


def anchor_diversity(
    parsed_links: DataFrame,
    host_col: str = "host",
    anchor_col: str = "anchor_text",
) -> DataFrame:
    """Anchor-text diversity per target host — the link-farm TEXTURE
    signal that complements :func:`anchor_index`'s top-k listing:
    organic inbound links describe a site many different ways; paid
    rings stamp the same anchor string on every link, so a host with
    many links and few distinct anchors is the classic spam shape.

    Same input contract as anchor_index (extract_links output joined
    with parsed hosts, empty host/anchor rows dropped).
    ``diversity_micro = n_distinct·1e6 DIV n_links`` — fixed-point,
    low means stamped.

    Plan: one (host, anchor) hash aggregate (map-side combine shrinks
    the exchange to distinct pairs — per-host distinct anchors are
    Zipf-bounded) + one host rollup over those pairs; the exact
    distinct count is the row count of the first aggregate, never an
    expand-based COUNT(DISTINCT) over raw links.

    Output: (host, n_links, n_distinct, diversity_micro).
    """
    pairs = (
        parsed_links.where(
            (F.col(host_col) != "") & (F.col(anchor_col) != "")
        )
        .groupBy(
            F.col(host_col).alias("host"),
            F.col(anchor_col).alias("anchor_text"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return (
        pairs.groupBy("host")
        .agg(
            F.sum("n").cast("long").alias("n_links"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
        )
        .select(
            "host",
            "n_links",
            "n_distinct",
            F.expr("(n_distinct * 1000000L) DIV greatest(n_links, 1L)")
            .cast("long")
            .alias("diversity_micro"),
        )
    )


# --- table extraction ---------------------------------------------------
# Java-regex ∩ RE2 subset like every pattern above; the q204 oracle SQL
# interpolates THESE constants — never fork them.  Lazy quantifiers keep
# each capture inside its own element; [^>]* tolerates attributes.
TABLE_RE = "(?is)<table[^>]*>(.*?)</table>"
TR_RE = "(?is)<tr[^>]*>(.*?)</tr>"
CELL_RE = "(?is)<t[dh][^>]*>(.*?)</t[dh]>"
TH_OPEN = "(?i)<th[^>]*>"


def extract_tables(
    docs: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """Parse HTML ``<table>`` markup into a row-level relation — the
    structured-data leg of the extraction family (tables are the densest
    training-data payload a crawl page carries, and the reference's
    span model has no analog for them; cf. reference
    handlers/pdf_handler.py:48 which only rasterizes).

    Per table row: the cells in order (inner tags stripped, whitespace
    collapsed, pipe-joined), the cell count, and a header flag (the row
    contains a ``<th>``).  Nested tables are NOT recursed into (the
    outer capture is lazy, so an inner ``</table>`` terminates the outer
    match — documented, deterministic, identical on both engines).

    Output: (id_col, table_idx, row_idx, is_header, n_cells, cells)
    with 1-based indexes, ordered by (id, table_idx, row_idx).

    At 100 TB: pure map-side projection — two posexplodes whose fan-out
    is bounded by the document's own markup; no exchange, no UDF.  The
    final orderBy is presentation-only (drop it when feeding a sink).
    """
    tables = docs.select(
        F.col(id_col),
        F.posexplode(
            F.expr(f"regexp_extract_all({html_col}, '{TABLE_RE}', 1)")
        ).alias("tpos", "thtml"),
    )
    rows = tables.select(
        id_col,
        (F.col("tpos") + 1).cast("long").alias("table_idx"),
        F.posexplode(
            F.expr(f"regexp_extract_all(thtml, '{TR_RE}', 1)")
        ).alias("rpos", "rhtml"),
    )
    cells = F.expr(f"regexp_extract_all(rhtml, '{CELL_RE}', 1)")
    clean = F.transform(
        cells,
        lambda c: F.trim(
            F.regexp_replace(F.regexp_replace(c, TAG, ""), f"{WS_CLASS}+", " ")
        ),
    )
    return rows.select(
        id_col,
        "table_idx",
        (F.col("rpos") + 1).cast("long").alias("row_idx"),
        (F.expr(f"rhtml rlike '{TH_OPEN}'")).alias("is_header"),
        F.size(cells).cast("long").alias("n_cells"),
        F.coalesce(F.array_join(clean, "|"), F.lit("")).alias("cells"),
    ).orderBy(id_col, "table_idx", "row_idx")
