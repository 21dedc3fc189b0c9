"""URL normalization and host-level rollups — the web-corpus curation
front door (canonical URLs drive exact dedup; host aggregates drive
domain-level quality policies and spam caps).

Pure Column expressions over shared Java-regex ∩ RE2 constants (the
DuckDB oracle interpolates THESE — never fork them). Parsing and
normalization are map-side projections (zero exchanges, pipelined into
the scan); ``host_stats`` is one hash aggregate on the host key — skewed
mega-hosts are exactly the per-group-cap case ``operators/sampling``
already covers.

Normalization rules (canonical, lossless for dedup purposes):
  scheme/host lowercased; leading ``www.`` dropped; default port for the
  scheme dropped; fragment dropped; tracking params (``utm_*``,
  ``fbclid``, ``gclid``, ``ref``) removed; remaining query params sorted;
  trailing slashes collapsed (root stays ``/``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import WS_CLASS

# one pass: scheme://host path(until ? or #) — groups 1/2/3.  Matches the
# ORIGINAL-case url (scheme letters either case); callers lowercase only
# scheme/host afterwards — path/query case is significant on many servers.
URL_PARTS = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)"
QUERY_PART = "\\?([^#]*)"  # group 1: query without the leading ?
TRACKING_PARAM = "(?i)^(utm_[a-z]+|fbclid|gclid|ref)="
WWW_PREFIX = "^www\\."
TRAILING_SLASH = "/+$"

DEFAULT_PORTS = {"http": ":80", "https": ":443"}


def _clean_query(url: Column) -> Column:
    # original case preserved — query values are case-significant; the
    # tracking-param pattern carries its own (?i)
    raw = F.regexp_extract(url, QUERY_PART, 1)
    kept = F.filter(
        F.split(raw, "&"),
        lambda p: (p != F.lit(""))
        & ~p.rlike(TRACKING_PARAM),
    )
    return F.array_join(F.array_sort(kept), "&")


def parse_urls(
    docs: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """URL column → (id, url, scheme, host, path, query_clean, url_norm)
    (+ any ``keep`` columns passed through untouched — parse_urls is a
    pure projection, one output row per input row).

    Only scheme and host are lowercased (per the module contract); path
    and query keep their original case — ``/About`` and ``/about`` stay
    distinct canonical URLs.  Unparseable URLs (no ``scheme://``) yield
    empty scheme/host and a NULL ``url_norm`` — errors-as-data, never a
    dropped row.
    """
    url = F.col(url_col)
    scheme = F.lower(F.regexp_extract(url, URL_PARTS, 1))
    host0 = F.regexp_replace(F.lower(F.regexp_extract(url, URL_PARTS, 2)), WWW_PREFIX, "")
    host = host0
    for sch, port in DEFAULT_PORTS.items():
        host = F.when(
            (scheme == F.lit(sch)) & F.endswith(host0, F.lit(port)),
            F.substring(host0, 1, F.length(host0) - len(port)),
        ).otherwise(host)
    path0 = F.regexp_replace(F.regexp_extract(url, URL_PARTS, 3), TRAILING_SLASH, "")
    path = F.when(path0 == "", F.lit("/")).otherwise(path0)
    qc = _clean_query(F.col(url_col))
    url_norm = F.when(
        scheme == "",
        F.lit(None).cast("string"),
    ).otherwise(
        F.concat(
            scheme,
            F.lit("://"),
            host,
            path,
            F.when(qc == "", F.lit("")).otherwise(F.concat(F.lit("?"), qc)),
        )
    )
    return docs.select(
        F.col(id_col),
        F.col(url_col).alias("url"),
        scheme.alias("scheme"),
        host.alias("host"),
        path.alias("path"),
        qc.alias("query_clean"),
        url_norm.alias("url_norm"),
        *[F.col(c) for c in keep],
    )


def host_stats(parsed: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-host rollup over parsed URLs: document count, distinct canonical
    URLs, duplicate-URL count (docs sharing a canonical URL — the host's
    exact-dup pressure). One hash aggregate."""
    p = parsed.where(F.col("host") != "")
    return p.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("url_norm").alias("n_urls"),
        (F.count(F.lit(1)) - F.countDistinct("url_norm")).alias("n_dup_docs"),
        F.min(id_col).alias("first_doc"),
    )


def prefix_block_join(
    parsed: DataFrame,
    rules: DataFrame,
    id_col: str = "doc_id",
    max_depth: int = 8,
    default_action: str = "allow",
) -> DataFrame:
    """Longest-prefix policy match (robots.txt / domain-blocklist shape):
    each URL takes the action of the most specific matching rule
    ``(host, path_prefix, action)``; no match → ``default_action``.

    Scale design: NEVER a starts-with theta join (per-host quadratic).
    The URL's path explodes into its ancestor prefixes (bounded by
    ``max_depth``) and matches rules by plain equi-join on
    ``(host, prefix)``; the winner is an algebraic max_by on prefix
    length — so the big side costs one bounded explode + one equi-join,
    and a small rule set broadcasts. Rules are first deduped on
    ``(host, path_prefix)`` least-restrictive (MIN(action) — allow wins,
    matching ``parse_robots``), so two same-length matches are
    necessarily the same (prefix, action) and the winner is unique; the
    full (length, prefix) order key keeps replay deterministic anyway.

    ``rules.path_prefix`` must be normalized like ``parsed.path``
    (leading slash, no trailing slash; root = '/').

    Output: parsed columns + (matched_prefix, action).
    """
    parts = F.split(F.col("path"), "/")  # '/a/b' → ['', 'a', 'b']
    prefixes = F.array_union(
        F.array(F.lit("/")),
        F.filter(
            F.transform(
                # sequence() counts DOWN when stop < start — guard the
                # degenerate empty-path case with an explicit empty array
                F.when(
                    F.size(parts) >= 2,
                    F.sequence(
                        F.lit(1),
                        F.least(F.size(parts) - 1, F.lit(int(max_depth))),
                    ),
                ).otherwise(F.array().cast("array<int>")),
                lambda i: F.array_join(F.slice(parts, 1, i + 1), "/"),
            ),
            lambda p: p != F.lit(""),
        ),
    )
    ex = parsed.where(F.col("host") != "").select(
        F.col(id_col), F.col("host"), F.explode(prefixes).alias("prefix")
    )
    hits = ex.join(
        F.broadcast(
            rules.select(
                "host", F.col("path_prefix").alias("prefix"), "action"
            )
            # caller-supplied duplicate (host, prefix) rows with
            # conflicting actions would make max_by nondeterministic —
            # collapse least-restrictive first (allow < deny)
            .groupBy("host", "prefix")
            .agg(F.min("action").alias("action"))
        ),
        ["host", "prefix"],
    )
    win = hits.groupBy(id_col).agg(
        F.max_by(
            F.struct(F.col("prefix").alias("prefix"), F.col("action").alias("action")),
            F.struct(F.length("prefix"), F.col("prefix")),
        ).alias("_w")
    )
    return parsed.join(win, id_col, "left").select(
        *[F.col(c) for c in parsed.columns],
        F.col("_w.prefix").alias("matched_prefix"),
        F.coalesce(F.col("_w.action"), F.lit(default_action)).alias("action"),
    )


ROBOTS_LINE = f"(?i)^(user-agent|allow|disallow){WS_CLASS}*:{WS_CLASS}*(.*)$"


def parse_robots(
    df: DataFrame, host_col: str = "host", txt_col: str = "robots_txt"
) -> DataFrame:
    """robots.txt → the ``(host, path_prefix, action)`` rule table
    ``prefix_block_join`` consumes, honoring the wildcard agent group.

    Grammar subset (the fetch-policy core): ``User-agent:`` opens a
    group; ``Allow:``/``Disallow:`` lines bind to the MOST RECENT group
    (carry-forward window per host — line order matters, so the parse
    keys on line number); only the ``*`` group is kept; empty Disallow
    (allow-all) and comment/blank lines drop; prefixes normalize like
    ``parse_urls`` paths (no trailing slash, root = '/'); duplicate
    (host, prefix) rules resolve least-restrictive (allow wins) so the
    downstream longest-prefix winner stays total.

    One exchange on host (bounded per-host line windows).
    """
    from pyspark.sql import Window

    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(
            F.split(F.coalesce(F.col(txt_col), F.lit("")), "\n")
        ).alias("line_no", "line"),
    ).select(
        "host",
        "line_no",
        F.lower(F.regexp_extract(F.trim(F.col("line")), ROBOTS_LINE, 1)).alias("key"),
        F.trim(F.regexp_extract(F.trim(F.col("line")), ROBOTS_LINE, 2)).alias("val"),
    )
    w = (
        Window.partitionBy("host")
        .orderBy("line_no")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grp = F.last(
        F.when(F.col("key") == "user-agent", F.col("val")), ignorenulls=True
    ).over(w)
    rules = (
        lines.withColumn("grp", grp)
        .where(
            F.col("key").isin("allow", "disallow")
            & (F.col("grp") == "*")
            & (F.col("val") != "")
        )
        .select(
            "host",
            F.when(
                F.regexp_replace("val", TRAILING_SLASH, "") == "", F.lit("/")
            )
            .otherwise(F.regexp_replace("val", TRAILING_SLASH, ""))
            .alias("path_prefix"),
            F.when(F.col("key") == "allow", "allow").otherwise("deny").alias("action"),
        )
    )
    return rules.groupBy("host", "path_prefix").agg(
        F.min("action").alias("action")  # 'allow' < 'deny' → allow wins
    )


def prefix_compression_profile(
    urls: DataFrame,
    host_col: str = "host",
    url_col: str = "url_norm",
    cap: int = 64,
) -> DataFrame:
    """Per-host front-coding savings estimate — how many bytes a
    sorted-run delta encoding of the URL column would save (the
    index/frontier storage planner: crawl frontiers and URL indexes are
    stored front-coded precisely because same-host URLs share long
    prefixes).

    Within each host, URLs sort ascending and each row measures the
    common prefix with its predecessor on a ``cap``-char window — the
    LCP is ``count of i in 1..m where prefix_i(url) == prefix_i(prev)``
    (prefix equality is monotone, so the count IS the LCP; O(cap²)
    char compares per row is the deliberate scale contract, the q122
    levenshtein-prefix-cap pattern). First row per host saves 0 (via
    ``COALESCE(prev, '')``; an empty-string predecessor also guards the
    descending-``sequence`` trap on empty bounds).

    Scale shape: ONE per-host window (bounded by a host's URL count —
    the natural shard key of every real URL store, never a global sort)
    + one per-host rollup. NULL urls drop (unparseable rows carry NULL
    ``url_norm`` — errors-as-data upstream, not this planner's input).

    Output: (host, n_urls, total_chars, saved_chars, saved_micro)
    where saved_micro = saved·1e6 DIV max(total, 1).
    """
    from pyspark.sql import Window

    if cap < 1:
        raise ValueError("cap must be >= 1")
    base = urls.select(
        F.col(host_col).alias("host"), F.col(url_col).alias("u")
    ).where(F.col("u").isNotNull())
    w = Window.partitionBy("host").orderBy(F.col("u").asc())
    prev = F.coalesce(F.lag("u").over(w), F.lit(""))
    lcp = F.expr(
        f"size(filter(sequence(1, greatest(least(length(u), length(_prev),"
        f" {int(cap)}), 1)), i -> substring(u, 1, i) = substring(_prev, 1, i)))"
    )
    per_row = base.select(
        "host", F.length("u").cast("long").alias("len"), prev.alias("_prev"), "u"
    ).select("host", "len", lcp.cast("long").alias("lcp"))
    return (
        per_row.groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.sum("len").cast("long").alias("total_chars"),
            F.sum("lcp").cast("long").alias("saved_chars"),
        )
        .select(
            "host",
            "n_urls",
            "total_chars",
            "saved_chars",
            F.expr("(saved_chars * 1000000L) DIV greatest(total_chars, 1L)")
            .cast("long")
            .alias("saved_micro"),
        )
    )


def url_depth_profile(
    urls: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Per-host URL shape profile — path depth × file extension counts,
    the crawl-sanity dashboard (a host whose depth histogram suddenly
    grows a deep tail is a crawler trap / calendar spider; an extension
    mix shifting to binaries means the crawl left the HTML zone).

    Depth = number of '/' separators in the normalized path (parse_urls
    guarantees a leading '/', no trailing '/', so '/' is depth 1 — the
    root); counted by the shared length-minus-stripped idiom.
    Extension = the final '.suffix' of the last segment ([a-z0-9]{1,5},
    case-normalized), '' when none — the cross-engine regex contract.

    Scale shape: one map-side projection + ONE aggregate on the
    (host, depth, ext) grid — bounded by hosts × ~dozen depths × a few
    extensions, never URL count.

    Output: (host, depth, ext, n_urls) ordered by (host, depth, ext).
    """
    p = F.coalesce(F.col(path_col), F.lit("/"))
    depth = (
        F.length(p) - F.length(F.regexp_replace(p, "/", ""))
    ).cast("long")
    ext = F.lower(F.regexp_extract(p, r"\.([A-Za-z0-9]{1,5})$", 1))
    return (
        urls.where(F.col(host_col) != "")
        .select(
            F.col(host_col).alias("host"),
            depth.alias("depth"),
            ext.alias("ext"),
        )
        .groupBy("host", "depth", "ext")
        .agg(F.count(F.lit(1)).cast("long").alias("n_urls"))
        .orderBy("host", "depth", "ext")
    )


def mirror_pairs(
    pages: DataFrame,
    min_shared: int = 2,
    max_hosts_per_path: int = 8,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Mirror-host detection: host pairs serving many IDENTICAL paths —
    the classic crawl-waste pattern (mirrors, CDN vanity domains, parked
    duplicates) that URL-level dedup cannot see because every URL is
    distinct. Pairs with high path containment are crawl-once
    candidates; their docs are prime near-dup suspects.

    The heavy-path cap is the scale contract: a path carried by more
    than ``max_hosts_per_path`` hosts (``/``, ``/index.html``,
    ``/robots.txt``) is dropped BEFORE the self-join, so per-path
    fan-out is ≤ cap and the pair join is O(paths · cap²) — never
    O(paths · hosts²). Containment is min-normalized over each host's
    CAPPED path set (both sides of the ratio see the same universe):
    ``containment_micro = shared·1e6 DIV least(n1, n2)`` (non-negative
    → DIV == ``//``).

    Plan: distinct (host, path) → md5 path key → per-path host-count
    filter (the cap) → self-equi-join on the key (host1 < host2) →
    pair aggregate + two per-host count joins. No window, no collect.

    Output: (host1, host2, shared_paths, n_paths1, n_paths2,
    containment_micro) ordered by (containment_micro DESC, host1,
    host2) — driver-readable, pair-bounded.
    """
    hp = (
        pages.where(
            F.col(host_col).isNotNull() & (F.col(host_col) != F.lit(""))
        )
        .select(
            F.col(host_col).alias("h"),
            F.md5(F.coalesce(F.col(path_col), F.lit(""))).alias("pk"),
        )
        .distinct()
    )
    light = hp.join(
        hp.groupBy("pk")
        .agg(F.count(F.lit(1)).cast("long").alias("nh"))
        .where(F.col("nh") <= F.lit(int(max_hosts_per_path)))
        .select("pk"),
        "pk",
    )
    per_host = light.groupBy("h").agg(
        F.count(F.lit(1)).cast("long").alias("n_paths")
    )
    a = light.select(F.col("pk"), F.col("h").alias("host1"))
    b = light.select(F.col("pk"), F.col("h").alias("host2"))
    shared = (
        a.join(b, "pk")
        .where(F.col("host1") < F.col("host2"))
        .groupBy("host1", "host2")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_paths"))
        .where(F.col("shared_paths") >= F.lit(int(min_shared)))
    )
    return (
        shared.join(
            per_host.withColumnRenamed("h", "host1").withColumnRenamed(
                "n_paths", "n_paths1"
            ),
            "host1",
        )
        .join(
            per_host.withColumnRenamed("h", "host2").withColumnRenamed(
                "n_paths", "n_paths2"
            ),
            "host2",
        )
        .select(
            "host1",
            "host2",
            "shared_paths",
            "n_paths1",
            "n_paths2",
            F.expr(
                "(shared_paths * 1000000L) DIV least(n_paths1, n_paths2)"
            ).cast("long").alias("containment_micro"),
        )
        .orderBy(F.col("containment_micro").desc(), "host1", "host2")
    )
