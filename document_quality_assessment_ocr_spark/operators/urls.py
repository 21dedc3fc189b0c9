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

# one pass: scheme://host path(until ? or #) — groups 1/2/3
URL_PARTS = "^([a-z][a-z0-9+.-]*)://([^/?#]*)([^?#]*)"
QUERY_PART = "\\?([^#]*)"  # group 1: query without the leading ?
TRACKING_PARAM = "^(utm_[a-z]+|fbclid|gclid|ref)="
WWW_PREFIX = "^www\\."
TRAILING_SLASH = "/+$"

DEFAULT_PORTS = {"http": ":80", "https": ":443"}


def _clean_query(url: Column) -> Column:
    raw = F.regexp_extract(F.lower(url), QUERY_PART, 1)
    kept = F.filter(
        F.split(raw, "&"),
        lambda p: (p != F.lit(""))
        & ~p.rlike(TRACKING_PARAM),
    )
    return F.array_join(F.array_sort(kept), "&")


def parse_urls(
    docs: DataFrame, id_col: str = "doc_id", url_col: str = "url"
) -> DataFrame:
    """URL column → (id, url, scheme, host, path, query_clean, url_norm).

    Unparseable URLs (no ``scheme://``) yield empty scheme/host and a NULL
    ``url_norm`` — errors-as-data, never a dropped row.
    """
    lurl = F.lower(F.col(url_col))
    scheme = F.regexp_extract(lurl, URL_PARTS, 1)
    host0 = F.regexp_replace(F.regexp_extract(lurl, URL_PARTS, 2), WWW_PREFIX, "")
    host = host0
    for sch, port in DEFAULT_PORTS.items():
        host = F.when(
            (scheme == F.lit(sch)) & F.endswith(host0, F.lit(port)),
            F.substring(host0, 1, F.length(host0) - len(port)),
        ).otherwise(host)
    path0 = F.regexp_replace(F.regexp_extract(lurl, URL_PARTS, 3), TRAILING_SLASH, "")
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
