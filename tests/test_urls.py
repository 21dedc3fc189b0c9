"""URL normalization semantics (operators/urls)."""

from __future__ import annotations

import pytest

from document_quality_assessment_ocr_spark.operators.urls import host_stats, parse_urls


@pytest.fixture(scope="module")
def parsed(spark):
    urls = [
        (1, "https://WWW.Example.COM:443/A/B/?id=9&utm_source=x&utm_medium=y#frag"),
        (2, "http://example.com:80"),
        (3, "https://example.com:80/x"),  # :80 is NOT https's default → kept
        (4, "http://sub.example.com/p/?ref=tw"),
        (5, "garbage with no scheme"),
        (6, "https://example.com/a/b?z=1&a=2"),
        (7, "https://example.com/a/b?a=2&z=1"),  # param order canonicalized
        (8, None),
    ]
    df = spark.createDataFrame(urls, "doc_id long, url string")
    return {r["doc_id"]: r for r in parse_urls(df).collect()}


def test_canonicalization(parsed):
    assert parsed[1]["host"] == "example.com"
    assert parsed[1]["path"] == "/a/b"
    assert parsed[1]["query_clean"] == "id=9"
    assert parsed[1]["url_norm"] == "https://example.com/a/b?id=9"


def test_default_port_is_scheme_aware(parsed):
    assert parsed[2]["host"] == "example.com"
    assert parsed[2]["path"] == "/"
    assert parsed[3]["host"] == "example.com:80"


def test_tracking_only_query_drops_question_mark(parsed):
    assert parsed[4]["url_norm"] == "http://sub.example.com/p"


def test_unparseable_is_data_not_error(parsed):
    assert parsed[5]["scheme"] == "" and parsed[5]["url_norm"] is None
    assert parsed[8]["url_norm"] is None


def test_param_sort_makes_urls_identical(parsed):
    assert parsed[6]["url_norm"] == parsed[7]["url_norm"]


def test_host_stats_counts_dups(spark):
    df = spark.createDataFrame(
        [
            (1, "https://a.com/x?b=1&a=1"),
            (2, "https://a.com/x?a=1&b=1"),
            (3, "https://a.com/y"),
            (4, "https://b.com/"),
            (5, "no scheme"),
        ],
        "doc_id long, url string",
    )
    rows = {r["host"]: r for r in host_stats(parse_urls(df)).collect()}
    assert set(rows) == {"a.com", "b.com"}
    assert rows["a.com"]["n_docs"] == 3
    assert rows["a.com"]["n_urls"] == 2
    assert rows["a.com"]["n_dup_docs"] == 1
    assert rows["a.com"]["first_doc"] == 1
