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
    # scheme/host lowercase; path keeps its original case (case-significant
    # on many servers — lowercasing would over-merge /About with /about)
    assert parsed[1]["path"] == "/A/B"
    assert parsed[1]["query_clean"] == "id=9"
    assert parsed[1]["url_norm"] == "https://example.com/A/B?id=9"


def test_path_case_is_preserved(spark):
    df = spark.createDataFrame(
        [(1, "https://a.com/About"), (2, "https://a.com/about")],
        "doc_id long, url string",
    )
    rows = {r["doc_id"]: r for r in parse_urls(df).collect()}
    assert rows[1]["url_norm"] != rows[2]["url_norm"]


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


def test_prefix_block_longest_match_wins(spark):
    from document_quality_assessment_ocr_spark.operators.urls import prefix_block_join

    urls = [
        (1, "https://a.com/private/x/y"),   # /private deny
        (2, "https://a.com/private/ok/z"),  # /private/ok allow (longer wins)
        (3, "https://a.com/public"),        # '/' allow rule
        (4, "https://b.com/anything"),      # no rule for host → default
        (5, "nonsense"),                    # unparseable → default, no match
    ]
    df = parse_urls(spark.createDataFrame(urls, "doc_id long, url string"))
    rules = spark.createDataFrame(
        [
            ("a.com", "/", "allow"),
            ("a.com", "/private", "deny"),
            ("a.com", "/private/ok", "allow"),
        ],
        "host string, path_prefix string, action string",
    )
    out = {r["doc_id"]: r for r in prefix_block_join(df, rules).collect()}
    assert out[1]["action"] == "deny" and out[1]["matched_prefix"] == "/private"
    assert out[2]["action"] == "allow" and out[2]["matched_prefix"] == "/private/ok"
    assert out[3]["action"] == "allow" and out[3]["matched_prefix"] == "/"
    assert out[4]["action"] == "allow" and out[4]["matched_prefix"] is None
    assert out[5]["action"] == "allow" and out[5]["matched_prefix"] is None


def test_prefix_block_depth_cap(spark):
    from document_quality_assessment_ocr_spark.operators.urls import prefix_block_join

    df = parse_urls(
        spark.createDataFrame(
            [(1, "https://a.com/1/2/3/4")], "doc_id long, url string"
        )
    )
    rules = spark.createDataFrame(
        [("a.com", "/1/2/3/4", "deny")],
        "host string, path_prefix string, action string",
    )
    # depth cap below the rule's specificity → rule cannot match
    capped = prefix_block_join(df, rules, max_depth=2).collect()[0]
    assert capped["action"] == "allow"
    full = prefix_block_join(df, rules, max_depth=8).collect()[0]
    assert full["action"] == "deny"


def test_parse_robots(spark):
    from document_quality_assessment_ocr_spark.operators.urls import parse_robots

    txt = "\n".join([
        "# policy",
        "User-agent: badbot",
        "Disallow: /",
        "",
        "User-agent: *",
        "Disallow: /private/",
        "Allow: /private/ok",
        "Disallow:",              # empty → allow-all, ignored
        "disallow: /tmp",          # case-insensitive key
        "Allow: /dup",
        "Disallow: /dup",          # same prefix both ways → allow wins
        "not a rule line",
    ])
    df = spark.createDataFrame([("a.com", txt), ("b.com", None)],
                               "host string, robots_txt string")
    rules = {(r["host"], r["path_prefix"]): r["action"]
             for r in parse_robots(df).collect()}
    assert rules == {
        ("a.com", "/private"): "deny",
        ("a.com", "/private/ok"): "allow",
        ("a.com", "/tmp"): "deny",
        ("a.com", "/dup"): "allow",
    }


def test_parse_robots_feeds_prefix_join(spark):
    from document_quality_assessment_ocr_spark.operators.urls import (
        parse_robots,
        prefix_block_join,
    )

    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /private/\nAllow: /private/ok")],
        "host string, robots_txt string",
    )
    urls = parse_urls(spark.createDataFrame(
        [(1, "https://a.com/private/x"), (2, "https://a.com/private/ok/y"),
         (3, "https://a.com/public")],
        "doc_id long, url string",
    ))
    out = {r["doc_id"]: r["action"]
           for r in prefix_block_join(urls, parse_robots(robots)).collect()}
    assert out == {1: "deny", 2: "allow", 3: "allow"}


def test_prefix_block_plan_shape(spark):
    """Rules broadcast into the prefix equi-join (never a shuffled theta
    join); the only hash exchanges serve the winner aggregate + re-attach."""
    df = parse_urls(
        spark.createDataFrame(
            [(i, f"https://a.com/p{i % 7}/x") for i in range(50)],
            "doc_id long, url string",
        )
    )
    from document_quality_assessment_ocr_spark.operators.urls import (
        prefix_block_join,
    )

    rules = spark.createDataFrame(
        [("a.com", "/p1", "deny")], "host string, path_prefix string, action string"
    )
    plan = (
        prefix_block_join(df, rules)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
    # the (host, prefix) rules join must never be a shuffled join; the
    # doc_id re-attach of the aggregated winners may shuffle
    assert "SortMergeJoin [host" not in plan, plan
