"""HTML boilerplate strip / DOM heuristics (operators/html.py).

Rule-by-rule classification semantics on crafted pages, main-content
assembly, null/edge handling, and plan shape (decomposition is map-side;
the whole extraction costs ONE doc_id exchange)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_quality_assessment_ocr_spark.operators.html import (
    classify_blocks,
    extract_main_html,
    html_blocks,
)

GOOD_P = (
    "<p>The quick brown fox is in the yard and it is that kind of day for "
    "a walk in the park, it is fine.</p>"
)


def _page(body: str) -> str:
    return (
        "<html><head><title>T</title><style>p{color:red}</style>"
        "<script>var x = '<p>not a block</p>';</script></head>"
        f"<body>{body}</body></html>"
    )


def _blocks(spark, html):
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    return {
        r["text"]: r
        for r in classify_blocks(html_blocks(df)).collect()
    }


def test_head_script_style_comments_stripped(spark):
    rows = _blocks(
        spark,
        _page("<!-- <p>comment</p> -->" + GOOD_P + "<style>h1{}</style>"),
    )
    assert list(rows) == [GOOD_P[3:-4]]  # only the paragraph text survives


def test_link_dense_block_is_boilerplate(spark):
    # long AND stopword-dense, but entirely anchor text → bad beats good
    linky = (
        '<div><a href="/x">The quick brown fox is in the yard and it is '
        "that kind of day for a walk in the park</a></div>"
    )
    rows = _blocks(spark, _page(linky + GOOD_P))
    r = rows["The quick brown fox is in the yard and it is that kind of day for a walk in the park"]
    assert r["label"] == "boilerplate" and r["link_density"] == 1.0


def test_short_promoted_by_adjacent_good(spark):
    rows = _blocks(spark, _page(GOOD_P + "<p>Short note.</p>"))
    assert rows["Short note."]["label"] == "content"
    rows = _blocks(spark, _page("<p>Lonely short.</p><p>Another short.</p>"))
    assert rows["Lonely short."]["label"] == "boilerplate"
    assert rows["Another short."]["label"] == "boilerplate"


def test_heading_looks_forward_only(spark):
    # heading BEFORE good → content; heading AFTER good (next is short) → boiler
    rows = _blocks(
        spark, _page("<h1>Title ahead</h1>" + GOOD_P + "<h2>Trailing head</h2>")
    )
    assert rows["Title ahead"]["is_heading"]
    assert rows["Title ahead"]["label"] == "content"
    assert rows["Trailing head"]["label"] == "boilerplate"
    # plain short in the same trailing position IS promoted (lag == good)
    rows = _blocks(spark, _page(GOOD_P + "<p>Trailing short</p>"))
    assert rows["Trailing short"]["label"] == "content"


def test_inline_tags_and_entities(spark):
    rows = _blocks(
        spark,
        _page("<p>Bold <b>text</b> &amp; <i>italics</i> &lt;kept&gt;</p>" + GOOD_P),
    )
    assert "Bold text & italics <kept>" in rows
    r = rows["Bold text & italics <kept>"]
    assert r["n_words"] == 5 and r["link_chars"] == 0


def test_link_chars_counts_anchor_text_only(spark):
    rows = _blocks(
        spark, _page('<p>Click <a href="/h">here now</a> for more info today ok</p>')
    )
    r = rows["Click here now for more info today ok"]
    assert r["link_chars"] == len("here now")
    assert 0.0 < r["link_density"] < 1.0 / 3.0


def test_null_and_empty_html(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "<div></div>")], "doc_id long, html string"
    )
    assert html_blocks(df).count() == 0
    out = {r["doc_id"]: r for r in extract_main_html(df).collect()}
    assert out == {}  # no blocks → no rows (documents with no text at all)


def test_extract_main_assembles_in_order(spark):
    html = _page(
        '<div class="nav"><a href="/">Home</a><a href="/a">About</a></div>'
        "<h2>Head</h2>" + GOOD_P + "<p>Short tail.</p>"
    )
    df = spark.createDataFrame([(7, html)], "doc_id long, html string")
    r = extract_main_html(df).collect()[0]
    assert r["main_text"].split("\n") == [
        "Head",
        GOOD_P[3:-4],
        "Short tail.",
    ]
    assert r["n_blocks"] == 4 and r["n_content"] == 3
    assert r["boiler_chars"] == len("HomeAbout") + 1  # 'Home About'


def test_marker_bytes_in_input_are_inert(spark):
    rows = _blocks(spark, _page(f"<p>pre\x1emid\x1fpost</p>" + GOOD_P))
    assert "premidpost" in rows  # separators stripped, block not split


def test_plan_shape(spark):
    df = spark.createDataFrame([(1, _page(GOOD_P))], "doc_id long, html string")
    # decomposition + featurisation: pure map-side, zero exchanges
    plan = html_blocks(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    # full extraction: exactly one hash exchange (doc_id), reused by the
    # classify window AND the assembly groupBy
    plan = (
        extract_main_html(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_extract_links(spark):
    from document_quality_assessment_ocr_spark.operators.html import extract_links

    html = (
        '<p><a href="/a">First <b>link</b></a> then '
        "<a href='/sq'>single-quoted skipped</a> and "
        '<a class="x" href="https://b.com/c?q=1">Second &amp; last</a>'
        " and <a>no href skipped</a></p>"
    )
    df = spark.createDataFrame([(1, html), (2, None)], "doc_id long, html string")
    rows = extract_links(df).orderBy("link_idx").collect()
    assert [(r["href"], r["anchor_text"]) for r in rows] == [
        ("/a", "First link"),
        ("https://b.com/c?q=1", "Second & last"),
    ]
    assert all(r["doc_id"] == 1 for r in rows)


def test_anchor_index(spark):
    """Top-k anchors per host by link count; empty hosts/anchors drop;
    ties break (count DESC, anchor ASC); rank never exceeds k."""
    import pyspark.sql.functions as F

    from document_quality_assessment_ocr_spark.operators.html import (
        anchor_index,
        extract_links,
    )
    from document_quality_assessment_ocr_spark.operators.urls import parse_urls

    html = (
        '<a href="https://a.com/x">Home</a><a href="https://a.com/y">Home</a>'
        '<a href="https://a.com/z">Docs</a><a href="https://b.com/">B</a>'
        '<a href="/relative">Rel</a><a href="https://a.com/e"></a>'
    )
    d = spark.createDataFrame([(1, html)], "doc_id long, html string")
    links = extract_links(d)
    parsed = parse_urls(
        links.select("doc_id", F.col("href").alias("url"), "anchor_text"),
        keep=("anchor_text",),
    )
    out = {(r["host"], r["anchor_text"]): (r["n_links"], r["rank"])
           for r in anchor_index(parsed, k=2).collect()}
    assert out == {("a.com", "Home"): (2, 1), ("a.com", "Docs"): (1, 2),
                   ("b.com", "B"): (1, 1)}
