"""THE correctness gate (BASELINE.json invariant): the Spark pipeline's
per-document output — accepted, reasons, warnings, and the surviving span
sequence ``(kind, text, media_ref, order)`` — must equal the pure-Python
oracle byte-for-byte, on the full fixture corpus, under both the shipped
config and the tiered variant."""

import pytest

from document_quality_assessment_ocr_spark import oracle
from document_quality_assessment_ocr_spark.config import default_criteria, tiered_criteria
from document_quality_assessment_ocr_spark.plans.pipeline import run_extraction
from document_quality_assessment_ocr_spark.sources import fixtures, tables


def _compare(spark, corpus_dir, criteria, n_docs, seed, size, mega, max_media=None):
    spans, pay = tables.read_corpus(spark, corpus_dir)
    got = {
        r["doc_id"]: r.asDict(recursive=True)
        for r in run_extraction(
            spans, pay, criteria=criteria, max_media_spans=max_media
        ).collect()
    }
    exp = oracle.evaluate_corpus(
        fixtures.build_corpus(n_docs=n_docs, seed=seed, mega_spans=mega),
        fixtures.build_payloads(seed=seed, size=size),
        criteria,
        max_media_spans=max_media,
    )
    assert set(got) == set(exp)
    for doc_id, e in exp.items():
        g = got[doc_id]
        assert g["accepted"] == e["accepted"], (doc_id, g["reasons"], e["reasons"])
        assert g["reasons"] == e["reasons"], doc_id
        assert g["warnings"] == e["warnings"], doc_id
        gs = [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in g["spans"]]
        es = [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in e["spans"]]
        assert gs == es, doc_id


@pytest.mark.slow
def test_parity_default_config(spark, small_corpus_dir):
    _compare(spark, small_corpus_dir, default_criteria(), 12, 7, (800, 1000), 80)


@pytest.mark.slow
def test_parity_tiered_config(spark, small_corpus_dir):
    _compare(spark, small_corpus_dir, tiered_criteria(), 12, 7, (800, 1000), 80)


@pytest.mark.slow
def test_parity_page_budget(spark, small_corpus_dir):
    # reference's 3-page budget analog (pdf_handler.py:65)
    _compare(spark, small_corpus_dir, default_criteria(), 12, 7, (800, 1000), 80, max_media=3)


@pytest.mark.slow
def test_split_mega_docs_identical(spark, small_corpus_dir):
    """Skew mitigation is semantics-free: chunking oversized spans arrays
    across rows yields byte-identical extraction output."""
    from document_quality_assessment_ocr_spark.operators.dedup import dedup_last_wins
    from document_quality_assessment_ocr_spark.operators.salting import (
        split_oversized_docs,
    )

    spans, pay = tables.read_corpus(spark, small_corpus_dir)
    uniq = dedup_last_wins(spans, "doc_id", "ingest_seq")
    split = split_oversized_docs(uniq, max_spans_per_row=7)
    assert split.count() > uniq.count()  # the mega-doc actually split

    def res(df):
        return {
            (
                r["doc_id"],
                r["accepted"],
                tuple(r["reasons"]),
                tuple((s["kind"], s["text"], s["media_ref"], s["order"]) for s in r["spans"]),
            )
            for r in run_extraction(df, pay, assume_unique_doc_ids=True).collect()
        }

    assert res(split) == res(uniq)


def test_partdoc_mode_identical(spark, small_corpus_dir):
    """Part-doc mode (round-5: two-level aggregation, per-part bounded sort,
    flatten-by-part_idx ordered re-merge) is semantics-free: byte-identical
    verdict + span sequence vs the single-Exchange plan, even at a part size
    small enough that every multi-span doc splits."""
    from document_quality_assessment_ocr_spark.operators.dedup import dedup_last_wins

    spans, pay = tables.read_corpus(spark, small_corpus_dir)
    uniq = dedup_last_wins(spans, "doc_id", "ingest_seq")

    def res(df, **kw):
        return {
            (
                r["doc_id"],
                r["accepted"],
                tuple(r["reasons"]),
                tuple(r["warnings"]),
                tuple((s["kind"], s["text"], s["media_ref"], s["order"]) for s in r["spans"]),
            )
            for r in run_extraction(df, pay, assume_unique_doc_ids=True, **kw).collect()
        }

    assert res(uniq, partdoc_max_spans=3) == res(uniq)
    # contract errors, not silent wrong answers
    with pytest.raises(ValueError):
        run_extraction(spans, pay, partdoc_max_spans=3)
    with pytest.raises(ValueError):
        run_extraction(
            uniq, pay, assume_unique_doc_ids=True, partdoc_max_spans=3, max_media_spans=3
        )


@pytest.mark.slow
def test_duplicate_offset_tiebreak_parity(spark, small_corpus_dir, tmp_path):
    """Duplicate offsets (undefined by the input contract) must still resolve
    identically: both sides totally order spans by (offset, kind, text,
    media_ref)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    spans_rows = [
        {
            "doc_id": "dup_off",
            "skip_checks": False,
            "ingest_seq": 0,
            "spans": [
                {"kind": "text", "text": "zz aa bb cc dd", "media_ref": "", "offset": 5},
                {"kind": "media", "text": "", "media_ref": "ok_clean", "offset": 5},
                {"kind": "text", "text": "aa bb cc dd ee", "media_ref": "", "offset": 5},
                {"kind": "media", "text": "", "media_ref": "ok_clean2", "offset": 1},
            ],
        }
    ]
    d = tmp_path / "dupoff"
    d.mkdir()
    pq.write_table(
        pa.Table.from_pylist(spans_rows, schema=fixtures.SPANS_SCHEMA),
        str(d / "documents_spans.parquet"),
    )
    _, pay = tables.read_corpus(spark, small_corpus_dir)
    sdf = tables.read_spans(spark, str(d / "documents_spans.parquet"))
    g = run_extraction(sdf, pay).collect()[0].asDict(recursive=True)
    e = oracle.evaluate_corpus(spans_rows, fixtures.build_payloads(seed=7))["dup_off"]
    assert g["accepted"] == e["accepted"] and g["reasons"] == e["reasons"]
    assert [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in g["spans"]] == [
        (s["kind"], s["text"], s["media_ref"], s["order"]) for s in e["spans"]
    ]


def _roundtrip(spark, tmp_path, spans_rows, pay_dir, name, **kw):
    """Write rows → run engine + oracle → return (got, exp) dicts per doc."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / name
    d.mkdir()
    pq.write_table(
        pa.Table.from_pylist(spans_rows, schema=fixtures.SPANS_SCHEMA),
        str(d / "documents_spans.parquet"),
    )
    _, pay = tables.read_corpus(spark, pay_dir)
    sdf = tables.read_spans(spark, str(d / "documents_spans.parquet"))
    got = {
        r["doc_id"]: r.asDict(recursive=True)
        for r in run_extraction(sdf, pay, **kw).collect()
    }
    exp = oracle.evaluate_corpus(
        spans_rows,
        fixtures.build_payloads(seed=7),
        max_media_spans=kw.get("max_media_spans"),
    )
    return got, exp


def _assert_doc_parity(got, exp):
    assert set(got) == set(exp)
    for doc_id, e in exp.items():
        g = got[doc_id]
        assert g["accepted"] == e["accepted"], (doc_id, g["reasons"], e["reasons"])
        assert g["reasons"] == e["reasons"], doc_id
        assert g["warnings"] == e["warnings"], doc_id
        gs = [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in g["spans"]]
        es = [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in e["spans"]]
        assert gs == es, doc_id


@pytest.mark.slow
def test_page_budget_duplicate_offset_boundary(spark, small_corpus_dir, tmp_path):
    """ADVICE r01 (high): two media spans sharing an offset at the page-budget
    boundary must resolve by array RANK, not offset membership — otherwise the
    out-of-budget span (here a missing payload) leaks into the verdict."""
    rows = [
        {
            "doc_id": "dup_budget",
            "skip_checks": False,
            "ingest_seq": 0,
            "spans": [
                {"kind": "media", "text": "", "media_ref": "ok_clean", "offset": 5},
                {"kind": "media", "text": "", "media_ref": "zzz_missing", "offset": 5},
            ],
        }
    ]
    got, exp = _roundtrip(
        spark, tmp_path, rows, small_corpus_dir, "dupbudget", max_media_spans=1
    )
    assert exp["dup_budget"]["accepted"] is True  # the scenario is live
    _assert_doc_parity(got, exp)


@pytest.mark.slow
def test_first_error_tiebreak_same_offset(spark, small_corpus_dir, tmp_path):
    """ADVICE r01 (medium): two failing pages at ONE offset — the engine's
    first-error min must pick the oracle's pages[0] (media_ref order), so the
    'Critical error ...' message names the right payload."""
    rows = [
        {
            "doc_id": "two_err",
            "skip_checks": False,
            "ingest_seq": 0,
            "spans": [
                # 'aaa_missing' < 'corrupt' lexicographically → its
                # missing-payload error must win over corrupt's decode error
                {"kind": "media", "text": "", "media_ref": "corrupt", "offset": 3},
                {"kind": "media", "text": "", "media_ref": "aaa_missing", "offset": 3},
            ],
        }
    ]
    got, exp = _roundtrip(spark, tmp_path, rows, small_corpus_dir, "twoerr")
    assert "aaa_missing" in exp["two_err"]["reasons"][0]
    _assert_doc_parity(got, exp)


@pytest.mark.slow
def test_null_vs_empty_field_ordering(spark, small_corpus_dir, tmp_path):
    """ADVICE r01 (low): same-offset same-kind spans with NULL vs '' fields
    must order identically on both engines (Spark structs sort NULL first)."""
    rows = [
        {
            "doc_id": "null_empty",
            "skip_checks": False,
            "ingest_seq": 0,
            "spans": [
                {"kind": "text", "text": "aa bb cc dd", "media_ref": "", "offset": 2},
                {"kind": "text", "text": "aa bb cc dd", "media_ref": None, "offset": 2},
                {"kind": "text", "text": None, "media_ref": "", "offset": 7},
                {"kind": "text", "text": "", "media_ref": "", "offset": 7},
                {"kind": "media", "text": "", "media_ref": "ok_clean", "offset": 9},
            ],
        }
    ]
    got, exp = _roundtrip(spark, tmp_path, rows, small_corpus_dir, "nullempty")
    # the two surviving twins differ only in media_ref NULL vs '' — order matters
    assert [s["media_ref"] for s in exp["null_empty"]["spans"][:2]] == [None, ""]
    _assert_doc_parity(got, exp)


@pytest.mark.slow
def test_entry_contract(spark):
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
    spec = importlib.util.spec_from_file_location("__spark_entry__", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    df = mod.entry(spark)
    assert df.count() >= 0
    q = mod.queries()
    o = mod.oracle_sql()
    assert set(o) <= set(q)
