"""Oracle behavior tests: verdict fold routing, bypass, dedup, error-as-data —
the reference's evaluation-layer test surface (reference
``tests/test_evaluation.py:17-215``) re-expressed for the span model."""

import numpy as np

from document_quality_assessment_ocr_spark import oracle, png
from document_quality_assessment_ocr_spark.config import (
    default_criteria,
    tiered_criteria,
)
from document_quality_assessment_ocr_spark.sources import fixtures


def _payloads():
    # full-size pages: the FFT watermark metric legitimately scores ANY
    # small upscaled-to-512² page high, so payload recipes are calibrated
    # at the reference's 800×1000 geometry (generate_bad_docs.py:7)
    return fixtures.build_payloads(seed=42)


def _scored(payloads):
    return oracle.score_payloads(payloads)


def span(kind, text="", ref="", offset=0):
    return {"kind": kind, "text": text, "media_ref": ref, "offset": offset}


PAYLOADS = _payloads()
SCORED = _scored(PAYLOADS)
CRIT = default_criteria()


def test_empty_doc_rejected():
    r = oracle.evaluate_document([], SCORED, CRIT)
    assert r["accepted"] is False
    assert r["reasons"] == [oracle.NO_IMAGES_MSG]
    assert r["spans"] == []


def test_bypass_keeps_everything():
    spans = [span("media", ref="bad_noise", offset=5), span("text", text="   ", offset=1)]
    r = oracle.evaluate_document(spans, SCORED, CRIT, skip_checks=True)
    assert r["accepted"] is True and r["reasons"] == [] and r["warnings"] == []
    # all spans kept, ordered by offset
    assert [(s["kind"], s["order"]) for s in r["spans"]] == [("text", 0), ("media", 1)]


def test_missing_payload_critical_error():
    r = oracle.evaluate_document([span("media", ref="nope", offset=1)], SCORED, CRIT)
    assert r["accepted"] is False
    assert r["reasons"] == ["Critical error during evaluation: missing media payload nope"]
    assert r["spans"] == []


def test_corrupt_payload_critical_error():
    r = oracle.evaluate_document([span("media", ref="corrupt", offset=1)], SCORED, CRIT)
    assert r["accepted"] is False
    assert r["reasons"][0].startswith("Critical error during evaluation: ")
    assert r["spans"] == []


def test_text_only_doc_accepted_vacuously():
    spans = [span("text", text="ab cd ef gh", offset=3)]
    r = oracle.evaluate_document(spans, SCORED, CRIT)
    assert r["accepted"] is True and r["reasons"] == []
    assert len(r["spans"]) == 1


def test_clean_media_doc_accepted():
    spans = [span("media", ref="ok_clean", offset=1), span("media", ref="ok_clean2", offset=9)]
    r = oracle.evaluate_document(spans, SCORED, CRIT)
    assert r["accepted"] is True, r["reasons"]
    assert [s["media_ref"] for s in r["spans"]] == ["ok_clean", "ok_clean2"]
    assert [s["order"] for s in r["spans"]] == [0, 1]


def test_required_break_short_circuits():
    # bad_blur doc: blur (idx 5) fails; later criteria never evaluated —
    # exactly one reason (reference criteria.py:320-321 break)
    spans = [span("media", ref="bad_blur", offset=1)]
    r = oracle.evaluate_document(spans, SCORED, CRIT)
    assert r["accepted"] is False
    assert len(r["reasons"]) == 1
    assert r["reasons"][0].startswith("Image too blurry (variance: ")
    # gated media span is also dropped span-level
    assert r["spans"] == []


def test_reason_strings_exact_format():
    r = oracle.evaluate_document([span("media", ref="edge_blank", offset=1)], SCORED, CRIT)
    assert r["reasons"] == ["Text density out of range (0.00%)"]
    r = oracle.evaluate_document([span("media", ref="bad_density_high", offset=1)], SCORED, CRIT)
    assert r["reasons"] == ["Text density out of range (100.00%)"]
    r = oracle.evaluate_document([span("media", ref="bad_resolution", offset=1)], SCORED, CRIT)
    assert r["reasons"] == [
        "Resolution too low (metadata_dpi: 0.00, estimated_dpi: 0.00)"
    ]


def test_tiered_routing_recommended_and_warning():
    crit = tiered_criteria()  # watermark/noise → warning, compression/brightness → recommended
    r = oracle.evaluate_document([span("media", ref="bad_watermark", offset=1)], SCORED, crit)
    assert r["accepted"] is True
    assert r["warnings"] and r["warnings"][0].startswith("Watermark interference too high")
    r = oracle.evaluate_document([span("media", ref="bad_entropy", offset=1)], SCORED, crit)
    assert r["accepted"] is True
    assert any(x.startswith("Compression artifact detected") for x in r["reasons"])


def test_skew_vacuous_with_shipped_config():
    # detector range is [-5,5]; shipped max_deg=5 can never be exceeded
    # (SURVEY.md §4.3) — a 10°-rotated page clamps to 5 and PASSES skew
    r = oracle.evaluate_document([span("media", ref="bad_skew10", offset=1)], SCORED, CRIT)
    assert not any("Skew" in x for x in r["reasons"])


def test_skew_gating_with_variant_config():
    crit = default_criteria()
    next(c for c in crit if c.name == "skew").threshold.max_deg = 3
    r = oracle.evaluate_document(
        [span("media", ref="bad_skew4", offset=1), span("text", text="ab cd ef", offset=9)],
        SCORED,
        crit,
    )
    assert r["accepted"] is False and r["reasons"] == ["Skew angle too large"]
    # media span dropped by gate, text span survives
    assert [(s["kind"], s["order"]) for s in r["spans"]] == [("text", 0)]


def test_text_gating_bands():
    rng = np.random.default_rng(0)
    spans = [
        span("text", text=fixtures.body_text(rng), offset=1),
        span("text", text=fixtures.sparse_text(rng), offset=5),
        span("text", text=fixtures.dense_text(rng), offset=9),
        span("text", text="", offset=12),
    ]
    r = oracle.evaluate_document(spans, SCORED, CRIT)
    assert r["accepted"] is True
    assert len(r["spans"]) == 1 and r["spans"][0]["order"] == 0
    assert r["spans"][0]["text"].startswith(spans[0]["text"][:10])


def test_dedup_last_wins():
    rows = [
        {"doc_id": "d", "ingest_seq": 0, "skip_checks": False,
         "spans": [span("media", ref="bad_blur", offset=1)]},
        {"doc_id": "d", "ingest_seq": 1, "skip_checks": False,
         "spans": [span("media", ref="ok_clean", offset=1)]},
    ]
    out = oracle.evaluate_corpus(rows, PAYLOADS, CRIT)
    assert out["d"]["accepted"] is True


def test_mixed_dpi_estimation_on_page_one():
    # page1 dpi=200, page2 dpi missing → min=0 < 72 → estimate page ONE
    # (big glyphs → passes; reference criteria.py:229-246)
    spans = [span("media", ref="ok_clean", offset=1), span("media", ref="ok_est_dpi", offset=2)]
    r = oracle.evaluate_document(spans, SCORED, CRIT)
    assert r["accepted"] is True, r["reasons"]


def test_page_budget_caps_verdict_scope():
    # bad page is the 4th media span: with the reference's 3-page budget the
    # doc is ACCEPTED (page never scored), without it the blur check fails
    spans = [
        span("media", ref="ok_clean", offset=1),
        span("media", ref="ok_clean2", offset=2),
        span("media", ref="ok_clean3", offset=3),
        span("media", ref="bad_blur", offset=4),
    ]
    full = oracle.evaluate_document(spans, SCORED, CRIT)
    assert full["accepted"] is False
    capped = oracle.evaluate_document(spans, SCORED, CRIT, max_media_spans=3)
    assert capped["accepted"] is True
    # gating still sees the 4th span and drops it
    assert [s["media_ref"] for s in capped["spans"]] == ["ok_clean", "ok_clean2", "ok_clean3"]
    # beyond-budget decode errors do not reject the document
    spans2 = spans[:3] + [span("media", ref="corrupt", offset=9)]
    r = oracle.evaluate_document(spans2, SCORED, CRIT, max_media_spans=3)
    assert r["accepted"] is True
    assert [s["media_ref"] for s in r["spans"]] == ["ok_clean", "ok_clean2", "ok_clean3"]


def test_first_error_by_offset_wins():
    spans = [
        span("media", ref="corrupt", offset=10),
        span("media", ref="missing_one", offset=2),
    ]
    r = oracle.evaluate_document(spans, SCORED, CRIT)
    assert r["reasons"] == [
        "Critical error during evaluation: missing media payload missing_one"
    ]


def test_payload_names_lockstep():
    """fixtures.payload_names() (pixel-free constant for the entry paths)
    must always equal the built catalog's keys."""
    from document_quality_assessment_ocr_spark.sources import fixtures

    assert sorted(fixtures.payload_names()) == sorted(
        fixtures.build_payloads(seed=42, size=(64, 80))
    )
