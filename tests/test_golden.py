"""Committed-golden regression (FIXTURES.md §5): oracle output must equal the
golden files in git byte-for-byte — catches joint engine+oracle semantic
drift that live parity comparison cannot see. Regenerate deliberately with
scripts/gen_golden.py when semantics change on purpose."""

import json
import os

import pytest

from document_quality_assessment_ocr_spark import oracle
from document_quality_assessment_ocr_spark.config import default_criteria, tiered_criteria
from document_quality_assessment_ocr_spark.sources import fixtures

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def _oracle_as_golden(n_docs, seed, mega, crit):
    out = oracle.evaluate_corpus(
        fixtures.build_corpus(n_docs=n_docs, seed=seed, mega_spans=mega),
        fixtures.build_payloads(seed=seed),
        crit,
    )
    return {
        doc_id: {
            "accepted": r["accepted"],
            "reasons": r["reasons"],
            "warnings": r["warnings"],
            "spans": [[s["kind"], s["text"], s["media_ref"], s["order"]] for s in r["spans"]],
        }
        for doc_id, r in sorted(out.items())
    }


@pytest.mark.slow
@pytest.mark.parametrize(
    "name,n_docs,seed,mega,tiers",
    [
        ("small_default", 12, 7, 80, "default"),
        ("small_tiered", 12, 7, 80, "tiered"),
        ("full_default", 60, 42, 600, "default"),
    ],
)
def test_oracle_matches_committed_golden(name, n_docs, seed, mega, tiers):
    with open(os.path.join(GOLDEN, f"{name}.json")) as f:
        golden = json.load(f)
    crit = tiered_criteria() if tiers == "tiered" else default_criteria()
    got = _oracle_as_golden(n_docs, seed, mega, crit)
    assert got == golden
