#!/usr/bin/env python3
"""Generate the committed golden expectations for the fixture corpora
(FIXTURES.md §5): oracle output, serialized deterministically. Committed to
git; tests compare BOTH oracle and engine against it, so a joint drift of
shared kernel semantics is caught across rounds."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from document_quality_assessment_ocr_spark import oracle  # noqa: E402
from document_quality_assessment_ocr_spark.config import (  # noqa: E402
    default_criteria,
    tiered_criteria,
)
from document_quality_assessment_ocr_spark.sources import fixtures  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden")

CORPORA = {
    "small_default": dict(n_docs=12, seed=7, mega_spans=80, tiers="default"),
    "small_tiered": dict(n_docs=12, seed=7, mega_spans=80, tiers="tiered"),
    "full_default": dict(n_docs=60, seed=42, mega_spans=600, tiers="default"),
}


def generate(name: str, spec: dict) -> dict:
    crit = tiered_criteria() if spec["tiers"] == "tiered" else default_criteria()
    rows = fixtures.build_corpus(
        n_docs=spec["n_docs"], seed=spec["seed"], mega_spans=spec["mega_spans"]
    )
    payloads = fixtures.build_payloads(seed=spec["seed"])
    out = oracle.evaluate_corpus(rows, payloads, crit)
    return {
        doc_id: {
            "accepted": r["accepted"],
            "reasons": r["reasons"],
            "warnings": r["warnings"],
            "spans": [
                [s["kind"], s["text"], s["media_ref"], s["order"]] for s in r["spans"]
            ],
        }
        for doc_id, r in sorted(out.items())
    }


def main() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, spec in CORPORA.items():
        path = os.path.join(GOLDEN_DIR, f"{name}.json")
        with open(path, "w") as f:
            json.dump(generate(name, spec), f, sort_keys=True, separators=(",", ":"))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
