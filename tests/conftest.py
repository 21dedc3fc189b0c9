"""Shared fixtures: one SparkSession per test run, one fixture corpus on disk.

Mirrors the reference's determinism harness (``tests/conftest.py:7-39`` swaps
the process pool for a synchronous executor); here determinism comes from the
seeded corpus + pure kernels, and the session is local[*] with AQE on.
"""

from __future__ import annotations

import os

import pytest

CORPUS_DIR = os.path.join(os.path.dirname(__file__), "..", ".fixture_cache", "full")
SMALL_DIR = os.path.join(os.path.dirname(__file__), "..", ".fixture_cache", "small")


@pytest.fixture(scope="session")
def corpus_dir() -> str:
    from document_quality_assessment_ocr_spark.sources import fixtures

    marker = os.path.join(CORPUS_DIR, "documents_spans.parquet")
    if not os.path.exists(marker):
        fixtures.write_corpus(CORPUS_DIR, n_docs=60, seed=42)
    return os.path.abspath(CORPUS_DIR)


@pytest.fixture(scope="session")
def small_corpus_dir() -> str:
    from document_quality_assessment_ocr_spark.sources import fixtures

    marker = os.path.join(SMALL_DIR, "documents_spans.parquet")
    if not os.path.exists(marker):
        # full-size pages (watermark metric is calibrated at 800×1000);
        # "small" = fewer docs + smaller mega-doc, payload scoring cost is
        # per-distinct-payload and constant anyway
        fixtures.write_corpus(SMALL_DIR, n_docs=12, seed=7, mega_spans=80)
    return os.path.abspath(SMALL_DIR)


@pytest.fixture(scope="session")
def spark():
    from document_quality_assessment_ocr_spark.session import get_spark

    s = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()
