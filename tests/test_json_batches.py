"""S1 DocumentBatch JSON ingestion + batch fan-back-out contract tests
(reference utils.py:104-137 load, evaluator.py:55-57 dedup,
evaluator.py:132-139 batch-shaped echo with shared duplicate results)."""

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from document_quality_assessment_ocr_spark import png
from document_quality_assessment_ocr_spark.sources import binary_docs as B
from document_quality_assessment_ocr_spark.sources import json_batches as J
from document_quality_assessment_ocr_spark.sources.fixtures import draw_text_page

BATCHES = [
    {
        "customerID": "cust-a",
        "transactionID": "txn-1",
        "documents": [
            {"documentID": "doc1", "documentPath": "/data/doc1.pdf",
             "documentFormat": "pdf", "requiresOCR": True},
            {"documentID": "doc2", "documentPath": "/data/doc2.pdf",
             "documentFormat": "pdf", "requiresOCR": True},
            # duplicate WITHIN the batch
            {"documentID": "doc1", "documentPath": "/data/doc1.pdf",
             "documentFormat": "pdf", "requiresOCR": True},
        ],
    },
    {
        "customerID": "cust-b",
        "transactionID": None,
        "documents": [
            # duplicate ACROSS batches, LAST occurrence (this one) wins:
            # different path + requiresOCR flag
            {"documentID": "doc1", "documentPath": "/data/doc1_v2.pdf",
             "documentFormat": "pdf", "requiresOCR": False},
            {"documentID": "doc3", "documentPath": "/data/doc3.png"},
        ],
    },
]


@pytest.fixture()
def batch_file(tmp_path):
    p = tmp_path / "input.json"
    p.write_text(json.dumps(BATCHES))
    return str(p)


@pytest.mark.slow
def test_read_and_flatten_last_wins(spark, batch_file):
    b = J.read_document_batches(spark, batch_file)
    assert b.count() == 2
    rows = {r["documentID"]: r for r in J.batches_to_documents(b).collect()}
    assert set(rows) == {"doc1", "doc2", "doc3"}
    # last occurrence of doc1 (batch 2) wins: v2 path, requiresOCR False
    assert rows["doc1"]["documentPath"] == "/data/doc1_v2.pdf"
    assert rows["doc1"]["requiresOCR"] is False
    # missing requiresOCR defaults False (reference models.py:60)
    assert rows["doc3"]["requiresOCR"] is False


@pytest.mark.slow
def test_reattach_shared_duplicate_results(spark, batch_file):
    b = J.read_document_batches(spark, batch_file)
    res = spark.createDataFrame(
        [
            ("doc1", True, [], []),
            ("doc2", False, ["Image too blurry (variance: 1.00)"], []),
        ],
        "doc_id string, accepted boolean, reasons array<string>, warnings array<string>",
    )
    out = {r["customerID"]: r.asDict(recursive=True)
           for r in J.reattach_results(b, res).collect()}
    a_docs = out["cust-a"]["documents"]
    # input order and count echoed (duplicate doc1 twice)
    assert [d["documentID"] for d in a_docs] == ["doc1", "doc2", "doc1"]
    assert a_docs[0]["isAccepted"] is True and a_docs[2]["isAccepted"] is True
    assert a_docs[1]["isAccepted"] is False
    assert a_docs[1]["reasons"] == ["Image too blurry (variance: 1.00)"]
    b_docs = out["cust-b"]["documents"]
    assert [d["documentID"] for d in b_docs] == ["doc1", "doc3"]
    assert b_docs[0]["isAccepted"] is True  # SAME shared result across batches
    # no result row → verdict fields stay null (pre-evaluation state)
    assert b_docs[1]["isAccepted"] is None


REF_CONFIG = "/root/reference/config/criteria_config.json"


@pytest.mark.slow
@pytest.mark.skipif(not __import__("os").path.exists(REF_CONFIG),
                    reason="reference config not present")
def test_cli_json_batches_with_reference_config(spark, batch_file, tmp_path):
    """End-to-end CLI smoke: reference-format JSON in, batch-shaped JSON echo
    out, driven with the reference's OWN shipped criteria_config.json.
    Subprocess run — the CLI owns (and stops) its session."""
    import glob
    import os
    import subprocess
    import sys

    rng = np.random.default_rng(3)
    page = png.encode_gray(draw_text_page(rng, w=400, h=500), dpi=200)
    content = spark.createDataFrame(
        [
            ("/data/doc1_v2.pdf", bytearray(B.encode_page_container([(page, 612.0)]))),
            ("/data/doc2.pdf", bytearray(B.encode_page_container([(b"trash", 612.0)]))),
            ("/data/doc3.png", bytearray(page)),
        ],
        "documentPath string, content binary",
    )
    cpath = str(tmp_path / "content")
    content.write.mode("overwrite").parquet(cpath)
    out = str(tmp_path / "echo_json")
    proc = subprocess.run(
        [
            sys.executable, "/root/repo/scripts/run_extraction.py",
            "--json-batches", batch_file,
            "--content", cpath,
            "--config", REF_CONFIG,
            "--output", out,
            "--master", "local[4]",
        ],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "PYTHONPATH": "/root/repo"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    echoed = {}
    for part in glob.glob(os.path.join(out, "part-*.json")):
        with open(part) as f:
            for line in f:
                b = json.loads(line)
                echoed[b["customerID"]] = b
    assert set(echoed) == {"cust-a", "cust-b"}
    a = {d["documentID"]: d for d in echoed["cust-a"]["documents"]}
    assert a["doc2"]["isAccepted"] is False
    assert a["doc2"]["reasons"][0].startswith("Critical error during evaluation:")
    assert '"rejection_summary"' in proc.stdout


@pytest.mark.slow
def test_evaluate_document_batches_end_to_end(spark, batch_file):
    rng = np.random.default_rng(0)
    good = B.encode_page_container(
        [(png.encode_gray(draw_text_page(rng, w=400, h=500), dpi=200), 612.0)]
    )
    bad = B.encode_page_container([(b"trash", 612.0)])
    content = spark.createDataFrame(
        [
            ("/data/doc1_v2.pdf", bytearray(good)),
            ("/data/doc2.pdf", bytearray(bad)),
            ("/data/doc3.png",
             bytearray(png.encode_gray(draw_text_page(rng, w=400, h=500), dpi=200))),
        ],
        "documentPath string, content binary",
    )
    b = J.read_document_batches(spark, batch_file)
    out = {r["customerID"]: r.asDict(recursive=True)
           for r in J.evaluate_document_batches(b, content).collect()}
    a = {d["documentID"]: d for d in out["cust-a"]["documents"]}
    # doc1 deduped to the batch-2 version: requiresOCR=False → bypass-accepted
    assert a["doc1"]["isAccepted"] is True and a["doc1"]["reasons"] == []
    assert a["doc2"]["isAccepted"] is False
    assert a["doc2"]["reasons"][0].startswith(
        "Critical error during evaluation: Failed to extract images from doc2: "
    )
    bdocs = {d["documentID"]: d for d in out["cust-b"]["documents"]}
    assert bdocs["doc1"]["isAccepted"] is True  # shared result
    assert bdocs["doc3"]["isAccepted"] is True  # generic png path
