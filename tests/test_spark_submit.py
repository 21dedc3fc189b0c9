"""Deployment-contract test: the pipeline runs under real ``spark-submit
--py-files pkg.zip`` (the north_rule's cluster submission mode) with the
package imported from the shipped zip, and the output matches the oracle.

The CLI script is copied OUT of the repo and run from a foreign cwd with
PYTHONPATH scrubbed, so the only way ``document_quality_assessment_ocr_spark``
can resolve — driver and python workers both — is the --py-files zip."""

import os
import shutil
import subprocess

import duckdb
import pytest

from document_quality_assessment_ocr_spark import oracle
from document_quality_assessment_ocr_spark.session import _package_zip
from document_quality_assessment_ocr_spark.sources import fixtures

SPARK_SUBMIT = "/opt/spark/bin/spark-submit"


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_py_files_deployment(tmp_path):
    corpus_dir = str(tmp_path / "corpus")
    fixtures.write_corpus(corpus_dir, n_docs=20, seed=42)
    script = str(tmp_path / "run_extraction.py")
    shutil.copy(
        os.path.join(os.path.dirname(__file__), "..", "scripts", "run_extraction.py"),
        script,
    )
    out = str(tmp_path / "out")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--py-files", _package_zip(),
            script,
            "--input", os.path.join(corpus_dir, "documents_spans.parquet"),
            "--payloads", os.path.join(corpus_dir, "media_payloads.parquet"),
            "--output", out,
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=500,
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-4000:])
    assert '"summary"' in proc.stdout  # the CLI's run-metrics report printed

    rows = duckdb.sql(
        f"SELECT doc_id, accepted, reasons, warnings FROM '{out}/*.parquet'"
    ).fetchall()
    exp = oracle.evaluate_corpus(
        fixtures.build_corpus(n_docs=20, seed=42), fixtures.build_payloads(seed=42)
    )
    got = {r[0]: (r[1], list(r[2]), list(r[3])) for r in rows}
    assert set(got) == set(exp)
    for d, e in exp.items():
        assert got[d] == (e["accepted"], e["reasons"], e["warnings"]), d
