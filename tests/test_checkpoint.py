"""Resume-from-checkpoint semantics (north_rule): a run killed mid-way
resumes from the last committed snapshot, re-emits nothing, and the final
output is identical to a single-shot run."""

import json
import os

import pytest

from document_quality_assessment_ocr_spark.plans import checkpoint as cp
from document_quality_assessment_ocr_spark.plans.pipeline import run_extraction
from document_quality_assessment_ocr_spark.sources import tables


def _result_set(df):
    return {
        (
            r["doc_id"],
            r["accepted"],
            tuple(r["reasons"]),
            tuple(r["warnings"]),
            tuple((s["kind"], s["text"], s["media_ref"], s["order"]) for s in r["spans"]),
        )
        for r in df.collect()
    }


@pytest.mark.slow
def test_checkpoint_resume_identical(spark, small_corpus_dir, tmp_path, monkeypatch):
    spans, pay = tables.read_corpus(spark, small_corpus_dir)
    base = str(tmp_path / "snap")

    # single-shot reference result
    expect = _result_set(run_extraction(spans, pay))

    # crash after 2 of 4 groups: the 3rd run_extraction call raises
    calls = {"n": 0}
    real = cp.run_extraction

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("injected crash")
        return real(*a, **kw)

    monkeypatch.setattr(cp, "run_extraction", flaky)
    with pytest.raises(RuntimeError, match="injected crash"):
        cp.run_with_checkpoints(spark, spans, pay, base, n_groups=4)
    snap = json.load(open(os.path.join(base, cp.SNAPSHOT)))
    assert len(snap["committed_groups"]) == 2  # two groups committed, crash on 3rd

    # resume with the real pipeline: only the remaining groups run
    monkeypatch.setattr(cp, "run_extraction", real)
    calls_before = calls["n"]
    out = cp.run_with_checkpoints(spark, spans, pay, base, n_groups=4)
    snap = json.load(open(os.path.join(base, cp.SNAPSHOT)))
    assert snap["committed_groups"] == [0, 1, 2, 3]
    assert _result_set(out) == expect

    # idempotent re-invoke: nothing to do, same data back
    out2 = cp.run_with_checkpoints(spark, spans, pay, base, n_groups=4)
    assert _result_set(out2) == expect


@pytest.mark.slow
def test_manifests_record_lineage(spark, small_corpus_dir, tmp_path):
    spans, pay = tables.read_corpus(spark, small_corpus_dir)
    base = str(tmp_path / "snap2")
    cp.run_with_checkpoints(spark, spans, pay, base, n_groups=2)
    mani = cp.read_manifests(spark, base)
    rows = mani.collect()
    assert {r["group_id"] for r in rows} == {0, 1}
    total_docs = sum(r["n_docs"] for r in rows)
    assert total_docs == spans.select("doc_id").distinct().count()
    assert all(r["spans_kept"] is not None for r in rows)


@pytest.mark.slow
def test_binary_checkpoint_resume_identical(spark, tmp_path, monkeypatch):
    """run_binary_with_checkpoints: crash mid-run, resume, output identical
    to the one-shot binary extraction (handler errors included)."""
    import numpy as np

    from document_quality_assessment_ocr_spark import png
    from document_quality_assessment_ocr_spark.sources import binary_docs as B
    from document_quality_assessment_ocr_spark.sources.fixtures import draw_text_page

    rng = np.random.default_rng(5)

    def pdf(i, good=True):
        pages = (
            [(png.encode_gray(draw_text_page(rng, w=300, h=380), dpi=200), 612.0)]
            if good
            else [(b"trash", 612.0)]
        )
        return (f"c{i}", "pdf", bytearray(B.encode_page_container(pages)), True)

    rows = [pdf(0), pdf(1), pdf(2, good=False), pdf(3), pdf(4)]
    docs = spark.createDataFrame(rows, B.BINARY_DOCS_SCHEMA)
    expect = _result_set(B.extract_from_binary(docs))

    base = str(tmp_path / "bsnap")
    calls = {"n": 0}
    real = cp.run_extraction

    def flaky(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("injected crash")
        return real(*a, **kw)

    monkeypatch.setattr(cp, "run_extraction", flaky)
    with pytest.raises(RuntimeError, match="injected crash"):
        cp.run_binary_with_checkpoints(spark, docs, base, n_groups=4)
    snap = json.load(open(os.path.join(base, cp.SNAPSHOT)))
    assert len(snap["committed_groups"]) == 2  # two groups survived the crash

    monkeypatch.setattr(cp, "run_extraction", real)
    out = cp.run_binary_with_checkpoints(spark, docs, base, n_groups=4)
    assert _result_set(out) == expect


@pytest.mark.slow
def test_time_travel_read_as_of(spark, small_corpus_dir, tmp_path):
    """Iceberg-style snapshot time travel: version v sees exactly the groups
    committed by then, the latest version equals the full run, and the
    group filter is a partition PRUNE (pushed partition filter), never a
    scan-and-discard."""
    from pyspark.sql import functions as F

    spans, pay = tables.read_corpus(spark, small_corpus_dir)
    base = str(tmp_path / "tt")
    full = cp.run_with_checkpoints(spark, spans, pay, base, n_groups=4)

    hist = cp.snapshot_history(base)
    assert [h["version"] for h in hist] == [0, 1, 2, 3]

    grp_col = F.pmod(F.xxhash64("doc_id"), F.lit(4)).cast("int")
    for v in (0, 1, 3):
        got = _result_set(cp.read_as_of(spark, base, version=v))
        committed = {h["group"] for h in hist[: v + 1]}
        expect = _result_set(
            spark.createDataFrame(full.rdd, full.schema).where(
                grp_col.isin(sorted(committed))
            )
        )
        assert got == expect, f"version {v}"
    assert _result_set(cp.read_as_of(spark, base)) == _result_set(full)

    plan = (
        cp.read_as_of(spark, base, version=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [" in plan and "group" in plan.split("PartitionFilters")[1][:120]

    with pytest.raises(ValueError):
        cp.read_as_of(spark, str(tmp_path / "nowhere"))  # no snapshot yet
