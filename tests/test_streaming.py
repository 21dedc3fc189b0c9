"""Incremental extraction via Structured Streaming: two micro-batched file
drops produce byte-identical output to the one-shot batch run."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from document_quality_assessment_ocr_spark.plans.pipeline import run_extraction
from document_quality_assessment_ocr_spark.sources import fixtures, tables
from document_quality_assessment_ocr_spark.streaming import stream_extraction


def _result_set(df):
    return {
        (
            r["doc_id"],
            r["accepted"],
            tuple(r["reasons"]),
            tuple((s["kind"], s["text"], s["media_ref"], s["order"]) for s in r["spans"]),
        )
        for r in df.collect()
    }


@pytest.mark.slow
def test_stream_matches_batch(spark, small_corpus_dir, tmp_path):
    rows = fixtures.build_corpus(n_docs=12, seed=7, mega_spans=80)
    half = len(rows) // 2
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    for i, chunk in enumerate((rows[:half], rows[half:])):
        pq.write_table(
            pa.Table.from_pylist(chunk, schema=fixtures.SPANS_SCHEMA),
            os.path.join(in_dir, f"drop-{i}.parquet"),
        )
    pay = tables.read_payloads(
        spark, os.path.join(small_corpus_dir, "media_payloads.parquet")
    )
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream_extraction(spark, in_dir, pay, out_dir, ckpt, available_now=True)
    got = _result_set(spark.read.parquet(out_dir))

    spans = tables.read_spans(spark, in_dir)
    expect = _result_set(run_extraction(spans, pay))
    assert got == expect
