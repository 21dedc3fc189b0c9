"""Randomized-corpus parity fuzz: engine == oracle on corpora drawn from a
much wilder distribution than the curated fixtures — random span mixes,
invalid/corrupt payload refs, duplicate doc_ids and offsets, empty docs,
random skip flags, unicode-ish text, page budgets."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from document_quality_assessment_ocr_spark import oracle
from document_quality_assessment_ocr_spark.config import default_criteria, tiered_criteria
from document_quality_assessment_ocr_spark.plans.pipeline import run_extraction
from document_quality_assessment_ocr_spark.sources import fixtures, tables

PAYLOAD_NAMES = [
    "ok_clean", "ok_clean2", "bad_blur", "bad_noise", "bad_density_low",
    "bad_watermark", "corrupt", "edge_blank", "bad_resolution",
    "no_such_ref", "another_missing", "", None,
]

TEXT_POOL = [
    "aa bb cc dd ee ff gg hh",
    "x" + " " * 200,
    "q" * 150,
    "",
    None,  # NULL text — must order before '' (Spark struct null-first)
    "word " * 40,
    "tab\tsep\ttext\nwith newlines\n",
    "ünïcödé tëxt with âccents and spaces here",
    " \t \n ",
    "a",
]


def _random_corpus(rng: np.random.Generator, n_docs: int) -> list[dict]:
    rows, seq = [], 0
    for i in range(n_docs):
        doc_id = f"d{rng.integers(0, max(2, n_docs // 2)):03d}"  # forced dup ids
        n = int(rng.integers(0, 9))
        offsets = rng.integers(0, 40, size=n)  # duplicates allowed
        spans = []
        for off in offsets:
            if rng.random() < 0.5:
                spans.append(
                    {"kind": "text",
                     "text": TEXT_POOL[int(rng.integers(0, len(TEXT_POOL)))],
                     # occasional NULL media_ref on text spans (ordering path)
                     "media_ref": None if rng.random() < 0.1 else "",
                     "offset": int(off)}
                )
            else:
                spans.append(
                    {"kind": "media",
                     "text": None if rng.random() < 0.1 else "",
                     "media_ref": PAYLOAD_NAMES[int(rng.integers(0, len(PAYLOAD_NAMES)))],
                     "offset": int(off)}
                )
        rows.append(
            {"doc_id": doc_id, "skip_checks": bool(rng.random() < 0.15),
             "ingest_seq": seq, "spans": spans}
        )
        seq += 1
    return rows


@pytest.mark.slow
@pytest.mark.parametrize("seed,tiers,budget", [
    (101, "default", None),
    (202, "tiered", None),
    (303, "default", 2),
    (404, "tiered", 1),
    (505, "default", 20),
    (606, "tiered", 3),
    (707, "default", None),
    (808, "tiered", None),
    (909, "default", 1),
    (1010, "tiered", 2),
    (1111, "default", 4),
    (1212, "tiered", None),
])
def test_fuzz_corpus_parity(spark, tmp_path, seed, tiers, budget):
    rng = np.random.default_rng(seed)
    rows = _random_corpus(rng, 40)
    d = tmp_path / f"fuzz{seed}"
    d.mkdir()
    pq.write_table(
        pa.Table.from_pylist(rows, schema=fixtures.SPANS_SCHEMA),
        str(d / "documents_spans.parquet"),
    )
    payloads = fixtures.build_payloads(seed=42, size=(320, 400))
    prows = [
        {"media_ref": k, "width": 0, "height": 0, "dpi": p["dpi"], "png": p["png"]}
        for k, p in payloads.items()
    ]
    pq.write_table(
        pa.Table.from_pylist(prows, schema=fixtures.PAYLOADS_SCHEMA),
        str(d / "media_payloads.parquet"),
    )

    crit = tiered_criteria() if tiers == "tiered" else default_criteria()
    sdf, pdf = tables.read_corpus(spark, str(d))
    got = {
        r["doc_id"]: r.asDict(recursive=True)
        for r in run_extraction(sdf, pdf, criteria=crit, max_media_spans=budget).collect()
    }
    exp = oracle.evaluate_corpus(rows, payloads, crit, max_media_spans=budget)
    assert set(got) == set(exp)
    for doc_id, e in exp.items():
        g = got[doc_id]
        assert g["accepted"] == e["accepted"], (seed, doc_id, g["reasons"], e["reasons"])
        assert g["reasons"] == e["reasons"], (seed, doc_id)
        assert g["warnings"] == e["warnings"], (seed, doc_id)
        gs = [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in g["spans"]]
        es = [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in e["spans"]]
        assert gs == es, (seed, doc_id)
