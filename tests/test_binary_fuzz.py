"""Randomized binary front-end fuzz: extract_from_binary == an independent
Python composition of the handler contract (caps, dispatch, error rules, K9
effective-DPI) + the pure-Python oracle. Pins the Spark plumbing
(rasterize → payloads/spans/error rows → pipeline) on wilder inputs than the
curated contract tests: random page counts, corrupt pages at random
positions, junk containers, unknown formats, missing content, bypass flags."""

import numpy as np
import pytest

from document_quality_assessment_ocr_spark import oracle, png
from document_quality_assessment_ocr_spark.sources import binary_docs as B
from document_quality_assessment_ocr_spark.sources.fixtures import draw_text_page


def _page(rng, dpi):
    w = int(rng.integers(120, 300))
    h = int(rng.integers(150, 350))
    return png.encode_gray(draw_text_page(rng, w=w, h=h), dpi=dpi), w, h


def _random_docs(rng, n):
    docs = []
    for i in range(n):
        doc_id = f"f{i:03d}"
        requires_ocr = bool(rng.random() < 0.8)
        kind = rng.random()
        if kind < 0.45:  # pdf container
            fmt = "pdf" if rng.random() < 0.7 else "PDF"
            n_pages = int(rng.integers(0, 6))
            pages = []
            for p in range(n_pages):
                if rng.random() < 0.25:
                    pages.append((b"corrupt-page", float(rng.integers(0, 700))))
                else:
                    dpi = 0 if rng.random() < 0.3 else int(rng.integers(72, 300))
                    data, w, h = _page(rng, dpi)
                    pages.append((data, float(rng.integers(100, 700))))
            content = B.encode_page_container(pages)
        elif kind < 0.65:  # tiff container
            fmt = "tiff"
            n_pages = int(rng.integers(0, 25))
            pages = []
            for p in range(n_pages):
                if rng.random() < 0.2:
                    pages.append((b"bad-frame", 0.0))
                else:
                    data, w, h = _page(rng, int(rng.integers(72, 300)))
                    pages.append((data, 0.0))
            content = B.encode_page_container(pages)
        elif kind < 0.8:  # plain image
            fmt = rng.choice(["png", "bmp", None])
            data, w, h = _page(rng, int(rng.integers(0, 300)))
            content = data
        elif kind < 0.9:  # junk bytes under a container format
            fmt = rng.choice(["pdf", "tiff"])
            content = bytes(rng.integers(0, 256, int(rng.integers(1, 64)), dtype=np.uint8))
        else:  # junk bytes as image / missing content
            fmt = "png"
            content = None if rng.random() < 0.5 else b"zz"
        docs.append((doc_id, fmt, content, requires_ocr))
    return docs


def _py_raster(doc_id, fmt, content, max_pages=5):
    """Independent restatement of the reference handler contract
    (pdf_handler.py:65,88-96; tiff_handler.py:15,27-35; criteria.py:28-41)."""
    fmt_l = (fmt or "").lower()
    pages = []
    try:
        if content is None:
            raise ValueError("no content")
        if fmt_l == "pdf":
            parsed = B.parse_page_container(bytes(content))
            for i in range(min(len(parsed), max_pages, 3)):
                data, wpt = parsed[i]
                try:
                    arr, pdpi = png.decode_gray(bytes(data))
                except Exception as pe:
                    if not pages:
                        raise RuntimeError(f"Failed to extract even the first page: {pe}")
                    continue
                pages.append((i, bytes(data), arr.shape[1], pdpi, wpt))
        elif fmt_l == "tiff":
            parsed = B.parse_page_container(bytes(content))
            for i in range(min(len(parsed), 20)):
                data, wpt = parsed[i]
                try:
                    arr, pdpi = png.decode_gray(bytes(data))
                except Exception:
                    continue
                pages.append((i, bytes(data), arr.shape[1], pdpi, wpt))
        else:
            arr, pdpi = png.decode_gray(bytes(content))
            pages.append((0, bytes(content), arr.shape[1], pdpi, 0.0))
    except Exception as e:
        return None, f"Failed to extract images from {doc_id}: {e}"
    return pages, None


def _py_expected(docs):
    """Python-composed expected results: raster contract + K9 dpi rule +
    oracle evaluation with handler errors injected as pre-scored entries."""
    payloads, rows, handler_errors = {}, [], {}
    for doc_id, fmt, content, requires_ocr in docs:
        pages, err = _py_raster(doc_id, fmt, content)
        spans = []
        if err is not None:
            ref = f"{doc_id}#error"
            handler_errors[ref] = err
            spans.append({"kind": "media", "text": "", "media_ref": ref, "offset": 0})
        else:
            use_eff = (fmt or "").lower() == "pdf" and any(p[3] <= 0 for p in pages)
            for i, data, width, pdpi, wpt in pages:
                ref = f"{doc_id}#p{i}"
                dpi = (width * 72.0 / wpt if wpt > 0 else 0.0) if use_eff else float(pdpi)
                payloads[ref] = {"png": data, "dpi": dpi}
                spans.append({"kind": "media", "text": "", "media_ref": ref, "offset": i})
        rows.append({"doc_id": doc_id, "skip_checks": not requires_ocr,
                     "ingest_seq": len(rows), "spans": spans})
    scored = oracle.score_payloads(payloads)
    for ref, msg in handler_errors.items():
        scored[ref] = {"scores": None, "dpi": 0.0, "est": 0.0, "error": msg}
    crit = None
    from document_quality_assessment_ocr_spark.config import default_criteria
    crit = default_criteria()
    return {
        r["doc_id"]: oracle.evaluate_document(
            r["spans"], scored, crit, skip_checks=r["skip_checks"]
        )
        for r in rows
    }


@pytest.mark.slow
@pytest.mark.parametrize("seed", [11, 22, 33])
def test_binary_fuzz_parity(spark, seed):
    rng = np.random.default_rng(seed)
    docs = _random_docs(rng, 18)
    df = spark.createDataFrame(
        [(d, f, bytearray(c) if c is not None else None, r) for d, f, c, r in docs],
        B.BINARY_DOCS_SCHEMA,
    )
    got = {r["doc_id"]: r.asDict(recursive=True)
           for r in B.extract_from_binary(df).collect()}
    exp = _py_expected(docs)
    assert set(got) == set(exp)
    for doc_id, e in exp.items():
        g = got[doc_id]
        assert g["accepted"] == e["accepted"], (seed, doc_id, g["reasons"], e["reasons"])
        assert g["reasons"] == e["reasons"], (seed, doc_id)
        assert g["warnings"] == e["warnings"], (seed, doc_id)
        gs = [(s["kind"], s["media_ref"], s["order"]) for s in g["spans"]]
        es = [(s["kind"], s["media_ref"], s["order"]) for s in e["spans"]]
        assert gs == es, (seed, doc_id)
