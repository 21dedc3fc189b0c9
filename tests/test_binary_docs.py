"""Binary front-end (S4/S5) contract tests: dispatch, page/frame caps, error
paths, K9 effective-DPI, end-to-end extraction — mirroring the reference's
handler tests (which fully mock pymupdf/PIL; reference
tests/test_handlers.py:18-124) with the in-repo PNG codec as the decoder
double."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from document_quality_assessment_ocr_spark import png
from document_quality_assessment_ocr_spark.sources import binary_docs as B
from document_quality_assessment_ocr_spark.sources.fixtures import draw_text_page


def _page_png(seed=0, dpi=200, w=400, h=500):
    rng = np.random.default_rng(seed)
    return png.encode_gray(draw_text_page(rng, w=w, h=h), dpi=dpi)


def _mk(spark, rows):
    return spark.createDataFrame(rows, B.BINARY_DOCS_SCHEMA)


def _raster(spark, rows, **kw):
    return B.rasterize(_mk(spark, rows), **kw).collect()


def test_container_roundtrip():
    pages = [(_page_png(1), 612.0), (_page_png(2), 595.5)]
    blob = B.encode_page_container(pages)
    assert B.parse_page_container(blob) == pages
    with pytest.raises(ValueError):
        B.parse_page_container(b"JUNK" + blob[4:])
    with pytest.raises(ValueError):
        B.parse_page_container(blob[:-10])  # truncated


@pytest.mark.slow
def test_pdf_three_page_cap(spark):
    # 5-page PDF, max_pages=5 → hard cap 3 (reference pdf_handler.py:65)
    blob = B.encode_page_container([(_page_png(i), 612.0) for i in range(5)])
    rows = _raster(spark, [("d1", "PDF", bytearray(blob), True)])
    assert sorted(r["page_idx"] for r in rows) == [0, 1, 2]
    assert all(r["error"] is None for r in rows)


@pytest.mark.slow
def test_tiff_twenty_frame_cap(spark):
    blob = B.encode_page_container([(_page_png(i), 0.0) for i in range(25)])
    rows = _raster(spark, [("d1", "tiff", bytearray(blob), True)])
    assert len(rows) == 20  # reference tiff_handler.py:15


@pytest.mark.slow
def test_pdf_first_page_failure_rejects_document(spark):
    blob = B.encode_page_container([(b"not a png", 612.0), (_page_png(1), 612.0)])
    rows = _raster(spark, [("bad1", "pdf", bytearray(blob), True)])
    assert len(rows) == 1
    err = rows[0]["error"]
    assert err.startswith("Failed to extract images from bad1: ")
    assert "Failed to extract even the first page:" in err


@pytest.mark.slow
def test_pdf_later_page_failure_is_skipped(spark):
    blob = B.encode_page_container(
        [(_page_png(1), 612.0), (b"not a png", 612.0), (_page_png(2), 612.0)]
    )
    rows = _raster(spark, [("d1", "pdf", bytearray(blob), True)])
    assert sorted(r["page_idx"] for r in rows) == [0, 2]
    assert all(r["error"] is None for r in rows)


@pytest.mark.slow
def test_tiff_bad_frame_skipped_even_first(spark):
    blob = B.encode_page_container([(b"junk", 0.0), (_page_png(1), 0.0)])
    rows = _raster(spark, [("d1", "TIFF", bytearray(blob), True)])
    assert [r["page_idx"] for r in rows] == [1]


@pytest.mark.slow
def test_generic_image_and_dispatch_errors(spark):
    rows = _raster(
        spark,
        [
            ("img1", "png", bytearray(_page_png(3, dpi=150)), True),
            ("img2", None, bytearray(_page_png(4)), True),
            ("broken", "png", bytearray(b"zzzz"), True),
            ("notpdf", "pdf", bytearray(b"zzzz"), True),
        ],
    )
    by_id = {}
    for r in rows:
        by_id.setdefault(r["doc_id"], []).append(r)
    assert by_id["img1"][0]["dpi"] == 150 and by_id["img1"][0]["page_idx"] == 0
    assert by_id["img2"][0]["error"] is None  # None fmt → generic decode
    assert by_id["broken"][0]["error"].startswith("Failed to extract images from broken: ")
    assert by_id["notpdf"][0]["error"].startswith("Failed to extract images from notpdf: ")
    assert "not a multi-page container" in by_id["notpdf"][0]["error"]


@pytest.mark.slow
def test_k9_effective_dpi(spark):
    # PDF page with NO metadata dpi: 400 px wide over 200 pt → 144 dpi; a
    # sibling WITH metadata keeps the whole doc on metadata (all() truthy)
    no_meta = B.encode_page_container([(_page_png(5, dpi=0, w=400), 200.0)])
    with_meta = B.encode_page_container(
        [(_page_png(6, dpi=300, w=400), 200.0), (_page_png(7, dpi=250, w=400), 200.0)]
    )
    mixed = B.encode_page_container(
        [(_page_png(8, dpi=300, w=400), 200.0), (_page_png(9, dpi=0, w=400), 100.0)]
    )
    pages = B.rasterize(
        _mk(
            spark,
            [
                ("eff", "pdf", bytearray(no_meta), True),
                ("meta", "pdf", bytearray(with_meta), True),
                ("mixed", "pdf", bytearray(mixed), True),
                ("img", "png", bytearray(_page_png(5, dpi=0, w=400)), True),
            ],
        )
    )
    pay = {r["media_ref"]: r["dpi"] for r in B.pages_to_payloads(pages).collect()}
    assert pay["eff#p0"] == pytest.approx(400 * 72.0 / 200.0)  # 144.0
    assert pay["meta#p0"] == 300.0 and pay["meta#p1"] == 250.0
    # one missing page flips the WHOLE pdf doc to effective dpi
    assert pay["mixed#p0"] == pytest.approx(400 * 72.0 / 200.0)
    assert pay["mixed#p1"] == pytest.approx(400 * 72.0 / 100.0)
    # non-pdf never uses geometry (reference guards on doc_format == 'pdf')
    assert pay["img#p0"] == 0.0


@pytest.mark.slow
def test_extract_from_binary_end_to_end(spark):
    ok_pdf = B.encode_page_container([(_page_png(10), 612.0), (_page_png(11), 612.0)])
    corrupt = B.encode_page_container([(b"trash", 612.0)])
    rows = [
        ("ok", "pdf", bytearray(ok_pdf), True),
        ("bad", "pdf", bytearray(corrupt), True),
        ("bypass", "pdf", bytearray(corrupt), False),  # requiresOCR=False
        ("lone", "png", bytearray(_page_png(12)), True),
    ]
    out = {
        r["doc_id"]: r.asDict(recursive=True)
        for r in B.extract_from_binary(_mk(spark, rows)).collect()
    }
    assert out["ok"]["accepted"] is True and out["ok"]["reasons"] == []
    assert len(out["ok"]["spans"]) == 2  # both pages survive gating
    assert out["bad"]["accepted"] is False
    assert out["bad"]["reasons"][0].startswith(
        "Critical error during evaluation: Failed to extract images from bad: "
    )
    assert out["bad"]["spans"] == []
    assert out["bypass"]["accepted"] is True and out["bypass"]["reasons"] == []
    assert out["lone"]["accepted"] is True
    assert [s["media_ref"] for s in out["lone"]["spans"]] == ["lone#p0"]


@pytest.mark.slow
def test_stream_binary_extraction_equals_batch(spark, tmp_path):
    """readStream over binary documents through foreachBatch must equal the
    one-shot batch run on identical input."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from document_quality_assessment_ocr_spark.streaming.extract import (
        stream_binary_extraction,
    )

    def doc(i, good=True):
        blob = B.encode_page_container(
            [(_page_png(100 + i), 612.0)] if good else [(b"junk", 612.0)]
        )
        return {"doc_id": f"s{i}", "fmt": "pdf", "content": blob,
                "requires_ocr": True}

    rows = [doc(0), doc(1), doc(2, good=False), doc(3)]
    schema = pa.schema([("doc_id", pa.string()), ("fmt", pa.string()),
                        ("content", pa.binary()), ("requires_ocr", pa.bool_())])
    in_dir = tmp_path / "bin_in"
    in_dir.mkdir()
    # two files → two micro-batches with maxFilesPerTrigger=1
    pq.write_table(pa.Table.from_pylist(rows[:2], schema=schema), str(in_dir / "a.parquet"))
    pq.write_table(pa.Table.from_pylist(rows[2:], schema=schema), str(in_dir / "b.parquet"))

    out_dir, cp = str(tmp_path / "bin_out"), str(tmp_path / "bin_cp")
    stream_binary_extraction(spark, str(in_dir), out_dir, cp)
    got = {r["doc_id"]: r.asDict(recursive=True)
           for r in spark.read.parquet(out_dir).collect()}

    batch_in = spark.createDataFrame(
        [(r["doc_id"], r["fmt"], bytearray(r["content"]), r["requires_ocr"])
         for r in rows], B.BINARY_DOCS_SCHEMA)
    exp = {r["doc_id"]: r.asDict(recursive=True)
           for r in B.extract_from_binary(batch_in).collect()}
    assert set(got) == set(exp) == {"s0", "s1", "s2", "s3"}
    for k in exp:
        assert got[k]["accepted"] == exp[k]["accepted"], k
        assert got[k]["reasons"] == exp[k]["reasons"], k
        assert got[k]["spans"] == exp[k]["spans"], k


def _have(mod):
    import importlib.util

    return importlib.util.find_spec(mod) is not None


def test_real_codec_shim_absent_libs_yield_error_rows(spark):
    """Plugging a real-codec parser on a box WITHOUT the libs must follow
    the errors-as-data contract: ImportError inside the parser becomes a
    handler-level error ROW (criteria.py:39-41 shape), never a task crash."""
    if _have("pymupdf"):
        pytest.skip("pymupdf present — absent-lib contract not testable")
    from document_quality_assessment_ocr_spark.sources import codecs

    rows = _raster(
        spark,
        [("d1", "pdf", bytearray(b"%PDF-1.4 fake"), True)],
        parser=codecs.pymupdf_pdf_parser(),
    )
    assert len(rows) == 1
    assert rows[0]["error"].startswith("Failed to extract images from d1:")


@pytest.mark.skipif(not _have("pymupdf"), reason="pymupdf not installed")
def test_pymupdf_parser_rasterizes_real_pdf(spark):
    """Integration (runs wherever pymupdf exists): a real PDF rasterizes
    through the SAME front-end — caps, K9 arithmetic, span scoring all
    downstream-identical to the test-double path."""
    import pymupdf

    from document_quality_assessment_ocr_spark.sources import codecs

    doc = pymupdf.open()
    for _ in range(5):
        page = doc.new_page(width=612, height=792)
        page.insert_text((72, 72), "hello extraction")
    blob = doc.tobytes()
    rows = _raster(
        spark,
        [("d1", "pdf", bytearray(blob), True)],
        parser=codecs.pymupdf_pdf_parser(dpi=96),
    )
    assert sorted(r["page_idx"] for r in rows) == [0, 1, 2]  # 3-page cap
    for r in rows:
        assert r["error"] is None and r["dpi"] == 96
        assert abs(r["page_width_pt"] - 612.0) < 1e-9
        arr, pdpi = png.decode_gray(bytes(r["png"]))  # in-repo codec reads it
        assert arr.shape == (r["height"], r["width"]) and pdpi == 96


@pytest.mark.skipif(not _have("PIL"), reason="PIL not installed")
def test_pil_parser_reads_multiframe_tiff(spark):
    import io

    import numpy as _np
    from PIL import Image

    from document_quality_assessment_ocr_spark.sources import codecs

    frames = [
        Image.fromarray(_np.full((40, 30), 60 * i, dtype=_np.uint8))
        for i in range(1, 4)
    ]
    buf = io.BytesIO()
    frames[0].save(buf, format="TIFF", save_all=True, append_images=frames[1:])
    rows = _raster(
        spark,
        [("t1", "tiff", bytearray(buf.getvalue()), True)],
        parser=codecs.pil_image_parser(),
    )
    assert sorted(r["page_idx"] for r in rows) == [0, 1, 2]
    assert all(r["error"] is None for r in rows)
