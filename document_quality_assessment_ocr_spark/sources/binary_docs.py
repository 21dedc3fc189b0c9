"""Binary document front-end (SURVEY §2.1 S4/S5 + K9): bytes → scored pages.

Re-expresses the reference's handler layer — PDF rasterizer
(``src/document_assessor/handlers/pdf_handler.py:48-122``), TIFF frame
extractor (``handlers/tiff_handler.py:8-48``) and the format dispatch
(``criteria.py:28-41``) — as ONE ``mapInPandas`` stage over a
binary-documents table::

    (doc_id, fmt, content binary, requires_ocr)
        → rasterize() →
    (doc_id, fmt, page_idx, png, width, height, dpi, page_width_pt, error)
        → pages_to_payloads / pages_to_spans / extract_from_binary

Contract carried from the reference:

* **dispatch** on ``lower(fmt)``: ``'pdf'`` → page rasterizer, ``'tiff'`` →
  frame extractor, anything else → single-image decode
  (``criteria.py:30-38``).
* **page budgets**: PDF scores ``min(n_pages, max_pages, 3)`` pages
  (``pdf_handler.py:65``); TIFF a hard 20-frame cap (``tiff_handler.py:15``).
* **error paths**: a failing PDF page is skipped UNLESS no page has been
  extracted yet — then the whole document fails with
  ``Failed to extract even the first page: …`` (``pdf_handler.py:88-96``);
  a failing TIFF frame is always skipped (``tiff_handler.py:27-35``);
  handler-level failures become ONE error row
  ``Failed to extract images from {doc_id}: {err}`` (``criteria.py:39-41``)
  which :func:`extract_from_binary` surfaces as the reference's
  critical-error rejection. Errors are DATA (rows), never task crashes.
* **K9 effective DPI** (``criteria.py:229-241``): when any page of a PDF is
  missing metadata DPI, the WHOLE document's dpi list is replaced with
  ``rendered_width·72 / page_width_pt`` per page.

Decoding is PLUGGABLE: the container has no pymupdf/PIL, so the default
``parse_page_container`` understands a deterministic multi-page framing
(:func:`encode_page_container`) holding in-repo-codec PNG pages — the same
standard as the reference's own handler tests, which fully mock pymupdf/PIL
(reference ``tests/test_handlers.py:18-124``). Production swaps in a
pymupdf/PIL-backed parser with the same ``bytes → [(png, width_pt)]``
signature; everything Spark-side (schema, batching, caps, error contract,
K9 arithmetic) is identical and is what the tests pin.

Scale notes: rasterization is embarrassingly parallel (one input row → ≤3/20
output rows; Arrow batches keep the Python boundary amortized); downstream,
payload bytes never shuffle — pages go straight into the scored-payload
table and only numeric scores join to spans (plans/pipeline.py design).
"""

from __future__ import annotations

import struct as _struct
from typing import Callable, Iterator, List, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import png
from ..functions.udfs import MEDIA_SCORE_SCHEMA

PageParser = Callable[[bytes], List[Tuple[bytes, float]]]

_MAGIC = b"MPAG"

RASTER_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("page_idx", T.IntegerType()),
        T.StructField("png", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("dpi", T.IntegerType()),
        T.StructField("page_width_pt", T.DoubleType()),
        T.StructField("error", T.StringType()),
    ]
)

BINARY_DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("requires_ocr", T.BooleanType()),
    ]
)


def encode_page_container(pages: List[Tuple[bytes, float]]) -> bytes:
    """Multi-page container framing (test double for PDF/TIFF bytes):
    ``MPAG | u32 n | (u32 len, f64 width_pt, payload)*``. ``width_pt`` is the
    page's PDF-point width (0.0 when not applicable)."""
    out = [_MAGIC, _struct.pack("<I", len(pages))]
    for data, wpt in pages:
        out.append(_struct.pack("<Id", len(data), float(wpt)))
        out.append(data)
    return b"".join(out)


def parse_page_container(content: bytes) -> List[Tuple[bytes, float]]:
    """Default pluggable parser: container bytes → [(page_png, width_pt)].
    Raises ``ValueError`` on a malformed container (→ handler-level error,
    like the reference's ``pymupdf.open`` failure path)."""
    if len(content) < 8 or content[:4] != _MAGIC:
        raise ValueError("not a multi-page container")
    (n,) = _struct.unpack_from("<I", content, 4)
    off = 8
    pages = []
    for _ in range(n):
        if off + 12 > len(content):
            raise ValueError("truncated page container")
        ln, wpt = _struct.unpack_from("<Id", content, off)
        off += 12
        if off + ln > len(content):
            raise ValueError("truncated page container")
        pages.append((bytes(content[off : off + ln]), float(wpt)))
        off += ln
    return pages


def _raster_rows(
    doc_id: str,
    fmt: Optional[str],
    content: Optional[bytes],
    max_pages: int,
    parser: PageParser,
) -> list:
    fmt_l = (fmt or "").lower()
    rows: list = []
    try:
        if content is None:
            raise ValueError("no content")
        if fmt_l == "pdf":
            pages = parser(bytes(content))
            cap = min(len(pages), max_pages, 3)  # pdf_handler.py:65
            for i in range(cap):
                data, wpt = pages[i]
                try:
                    arr, pdpi = png.decode_gray(bytes(data))
                except Exception as pe:  # pdf_handler.py:88-96
                    if not rows:
                        raise RuntimeError(
                            f"Failed to extract even the first page: {pe}"
                        )
                    continue
                rows.append(
                    (doc_id, fmt_l, i, bytes(data), int(arr.shape[1]),
                     int(arr.shape[0]), int(pdpi), float(wpt), None)
                )
        elif fmt_l == "tiff":
            pages = parser(bytes(content))
            cap = min(len(pages), 20)  # tiff_handler.py:15
            for i in range(cap):
                data, wpt = pages[i]
                try:
                    arr, pdpi = png.decode_gray(bytes(data))
                except Exception:  # tiff_handler.py:27-35 — skip frame
                    continue
                rows.append(
                    (doc_id, fmt_l, i, bytes(data), int(arr.shape[1]),
                     int(arr.shape[0]), int(pdpi), float(wpt), None)
                )
        else:  # generic single image (criteria.py:37-38)
            arr, pdpi = png.decode_gray(bytes(content))
            rows.append(
                (doc_id, fmt_l, 0, bytes(content), int(arr.shape[1]),
                 int(arr.shape[0]), int(pdpi), 0.0, None)
            )
    except Exception as e:  # criteria.py:39-41 — handler-level error row
        return [
            (doc_id, fmt_l, None, None, None, None, None, None,
             f"Failed to extract images from {doc_id}: {e}")
        ]
    return rows


def rasterize(
    docs_df: DataFrame,
    max_pages: int = 5,
    parser: PageParser = parse_page_container,
) -> DataFrame:
    """Binary documents → per-page raster rows (Arrow-batched mapInPandas).

    ``docs_df`` needs (doc_id, fmt, content); extra columns are dropped. The
    reference's ``dpi`` render parameter has no meaning for the test-double
    parser (pages arrive pre-rendered); a pymupdf-backed parser closure owns
    it instead."""
    cols = ["doc_id", "fmt", "content"]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        names = [f.name for f in RASTER_SCHEMA.fields]
        for pdf in batches:
            out: list = []
            for doc_id, fmt, content in zip(
                pdf["doc_id"], pdf["fmt"], pdf["content"]
            ):
                out.extend(_raster_rows(doc_id, fmt, content, max_pages, parser))
            yield pd.DataFrame(out, columns=names)

    return docs_df.select(*cols).mapInPandas(gen, schema=RASTER_SCHEMA)


def _page_ref():
    return F.concat(
        F.col("doc_id"), F.lit("#p"), F.col("page_idx").cast("string")
    )


def pages_to_payloads(pages_df: DataFrame) -> DataFrame:
    """Raster rows → media-payload table, with K9 effective-DPI arithmetic:
    if ANY page of a PDF lacks metadata DPI, every page of that document
    gets ``width·72/page_width_pt`` instead (reference criteria.py:229-241
    replaces the whole dpis list). The per-doc flag is a tiny aggregate
    (≤3 pages/doc) reusing the scan."""
    ok = pages_df.filter(F.col("error").isNull())
    flags = ok.groupBy("doc_id").agg(F.min("dpi").alias("_min_dpi"))
    use_eff = (F.col("_min_dpi") <= 0) & (F.col("fmt") == F.lit("pdf"))
    eff = F.when(
        F.col("page_width_pt") > 0,
        F.col("width").cast("double") * F.lit(72.0) / F.col("page_width_pt"),
    ).otherwise(F.lit(0.0))
    return (
        ok.join(flags, "doc_id")
        .select(
            _page_ref().alias("media_ref"),
            "width",
            "height",
            F.when(use_eff, eff).otherwise(F.col("dpi").cast("double")).alias("dpi"),
            "png",
        )
    )


_SPAN_ARR = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"


def pages_to_spans(pages_df: DataFrame, docs_df: Optional[DataFrame] = None) -> DataFrame:
    """Raster rows → (doc_id, skip_checks, spans) in the pipeline's input
    model: one media span per page (offset = page index); a handler-error doc
    carries one span referencing its ``#error`` pseudo-payload. Passing the
    original ``docs_df`` wires the requiresOCR bypass (reference
    ``evaluator.py:21-22``: requiresOCR=False → accept unchecked) AND
    preserves zero-page documents (empty PDF/TIFF, all frames undecodable):
    they get an EMPTY spans array so the pipeline rejects them with the
    reference's no-images message (criteria.py:198-199) instead of silently
    vanishing from the output."""
    ref = F.when(F.col("error").isNull(), _page_ref()).otherwise(
        F.concat(F.col("doc_id"), F.lit("#error"))
    )
    s = F.struct(
        F.lit("media").alias("kind"),
        F.lit("").alias("text"),
        ref.alias("media_ref"),
        F.coalesce(F.col("page_idx"), F.lit(0)).cast("int").alias("offset"),
    )
    spans = (
        pages_df.select("doc_id", s.alias("s"))
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("s")).alias("spans"))
    )
    if docs_df is not None:
        skip = (
            (~F.coalesce(F.col("requires_ocr"), F.lit(True)))
            if "requires_ocr" in docs_df.columns
            else F.lit(False)
        )
        base = docs_df.select("doc_id", skip.alias("skip_checks"))
        return base.join(spans, "doc_id", "left").select(
            "doc_id",
            "skip_checks",
            F.coalesce(F.col("spans"), F.array().cast(_SPAN_ARR)).alias("spans"),
        )
    return spans.withColumn("skip_checks", F.lit(False))


def error_scored_rows(pages_df: DataFrame) -> DataFrame:
    """Handler-error rows → pre-scored payload rows whose ``ms.error`` carries
    the handler message, so the standard pipeline turns them into the
    reference's ``Critical error during evaluation: Failed to extract images
    from …`` rejection without any special-casing."""
    null_d = F.lit(None).cast("double")
    ms = F.struct(
        *[
            (F.col("error") if f.name == "error" else null_d).alias(f.name)
            for f in MEDIA_SCORE_SCHEMA.fields
        ]
    )
    return pages_df.filter(F.col("error").isNotNull()).select(
        F.concat(F.col("doc_id"), F.lit("#error")).alias("media_ref"),
        F.lit(0.0).alias("p_dpi"),
        ms.alias("ms"),
    )


def extract_from_binary(
    docs_df: DataFrame,
    criteria=None,
    max_pages: int = 5,
    parser: PageParser = parse_page_container,
    cache: bool = True,
) -> DataFrame:
    """End-to-end: binary documents table → per-document verdict + surviving
    spans, through the standard extraction plan. ``doc_id`` must be unique
    (apply operators.dedup.dedup_last_wins upstream for re-ingests, mirroring
    the reference's batch-level dedup at evaluator.py:55-57).

    ``cache=True`` persists the raster stage — it feeds both the payload
    scoring and the spans assembly, and pages must decode exactly once (the
    reference extracts images once per document too, criteria.py:176-197)."""
    from ..plans.pipeline import run_extraction, score_payload_table

    pages = rasterize(docs_df, max_pages=max_pages, parser=parser)
    if cache:
        pages = pages.persist()
    payloads = pages_to_payloads(pages)
    scored = score_payload_table(payloads).unionByName(error_scored_rows(pages))
    spans = pages_to_spans(pages, docs_df)
    return run_extraction(
        spans,
        payloads,
        criteria=criteria,
        scored_payloads=scored,
        assume_unique_doc_ids=True,
    )
