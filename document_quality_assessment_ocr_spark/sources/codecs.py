"""Optional real-codec parsers for the binary front-end (SURVEY §2.1 S4/S5).

The container ships no pymupdf/PIL (the reference's own handler tests mock
them too — reference ``tests/test_handlers.py:18-124``), so the default
parser is :func:`sources.binary_docs.parse_page_container` over the
deterministic multi-page framing.  A user with REAL PDFs/TIFFs plugs one of
these into the same ``bytes → [(png_bytes, width_pt)]`` seam::

    from document_quality_assessment_ocr_spark.sources import binary_docs, codecs
    pages = binary_docs.rasterize(docs, parser=codecs.pymupdf_pdf_parser(dpi=200))

Each factory import-checks lazily INSIDE the returned parser, so merely
importing this module never requires the libraries; executors that lack
them raise a normal decode error which the front-end's errors-as-data
contract turns into an error ROW (``Failed to extract images from …``),
never a task crash.  Decoded frames re-encode through the in-repo PNG
codec (grayscale), so every downstream stage — kernels, payload table,
span scoring — is byte-identical to the test-double path; mirrors the
reference's rasterizer at ``handlers/pdf_handler.py:48-122`` and frame
extractor at ``handlers/tiff_handler.py:8-48``.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from .. import png


def _to_gray(arr: np.ndarray) -> np.ndarray:
    """H×W[×C] uint8 → H×W grayscale with the Rec.601 integer weights
    (matches PIL's 'L' conversion arithmetic)."""
    if arr.ndim == 2:
        return arr.astype(np.uint8)
    rgb = arr[..., :3].astype(np.uint32)
    g = (rgb[..., 0] * 299 + rgb[..., 1] * 587 + rgb[..., 2] * 114) // 1000
    return g.astype(np.uint8)


def pymupdf_pdf_parser(dpi: int = 200, max_pages: int = 0):
    """PDF bytes → [(gray_png, page_width_pt)] via pymupdf (fitz).

    ``dpi`` sets the render resolution (the reference renders at the
    caller-supplied DPI, ``pdf_handler.py:70``); ``max_pages=0`` parses
    every page — the front-end applies its own budget afterwards, keeping
    the cap logic in ONE place.  Raises ImportError when pymupdf is
    absent (→ handler-level error row, not a crash).
    """

    def parse(content: bytes) -> List[Tuple[bytes, float]]:
        import pymupdf  # noqa: PLC0415 — optional dependency, lazy

        doc = pymupdf.open(stream=content, filetype="pdf")
        try:
            n = doc.page_count if max_pages <= 0 else min(doc.page_count, max_pages)
            zoom = float(dpi) / 72.0
            out: List[Tuple[bytes, float]] = []
            for i in range(n):
                page = doc.load_page(i)
                pix = page.get_pixmap(
                    matrix=pymupdf.Matrix(zoom, zoom), colorspace=pymupdf.csGRAY
                )
                arr = np.frombuffer(pix.samples, dtype=np.uint8).reshape(
                    pix.height, pix.stride
                )[:, : pix.width]
                out.append((png.encode_gray(arr, dpi=int(dpi)), float(page.rect.width)))
            return out
        finally:
            doc.close()

    return parse


def pil_image_parser():
    """Image/TIFF bytes → [(gray_png, 0.0)] per frame via PIL.

    Multi-frame TIFFs yield one tuple per frame (the front-end caps at
    20, ``tiff_handler.py:15``); single images yield one.  Metadata DPI
    carries through when PIL exposes it.  Raises ImportError when PIL is
    absent (→ handler-level error row).
    """

    def parse(content: bytes) -> List[Tuple[bytes, float]]:
        import io

        from PIL import Image, ImageSequence  # noqa: PLC0415 — optional, lazy

        im = Image.open(io.BytesIO(content))
        out: List[Tuple[bytes, float]] = []
        for frame in ImageSequence.Iterator(im):
            g = frame.convert("L")
            dpi = int(round((g.info.get("dpi") or im.info.get("dpi") or (0, 0))[0]))
            arr = np.asarray(g, dtype=np.uint8)
            out.append((png.encode_gray(arr, dpi=dpi), 0.0))
        return out

    return parse
