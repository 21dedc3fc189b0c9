"""Quantified kernel-deviation tests against REAL PIL/cv2 (skipif-gated).

``kernels.py`` re-derives the reference's PIL/cv2 math in pure numpy with
four documented deviations (kernels.py module docstring): bilinear resize
vs LANCZOS in the watermark path (reference ``criteria.py:100``),
projection-profile coordinate rotation vs PIL raster rotate in skew
(``criteria.py:82``), edge-replicate median padding (``criteria.py:284``),
and run-based CC labeling vs ``cv2.findContours`` (``criteria.py:52-60``).

Neither library ships in this container, so the tests skip here; on a real
deployment's driver (where PIL/cv2 exist) they re-implement the reference
recipes VERBATIM and assert the divergence bounds below. The bounds are
the deviation CONTRACT: if a kernel change widens a gap past them, the
fixture panel catches it wherever the libs are present.

Asserted bounds (panel = build_payloads(seed=42, 800x1000) decodable pages):
  * watermark: gating agreement at the shipped max_overlap=10 threshold on
    every panel page, and the periodic-comb fixture ranks strictly above
    every clean page in BOTH implementations;
  * skew: integer angle within ±1° on every page, exact on the planted
    skew fixture (the search space clamps to [-5, 5] in both);
  * median/noise: median3x3 equals PIL MedianFilter on the interior
    (padding differs only on the 1-px border); full-resolution noise_pct
    within 1.0pp of the reference recipe, and the subsampled production
    kernel within 1.5pp of full resolution;
  * CC boxes: box set equal to cv2 external-contour bounding rects for
    solid glyphs; estimated DPI within 5% on text pages.
"""

from __future__ import annotations

import importlib.util

import numpy as np
import pytest

from document_quality_assessment_ocr_spark import kernels
from document_quality_assessment_ocr_spark.sources import fixtures

_HAVE_PIL = importlib.util.find_spec("PIL") is not None
_HAVE_CV2 = importlib.util.find_spec("cv2") is not None


@pytest.fixture(scope="module")
def panel():
    pl = fixtures.build_payloads(seed=42, size=(800, 1000))
    return {n: p["arr"] for n, p in pl.items() if p["arr"] is not None}


@pytest.mark.skipif(not (_HAVE_PIL and _HAVE_CV2), reason="PIL/cv2 not installed")
def test_watermark_lanczos_deviation(panel):
    """Reference detect_watermark_fft (criteria.py:93-131) verbatim:
    512² LANCZOS, fftshift, cv2.line axis zeroing, minMaxLoc peak."""
    import cv2
    from PIL import Image

    def ref_watermark(arr: np.ndarray) -> float:
        img = Image.fromarray(arr).resize((512, 512), Image.Resampling.LANCZOS).convert("L")
        f = np.fft.fft2(np.array(img))
        mag = 20 * np.log(np.abs(np.fft.fftshift(f)) + 1)
        cy, cx = mag.shape[0] // 2, mag.shape[1] // 2
        cv2.line(mag, (0, cy), (mag.shape[1], cy), 0, 2)
        cv2.line(mag, (cx, 0), (cx, mag.shape[0]), 0, 2)
        _, max_val, _, _ = cv2.minMaxLoc(mag)
        mean_val = mag.mean()
        score = (max_val / (mean_val + 1e-9)) if mean_val > 0 else 0
        return float(max(0, min(100, (score - 1.5) * 20)))

    ours = {n: kernels.watermark_fft(a) for n, a in panel.items()}
    ref = {n: ref_watermark(a) for n, a in panel.items()}
    # gating agreement at the shipped threshold (max_overlap=10)
    for n in panel:
        assert (ours[n] > 10) == (ref[n] > 10), (n, ours[n], ref[n])
    # the periodic comb ranks above every clean page in both
    clean = [n for n in panel if n.startswith("ok_")]
    assert all(ours["bad_watermark"] > ours[n] for n in clean)
    assert all(ref["bad_watermark"] > ref[n] for n in clean)


@pytest.mark.skipif(not _HAVE_PIL, reason="PIL not installed")
def test_skew_pil_rotate_deviation(panel):
    """Reference calculate_skew (criteria.py:72-90) verbatim: PIL raster
    rotate(expand, fillcolor=255) per integer angle, row-count variance."""
    from PIL import Image

    def ref_skew(arr: np.ndarray) -> int:
        img = Image.fromarray(arr)
        if img.width > 1000 or img.height > 1000:
            img.thumbnail((1000, 1000))
        np_img = np.array(img)
        angles = np.arange(-5, 6)
        scores = [
            np.var(
                np.sum(
                    np.array(
                        Image.fromarray(np_img).rotate(
                            angle, expand=True, fillcolor=255
                        )
                    )
                    < 128,
                    axis=1,
                )
            )
            for angle in angles
        ]
        return int(angles[np.argmax(scores)])

    for n, a in panel.items():
        ours = int(kernels.skew_degrees(a))
        ref = ref_skew(a)
        assert abs(ours - ref) <= 1, (n, ours, ref)
    # the planted-skew fixtures must agree exactly
    assert int(kernels.skew_degrees(panel["bad_skew4"])) == ref_skew(panel["bad_skew4"])


@pytest.mark.skipif(not _HAVE_PIL, reason="PIL not installed")
def test_median_and_noise_deviation(panel):
    """median3x3 vs PIL MedianFilter: exact on the interior (only the 1-px
    border depends on padding); reference noise recipe (criteria.py:282-296)
    within 1.0pp at full resolution, production subsample within 1.5pp."""
    from PIL import Image, ImageChops, ImageFilter

    def ref_noise(arr: np.ndarray) -> float:
        img = Image.fromarray(arr)
        blur = img.filter(ImageFilter.MedianFilter(size=3))
        diff = ImageChops.difference(img, blur).point(lambda x: 255 if x > 30 else 0)
        np_diff = np.array(diff)
        return float(np.sum(np_diff == 255)) / np_diff.size * 100 if np_diff.size else 0.0

    for n in ("ok_clean", "bad_noise"):
        arr = panel[n]
        pil_med = np.array(Image.fromarray(arr).filter(ImageFilter.MedianFilter(3)))
        ours_med = kernels.median3x3(arr)
        assert np.array_equal(ours_med[1:-1, 1:-1], pil_med[1:-1, 1:-1]), n
        # full-res numpy recipe vs reference recipe (border-only divergence)
        full = np.abs(arr.astype(np.int16) - ours_med.astype(np.int16))
        full_pct = float(np.count_nonzero(full > 30)) / arr.size * 100.0
        assert abs(full_pct - ref_noise(arr)) <= 1.0, n
        # production subsampled kernel vs full resolution
        assert abs(kernels.noise_percent(arr) - full_pct) <= 1.5, n


@pytest.mark.skipif(not _HAVE_CV2, reason="cv2 not installed")
def test_cc_boxes_cv2_deviation(panel):
    """Reference estimate_dpi_from_image (criteria.py:44-69) verbatim:
    cv2 Otsu-INV + RETR_EXTERNAL contours. Solid glyphs → identical box
    sets; DPI estimate within 5% on text pages."""
    import cv2

    for n in ("ok_clean", "ok_est_dpi"):
        arr = panel[n]
        _, binary = cv2.threshold(arr, 0, 255, cv2.THRESH_BINARY_INV + cv2.THRESH_OTSU)
        contours, _ = cv2.findContours(binary, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
        ref_boxes = {tuple(cv2.boundingRect(c)) for c in contours}
        t = kernels.otsu_threshold(arr)
        ours_boxes = set(kernels.connected_component_boxes(arr <= t))
        assert ours_boxes == ref_boxes, n
        heights = [
            h for (_, _, w, h) in ref_boxes if 10 < h < 100 and 0.1 < (w / h) < 1.5
        ]
        if heights:
            import statistics

            ref_dpi = statistics.median(heights) / (2.5 / 25.4)
            ours_dpi = kernels.estimate_dpi(arr)
            assert abs(ours_dpi - ref_dpi) / ref_dpi <= 0.05, n


def test_deviation_suite_is_gated_not_dead():
    """In THIS container the libs are absent and the suite skips — assert
    the gate logic itself (so a future env with PIL/cv2 runs them)."""
    assert isinstance(_HAVE_PIL, bool) and isinstance(_HAVE_CV2, bool)
