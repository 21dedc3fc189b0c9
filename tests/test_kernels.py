"""Kernel unit tests: pin each K1–K8 kernel against analytically known values
and the reference's own test expectations (reference
``tests/test_criteria.py:33-220``)."""

import numpy as np
import pytest

from document_quality_assessment_ocr_spark import kernels, png


def white(h=100, w=80):
    return np.full((h, w), 255, dtype=np.uint8)


def test_content_ratio_blank_and_black():
    assert kernels.content_ratio(white()) == 0.0
    assert kernels.content_ratio(np.zeros((10, 10), dtype=np.uint8)) == 100.0


def test_content_ratio_threshold_boundary():
    a = white(10, 10)
    a[0, 0] = 199  # < 200 counts as ink
    a[0, 1] = 200  # >= 200 does not
    assert kernels.content_ratio(a) == pytest.approx(1.0)


def test_brightness_blank_is_255():
    # reference tests/test_criteria.py:203-208
    assert kernels.brightness_with_trim(white()) == 255.0


def test_brightness_trims_to_bright_bbox():
    a = np.full((10, 10), 10, dtype=np.uint8)  # fully dark → mean of whole
    assert kernels.brightness_with_trim(a) == pytest.approx(10.0)
    a[2:5, 2:5] = 230  # bright bbox rows/cols 2..4
    crop = a[2:5, 2:5]
    assert kernels.brightness_with_trim(a) == pytest.approx(float(crop.mean()))


def test_blur_flat_image_zero_variance():
    assert kernels.blur_laplacian_var(white()) == 0.0


def test_blur_sharp_edge_high_variance():
    a = white(100, 100)
    a[:, 50:] = 0
    assert kernels.blur_laplacian_var(a) > 1000


def test_laplacian_matches_manual_interior():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 256, (20, 20), dtype=np.uint8)
    f = a.astype(np.float64)
    lap = np.zeros_like(f)
    for y in range(1, 19):
        for x in range(1, 19):
            lap[y, x] = f[y - 1, x] + f[y + 1, x] + f[y, x - 1] + f[y, x + 1] - 4 * f[y, x]
    p = np.pad(f, 1, mode="reflect")
    full = p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:] - 4 * f
    assert np.allclose(full[1:-1, 1:-1], lap[1:-1, 1:-1])


def test_skew_returns_int_in_range():
    rng = np.random.default_rng(1)
    from document_quality_assessment_ocr_spark.sources.fixtures import (
        draw_text_page,
        rotate_nearest,
    )

    page = draw_text_page(rng, w=400, h=500)
    assert kernels.skew_degrees(page) == 0.0
    rot = rotate_nearest(page, 3.0)
    assert kernels.skew_degrees(rot) == 3.0
    rot = rotate_nearest(page, -4.0)
    assert kernels.skew_degrees(rot) == -4.0
    # beyond the search space clamps to the edge (reference criteria.py:77)
    rot = rotate_nearest(page, 10.0)
    assert abs(kernels.skew_degrees(rot)) == 5.0
    assert kernels.skew_degrees(white()) == 0.0  # no dark pixels


def test_entropy_uniform_zero_and_two_level():
    # reference tests/test_criteria.py:138-139 — uniform gray → ~0 entropy
    assert kernels.entropy256(np.full((64, 64), 128, dtype=np.uint8)) == pytest.approx(
        0.0, abs=1e-6
    )
    a = white(100, 100)
    a[:50] = 0  # 50/50 two-level → 1 bit
    assert kernels.entropy256(a) == pytest.approx(1.0, abs=1e-3)


def test_noise_salt_pepper_detected():
    rng = np.random.default_rng(2)
    a = white(200, 200)
    flips = rng.random(a.shape) < 0.10
    a[flips] = 0
    measured = kernels.noise_percent(a)
    assert 5.0 < measured < 15.0  # isolated pepper on white ≈ flip rate
    assert kernels.noise_percent(white()) == 0.0


def test_estimate_dpi_glyph_height():
    # glyphs of height 30 px → dpi = 30 / (2.5/25.4) = 304.8
    a = white(400, 400)
    for y in range(30, 360, 60):
        for x in range(20, 360, 40):
            a[y : y + 30, x : x + 20] = 0
    assert kernels.estimate_dpi(a) == pytest.approx(304.8, rel=1e-6)
    assert kernels.estimate_dpi(white()) == 0.0  # no contours → 0.0


def test_otsu_bimodal():
    a = np.concatenate([np.full(500, 30, np.uint8), np.full(500, 220, np.uint8)]).reshape(
        20, 50
    )
    t = kernels.otsu_threshold(a)
    assert 30 <= t < 220


def test_connected_components_boxes():
    a = np.zeros((20, 20), dtype=bool)
    a[2:5, 2:6] = True  # box 1: w=4 h=3
    a[10:18, 10:12] = True  # box 2: w=2 h=8
    boxes = sorted(kernels.connected_component_boxes(a))
    assert boxes == [(2, 2, 4, 3), (10, 10, 2, 8)]


def test_connected_components_diagonal_8conn():
    a = np.zeros((4, 4), dtype=bool)
    a[0, 0] = a[1, 1] = a[2, 2] = True
    boxes = kernels.connected_component_boxes(a)
    assert len(boxes) == 1 and boxes[0] == (0, 0, 3, 3)


def test_aggregate_modes():
    # reference criteria.py:140-149 incl. empty→0 and unknown→min
    assert kernels.aggregate([], "min") == 0.0
    assert kernels.aggregate([3, 1, 2], "min") == 1.0
    assert kernels.aggregate([3, 1, 2], "max") == 3.0
    assert kernels.aggregate([3, 1, 2], "avg") == 2.0
    assert kernels.aggregate([3, 1, 2], "all_pass") == 1.0


def test_watermark_comb_vs_clean():
    from document_quality_assessment_ocr_spark.sources.fixtures import (
        draw_text_page,
        periodic_dot_comb,
    )

    rng = np.random.default_rng(3)
    assert kernels.watermark_fft(draw_text_page(rng)) < 10.0
    assert kernels.watermark_fft(periodic_dot_comb(1000, 800)) > 10.0


def test_png_roundtrip():
    rng = np.random.default_rng(4)
    a = rng.integers(0, 256, (37, 53), dtype=np.uint8)
    data = png.encode_gray(a, dpi=200)
    b, dpi = png.decode_gray(data)
    assert (a == b).all()
    assert dpi == 200
    with pytest.raises(ValueError):
        png.decode_gray(data[:60])
    with pytest.raises(ValueError):
        png.decode_gray(b"not a png at all")
