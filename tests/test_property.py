"""Property-based kernel tests (hypothesis): invariants that must hold for
ANY grayscale page, not just the fixture constructions."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from document_quality_assessment_ocr_spark import kernels, png

small_gray = arrays(
    np.uint8,
    st.tuples(st.integers(4, 40), st.integers(4, 40)),
    elements=st.integers(0, 255),
)


@settings(max_examples=60, deadline=None)
@given(small_gray)
def test_content_ratio_bounds(a):
    r = kernels.content_ratio(a)
    assert 0.0 <= r <= 100.0
    # same operation ORDER as the kernel (count/size * 100): float equality
    assert r == float(np.count_nonzero(a < 200)) / a.size * 100.0


@settings(max_examples=60, deadline=None)
@given(small_gray)
def test_brightness_bounds(a):
    b = kernels.brightness_with_trim(a)
    assert 0.0 <= b <= 255.0
    assert b >= a.min() - 1e-9 and b <= a.max() + 1e-9


@settings(max_examples=60, deadline=None)
@given(small_gray)
def test_entropy_bounds(a):
    e = kernels.entropy256(a)
    assert -1e-6 <= e <= 8.0 + 1e-6


@settings(max_examples=60, deadline=None)
@given(small_gray)
def test_noise_bounds(a):
    n = kernels.noise_percent(a)
    assert 0.0 <= n <= 100.0


@settings(max_examples=60, deadline=None)
@given(small_gray)
def test_blur_nonnegative(a):
    assert kernels.blur_laplacian_var(a) >= 0.0


@settings(max_examples=60, deadline=None)
@given(small_gray)
def test_skew_in_search_space(a):
    s = kernels.skew_degrees(a)
    assert s == int(s) and -5 <= s <= 5


@settings(max_examples=40, deadline=None)
@given(small_gray)
def test_median_network_equals_np_median(a):
    p = np.pad(a, 1, mode="edge")
    stack = np.stack(
        [p[i : i + a.shape[0], j : j + a.shape[1]] for i in range(3) for j in range(3)]
    )
    assert (kernels.median3x3(a) == np.median(stack, axis=0).astype(np.uint8)).all()


@settings(max_examples=40, deadline=None)
@given(small_gray, st.integers(0, 600))
def test_png_roundtrip_any_shape(a, dpi):
    data = png.encode_gray(a, dpi=dpi)
    b, d = png.decode_gray(data)
    assert (a == b).all()
    if dpi > 0:
        assert abs(d - dpi) <= 1  # ppm quantization


@settings(max_examples=40, deadline=None)
@given(small_gray)
def test_connected_components_partition_dark_pixels(a):
    mask = a < 128
    boxes = kernels.connected_component_boxes(mask)
    total_dark = int(mask.sum())
    if total_dark == 0:
        assert boxes == []
    else:
        # every dark pixel is inside at least one box
        cover = np.zeros_like(mask)
        for x, y, w, h in boxes:
            cover[y : y + h, x : x + w] = True
        assert bool((mask & ~cover).sum() == 0)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.floats(-1e6, 1e6), max_size=8), st.sampled_from(["min", "max", "avg", "weird"]))
def test_aggregate_matches_python(vals, mode):
    got = kernels.aggregate(vals, mode)
    if not vals:
        assert got == 0.0
    elif mode == "max":
        assert got == max(vals)
    elif mode == "avg":
        assert got == sum(vals) / len(vals)
    else:
        assert got == min(vals)
