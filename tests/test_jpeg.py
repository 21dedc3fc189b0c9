"""Baseline JPEG codec (sources/jpeg.py, round 5): round-trip fidelity,
decoder determinism, restart/subsampling/odd-size paths, the honest
unsupported-mode boundary, and error-as-data through the Spark surface."""

import hashlib

import numpy as np
import pytest

from document_quality_assessment_ocr_spark.sources import jpeg
from document_quality_assessment_ocr_spark.sources.fixtures import (
    build_jpeg_payloads,
    jpeg_payload_names,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10.0 * np.log10(255.0**2 / max(mse, 1e-12))


def _ramp(h=48, w=64):
    return (np.linspace(0, 255, w)[None, :] * np.ones((h, 1))).astype(np.uint8)


def test_gray_roundtrip_high_quality():
    img = _ramp()
    dec = jpeg.decode_jpeg_gray(jpeg.encode_jpeg_gray(img, quality=90))
    assert dec.shape == img.shape
    assert _psnr(dec, img) > 45.0


def test_odd_dimensions_crop():
    img = (np.add.outer(np.arange(21) * 7, np.arange(13) * 11) % 256).astype(np.uint8)
    dec = jpeg.decode_jpeg_gray(jpeg.encode_jpeg_gray(img, quality=95))
    assert dec.shape == (21, 13)  # MCU padding cropped back off


def test_restart_markers_roundtrip():
    img = _ramp().T.copy()
    enc = jpeg.encode_jpeg_gray(img, quality=75, restart_interval=3)
    assert b"\xff\xd0" in enc or b"\xff\xd1" in enc  # RSTn actually emitted
    assert _psnr(jpeg.decode_jpeg_gray(enc), img) > 35.0


@pytest.mark.parametrize("sub", ["420", "422"])
def test_color_subsampled_luma(sub):
    rgb = np.zeros((40, 56, 3), dtype=np.uint8)
    rgb[..., 0] = _ramp(40, 56)
    rgb[..., 1] = _ramp(40, 56)[::-1, :]
    rgb[..., 2] = 96
    dec = jpeg.decode_jpeg_gray(jpeg.encode_jpeg_color(rgb, quality=85, subsample=sub))
    y, _, _ = jpeg.rgb_to_ycbcr(rgb)
    assert dec.shape == y.shape
    # chroma blocks are entropy-decoded (stream stays in sync) but only
    # the luma plane is reconstructed — it must match the pre-encode Y
    assert _psnr(dec, y) > 40.0


def test_low_quality_noise_decodes():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (32, 32), dtype=np.uint8).astype(np.uint8)
    dec = jpeg.decode_jpeg_gray(jpeg.encode_jpeg_gray(img, quality=30))
    assert dec.shape == img.shape  # heavy quantization, still structurally exact


def test_decode_deterministic():
    cat = build_jpeg_payloads()
    h1 = {
        n: hashlib.md5(jpeg.decode_jpeg_gray(d).tobytes()).hexdigest()
        for n, d in cat.items()
        if n != "corrupt_jpeg"
    }
    h2 = {
        n: hashlib.md5(jpeg.decode_jpeg_gray(d).tobytes()).hexdigest()
        for n, d in cat.items()
        if n != "corrupt_jpeg"
    }
    assert h1 == h2 and len(h1) == len(jpeg_payload_names()) - 1


def test_malformed_and_unsupported_raise():
    good = jpeg.encode_jpeg_gray(_ramp(), quality=80)
    for bad in (
        b"",
        b"nope",
        b"\xff\xd8\xff\xe0\x00\x07JFIFxx",  # header then garbage
        good[: len(good) // 2],  # truncated entropy data
    ):
        with pytest.raises(ValueError):
            jpeg.decode_jpeg_gray(bad)
    # missing EOI tail is TOLERATED when every MCU already decoded — the
    # documented behavior (r5 ADVICE: assert it positively instead of a
    # dead skip)
    assert jpeg.decode_jpeg_gray(good[:-2]).shape == jpeg.decode_jpeg_gray(good).shape
    # progressive (SOF2) is a documented hard boundary
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="progressive"):
        jpeg.decode_jpeg_gray(prog)


def test_catalog_lockstep_and_profiles():
    from document_quality_assessment_ocr_spark.operators.multimodal import (
        jpeg_profile_values,
    )

    cat = build_jpeg_payloads()
    assert sorted(cat) == sorted(jpeg_payload_names())  # lockstep contract
    ok = 0
    for n in jpeg_payload_names():
        if n == "corrupt_jpeg":
            with pytest.raises(ValueError):
                jpeg_profile_values(cat[n])
            continue
        w, h, mean_milli, ahash = jpeg_profile_values(cat[n])
        assert w > 0 and h > 0 and 0 <= mean_milli <= 255_000
        assert len(ahash) == 16 and int(ahash, 16) >= 0
        ok += 1
    assert ok == len(jpeg_payload_names()) - 1


def test_jpeg_stats_error_as_data(spark):
    from document_quality_assessment_ocr_spark.operators.multimodal import jpeg_stats

    cat = build_jpeg_payloads()
    pay = spark.createDataFrame(
        [(n, bytearray(cat[n])) for n in sorted(cat)],
        "media_ref string, png binary",
    )
    rows = {r["media_ref"]: r for r in jpeg_stats(pay).collect()}
    assert rows["corrupt_jpeg"]["error"] is not None
    assert rows["corrupt_jpeg"]["width"] is None
    good = [r for n, r in rows.items() if n != "corrupt_jpeg"]
    assert all(r["error"] is None and r["width"] > 0 for r in good)
    # spark-side profile equals the shared pure function (the twin contract)
    from document_quality_assessment_ocr_spark.operators.multimodal import (
        jpeg_profile_values,
    )

    v = jpeg_profile_values(cat["gray_ramp"])
    r = rows["gray_ramp"]
    assert (r["width"], r["height"], r["mean_luma_milli"], r["ahash"]) == v


def test_reencode_ahash_invariance():
    """The q264 claim: a lossy JPEG q75 re-encode of a rendered page
    preserves the 8×8 aHash (hamming ≤ 4; measured 0 on the catalog)."""
    from document_quality_assessment_ocr_spark.operators.multimodal import (
        reencode_profile_values,
    )
    from document_quality_assessment_ocr_spark.sources.fixtures import build_payloads

    cat = build_payloads(seed=42)
    a, b, ham = reencode_profile_values(cat["ok_clean"]["png"])
    assert ham <= 4 and len(a) == 16 and len(b) == 16
    with pytest.raises(Exception):
        reencode_profile_values(cat["corrupt"]["png"])
