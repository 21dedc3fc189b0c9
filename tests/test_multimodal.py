"""Multimodal plumbing tests: decode/feature/resize over mapInPandas, audio
frame-sampling via the deterministic fake decoder, error-as-data rows."""

import numpy as np
import pytest

from document_quality_assessment_ocr_spark import png
from document_quality_assessment_ocr_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def payloads(spark):
    rng = np.random.default_rng(9)
    rows = []
    for i in range(6):
        arr = rng.integers(0, 256, (60 + i * 10, 40 + i * 5), dtype=np.uint8)
        rows.append((f"m{i}", bytearray(png.encode_gray(arr))))
    rows.append(("broken", bytearray(b"not a png")))
    return spark.createDataFrame(rows, "media_ref string, png binary")


def test_image_features(payloads):
    out = {r["media_ref"]: r for r in mm.image_features(payloads).collect()}
    assert out["m0"]["width"] == 40 and out["m0"]["height"] == 60
    assert 0 <= out["m0"]["ink_ratio"] <= 1
    assert out["m0"]["entropy"] > 6  # random bytes ≈ 8 bits
    assert out["broken"]["error"] is not None and out["broken"]["width"] is None


def test_image_thumbnails_roundtrip(payloads):
    out = {r["media_ref"]: r for r in mm.image_thumbnails(payloads, max_size=32).collect()}
    t = out["m5"]
    assert max(t["thumb_w"], t["thumb_h"]) <= 32
    arr, _ = png.decode_gray(bytes(t["thumb_png"]))
    assert arr.shape == (t["thumb_h"], t["thumb_w"])
    assert out["broken"]["error"] is not None


def test_audio_frame_rms_fake_decoder(payloads):
    out = mm.audio_frame_rms(payloads, frame=512).collect()
    by_ref = {}
    for r in out:
        by_ref.setdefault(r["media_ref"], []).append((r["frame_idx"], r["rms"]))
    assert len(by_ref["m0"]) == 4096 // 512
    rms = [v for _, v in sorted(by_ref["m0"])]
    assert all(0.5 < v < 1.5 for v in rms)  # ~N(0,1) frames
    # deterministic: same payload → same values
    out2 = mm.audio_frame_rms(payloads, frame=512).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_real_audio_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"RIFF....WAVE")
