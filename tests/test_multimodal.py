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


def test_real_wav_decode_roundtrip():
    """decode_audio is REAL for PCM WAV: 16-bit roundtrip is exact to 1 LSB,
    stereo downmixes by mean, 8-bit dequantizes around 128, corrupt raises."""
    from document_quality_assessment_ocr_spark.sources.fixtures import (
        build_wav_payloads,
        wav_payload_names,
    )

    cat = build_wav_payloads()
    assert sorted(cat) == sorted(wav_payload_names())  # lockstep contract
    pcm = mm.decode_audio(cat["ramp"])
    assert pcm.dtype == np.float32 and len(pcm) == 4096
    assert abs(pcm[0] - (-0.9)) < 1e-3 and abs(pcm[-1] - 0.9) < 1e-3
    assert float(np.abs(mm.decode_audio(cat["silence"])).max()) == 0.0
    # stereo downmix = mean of a 0.6-amp and 0.3-amp tone → RMS between them
    st = mm.decode_audio(cat["stereo_tones"])
    assert len(st) == 4096
    # 8-bit path: 220 Hz half-amp tone, RMS ≈ 0.5/sqrt(2)
    a8 = mm.decode_audio(cat["tone_8bit"])
    assert abs(float(np.sqrt((a8.astype(np.float64) ** 2).mean())) - 0.3536) < 0.02
    with pytest.raises(Exception):
        mm.decode_audio(cat["corrupt_wav"])


def test_audio_frame_rms_real_decoder(spark):
    """The real path end-to-end: WAV catalog → mapInPandas decode → per-frame
    RMS; values match the shared pure function exactly; corrupt payload
    contributes no rows."""
    from document_quality_assessment_ocr_spark.sources.fixtures import build_wav_payloads

    cat = build_wav_payloads()
    df = spark.createDataFrame(
        [(n, bytearray(b)) for n, b in sorted(cat.items())],
        "media_ref string, png binary",
    )
    out = mm.audio_frame_rms(df, frame=512, use_fake_decoder=False).collect()
    by_ref = {}
    for r in out:
        by_ref.setdefault(r["media_ref"], {})[r["frame_idx"]] = r["rms"]
    assert "corrupt_wav" not in by_ref
    assert set(by_ref) == set(cat) - {"corrupt_wav"}
    for name in by_ref:
        expected = mm.wav_frame_rms_values(cat[name], 512)
        assert len(by_ref[name]) == len(expected) == 8
        for i, v in enumerate(expected):
            assert by_ref[name][i] == v  # bit-exact: same shared function
    # sanity on magnitudes: full-scale tone ≈ 0.8/sqrt(2), silence = 0
    assert abs(by_ref["tone_440"][0] - 0.8 / np.sqrt(2)) < 0.01
    assert by_ref["silence"][0] == 0.0


def test_video_frame_sample_stride_and_errors(spark):
    """Stride sampling decodes only every k-th frame up to the budget; bad
    containers are error rows; the real decoder is honestly stubbed."""
    from document_quality_assessment_ocr_spark.sources.binary_docs import (
        encode_page_container,
    )

    rng = np.random.default_rng(11)
    frames = [
        (png.encode_gray(np.full((20, 30), i * 10, dtype=np.uint8)), 0.0)
        for i in range(20)
    ]
    vid = encode_page_container(frames)
    df = spark.createDataFrame(
        [("v1", bytearray(vid)), ("junk", bytearray(b"zz"))],
        "media_ref string, png binary",
    )
    rows = mm.video_frame_sample(df, every_k=5, max_frames=3).collect()
    by_ref = {}
    for r in rows:
        by_ref.setdefault(r["media_ref"], []).append(r)
    got = sorted((r["frame_idx"], r["mean_gray"]) for r in by_ref["v1"])
    # frames 0, 5, 10 (every 5th, capped at 3): solid gray i*10
    assert got == [(0, 0.0), (5, 50.0), (10, 100.0)]
    assert by_ref["junk"][0]["error"] is not None

    # non-Y4M bytes are a clean ValueError (error row, never a task crash)
    with pytest.raises(ValueError):
        next(mm.decode_video_frames(b"anything"))


def test_real_y4m_decode_roundtrip():
    """decode_video_frames is REAL for Y4M: luma planes roundtrip exactly,
    C422/Cmono colorspaces skip their chroma planes correctly, corrupt
    containers raise, and the catalog stays lockstep with its names fn."""
    from document_quality_assessment_ocr_spark.sources.fixtures import (
        build_y4m_payloads,
        y4m_payload_names,
    )

    cat = build_y4m_payloads()
    assert sorted(cat) == sorted(y4m_payload_names())  # lockstep contract
    yy, xx = np.mgrid[0:48, 0:64]
    frames = list(mm.decode_video_frames(cat["gradient_pan"]))
    assert len(frames) == 24 and frames[0].shape == (48, 64)
    for i in (0, 7, 23):
        assert np.array_equal(frames[i], ((xx * 4 + yy * 2 + 7 * i) % 256).astype(np.uint8))
    # chroma-plane offset arithmetic: C422 and Cmono land on the same luma
    f422 = list(mm.decode_video_frames(cat["tone_c422"]))
    assert np.array_equal(f422[3], ((yy * 5 + 9) % 256).astype(np.uint8))
    fmono = list(mm.decode_video_frames(cat["mono_ramp"]))
    assert np.array_equal(fmono[2], ((xx + 26) % 256).astype(np.uint8))
    with pytest.raises(ValueError):
        list(mm.decode_video_frames(cat["corrupt_y4m"]))
    # stats contract: stride + budget + exact means; short clip under-fills
    stats = mm.video_frame_stats_values(cat["fade_up"], every_k=5, max_frames=8)
    assert [s[0] for s in stats] == [0, 5, 10, 15, 20]
    assert stats[1] == (5, 64, 48, 55.0)
    assert len(mm.video_frame_stats_values(cat["short_clip"], 5, 8)) == 1


def test_video_frame_sample_real_decoder(spark):
    """The real Y4M path through the mapInPandas UDF matches the shared
    pure function bit-for-bit and error-rows the corrupt container."""
    from document_quality_assessment_ocr_spark.sources.fixtures import build_y4m_payloads

    cat = build_y4m_payloads()
    df = spark.createDataFrame(
        [(n, bytearray(b)) for n, b in cat.items()], "media_ref string, png binary"
    )
    rows = mm.video_frame_sample(
        df, every_k=5, max_frames=8, use_container_double=False
    ).collect()
    by_ref = {}
    for r in rows:
        by_ref.setdefault(r["media_ref"], []).append(r)
    assert by_ref["corrupt_y4m"][0]["error"] is not None
    for name in set(cat) - {"corrupt_y4m"}:
        got = sorted(
            (r["frame_idx"], r["width"], r["height"], r["mean_gray"])
            for r in by_ref[name]
        )
        assert got == mm.video_frame_stats_values(cat[name], 5, 8), name


def test_sessionize_gaps_and_islands(spark):
    """Two users; gaps > 30 min split sessions; stats per session."""
    import datetime as dt

    from document_quality_assessment_ocr_spark.operators.sessions import sessionize

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        # user 1: 3 events in one session, then a 2-hour gap, 1 more
        (1, t0, 1, 1.0),
        (1, t0 + dt.timedelta(minutes=10), 2, 2.0),
        (1, t0 + dt.timedelta(minutes=20), 3, 3.0),
        (1, t0 + dt.timedelta(hours=2, minutes=21), 4, 4.0),
        # user 2: single event
        (2, t0, 5, 10.0),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    out = {(r["user_id"], r["session_idx"]): r for r in sessionize(ev).collect()}
    assert set(out) == {(1, 1), (1, 2), (2, 1)}
    assert out[(1, 1)]["n_events"] == 3 and out[(1, 1)]["sum_value"] == 6.0
    assert out[(1, 2)]["n_events"] == 1 and out[(1, 2)]["sum_value"] == 4.0
    dur = out[(1, 1)]["session_end_us"] - out[(1, 1)]["session_start_us"]
    assert dur == 20 * 60 * 1_000_000


def test_phash_near_dup_pairs_banding(spark):
    """Pairs within the threshold are found even when every differing bit
    lands in a different band (pigeonhole recall guarantee); pairs beyond
    the threshold are excluded; NULL hashes (decode errors) are inert."""
    from document_quality_assessment_ocr_spark.operators.multimodal import (
        phash_near_dup_pairs,
    )

    base = "0000000000000000"
    # 3 bits flipped in 3 DIFFERENT 16-bit bands: 0x1 in chars 4, 8, 12
    spread = "0001000100010000"
    far = "ffffffffffffffff"
    df = spark.createDataFrame(
        [("a", base), ("b", spread), ("c", far), ("d", base), ("e", None)],
        "media_ref string, phash string",
    )
    out = {
        (r["ref_a"], r["ref_b"]): r["hamming"]
        for r in phash_near_dup_pairs(df, max_hamming=3, n_bands=4).collect()
    }
    assert out[("a", "b")] == 3
    assert out[("a", "d")] == 0
    assert out[("b", "d")] == 3
    assert len(out) == 3  # 'far' and NULL rows pair with nobody


def test_video_scene_profile_python_replay(spark):
    """video_frame_hashes → video_scene_profile over the real Y4M catalog
    matches a python replay of the SAME shared per-frame hashes (lag
    hamming, cut/static counts); corrupt payload error-rows and is
    excluded; a single-frame table keeps n_scenes=1, max_ham=0."""
    from document_quality_assessment_ocr_spark.sources.fixtures import (
        build_y4m_payloads,
    )

    cat = build_y4m_payloads()
    df = spark.createDataFrame(
        [(n, bytearray(b)) for n, b in cat.items()], "media_ref string, png binary"
    )
    fh = mm.video_frame_hashes(df, every_k=1, max_frames=12)
    errs = {r["media_ref"] for r in fh.where("error IS NOT NULL").collect()}
    assert errs == {"corrupt_y4m"}
    out = {r["media_ref"]: r for r in mm.video_scene_profile(fh, 16).collect()}
    assert "corrupt_y4m" not in out

    thr = 16
    for name in set(cat) - {"corrupt_y4m"}:
        vals = mm.video_frame_ahash_values(cat[name], 1, 12)
        hams = [
            bin(int(a, 16) ^ int(b, 16)).count("1")
            for (_, a), (_, b) in zip(vals, vals[1:])
        ]
        r = out[name]
        assert r["n_frames"] == len(vals), name
        assert r["n_cuts"] == sum(h > thr for h in hams), name
        assert r["n_scenes"] == r["n_cuts"] + 1, name
        assert r["n_static"] == sum(h == 0 for h in hams), name
        assert r["max_ham"] == (max(hams) if hams else 0), name
    # sanity anchors from the catalog's designed temporal shapes
    assert out["checker_flip"]["n_scenes"] == 12  # every frame a hard cut
    assert out["fade_up"]["n_static"] == 11 and out["fade_up"]["n_scenes"] == 1
    assert out["gradient_pan"]["n_cuts"] == 0 and out["gradient_pan"]["n_static"] == 0
    # single-sampled-frame video: no consecutive pair
    one = mm.video_scene_profile(
        fh.where("media_ref = 'short_clip' AND frame_idx = 0"), 16
    ).collect()[0]
    assert (one["n_frames"], one["n_scenes"], one["max_ham"]) == (1, 1, 0)
