"""Deterministic synthetic corpus generator (FIXTURES.md §1–§4).

Builds the pipeline input — ``documents_spans`` ``(doc_id, skip_checks,
ingest_seq, spans array<struct<kind,text,media_ref,offset>>)`` and
``media_payloads`` ``(media_ref, width, height, dpi, png)`` — entirely from a
seed (default 42); no external data. Payload recipes re-derive the reference's
bad-document constructions (``scripts/generate_bad_docs.py:31-136``,
``tests/test_criteria.py:17-28``) in numpy.

Written with pyarrow (not Spark) so the pure-Python oracle tests run without
a JVM.
"""

from __future__ import annotations

import os
import string

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .. import png

WIDTH, HEIGHT = 800, 1000  # reference generate_bad_docs.py:7

# ---------------------------------------------------------------------------
# raster construction helpers (fixture-gen only; scoring math lives in kernels)
# ---------------------------------------------------------------------------


def draw_text_page(
    rng: np.random.Generator,
    w: int = WIDTH,
    h: int = HEIGHT,
    glyph_h: int = 30,
    coverage: float = 0.16,
    ink_levels: tuple[int, ...] = (0, 0, 0, 90),
    bg: int = 255,
) -> np.ndarray:
    """White page with rows of glyph-like dark blocks (the PIL draw.text
    analog of reference ``create_base_image``, ``generate_bad_docs.py:23-29``).

    Line positions and block widths are jittered to avoid accidental
    periodicity (which would trip the FFT watermark detector); block heights
    cluster at ``glyph_h`` so smart-DPI estimation (K8) sees character-sized
    components.
    """
    arr = np.full((h, w), bg, dtype=np.uint8)
    y = int(rng.integers(20, 45))
    while y + glyph_h < h - 20:
        x = int(rng.integers(20, 60))
        while x < w - 40:
            bw = int(rng.integers(max(4, glyph_h // 3), int(glyph_h * 1.3)))
            if rng.random() < coverage * 2.4:
                level = int(ink_levels[int(rng.integers(0, len(ink_levels)))])
                gh = glyph_h + int(rng.integers(-2, 3))
                arr[y : y + gh, x : min(x + bw, w - 20)] = level
            x += bw + int(rng.integers(4, 14))
        y += glyph_h + int(rng.integers(12, 26))
    return arr


def gaussian_blur(arr: np.ndarray, sigma: float = 5.0) -> np.ndarray:
    """Separable Gaussian blur (reference GaussianBlur(radius=5),
    ``generate_bad_docs.py:61-66``)."""
    r = int(3 * sigma)
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x**2) / (2 * sigma * sigma))
    k /= k.sum()
    a = arr.astype(np.float64)
    p = np.pad(a, ((r, r), (0, 0)), mode="reflect")
    out = np.zeros_like(a)
    for i, kv in enumerate(k):
        out += kv * p[i : i + a.shape[0], :]
    p = np.pad(out, ((0, 0), (r, r)), mode="reflect")
    out2 = np.zeros_like(a)
    for i, kv in enumerate(k):
        out2 += kv * p[:, i : i + a.shape[1]]
    return np.clip(np.rint(out2), 0, 255).astype(np.uint8)


def rotate_nearest(arr: np.ndarray, deg: float, fill: int = 255) -> np.ndarray:
    """Nearest-neighbour raster rotation with expand=True, white fill
    (reference ``img.rotate(10, expand=True, fillcolor='white')``,
    ``generate_bad_docs.py:68-73``)."""
    h, w = arr.shape
    t = np.deg2rad(deg)
    c, s = np.cos(t), np.sin(t)
    out_w = int(round(abs(w * c) + abs(h * s)))
    out_h = int(round(abs(h * c) + abs(w * s)))
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ocy, ocx = (out_h - 1) / 2.0, (out_w - 1) / 2.0
    yy, xx = np.meshgrid(np.arange(out_h), np.arange(out_w), indexing="ij")
    # inverse map: rotate output coords by -deg about center
    xs = (xx - ocx) * c - (yy - ocy) * s + cx
    ys = (xx - ocx) * s + (yy - ocy) * c + cy
    xi = np.rint(xs).astype(np.int64)
    yi = np.rint(ys).astype(np.int64)
    valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    out = np.full((out_h, out_w), fill, dtype=np.uint8)
    out[valid] = arr[yi[valid], xi[valid]]
    return out


def salt_pepper(rng: np.random.Generator, arr: np.ndarray) -> np.ndarray:
    """Salt-and-pepper noise (reference ``generate_bad_docs.py:103-112``; the
    reference flips ~10% each way — we use 20% so the median-residual metric
    clears the 15% rejection threshold, measured 20.6%)."""
    noise = rng.integers(0, 100, arr.shape)
    out = arr.copy()
    out[noise < 20] = 0
    out[noise > 80] = 255
    return out


def periodic_dot_comb(
    h: int, w: int, step: int = 16, dot: int = 4, level: int = 0
) -> np.ndarray:
    """Exactly-periodic dot grid (reference CONFIDENTIAL watermark loop,
    ``generate_bad_docs.py:75-86``) — a Dirac-comb spectrum with strong
    off-axis FFT peaks (watermark score 100) while density/brightness/blur/
    noise/entropy all stay within accept bands."""
    out = np.full((h, w), 255, dtype=np.uint8)
    for dy in range(dot):
        for dx in range(dot):
            out[dy::step, dx::step] = level
    return out


# ---------------------------------------------------------------------------
# payload catalog
# ---------------------------------------------------------------------------


def build_payloads(seed: int = 42, size: tuple[int, int] = (WIDTH, HEIGHT)) -> dict:
    """name → dict(arr, dpi, png). One payload per reference failure mode
    (FIXTURES.md §2). ``size`` shrinks pages for bench corpora."""
    w, h = size
    rng = np.random.default_rng(seed)

    def page(**kw):
        return draw_text_page(rng, w=w, h=h, **kw)

    cat: dict[str, tuple[np.ndarray, int]] = {}
    cat["ok_clean"] = (page(), 200)
    cat["ok_clean2"] = (page(), 150)
    cat["ok_clean3"] = (page(glyph_h=26, coverage=0.13), 300)
    # metadata dpi missing → smart-DPI estimation path passes (glyphs ~30 px
    # → est ≈ 305 dpi ≥ 72; reference criteria.py:242-246)
    cat["ok_est_dpi"] = (page(), 0)
    cat["bad_blur"] = (gaussian_blur(page(), 5.0), 200)
    # detector search space is [-5,5]: 4° is detectable, 10° clamps to 5 —
    # with the shipped max_deg=5 NEITHER exceeds the threshold (the shipped
    # skew check is vacuous, SURVEY.md §4.3); the tiered/variant config with
    # max_deg=3 exercises real skew gating.
    cat["bad_skew4"] = (rotate_nearest(page(), 4.0), 200)
    cat["bad_skew10"] = (rotate_nearest(page(), 10.0), 200)
    cat["bad_noise"] = (salt_pepper(rng, page()), 200)
    # ×0.18 darkening drives every pixel under the 200 ink cut → rejected at
    # text_density (100.00%) exactly as the reference's own fail_brightness_dark
    # would be under the shipped config order (fold order §4.3)
    dark = (page().astype(np.float64) * 0.18).astype(np.uint8)
    cat["bad_dark"] = (dark, 200)
    # ~2.4% ink at gray 150 → density in band, trimmed mean ≈ 252.5 > 250 →
    # genuine Brightness-out-of-range rejection
    bright = np.full((h, w), 255, dtype=np.uint8)
    gl = max(2, h // 100)
    for yy in range(h // 10, h - h // 10, h // 14):
        bright[yy : yy + gl, w // 10 : w - w // 10 : 3] = 150
    cat["bad_bright"] = (bright, 200)
    low = np.full((h, w), 255, dtype=np.uint8)
    low[h // 2 : h // 2 + 2, w // 2 : w // 2 + 2] = 0  # single dot
    cat["bad_density_low"] = (low, 200)
    cat["bad_density_high"] = (np.zeros((h, w), dtype=np.uint8), 200)
    # two-level page with ~2.5% ink: entropy < 0.2 but density within band
    cat["bad_entropy"] = (page(coverage=0.035, ink_levels=(0,), glyph_h=18), 200)
    cat["bad_watermark"] = (periodic_dot_comb(h, w, step=16, dot=4), 200)
    # metadata dpi missing AND glyphs too small for K8 (h≤6 excluded by the
    # 10<h<100 band) → estimated 0.0 → resolution failure
    tiny = draw_text_page(rng, w=w, h=h, glyph_h=6, coverage=0.10)
    cat["bad_resolution"] = (tiny, 0)
    cat["edge_blank"] = (np.full((h, w), 255, dtype=np.uint8), 200)

    out = {}
    for name, (arr, dpi) in cat.items():
        out[name] = {"arr": arr, "dpi": dpi, "png": png.encode_gray(arr, dpi=dpi)}
    # corrupted payload: truncated PNG (reference generate_corrupted_file,
    # generate_bad_docs.py:31-39)
    out["corrupt"] = {
        "arr": None,
        "dpi": 200,
        "png": out["ok_clean"]["png"][:100],
    }
    return out


# ---------------------------------------------------------------------------
# text span recipes (FIXTURES.md §3)
# ---------------------------------------------------------------------------

_LETTERS = np.array(list(string.ascii_lowercase))


def body_text(rng: np.random.Generator) -> str:
    """Seeded lorem with word lengths 2–4 → ink density ~70–78%, inside the
    (1, 80) keep band."""
    n = int(rng.integers(40, 160))
    words = []
    for _ in range(n):
        ln = int(rng.integers(2, 5))
        words.append("".join(_LETTERS[rng.integers(0, 26, ln)]))
    txt = " ".join(words)
    ink = sum(len(w) for w in words)
    # guard the band deterministically
    while 100.0 * ink / len(txt) >= 79.0:
        txt += "  "
    return txt


def sparse_text(rng: np.random.Generator) -> str:
    return "x" + " " * int(rng.integers(150, 400))


def dense_text(rng: np.random.Generator) -> str:
    ch = str(_LETTERS[int(rng.integers(0, 26))])
    return ch * int(rng.integers(100, 300))


# ---------------------------------------------------------------------------
# corpus builder
# ---------------------------------------------------------------------------

_OK_PAYLOADS = ["ok_clean", "ok_clean2", "ok_clean3", "ok_est_dpi"]
_BAD_PAYLOADS = [
    "bad_blur",
    "bad_skew4",
    "bad_skew10",
    "bad_noise",
    "bad_dark",
    "bad_bright",
    "bad_density_low",
    "bad_density_high",
    "bad_entropy",
    "bad_watermark",
    "bad_resolution",
    "edge_blank",
]


def payload_names() -> list[str]:
    """Catalog keys WITHOUT building any pixels — the cheap driver-side
    constant for span derivation (entry/bench paths must not round-trip the
    name list through a Spark collect; the catalog is seeded config, not
    data). Kept in lockstep with build_payloads by a unit test."""
    return _OK_PAYLOADS + _BAD_PAYLOADS + ["corrupt"]


def build_wav_payloads(seed: int = 42, n_samples: int = 4096, rate: int = 8000) -> dict:
    """name → PCM WAV bytes: the seeded AUDIO payload catalog (the audio
    analog of :func:`build_payloads`). One payload per decode/feature mode:
    sine tones at two levels, seeded white noise, silence, a linear ramp, a
    stereo pair (downmix path), an 8-bit payload (dequant path), and one
    deliberately corrupt container (error-row path). All synthesis is
    integer-quantized before encode, so decode→RMS is bit-deterministic —
    the q137 oracle builder embeds values computed by the SAME
    ``wav_frame_rms_values`` the engine's mapInPandas calls."""
    import io
    import wave

    def enc(samples: np.ndarray, nch: int = 1, sampwidth: int = 2) -> bytes:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(nch)
            w.setsampwidth(sampwidth)
            w.setframerate(rate)
            w.writeframes(samples.tobytes())
        return buf.getvalue()

    rng = np.random.default_rng(seed)
    t = np.arange(n_samples, dtype=np.float64)

    def sine16(freq: float, amp: float) -> np.ndarray:
        return np.clip(
            np.round(np.sin(2 * np.pi * freq * t / rate) * amp * 32767.0),
            -32768, 32767,
        ).astype("<i2")

    cat: dict[str, bytes] = {}
    cat["tone_440"] = enc(sine16(440.0, 0.8))
    cat["tone_1k_quiet"] = enc(sine16(1000.0, 0.05))
    cat["noise_white"] = enc(
        np.clip(np.round(rng.standard_normal(n_samples) * 0.2 * 32767.0),
                -32768, 32767).astype("<i2")
    )
    cat["silence"] = enc(np.zeros(n_samples, dtype="<i2"))
    cat["ramp"] = enc(
        np.round(np.linspace(-0.9, 0.9, n_samples) * 32767.0).astype("<i2")
    )
    stereo = np.empty(n_samples * 2, dtype="<i2")
    stereo[0::2] = sine16(440.0, 0.6)
    stereo[1::2] = sine16(660.0, 0.3)
    cat["stereo_tones"] = enc(stereo, nch=2)
    cat["tone_8bit"] = enc(
        np.clip(np.round(np.sin(2 * np.pi * 220.0 * t / rate) * 0.5 * 127.0)
                + 128, 0, 255).astype(np.uint8),
        sampwidth=1,
    )
    cat["corrupt_wav"] = b"RIFF....WAVEnot-actually-a-wav"
    return cat


def wav_payload_names() -> list[str]:
    """WAV catalog keys without synthesizing any samples (same contract as
    :func:`payload_names`; lockstep-tested)."""
    return [
        "tone_440", "tone_1k_quiet", "noise_white", "silence", "ramp",
        "stereo_tones", "tone_8bit", "corrupt_wav",
    ]


def build_y4m_payloads(
    seed: int = 42, width: int = 64, height: int = 48, n_frames: int = 24
) -> dict:
    """name → Y4M (YUV4MPEG2) bytes: the seeded VIDEO payload catalog (the
    video analog of :func:`build_wav_payloads`). One payload per decode/
    sample mode: a drifting gradient, a per-frame-flipping checkerboard,
    seeded uint8 noise, a constant-luma fade (clean mean_gray ramp), a C422
    colorspace variant, a chroma-free Cmono stream, a 3-frame short clip
    (max_frames edge), and one deliberately corrupt container (error-row
    path). All frames are integer uint8 planes, so decode→mean is
    bit-deterministic — the q138 oracle builder embeds values computed by
    the SAME ``video_frame_stats_values`` the engine's mapInPandas calls."""

    def enc(frames: list[np.ndarray], chroma: str = "420jpeg") -> bytes:
        h, w = frames[0].shape
        parts = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C{chroma}\n".encode()]
        for y in frames:
            parts.append(b"FRAME\n")
            parts.append(y.astype(np.uint8).tobytes())
            if chroma.startswith("420"):
                parts.append(np.full((h // 2) * (w // 2) * 2, 128, np.uint8).tobytes())
            elif chroma.startswith("422"):
                parts.append(np.full((w // 2) * h * 2, 128, np.uint8).tobytes())
            elif chroma.startswith("444"):
                parts.append(np.full(w * h * 2, 128, np.uint8).tobytes())
        return b"".join(parts)

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:height, 0:width]
    cat: dict[str, bytes] = {}
    cat["gradient_pan"] = enc(
        [((xx * 4 + yy * 2 + 7 * i) % 256).astype(np.uint8) for i in range(n_frames)]
    )
    cat["checker_flip"] = enc(
        [(((xx // 8 + yy // 8 + i) % 2) * 255).astype(np.uint8) for i in range(n_frames)]
    )
    cat["noise_frames"] = enc(
        [rng.integers(0, 256, (height, width), dtype=np.uint8) for _ in range(n_frames)]
    )
    cat["fade_up"] = enc(
        [np.full((height, width), min(255, 11 * i), np.uint8) for i in range(n_frames)]
    )
    cat["tone_c422"] = enc(
        [((yy * 5 + 3 * i) % 256).astype(np.uint8) for i in range(n_frames)], "422"
    )
    cat["mono_ramp"] = enc(
        [((xx + 13 * i) % 256).astype(np.uint8) for i in range(n_frames)], "mono"
    )
    cat["short_clip"] = enc(
        [np.full((height, width), 40 * (i + 1), np.uint8) for i in range(3)]
    )
    cat["corrupt_y4m"] = b"YUV4MPEG2 W64 H48 F25:1\nFRAMEnot-actual-planes"
    return cat


def y4m_payload_names() -> list[str]:
    """Y4M catalog keys without synthesizing any frames (same contract as
    :func:`wav_payload_names`; lockstep-tested)."""
    return [
        "gradient_pan", "checker_flip", "noise_frames", "fade_up",
        "tone_c422", "mono_ramp", "short_clip", "corrupt_y4m",
    ]


def build_jpeg_payloads(seed: int = 42) -> dict:
    """name → baseline JFIF bytes: the seeded JPEG payload catalog (the
    compressed-image analog of :func:`build_payloads`), encoded by the
    from-scratch ``sources/jpeg.py`` encoder so each payload exercises a
    distinct decoder path: grayscale single-component, odd (non-MCU-
    aligned) dimensions, DRI/RSTn restart markers, interleaved YCbCr at
    4:2:0 and 4:2:2 subsampling, a low-quality noise payload (dense AC
    runs/ZRL codes), and one deliberately corrupt container (error-row
    path). All source rasters are integer uint8 from a seeded rng or
    closed-form ramps, and decode is bit-deterministic — the q261 oracle
    builder embeds values computed by the SAME
    ``multimodal.jpeg_profile_values`` the engine's mapInPandas calls."""
    from .jpeg import encode_jpeg_color, encode_jpeg_gray

    rng = np.random.default_rng(seed)
    cat: dict[str, bytes] = {}
    w, h = 64, 48
    ramp = (np.linspace(0, 255, w)[None, :] * np.ones((h, 1))).astype(np.uint8)
    cat["gray_ramp"] = encode_jpeg_gray(ramp, quality=90)
    checker = (((np.arange(h)[:, None] // 8 + np.arange(w)[None, :] // 8) % 2) * 255).astype(np.uint8)
    cat["gray_checker"] = encode_jpeg_gray(checker, quality=80)
    cat["gray_noise_q30"] = encode_jpeg_gray(
        rng.integers(0, 256, (40, 40), dtype=np.uint8).astype(np.uint8), quality=30
    )
    odd = (np.add.outer(np.arange(21) * 7, np.arange(13) * 11) % 256).astype(np.uint8)
    cat["gray_odd_21x13"] = encode_jpeg_gray(odd, quality=95)
    cat["gray_restart"] = encode_jpeg_gray(ramp.T.copy(), quality=75, restart_interval=3)
    rgb = np.zeros((h, w, 3), dtype=np.uint8)
    rgb[..., 0] = ramp
    rgb[..., 1] = ramp[::-1, :]
    rgb[..., 2] = 96
    cat["color_420"] = encode_jpeg_color(rgb, quality=85, subsample="420")
    cat["color_422"] = encode_jpeg_color(rgb[:, ::-1, :].copy(), quality=70, subsample="422")
    cat["corrupt_jpeg"] = b"\xff\xd8\xff\xe0\x00\x07JFIFnot-actually-entropy-data"
    return cat


def jpeg_payload_names() -> list[str]:
    """JPEG catalog keys without encoding anything (same contract as
    :func:`wav_payload_names`; lockstep-tested)."""
    return [
        "gray_ramp", "gray_checker", "gray_noise_q30", "gray_odd_21x13",
        "gray_restart", "color_420", "color_422", "corrupt_jpeg",
    ]


def build_corpus(
    n_docs: int = 60,
    seed: int = 42,
    mega_spans: int = 600,
    include_edge_docs: bool = True,
) -> list[dict]:
    """Rows of the documents_spans table (FIXTURES.md §1): per doc 3–40 spans
    interleaving text+media, offsets strictly increasing with gaps, array
    stored SHUFFLED (pipeline must sort by offset), plus edge docs: 0-span,
    duplicate doc_id (last-wins), skip_checks bypass, missing/corrupt payload,
    one mega-doc for skew handling."""
    rng = np.random.default_rng(seed + 1)
    rows = []
    seq = 0

    def mk_spans(recipe: list[tuple[str, str, str]]) -> list[dict]:
        nonlocal rng
        offset = 0
        spans = []
        for kind, text, ref in recipe:
            offset += int(rng.integers(1, 50))
            spans.append({"kind": kind, "text": text, "media_ref": ref, "offset": offset})
        order = rng.permutation(len(spans))
        return [spans[i] for i in order]

    def add(doc_id: str, recipe, skip=False):
        nonlocal seq
        rows.append(
            {
                "doc_id": doc_id,
                "skip_checks": bool(skip),
                "ingest_seq": seq,
                "spans": mk_spans(recipe),
            }
        )
        seq += 1

    def text_span():
        r = rng.random()
        if r < 0.70:
            return ("text", body_text(rng), "")
        if r < 0.85:
            return ("text", sparse_text(rng), "")
        if r < 0.95:
            return ("text", dense_text(rng), "")
        return ("text", "", "")

    def media_span(pool):
        return ("media", "", pool[int(rng.integers(0, len(pool)))])

    for i in range(n_docs):
        n_spans = int(rng.integers(3, 41))
        bad = rng.random() < 0.4
        pool = _OK_PAYLOADS + ([_BAD_PAYLOADS[i % len(_BAD_PAYLOADS)]] if bad else [])
        recipe = []
        for _ in range(n_spans):
            if rng.random() < 0.55:
                recipe.append(text_span())
            else:
                recipe.append(media_span(pool))
        add(f"doc_{i:05d}", recipe)

    if include_edge_docs:
        # dedicated single-failure docs, one per bad payload
        for name in _BAD_PAYLOADS:
            add(
                f"doc_bad_{name}",
                [
                    ("text", body_text(rng), ""),
                    ("media", "", "ok_clean"),
                    ("media", "", name),
                ],
            )
        add("doc_empty_a", [])
        add("doc_empty_b", [])
        # duplicate doc_id — first (rejected-worthy) version must lose
        add("doc_dup", [("media", "", "bad_blur"), ("text", body_text(rng), "")])
        add("doc_dup", [("media", "", "ok_clean"), ("text", body_text(rng), "")])
        # bypass doc carrying bad payloads — accepted, ALL spans kept
        add(
            "doc_bypass",
            [("media", "", "bad_noise"), ("text", sparse_text(rng), "")],
            skip=True,
        )
        add("doc_missing_ref", [("media", "", "no_such_payload"), ("text", body_text(rng), "")])
        add("doc_corrupt", [("media", "", "corrupt"), ("text", body_text(rng), "")])
        # mixed-dpi doc: page1 dpi ok, page2 metadata-missing → min=0 < 72 →
        # estimation on page ONE passes (reference criteria.py:229-246)
        add("doc_mixed_dpi", [("media", "", "ok_clean"), ("media", "", "ok_est_dpi")])
        mega = []
        for _ in range(mega_spans):
            mega.append(
                media_span(_OK_PAYLOADS) if rng.random() < 0.5 else text_span()
            )
        add("doc_mega", mega)
    return rows


# ---------------------------------------------------------------------------
# parquet writers
# ---------------------------------------------------------------------------

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

SPANS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("skip_checks", pa.bool_()),
        ("ingest_seq", pa.int64()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

PAYLOADS_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("dpi", pa.int32()),
        ("png", pa.binary()),
    ]
)


def write_corpus(
    out_dir: str,
    n_docs: int = 60,
    seed: int = 42,
    size: tuple[int, int] = (WIDTH, HEIGHT),
    mega_spans: int = 600,
    include_edge_docs: bool = True,
) -> tuple[str, str]:
    """Write documents_spans.parquet + media_payloads.parquet; returns paths."""
    os.makedirs(out_dir, exist_ok=True)
    payloads = build_payloads(seed=seed, size=size)
    rows = build_corpus(
        n_docs=n_docs, seed=seed, mega_spans=mega_spans, include_edge_docs=include_edge_docs
    )
    spans_path = os.path.join(out_dir, "documents_spans.parquet")
    pay_path = os.path.join(out_dir, "media_payloads.parquet")
    tbl = pa.Table.from_pylist(rows, schema=SPANS_SCHEMA)
    pq.write_table(tbl, spans_path)
    prows = []
    for name, p in payloads.items():
        arr = p["arr"]
        prows.append(
            {
                "media_ref": name,
                "width": 0 if arr is None else int(arr.shape[1]),
                "height": 0 if arr is None else int(arr.shape[0]),
                "dpi": int(p["dpi"]),
                "png": p["png"],
            }
        )
    pq.write_table(pa.Table.from_pylist(prows, schema=PAYLOADS_SCHEMA), pay_path)
    return spans_path, pay_path
