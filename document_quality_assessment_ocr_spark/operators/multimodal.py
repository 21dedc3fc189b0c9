"""Multimodal payload plumbing: typed metadata + decode/feature/resize/frame
stages as Arrow-batched ``mapInPandas`` transforms.

Every decode path is REAL for the codec-free member of its family: images
via the in-repo PNG codec AND (round 5) baseline JPEG via the from-scratch
``sources/jpeg.py`` Huffman+iDCT decoder, audio via stdlib-``wave`` PCM
WAV, video via the Y4M (YUV4MPEG2) raw-planar parser. Remaining compressed
formats (mp3/mp4, progressive JPEG) still need external codec libraries
that don't ship in this container — a real deployment swaps those decoders
in behind the same `bytes → arrays` contracts; deterministic fakes remain
as test seams (tests/test_multimodal.py)."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import kernels, png

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_gray", T.DoubleType()),
        T.StructField("ink_ratio", T.DoubleType()),
        T.StructField("entropy", T.DoubleType()),
        T.StructField("error", T.StringType()),
    ]
)

THUMB_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("thumb_w", T.IntegerType()),
        T.StructField("thumb_h", T.IntegerType()),
        T.StructField("thumb_png", T.BinaryType()),
        T.StructField("error", T.StringType()),
    ]
)

AUDIO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def ahash64(arr: np.ndarray, hash_size: int = 8) -> int:
    """Average-hash perceptual fingerprint of a grayscale array: crop to a
    multiple of ``hash_size``, block-mean down to hash_size², threshold at
    the global mean, pack row-major into a SIGNED 64-bit int (Spark
    LongType two's-complement). Deterministic pure numpy — the oracle
    generator calls this same function to embed literals."""
    h, w = arr.shape
    hs = hash_size
    h8, w8 = h - h % hs, w - w % hs
    blocks = arr[:h8, :w8].astype(np.float64).reshape(hs, h8 // hs, hs, w8 // hs)
    means = blocks.mean(axis=(1, 3))
    bits = (means > means.mean()).ravel()
    val = 0
    for i, b in enumerate(bits):
        if b:
            val |= 1 << i
    return val - (1 << 64) if val >= 1 << 63 else val


def ahash_hex(arr: np.ndarray, hash_size: int = 8) -> str:
    """:func:`ahash64` as a 16-digit lowercase hex string — the surfaced
    form: strings are dtype-stable across Spark↔pandas↔DuckDB (a signed
    BIGINT beyond 2⁵³ silently loses precision if a NULL anywhere coerces
    the pandas column to float64)."""
    return f"{ahash64(arr, hash_size) & 0xFFFFFFFFFFFFFFFF:016x}"


def image_ahash(payloads: DataFrame, hash_size: int = 8) -> DataFrame:
    """PNG payloads → (media_ref, phash-hex) perceptual hashes via one
    Arrow-batched ``mapInPandas`` decode pass; errors are data (NULL phash,
    message in ``error``). The visual-dedup primitive: identical/near-
    identical imagery collides on ``phash`` regardless of the byte stream
    (re-encodes, metadata diffs)."""
    schema = T.StructType(
        [
            T.StructField("media_ref", T.StringType()),
            T.StructField("phash", T.StringType()),
            T.StructField("error", T.StringType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, data in zip(pdf["media_ref"], pdf["png"]):
                try:
                    arr, _ = png.decode_gray(bytes(data))
                    rows.append((ref, ahash_hex(arr, hash_size), None))
                except Exception as e:
                    rows.append((ref, None, str(e)))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return payloads.select("media_ref", "png").mapInPandas(gen, schema)


def image_features(payloads: DataFrame) -> DataFrame:
    """Decode PNG payloads → basic image features. mapInPandas so each Arrow
    batch is one python round-trip; errors are data."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, data in zip(pdf["media_ref"], pdf["png"]):
                try:
                    arr, _ = png.decode_gray(bytes(data))
                    rows.append(
                        (
                            ref,
                            arr.shape[1],
                            arr.shape[0],
                            float(arr.mean()),
                            kernels.content_ratio(arr) / 100.0,
                            kernels.entropy256(arr),
                            None,
                        )
                    )
                except Exception as e:
                    rows.append((ref, None, None, None, None, None, str(e)))
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    return payloads.select("media_ref", "png").mapInPandas(gen, IMAGE_FEATURES_SCHEMA)


def image_thumbnails(payloads: DataFrame, max_size: int = 128) -> DataFrame:
    """Decode → aspect-fit resize → re-encode. The resize/encode path is the
    real thing (numpy + in-repo codec)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, data in zip(pdf["media_ref"], pdf["png"]):
                try:
                    arr, dpi = png.decode_gray(bytes(data))
                    th = kernels.thumbnail_fit(arr, max_size)
                    rows.append((ref, th.shape[1], th.shape[0], png.encode_gray(th), None))
                except Exception as e:
                    rows.append((ref, None, None, None, str(e)))
            yield pd.DataFrame(rows, columns=[f.name for f in THUMB_SCHEMA.fields])

    return payloads.select("media_ref", "png").mapInPandas(gen, THUMB_SCHEMA)


def decode_audio(payload: bytes) -> np.ndarray:
    """REAL decode for PCM WAV containers (RIFF/WAVE) — the most common
    raw-capture format needs no codec library: stdlib ``wave`` parses the
    container, numpy dequantizes. Returns mono float32 PCM in [-1, 1)
    (multi-channel inputs downmix by per-sample mean in float64 before the
    float32 cast, so the downmix is order-exact). Supports 8-bit unsigned,
    16/32-bit signed little-endian, and 24-bit packed PCM. Compressed
    formats (mp3/ogg/flac) still need a codec library — a real deployment
    swaps in soundfile/ffmpeg; the Spark-side contract stays
    `bytes → float32 PCM`."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        nch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sw == 1:
        arr = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    elif sw == 2:
        arr = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    elif sw == 3:
        b = np.frombuffer(raw, np.uint8).reshape(-1, 3).astype(np.int32)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        arr = v.astype(np.float32) / 8388608.0
    elif sw == 4:
        arr = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM sample width: {sw}")
    if nch > 1:
        arr = arr.reshape(-1, nch).astype(np.float64).mean(axis=1).astype(np.float32)
    return arr


def wav_frame_rms_values(payload: bytes, frame: int, decoder=None) -> list[float]:
    """Per-frame RMS of a decoded payload — the SHARED pure function: the
    engine's ``audio_frame_rms`` mapInPandas UDF and the q137 oracle-literal
    builder both call THIS (the oracle-literal invariant: engine and
    generator must run identical float operations)."""
    pcm = (decoder or decode_audio)(payload)
    n_frames = len(pcm) // frame
    fr = pcm[: n_frames * frame].reshape(n_frames, frame)
    return [float(x) for x in np.sqrt((fr * fr).mean(axis=1))]


def _fake_pcm(payload: bytes, n: int = 4096) -> np.ndarray:
    """Deterministic fake decode for plumbing tests: bytes → pseudo-PCM."""
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
    rng = np.random.default_rng(seed)
    return rng.standard_normal(n).astype(np.float32)


def audio_frame_rms(payloads: DataFrame, frame: int = 512, use_fake_decoder: bool = True) -> DataFrame:
    """Frame-sample an audio payload and emit per-frame RMS — the canonical
    'decode → window → feature' audio shape. ``use_fake_decoder=False`` is
    the REAL path (stdlib-``wave`` PCM WAV decode); the deterministic fake
    remains as the test seam for non-WAV payload fixtures. Undecodable
    payloads emit no rows (same exclusion semantics as q57's error rows)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dec = _fake_pcm if use_fake_decoder else decode_audio
        for pdf in batches:
            refs, idxs, rmss = [], [], []
            for ref, data in zip(pdf["media_ref"], pdf["png"]):
                try:
                    rms = wav_frame_rms_values(bytes(data), frame, decoder=dec)
                except Exception:
                    continue  # undecodable payload → no rows
                refs += [ref] * len(rms)
                idxs += list(range(len(rms)))
                rmss += rms
            yield pd.DataFrame({"media_ref": refs, "frame_idx": idxs, "rms": rmss})

    return payloads.select("media_ref", "png").mapInPandas(gen, AUDIO_FRAME_SCHEMA)


VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_gray", T.DoubleType()),
        T.StructField("error", T.StringType()),
    ]
)


# bytes-per-pixel numerators for the chroma planes that FOLLOW the Y plane
# (Y4M stores planar YUV: w*h luma bytes, then subsampled U and V planes)
_Y4M_CHROMA_FRACTION = {
    "420": 0.5,   # U + V at (w/2)x(h/2) each
    "422": 1.0,   # U + V at (w/2)xh each
    "444": 2.0,   # U + V at full resolution each
    "mono": 0.0,  # no chroma planes
}


def _parse_y4m_header(payload: bytes) -> tuple[int, int, str, int]:
    """Parse a YUV4MPEG2 stream header → (width, height, chroma_mode,
    header_end_offset). Raises ``ValueError`` on anything that is not a
    well-formed Y4M container."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("unsupported video container (Y4M/YUV4MPEG2 supported; "
                         "compressed formats need a codec library)")
    nl = payload.find(b"\n")
    if nl < 0:
        raise ValueError("truncated Y4M header")
    width = height = 0
    chroma = "420"  # Y4M default is C420jpeg
    for tok in payload[9:nl].split(b" "):
        if not tok:
            continue
        key, val = tok[:1], tok[1:]
        if key == b"W":
            width = int(val)
        elif key == b"H":
            height = int(val)
        elif key == b"C":
            c = val.decode("ascii", "replace")
            if c == "mono":
                chroma = "mono"
            else:
                chroma = c[:3]
            if chroma not in _Y4M_CHROMA_FRACTION:
                raise ValueError(f"unsupported Y4M colorspace: {c}")
    if width <= 0 or height <= 0:
        raise ValueError("Y4M header missing W/H")
    return width, height, chroma, nl + 1


def decode_video_frames(payload: bytes):
    """REAL decode for Y4M (YUV4MPEG2) containers — raw planar YUV behind a
    plain-text header needs no codec library (the video analog of
    :func:`decode_audio`'s PCM-WAV path). Yields each frame's LUMA plane as
    an ``(h, w)`` uint8 array (the grayscale contract every consumer here
    uses); chroma planes are skipped by offset arithmetic, never copied.

    Generator semantics are the scale contract: frames materialize lazily
    as zero-copy buffer views, so a stride-sampling consumer that breaks
    early pays O(frames kept), not O(video length). Compressed containers
    (mp4/webm/mkv) still need a demuxer library — a real deployment swaps
    in ffmpeg/pyav; the Spark-side contract stays `bytes → iterator of
    frame arrays`."""
    width, height, chroma, pos = _parse_y4m_header(payload)
    y_size = width * height
    frame_size = y_size + int(y_size * _Y4M_CHROMA_FRACTION[chroma])
    while pos < len(payload):
        nl = payload.find(b"\n", pos)
        if nl < 0 or payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad Y4M FRAME marker at offset {pos}")
        start = nl + 1
        if start + frame_size > len(payload):
            raise ValueError("truncated Y4M frame payload")
        yield np.frombuffer(payload, np.uint8, y_size, start).reshape(height, width)
        pos = start + frame_size


def video_frame_stats_values(
    payload: bytes, every_k: int = 5, max_frames: int = 8, decoder=None
) -> list[tuple[int, int, int, float]]:
    """Stride-sampled per-frame stats ``(frame_idx, width, height,
    mean_gray)`` — the SHARED pure function: the engine's
    ``video_frame_sample`` mapInPandas UDF and the q138 oracle-literal
    builder both call THIS (same invariant as :func:`wav_frame_rms_values`:
    engine and generator run identical float operations). Breaks out of the
    frame iterator once the budget is spent, so with the lazy Y4M decoder
    the cost is O(frames kept)."""
    rows: list[tuple[int, int, int, float]] = []
    ek = max(every_k, 1)
    for i, arr in enumerate((decoder or decode_video_frames)(payload)):
        if i % ek:
            continue
        rows.append((i, int(arr.shape[1]), int(arr.shape[0]), float(arr.mean())))
        if len(rows) >= max_frames:
            break
    return rows


def video_frame_sample(
    payloads: DataFrame,
    every_k: int = 5,
    max_frames: int = 8,
    use_container_double: bool = True,
) -> DataFrame:
    """Sample every ``every_k``-th frame of a video payload (≤ ``max_frames``)
    and emit per-frame stats — the canonical 'demux → stride-sample → decode
    only sampled frames → feature' shape. Stride selection happens BEFORE any
    decode, so at scale the cost is proportional to the frames kept, not the
    video length (the same budget idea as the reference's 3-page/20-frame
    caps).

    ``use_container_double=True`` reads the deterministic multi-page
    container of PNG frames (``sources.binary_docs.encode_page_container``);
    ``use_container_double=False`` is the REAL path — lazy Y4M decode via
    :func:`decode_video_frames` through the shared
    :func:`video_frame_stats_values` (the q138 oracle calls the same
    function). Per-payload failures are error rows, never task crashes."""
    from ..sources.binary_docs import parse_page_container

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        names = [f.name for f in VIDEO_FRAME_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for ref, data in zip(pdf["media_ref"], pdf["png"]):
                try:
                    if use_container_double:
                        frames = parse_page_container(bytes(data))
                        picked = frames[:: max(every_k, 1)][:max_frames]
                        for i, (fdata, _) in enumerate(picked):
                            arr, _dpi = png.decode_gray(bytes(fdata))
                            rows.append(
                                (ref, i * every_k, int(arr.shape[1]),
                                 int(arr.shape[0]), float(arr.mean()), None)
                            )
                    else:
                        for i, w, h, mg in video_frame_stats_values(
                            bytes(data), every_k, max_frames
                        ):
                            rows.append((ref, i, w, h, mg, None))
                except Exception as e:
                    rows.append((ref, None, None, None, None, str(e)))
            yield pd.DataFrame(rows, columns=names)

    return payloads.select("media_ref", "png").mapInPandas(gen, VIDEO_FRAME_SCHEMA)


def phash_near_dup_pairs(
    hashes: DataFrame,
    ref_col: str = "media_ref",
    hash_col: str = "phash",
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """Near-identical imagery: banded Hamming LSH over the 16-hex-char
    (64-bit) perceptual hashes from ``image_ahash``.

    Pigeonhole guarantee: a pair within Hamming distance d < ``n_bands``
    differs in fewer bits than there are bands, so at least one band is
    bit-identical — candidates come from an EQUI-join on
    (band_idx, band_value), never an all-pairs scan, with recall exactly 1
    for ``max_hamming < n_bands`` (raise ``n_bands`` to widen the exact
    regime; beyond it this is the standard LSH recall trade).

    The exact Hamming verify is per-nibble popcount (16 hex digits →
    ``bit_count(xor(...))`` fold) — integer-only, cross-engine exact,
    never a 64-bit signed parse of the full hash (the q57 2^53 lesson).

    Output: (ref_a, ref_b, hamming).
    """
    assert 16 % int(n_bands) == 0, "n_bands must divide 16 hex chars"
    width = 16 // int(n_bands)
    h = hashes.where(F.col(hash_col).isNotNull()).select(
        F.col(ref_col).alias("ref"), F.col(hash_col).alias("h")
    )
    bands = h.select(
        "ref",
        "h",
        F.posexplode(
            F.array(
                *[
                    F.substring("h", 1 + k * width, width)
                    for k in range(int(n_bands))
                ]
            )
        ).alias("band", "bv"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.ref") < F.col("b.ref")),
        )
        .select(
            F.col("a.ref").alias("ref_a"),
            F.col("b.ref").alias("ref_b"),
            F.col("a.h").alias("ha"),
            F.col("b.h").alias("hb"),
        )
        .distinct()
    )

    def nib(col: str, i):
        return F.conv(F.substring(F.col(col), i, 1), 16, 10).cast("int")

    ham = F.aggregate(
        F.sequence(F.lit(1), F.lit(16)),
        F.lit(0),
        lambda acc, i: acc
        + F.bit_count(nib("ha", i).bitwiseXOR(nib("hb", i))).cast("int"),
    ).cast("long")
    return (
        cand.withColumn("hamming", ham)
        .where(F.col("hamming") <= F.lit(int(max_hamming)))
        .select("ref_a", "ref_b", "hamming")
    )


def png_chunk_profile_values(data: bytes) -> tuple:
    """Structural PNG container profile — a walk of the length-prefixed
    chunk table (no pixel decode): (n_chunks, idat_bytes, width, height,
    bit_depth, color_type, chunk_types-CSV). SHARED by the engine's
    :func:`png_chunk_stats` UDF and the q154 oracle-literal builder (the
    q137 wav_frame_rms_values contract) — never fork. Raises ValueError
    on malformed containers (bad signature, truncated chunk, missing
    IHDR/IEND, trailing bytes); CRCs are not validated (the profile is
    structural, and both engines share this exact rule set)."""
    if len(data) < 8 or bytes(data[:8]) != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG container")
    data = bytes(data)
    pos, n, idat = 8, 0, 0
    width = height = bit_depth = color_type = None
    types = []
    while pos + 8 <= len(data):
        ln = int.from_bytes(data[pos : pos + 4], "big")
        typ = data[pos + 4 : pos + 8].decode("latin-1")
        if pos + 12 + ln > len(data):
            raise ValueError("truncated chunk")
        types.append(typ)
        n += 1
        if typ == "IHDR":
            if ln < 13:
                raise ValueError("short IHDR")
            width = int.from_bytes(data[pos + 8 : pos + 12], "big")
            height = int.from_bytes(data[pos + 12 : pos + 16], "big")
            bit_depth = data[pos + 16]
            color_type = data[pos + 17]
        elif typ == "IDAT":
            idat += ln
        pos += 12 + ln
        if typ == "IEND":
            break
    if pos != len(data) or not types or types[-1] != "IEND" or width is None:
        raise ValueError("malformed chunk table")
    return (n, idat, width, height, bit_depth, color_type, ",".join(types))


def jpeg_profile_values(data: bytes) -> tuple:
    """Decoded-JPEG profile — the SHARED pure function (the
    :func:`wav_quality_values` shared-INTEGER contract: float work happens
    once in here; only integers and a hex string cross engines):
    ``(width, height, mean_luma_milli, ahash_hex)`` from a REAL baseline
    JFIF decode (``sources/jpeg.py`` — from-scratch Huffman + dequant +
    float64 iDCT, deterministic everywhere). ``mean_luma_milli`` is the
    exact integer ``Σluma·1000 DIV n_pixels``; the aHash rides
    :func:`ahash_hex` over the same decoded plane. Raises ``ValueError``
    on malformed/unsupported streams (progressive, truncated) — excluded
    identically on both engines (the q154 convention)."""
    from ..sources.jpeg import decode_jpeg_gray

    y = decode_jpeg_gray(bytes(data))
    h, w = y.shape
    mean_milli = int(y.astype(np.int64).sum()) * 1000 // int(y.size)
    return (w, h, mean_milli, ahash_hex(y))


def reencode_profile_values(
    data: bytes, quality: int = 75, crop: tuple = (320, 256)
) -> tuple:
    """Cross-format re-encode fingerprint — the SHARED pure function for
    the q264 oracle-literal builder and the engine's
    :func:`reencode_match` UDF: decode a PNG payload, JPEG-compress a
    fixed top-left ``crop`` (h, w) window with the from-scratch baseline
    encoder (``sources/jpeg.py``), REAL-decode it back, and compare
    perceptual hashes:

        (ahash_png, ahash_jpeg, hamming)

    The point of the op: a near-dup pipeline keyed on perceptual hashes
    must survive lossy RE-ENCODES (the same web image circulating as PNG
    and JPEG) — hamming between the two hashes is the invariance
    measurement, and at q75 it is ≤ a couple of bits for document-like
    pages. The crop bounds the pure-python JPEG cost (panel × ~1.3k
    blocks); it is part of the cross-engine contract. Raises on
    undecodable payloads (error-as-data upstream).

    Memoized by payload content (md5 of the bytes + params — r5 verdict
    item #5: the oracle builder already memoized; the engine side re-paid
    the ~0.34 s/payload codec chain on every pass). A pure deterministic
    function of the bytes, so the cache is content-addressed, bounded,
    and survives task boundaries in reused Python workers."""
    import hashlib

    from ..sources.jpeg import decode_jpeg_gray, encode_jpeg_gray

    key = (hashlib.md5(bytes(data)).hexdigest(), int(quality), tuple(crop))
    hit = _REENCODE_MEMO.get(key)
    if hit is not None:
        return hit
    arr, _ = png.decode_gray(bytes(data))
    win = arr[: crop[0], : crop[1]]
    ha = ahash64(win)
    hb = ahash64(decode_jpeg_gray(encode_jpeg_gray(win, quality=quality)))
    ham = bin((ha ^ hb) & 0xFFFFFFFFFFFFFFFF).count("1")
    out = (
        f"{ha & 0xFFFFFFFFFFFFFFFF:016x}",
        f"{hb & 0xFFFFFFFFFFFFFFFF:016x}",
        ham,
    )
    if len(_REENCODE_MEMO) < 4096:
        _REENCODE_MEMO[key] = out
    return out


#: content-addressed cache for :func:`reencode_profile_values` (see its
#: docstring); bounded so a pathological stream of distinct payloads can
#: never grow worker memory unboundedly
_REENCODE_MEMO: dict = {}


def reencode_match(payloads: DataFrame, quality: int = 75) -> DataFrame:
    """PNG payloads → cross-format (PNG vs JPEG-re-encode) aHash match
    table via one Arrow-batched ``mapInPandas`` pass over the payload
    panel; errors are data. Columns: media_ref, ahash_png, ahash_jpeg,
    hamming, error."""
    schema = T.StructType(
        [
            T.StructField("media_ref", T.StringType()),
            T.StructField("ahash_png", T.StringType()),
            T.StructField("ahash_jpeg", T.StringType()),
            T.StructField("hamming", T.LongType()),
            T.StructField("error", T.StringType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, data in zip(pdf["media_ref"], pdf["png"]):
                try:
                    v = reencode_profile_values(bytes(data), quality)
                    rows.append((ref, *v, None))
                except Exception as e:
                    rows.append((ref, None, None, None, str(e)))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    # one payload per task: the panel is tiny (distinct media) but each row
    # costs ~0.34 s of pure-python codec work — without the repartition the
    # whole panel lands in one Arrow batch on one core
    src = payloads.select("media_ref", "png")
    n = src.sparkSession.sparkContext.defaultParallelism
    return src.repartition(n).mapInPandas(gen, schema)


def jpeg_stats(payloads: DataFrame) -> DataFrame:
    """JPEG payloads → decoded luma profiles via one Arrow-batched
    ``mapInPandas`` pass (the :func:`png_chunk_stats` shape); errors are
    data (NULL stats, message in ``error``). The decode is the real
    baseline-JFIF path — a panel-bounded cost (distinct media objects),
    never a per-corpus-row one."""
    schema = T.StructType(
        [
            T.StructField("media_ref", T.StringType()),
            T.StructField("width", T.LongType()),
            T.StructField("height", T.LongType()),
            T.StructField("mean_luma_milli", T.LongType()),
            T.StructField("ahash", T.StringType()),
            T.StructField("error", T.StringType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, data in zip(pdf["media_ref"], pdf["png"]):
                try:
                    v = jpeg_profile_values(bytes(data))
                    rows.append((ref, *v, None))
                except Exception as e:
                    rows.append((ref, None, None, None, None, str(e)))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return payloads.select("media_ref", "png").mapInPandas(gen, schema)


def png_chunk_stats(payloads: DataFrame) -> DataFrame:
    """PNG payloads → structural chunk-table stats via one Arrow-batched
    ``mapInPandas`` pass (the :func:`image_ahash` shape); errors are data
    (NULL stats, message in ``error``). Container metadata without pixel
    decode — the cheap first gate of an image-quality pipeline (declared
    dimensions, bit depth, compressed-payload size)."""
    schema = T.StructType(
        [
            T.StructField("media_ref", T.StringType()),
            T.StructField("n_chunks", T.LongType()),
            T.StructField("idat_bytes", T.LongType()),
            T.StructField("width", T.LongType()),
            T.StructField("height", T.LongType()),
            T.StructField("bit_depth", T.LongType()),
            T.StructField("color_type", T.LongType()),
            T.StructField("chunk_types", T.StringType()),
            T.StructField("error", T.StringType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, data in zip(pdf["media_ref"], pdf["png"]):
                try:
                    v = png_chunk_profile_values(bytes(data))
                    rows.append((ref, *v, None))
                except Exception as e:
                    rows.append(
                        (ref, None, None, None, None, None, None, None, str(e))
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return payloads.select("media_ref", "png").mapInPandas(gen, schema)


def video_frame_ahash_values(
    payload: bytes, every_k: int = 1, max_frames: int = 12, decoder=None
) -> list[tuple[int, str]]:
    """Per-sampled-frame aHash hex of a video payload — the SHARED pure
    function: the engine's :func:`video_frame_hashes` mapInPandas UDF and
    the q157 oracle-literal builder both call THIS (the
    :func:`wav_frame_rms_values` invariant: engine and generator run
    identical operations on identical decoded planes). Lazy decode +
    early break keep the cost O(frames kept)."""
    rows: list[tuple[int, str]] = []
    ek = max(every_k, 1)
    for i, arr in enumerate((decoder or decode_video_frames)(payload)):
        if i % ek:
            continue
        rows.append((i, ahash_hex(arr)))
        if len(rows) >= max_frames:
            break
    return rows


VIDEO_HASH_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("fhash", T.StringType()),
        T.StructField("error", T.StringType()),
    ]
)


def video_frame_hashes(
    payloads: DataFrame, every_k: int = 1, max_frames: int = 12
) -> DataFrame:
    """Sampled per-frame perceptual hashes over REAL Y4M payloads (lazy
    raw-planar decode, :func:`decode_video_frames`) via one Arrow-batched
    ``mapInPandas`` pass; undecodable payloads are error rows (the
    errors-as-data convention of :func:`video_frame_sample`)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        names = [f.name for f in VIDEO_HASH_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for ref, data in zip(pdf["media_ref"], pdf["png"]):
                try:
                    for i, hx in video_frame_ahash_values(
                        bytes(data), every_k, max_frames
                    ):
                        rows.append((ref, i, hx, None))
                except Exception as e:
                    rows.append((ref, None, None, str(e)))
            yield pd.DataFrame(rows, columns=names)

    return payloads.select("media_ref", "png").mapInPandas(gen, VIDEO_HASH_SCHEMA)


def hex_hamming(col_a, col_b):
    """Hamming distance between two 16-hex-char 64-bit hashes as a
    per-nibble popcount fold — integer-only, cross-engine exact, never a
    signed 64-bit parse of the whole hash (the q57 2^53 lesson; same
    arithmetic as :func:`phash_near_dup_pairs`'s verify)."""

    def nib(c, i):
        return F.conv(F.substring(c, i, 1), 16, 10).cast("int")

    return F.aggregate(
        F.sequence(F.lit(1), F.lit(16)),
        F.lit(0),
        lambda acc, i: acc
        + F.bit_count(nib(col_a, i).bitwiseXOR(nib(col_b, i))).cast("int"),
    ).cast("long")


def video_scene_profile(
    frame_hashes: DataFrame, cut_threshold: int = 16
) -> DataFrame:
    """Temporal scene profile per video from a per-frame hash table
    (:func:`video_frame_hashes` output): consecutive-sampled-frame Hamming
    distance → scene-cut count (``hamming > cut_threshold``), static-frame
    count (``hamming == 0`` — the within-video temporal dedup signal), and
    the max inter-frame jump. The shot-boundary-detection shape of a video
    curation pipeline (static slideshows vs. rapid-cut content), run
    entirely on hashes — pixels never shuffle.

    Scale shape: the per-video window partition is bounded by the sampling
    budget (``max_frames`` rows per video, never video length), so the lag
    window can never straggle; the aggregate is one hash groupBy with
    map-side combine on the same key. Single-sampled-frame videos have no
    consecutive pair: counts 0, ``max_ham`` coalesces to 0, ``n_scenes``
    stays 1.

    Output: (media_ref, n_frames, n_scenes, n_cuts, n_static, max_ham).
    """
    from pyspark.sql import Window

    ok = frame_hashes.where(F.col("fhash").isNotNull()).select(
        "media_ref", "frame_idx", "fhash"
    )
    w = Window.partitionBy("media_ref").orderBy("frame_idx")
    scored = ok.withColumn("prev", F.lag("fhash").over(w)).withColumn(
        "ham",
        F.when(
            F.col("prev").isNotNull(), hex_hamming(F.col("fhash"), F.col("prev"))
        ),
    )
    return scored.groupBy("media_ref").agg(
        F.count(F.lit(1)).cast("long").alias("n_frames"),
        (
            F.coalesce(
                F.sum(
                    (F.col("ham") > F.lit(int(cut_threshold))).cast("long")
                ),
                F.lit(0),
            )
            + F.lit(1)
        )
        .cast("long")
        .alias("n_scenes"),
        F.coalesce(
            F.sum((F.col("ham") > F.lit(int(cut_threshold))).cast("long")),
            F.lit(0),
        )
        .cast("long")
        .alias("n_cuts"),
        F.coalesce(
            F.sum((F.col("ham") == F.lit(0)).cast("long")), F.lit(0)
        )
        .cast("long")
        .alias("n_static"),
        F.coalesce(F.max("ham"), F.lit(0)).cast("long").alias("max_ham"),
    )


def wav_quality_values(
    payload: bytes,
    frame: int = 512,
    silence_rms: float = 0.02,
    clip_abs: float = 0.85,
    decoder=None,
) -> tuple[int, int, int, int]:
    """Integer audio-quality profile of one payload — the SHARED pure
    function (the wav_frame_rms_values contract): the engine's
    ``audio_quality_profile`` mapInPandas UDF and the q169 oracle-literal
    builder both call THIS. Float thresholding happens HERE, once, in
    python — only the resulting integers cross engines, so no float
    literal ever rides the SQL. Returns (n_frames, n_silent, n_clipped,
    peak_milli): silent = frame RMS < silence_rms; clipped = any sample
    |x| ≥ clip_abs in the frame; peak_milli = ⌊max|x|·1000⌋ (truncation)."""
    pcm = (decoder or decode_audio)(payload)
    n_frames = len(pcm) // frame
    if n_frames == 0:
        return 0, 0, 0, 0
    fr = pcm[: n_frames * frame].reshape(n_frames, frame)
    rms = np.sqrt((fr * fr).mean(axis=1))
    n_silent = int((rms < silence_rms).sum())
    n_clipped = int((np.abs(fr) >= clip_abs).any(axis=1).sum())
    peak_milli = int(float(np.abs(fr).max()) * 1000.0)
    return n_frames, n_silent, n_clipped, peak_milli


AUDIO_QUALITY_SCHEMA = (
    "media_ref string, n_frames long, n_silent long, n_clipped long, "
    "peak_milli long"
)


def audio_quality_profile(
    payloads: DataFrame,
    frame: int = 512,
    silence_rms: float = 0.02,
    clip_abs: float = 0.85,
    use_fake_decoder: bool = True,
) -> DataFrame:
    """Per-payload audio quality verdict — silence ratio and clipping
    counts, the two gates a speech-corpus ingest applies before paying
    for transcription (mostly-silent capture → drop; clipped capture →
    degraded). One row per decodable payload; undecodable payloads emit
    no rows (the q137 exclusion convention). Fixed-point
    ``silence_micro = n_silent·10⁶ DIV n_frames`` (non-negative counts).

    Shape: mapInPandas over payload bytes (pixels/samples never leave
    the task — only 5 integers per payload return), then a zero-shuffle
    projection for the micro ratios; joins against doc-level picks stay
    broadcastable (catalog-sized).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        dec = _fake_pcm if use_fake_decoder else decode_audio
        for pdf in batches:
            rows = []
            for ref, data in zip(pdf["media_ref"], pdf["png"]):
                try:
                    nf, ns, nc, pk = wav_quality_values(
                        bytes(data), frame, silence_rms, clip_abs, decoder=dec
                    )
                except Exception:
                    continue  # undecodable payload → no rows
                rows.append((ref, nf, ns, nc, pk))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_ref", "n_frames", "n_silent", "n_clipped",
                    "peak_milli",
                ],
            )

    prof = payloads.select("media_ref", "png").mapInPandas(
        gen, AUDIO_QUALITY_SCHEMA
    )
    return prof.select(
        "media_ref",
        "n_frames",
        "n_silent",
        "n_clipped",
        "peak_milli",
        F.expr("(n_silent * 1000000L) DIV greatest(n_frames, 1L)")
        .cast("long")
        .alias("silence_micro"),
        F.expr("(n_clipped * 1000000L) DIV greatest(n_frames, 1L)")
        .cast("long")
        .alias("clip_micro"),
    )
