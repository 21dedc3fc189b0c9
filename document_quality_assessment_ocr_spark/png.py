"""Minimal 8-bit grayscale PNG codec (pure stdlib zlib + numpy).

The container ships no PIL/cv2, so media payloads are real PNG bytes produced
and consumed by this module. This keeps the media column an *opaque binary
payload* (as a production corpus would be) and makes the decode step inside the
Arrow-batched UDF genuine work, mirroring the reference's
``Image.open(path).convert("L")`` scan (reference
``src/document_assessor/criteria.py:38``).

Supports: color type 0 (grayscale), bit depth 8, no interlace. Encoder emits
filter 0 scanlines; decoder understands all five standard filters.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_gray(arr: np.ndarray, dpi: int = 0) -> bytes:
    """Encode a 2-D uint8 array as grayscale PNG bytes.

    ``dpi > 0`` writes a pHYs chunk (meters-based, like PIL's ``dpi=`` save
    arg) so metadata DPI round-trips — the resolution criterion reads it
    (reference ``criteria.py:229``).
    """
    if arr.ndim != 2 or arr.dtype != np.uint8:
        raise ValueError("encode_gray expects 2-D uint8 array")
    h, w = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = np.empty((h, w + 1), dtype=np.uint8)
    raw[:, 0] = 0  # filter type 0 per scanline
    raw[:, 1:] = arr
    out = [_SIG, _chunk(b"IHDR", ihdr)]
    if dpi > 0:
        ppm = int(round(dpi / 0.0254))
        out.append(_chunk(b"pHYs", struct.pack(">IIB", ppm, ppm, 1)))
    out.append(_chunk(b"IDAT", zlib.compress(raw.tobytes(), 6)))
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)


def _unfilter(raw: np.ndarray, h: int, w: int) -> np.ndarray:
    """Undo per-scanline PNG filters for bpp=1 grayscale."""
    stride = w + 1
    # fast path: every scanline filter byte is 0 (this codec's encoder and
    # most scanned-document PNGs) → a single strided copy, no python loop
    view = raw.reshape(h, stride)
    if not view[:, 0].any():
        return view[:, 1:].copy()
    img = np.zeros((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.uint8)
    for y in range(h):
        line = raw[y * stride : (y + 1) * stride]
        ftype, cur = line[0], line[1:].astype(np.int32)
        if ftype == 0:
            row = cur
        elif ftype == 1:  # Sub
            row = cur.copy()
            for x in range(1, w):
                row[x] = (row[x] + row[x - 1]) & 0xFF
        elif ftype == 2:  # Up
            row = (cur + prev) & 0xFF
        elif ftype == 3:  # Average
            row = cur.copy()
            row[0] = (row[0] + (prev[0] >> 1)) & 0xFF
            for x in range(1, w):
                row[x] = (row[x] + ((int(row[x - 1]) + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            row = cur.copy()
            for x in range(w):
                a = int(row[x - 1]) if x > 0 else 0
                b = int(prev[x])
                c = int(prev[x - 1]) if x > 0 else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[x] = (row[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        img[y] = row.astype(np.uint8)
        prev = img[y]
    return img


def decode_gray(data: bytes) -> tuple[np.ndarray, int]:
    """Decode grayscale PNG bytes → (2-D uint8 array, metadata dpi or 0).

    Raises ``ValueError`` on malformed input — callers surface this as an
    extraction failure, never a task failure (reference ``criteria.py:332-334``:
    errors are data).
    """
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, w = 8, None
    h = 0
    dpi = 0
    idat = []
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) < length:
            raise ValueError("truncated PNG chunk")
        if typ == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or ctype != 0 or interlace != 0:
                raise ValueError("unsupported PNG variant")
        elif typ == b"pHYs":
            ppm_x, _, unit = struct.unpack(">IIB", body)
            if unit == 1:
                dpi = int(round(ppm_x * 0.0254))
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if raw.size != h * (w + 1):
        raise ValueError("PNG size mismatch")
    return _unfilter(raw, h, w), dpi
