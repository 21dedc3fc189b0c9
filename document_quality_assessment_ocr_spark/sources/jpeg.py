"""Baseline JPEG (JFIF) codec in pure numpy — no codec library.

Round-5 realism item: JPEG is the dominant web image format, and the
reference leans on PIL/pymupdf for exactly this job
(``handlers/pdf_handler.py:48``, ``handlers/tiff_handler.py:8``); this
container ships neither, so the decode path is built from the spec, the
same way ``png.py`` (PNG), the stdlib-``wave`` PCM path, and the Y4M
parser were.

Scope (documented, honest boundary):

* **Decode**: baseline sequential DCT (SOF0/SOF1), 8-bit samples, 1-4
  components, arbitrary 1-4× sampling factors, multiple DQT/DHT
  segments, DRI/RSTn restart markers, FF00 byte-unstuffing. Output is
  the LUMA plane (grayscale view — the quality kernels and aHash/pHash
  chain consume gray); chroma blocks are entropy-decoded to keep the
  bitstream in sync but skip iDCT. Progressive (SOF2), arithmetic
  coding (SOF9+), 12-bit, and hierarchical modes raise ``ValueError``
  (error-as-data upstream, the q137 undecodable-payload convention).
* **Encode**: baseline grayscale (1 component) and YCbCr 4:2:0 / 4:2:2
  color with the Annex-K quantization + Huffman tables and IJG quality
  scaling — enough to synthesize real decoder-exercising payloads
  in-container (fixture catalog ``fixtures.build_jpeg_payloads``).

Determinism contract: decode is exact integer work plus one float64
iDCT with a fixed operation order (matrix multiply, ``np.round``
half-even, clip) — bit-identical planes on every host — so
oracle-literal builders may embed hashes/statistics computed by the
SAME shared functions the engine UDFs call (the q57/q137 technique;
``operators.multimodal.jpeg_profile_values``).

Scale shape: decoding rides Arrow-batched ``mapInPandas`` over the
payload catalog — a bounded PANEL (distinct rendered media), never the
corpus; per-payload cost is O(pixels) with a pure-python Huffman inner
loop that is fine for catalog-sized panels and honestly NOT a
hot-corpus path (a 100 TB run would decode once per distinct media
object, exactly how the PNG/K1-K8 kernel panel works).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

# ---- Annex K.1/K.2 base quantization tables (natural row-major order)
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# zig-zag scan order: ZIGZAG[k] = flat index into the 8×8 block (row*8+col)
# of the k-th coefficient in scan order
_zz = []
for s in range(15):
    rng = range(0, s + 1)
    for i in (rng if s % 2 else reversed(rng)):
        r, c = i, s - i
        if r < 8 and c < 8:
            _zz.append(r * 8 + c)
ZIGZAG = np.array(_zz, dtype=np.int64)
del _zz

# ---- Annex K.3 standard Huffman tables: (bits[1..16], values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8-point DCT-II basis: A[k, n] = c_k/2 · cos((2n+1)kπ/16);
# forward F = A·f·Aᵀ, inverse f = Aᵀ·F·A — one float64 matmul each way,
# fixed operation order (the determinism contract)
_n = np.arange(8, dtype=np.float64)
_DCT_A = 0.5 * np.cos((2.0 * _n[None, :] + 1.0) * _n[:, None] * np.pi / 16.0)
_DCT_A[0, :] *= 1.0 / np.sqrt(2.0)
del _n


def _canonical_codes(bits: List[int], vals: List[int]) -> Dict[int, Tuple[int, int]]:
    """value → (code, length) for encode, built canonically per the spec
    (codes assigned in increasing length, increasing value order)."""
    out: Dict[int, Tuple[int, int]] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: List[int], vals: List[int]) -> Dict[Tuple[int, int], int]:
    """(length, code) → value for decode (same canonical assignment)."""
    out: Dict[Tuple[int, int], int] = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def quality_scaled(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of a base quant table (libjpeg jcparam.c rule,
    public): scale = 5000/q below 50 else 200−2q; entries clamp to 1..255."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (base * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int64)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------

class _Marker(Exception):
    def __init__(self, code: int, pos: int):
        self.code = code
        self.pos = pos


class _BitReader:
    """MSB-first entropy-segment reader with FF00 unstuffing; any other
    FFxx raises _Marker (RSTn handling lives in the MCU loop)."""

    __slots__ = ("data", "pos", "buf", "nbits")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated entropy segment")
        b = d[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(d):
                raise ValueError("truncated at 0xFF")
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise _Marker(nxt, self.pos)
        else:
            self.pos += 1
        self.buf = (self.buf << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self, expected: int) -> None:
        """Byte-align, consume the RSTn marker, reset the bit buffer."""
        self.buf = 0
        self.nbits = 0
        d = self.data
        if self.pos + 1 >= len(d) or d[self.pos] != 0xFF:
            raise ValueError("expected restart marker")
        code = d[self.pos + 1]
        if code != 0xD0 + (expected % 8):
            raise ValueError(
                f"bad restart marker 0x{code:02x} (expected RST{expected % 8})"
            )
        self.pos += 2


def _huff_decode(r: _BitReader, table: Dict[Tuple[int, int], int]) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | r.bit()
        v = table.get((ln, code))
        if v is not None:
            return v
    raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg_gray(data: bytes) -> np.ndarray:
    """Baseline JFIF → luma plane as uint8 ``(height, width)``.

    Raises ``ValueError`` on anything outside the documented baseline
    scope or on a malformed stream — callers treat that as data (the
    multimodal error-row convention)."""
    data = bytes(data)
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: Dict[int, np.ndarray] = {}
    dc_tabs: Dict[int, Dict[Tuple[int, int], int]] = {}
    ac_tabs: Dict[int, Dict[Tuple[int, int], int]] = {}
    dri = 0
    frame = None  # (w, h, comps[(cid, hs, vs, tq)])

    def seg_len(p: int) -> int:
        if p + 2 > len(data):
            raise ValueError("truncated segment header")
        n = (data[p] << 8) | data[p + 1]
        if n < 2 or p + n > len(data):
            raise ValueError("bad segment length")
        return n

    while True:
        if pos + 2 > len(data):
            raise ValueError("truncated stream (no SOS/EOI)")
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD8:  # stray SOI
            raise ValueError("unexpected SOI")
        if marker == 0xD9:
            raise ValueError("EOI before scan data")
        if 0xE0 <= marker <= 0xEF or marker == 0xFE:  # APPn / COM
            pos += seg_len(pos)
            continue
        if marker == 0xDB:  # DQT
            n = seg_len(pos)
            p, end = pos + 2, pos + n
            while p < end:
                pq, tq = data[p] >> 4, data[p] & 0x0F
                p += 1
                cnt = 64 * (2 if pq == 1 else 1)
                if p + cnt > end:
                    raise ValueError("truncated DQT")
                if pq == 1:
                    vals = [
                        (data[p + 2 * i] << 8) | data[p + 2 * i + 1]
                        for i in range(64)
                    ]
                else:
                    vals = [data[p + i] for i in range(64)]
                tab = np.zeros(64, dtype=np.int64)
                tab[ZIGZAG] = vals  # stored in zigzag order
                qt[tq] = tab.reshape(8, 8)
                p += cnt
            pos += n
            continue
        if marker == 0xC4:  # DHT
            n = seg_len(pos)
            p, end = pos + 2, pos + n
            while p < end:
                tc, th = data[p] >> 4, data[p] & 0x0F
                p += 1
                if p + 16 > end:
                    raise ValueError("truncated DHT")
                bits = list(data[p : p + 16])
                p += 16
                cnt = sum(bits)
                if p + cnt > end:
                    raise ValueError("truncated DHT values")
                vals = list(data[p : p + cnt])
                p += cnt
                (dc_tabs if tc == 0 else ac_tabs)[th] = _decode_table(bits, vals)
            pos += n
            continue
        if marker == 0xDD:  # DRI
            n = seg_len(pos)
            dri = (data[pos + 2] << 8) | data[pos + 3]
            pos += n
            continue
        if marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 extended seq.
            n = seg_len(pos)
            p = pos + 2
            prec = data[p]
            if prec != 8:
                raise ValueError(f"{prec}-bit samples not supported (8 only)")
            h = (data[p + 1] << 8) | data[p + 2]
            w = (data[p + 3] << 8) | data[p + 4]
            nf = data[p + 5]
            if not (1 <= nf <= 4):
                raise ValueError(f"bad component count {nf}")
            comps = []
            for i in range(nf):
                cid = data[p + 6 + 3 * i]
                hv = data[p + 7 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, data[p + 8 + 3 * i]))
            if w == 0 or h == 0:
                raise ValueError("zero dimension (DNL not supported)")
            frame = (w, h, comps)
            pos += n
            continue
        if marker == 0xC2:
            raise ValueError("progressive JPEG (SOF2) not supported")
        if marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported SOF marker 0xff{marker:02x}")
        if marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            n = seg_len(pos)
            p = pos + 2
            ns = data[p]
            p += 1
            scan = []
            byid = {c[0]: c for c in frame[2]}
            for _ in range(ns):
                cs, tt = data[p], data[p + 1]
                p += 2
                if cs not in byid:
                    raise ValueError(f"scan references unknown component {cs}")
                scan.append((byid[cs], tt >> 4, tt & 0x0F))
            # Ss/Se/AhAl: baseline must be 0/63/0
            if data[p] != 0 or data[p + 1] != 63 or data[p + 2] != 0:
                raise ValueError("non-baseline spectral selection")
            pos += n
            if len(scan) != len(frame[2]):
                raise ValueError("partial (multi-scan) files not supported")
            return _decode_scan(
                data, pos, frame, scan, qt, dc_tabs, ac_tabs, dri
            )
        raise ValueError(f"unexpected marker 0xff{marker:02x}")


def _decode_scan(data, pos, frame, scan, qt, dc_tabs, ac_tabs, dri):
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise ValueError("bad sampling factors")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    luma = comps[0]
    if luma[3] not in qt:
        raise ValueError(f"missing quant table {luma[3]}")
    lq = qt[luma[3]].astype(np.float64)
    # luma plane at its own sampled resolution, padded to whole MCUs
    lw, lh = 8 * hmax * mcux * luma[1] // hmax, 8 * vmax * mcuy * luma[2] // vmax
    plane = np.zeros((lh, lw), dtype=np.float64)

    r = _BitReader(data, pos)
    preds = {c[0][0]: 0 for c in scan}
    n_rst = 0
    for m in range(mcux * mcuy):
        if dri and m and m % dri == 0:
            r.restart(n_rst)
            n_rst += 1
            preds = {k: 0 for k in preds}
        my, mx = divmod(m, mcux)
        try:
            for (comp, td, ta) in scan:
                cid, hs, vs, tq = comp
                dct = dc_tabs.get(td)
                act = ac_tabs.get(ta)
                if dct is None or act is None:
                    raise ValueError("missing Huffman table")
                for by in range(vs):
                    for bx in range(hs):
                        coef = np.zeros(64, dtype=np.int64)
                        t = _huff_decode(r, dct)
                        if t > 11:
                            raise ValueError("bad DC category")
                        diff = _extend(r.bits(t), t)
                        preds[cid] += diff
                        coef[0] = preds[cid]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(r, act)
                            rr, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if rs == 0x00:  # EOB
                                    break
                                if rs == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                raise ValueError("bad AC code")
                            k += rr
                            if k > 63:
                                raise ValueError("AC index overflow")
                            coef[ZIGZAG[k]] = _extend(r.bits(s), s)
                            k += 1
                        if cid == luma[0]:
                            if tq not in qt:
                                raise ValueError(f"missing quant table {tq}")
                            blk = (coef.reshape(8, 8) * lq)
                            pix = _DCT_A.T @ blk @ _DCT_A + 128.0
                            y0 = (my * vs + by) * 8
                            x0 = (mx * hs + bx) * 8
                            plane[y0 : y0 + 8, x0 : x0 + 8] = pix
        except _Marker as mk:
            raise ValueError(
                f"marker 0xff{mk.code:02x} inside entropy data at MCU {m}"
            )
    # trailing: expect EOI (possibly after a final RST-boundary-less tail)
    out = np.clip(np.round(plane), 0.0, 255.0).astype(np.uint8)
    # crop to the luma component's true resolution, then expand to (h, w)
    # if luma is (atypically) subsampled
    ch = (h * luma[2] + vmax - 1) // vmax
    cw = (w * luma[1] + hmax - 1) // hmax
    out = out[:ch, :cw]
    if (ch, cw) != (h, w):
        out = np.repeat(
            np.repeat(out, (vmax + luma[2] - 1) // luma[2], axis=0),
            (hmax + luma[1] - 1) // luma[1],
            axis=1,
        )[:h, :w]
    return out


# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------

class _BitWriter:
    __slots__ = ("out", "buf", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.buf >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _encode_block(
    w: _BitWriter,
    block: np.ndarray,
    q: np.ndarray,
    pred: int,
    dc_codes: Dict[int, Tuple[int, int]],
    ac_codes: Dict[int, Tuple[int, int]],
) -> int:
    f = _DCT_A @ (block.astype(np.float64) - 128.0) @ _DCT_A.T
    coef = np.round(f / q.astype(np.float64)).astype(np.int64)
    zz = coef.reshape(64)[ZIGZAG]
    diff = int(zz[0]) - pred

    def cat(v: int) -> int:
        return int(abs(v)).bit_length()

    def emit(v: int, t: int) -> None:
        if t:
            w.write(v if v >= 0 else v + (1 << t) - 1, t)

    t = cat(diff)
    c, ln = dc_codes[t]
    w.write(c, ln)
    emit(diff, t)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]
            w.write(c, ln)
            run -= 16
        t = cat(v)
        c, ln = ac_codes[(run << 4) | t]
        w.write(c, ln)
        emit(v, t)
        run = 0
    if run:
        c, ln = ac_codes[0x00]
        w.write(c, ln)
    return int(zz[0])


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _dqt_seg(tq: int, table: np.ndarray) -> bytes:
    return _seg(0xDB, bytes([tq]) + bytes(int(v) for v in table.reshape(64)[ZIGZAG]))


def _dht_seg(tc: int, th: int, bits: List[int], vals: List[int]) -> bytes:
    return _seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))


_APP0_JFIF = _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")


def encode_jpeg_gray(
    img: np.ndarray, quality: int = 75, restart_interval: int = 0
) -> bytes:
    """uint8 ``(h, w)`` → baseline grayscale JFIF bytes (Annex-K tables,
    IJG quality scaling). ``restart_interval`` > 0 emits DRI + RSTn every
    that many MCUs (exercises the decoder's restart path)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 2 or img.size == 0:
        raise ValueError("expected a non-empty 2-D uint8 array")
    h, w = img.shape
    q = quality_scaled(QUANT_LUMA, quality)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(img, ((0, ph - h), (0, pw - w)), mode="edge")
    dc = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)

    head = bytearray(b"\xff\xd8")
    head += _APP0_JFIF
    head += _dqt_seg(0, q)
    head += _seg(
        0xC0,
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0]),
    )
    head += _dht_seg(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    head += _dht_seg(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if restart_interval:
        head += _seg(0xDD, int(restart_interval).to_bytes(2, "big"))
    head += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))

    bw = _BitWriter()
    pred = 0
    n_rst = 0
    m = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            if restart_interval and m and m % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + (n_rst % 8)])
                n_rst += 1
                pred = 0
            pred = _encode_block(
                bw, padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8], q,
                pred, dc, ac,
            )
            m += 1
    bw.flush()
    return bytes(head) + bytes(bw.out) + b"\xff\xd9"


def rgb_to_ycbcr(img: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """JFIF full-range BT.601 conversion, rounded half-even to uint8 —
    the deterministic shared rule (one float64 expression per plane)."""
    f = img.astype(np.float64)
    r, g, b = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    to8 = lambda p: np.clip(np.round(p), 0.0, 255.0).astype(np.uint8)  # noqa: E731
    return to8(y), to8(cb), to8(cr)


def encode_jpeg_color(
    img: np.ndarray, quality: int = 75, subsample: str = "420"
) -> bytes:
    """uint8 ``(h, w, 3)`` RGB → baseline YCbCr JFIF with 4:2:0 (2×2) or
    4:2:2 (2×1) chroma subsampling — the interleaved-MCU layout real web
    JPEGs use, exercising the decoder's multi-component path."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3 or img.size == 0:
        raise ValueError("expected a non-empty (h, w, 3) uint8 array")
    if subsample == "420":
        sh, sv = 2, 2
    elif subsample == "422":
        sh, sv = 2, 1
    else:
        raise ValueError("subsample must be '420' or '422'")
    h, w = img.shape[:2]
    y, cb, cr = rgb_to_ycbcr(img)
    mh, mw = 8 * sv, 8 * sh  # MCU pixel size
    ph, pw = -(-h // mh) * mh, -(-w // mw) * mw
    pad2 = lambda p: np.pad(  # noqa: E731
        p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"
    )
    y = pad2(y)
    # chroma box-mean subsample on the padded plane, exact halves round
    # half-even via np.round — deterministic everywhere
    def sub(p: np.ndarray) -> np.ndarray:
        p = pad2(p).astype(np.float64)
        p = p.reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3))
        return np.clip(np.round(p), 0.0, 255.0).astype(np.uint8)

    cbs, crs = sub(cb), sub(cr)

    lq = quality_scaled(QUANT_LUMA, quality)
    cq = quality_scaled(QUANT_CHROMA, quality)
    dcl = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    acl = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dcc = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    acc = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    head = bytearray(b"\xff\xd8")
    head += _APP0_JFIF
    head += _dqt_seg(0, lq)
    head += _dqt_seg(1, cq)
    head += _seg(
        0xC0,
        bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + bytes([3, 1, (sh << 4) | sv, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    head += _dht_seg(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    head += _dht_seg(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    head += _dht_seg(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
    head += _dht_seg(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    head += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    bw = _BitWriter()
    preds = {1: 0, 2: 0, 3: 0}
    for my in range(ph // mh):
        for mx in range(pw // mw):
            for by in range(sv):
                for bx in range(sh):
                    y0, x0 = my * mh + by * 8, mx * mw + bx * 8
                    preds[1] = _encode_block(
                        bw, y[y0 : y0 + 8, x0 : x0 + 8], lq, preds[1], dcl, acl
                    )
            cy, cx = my * 8, mx * 8
            preds[2] = _encode_block(
                bw, cbs[cy : cy + 8, cx : cx + 8], cq, preds[2], dcc, acc
            )
            preds[3] = _encode_block(
                bw, crs[cy : cy + 8, cx : cx + 8], cq, preds[3], dcc, acc
            )
    bw.flush()
    return bytes(head) + bytes(bw.out) + b"\xff\xd9"
