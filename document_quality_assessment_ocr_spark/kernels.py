"""Pure-numpy image-quality scoring kernels (K1–K8 in SURVEY.md §2.3).

Each kernel maps one grayscale uint8 page array → one float, re-deriving the
math of the reference's ``src/document_assessor/criteria.py`` without PIL/cv2
(neither ships in this container). These functions are the SINGLE source of
truth for scoring semantics: the Spark engine calls them inside Arrow-batched
pandas UDFs (:mod:`.functions.udfs`) and the pure-Python oracle
(:mod:`.oracle`) calls them directly, so engine↔oracle parity is structural
and tests pin the *dataflow* (dedup / gating / aggregation / verdict /
reassembly), while dedicated unit tests pin each kernel against analytically
known values (tests/test_kernels.py).

Documented deviations from the reference (PIL/cv2 specifics that cannot be
reproduced bit-exactly without those libraries):
  * resize is bilinear (reference watermark path uses LANCZOS,
    ``criteria.py:100``); skew rotation is a forward projection-profile
    rotation of dark-pixel coordinates rather than PIL's inverse-mapped
    nearest-neighbour raster rotate (``criteria.py:82``) — same metric, same
    argmax-over-angles search, same integer-degree result space [-5, 5];
  * the 3×3 median filter uses edge-replicate padding (PIL MedianFilter,
    ``criteria.py:284``);
  * connected components for DPI estimation use run-based 8-connectivity
    labeling instead of cv2.findContours external contours
    (``criteria.py:52-60``) — identical bounding boxes for solid glyphs.

Deviation bounds are a tested CONTRACT where the real libraries exist
(tests/test_kernel_deviations.py, skipif-gated — PIL/cv2 don't ship in this
container): watermark gating agrees at the shipped max_overlap=10 threshold
with the comb fixture ranking above every clean page in both; skew within
±1° everywhere and exact on the planted-skew fixture; median3x3 equals PIL
MedianFilter on the interior with noise_pct within 1.0pp (full-res) + 1.5pp
(production 2× row subsample); CC box sets equal to cv2 external-contour
rects on text pages with DPI within 5%.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _resize_bilinear_f32(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resample returning float32 (internal fast path for FFT)."""
    h, w = arr.shape
    a = arr.astype(np.float32)
    ys = (np.arange(out_h, dtype=np.float32) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w, dtype=np.float32) + 0.5) * (w / out_w) - 0.5
    ys = np.clip(ys, 0, h - 1)
    xs = np.clip(xs, 0, w - 1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None]
    wx = (xs - x0)[None, :]
    top = a[y0][:, x0] * (1 - wx) + a[y0][:, x1] * wx
    bot = a[y1][:, x0] * (1 - wx) + a[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


def resize_bilinear(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resample to (out_h, out_w). Pixel-center aligned."""
    h, w = arr.shape
    if (h, w) == (out_h, out_w):
        return arr.copy()
    a = arr.astype(np.float64)
    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    ys = np.clip(ys, 0, h - 1)
    xs = np.clip(xs, 0, w - 1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None]
    wx = (xs - x0)[None, :]
    top = a[y0][:, x0] * (1 - wx) + a[y0][:, x1] * wx
    bot = a[y1][:, x0] * (1 - wx) + a[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def thumbnail_fit(arr: np.ndarray, max_size: int = 1000) -> np.ndarray:
    """Aspect-preserving downscale to fit within (max_size, max_size).

    Analog of the reference's in-place ``img.thumbnail((1000, 1000))``
    (``criteria.py:73-75``) — here pure and side-effect-free; the pipeline
    never mutates shared pages (deliberate fix of reference quirk §4.3-1,
    fixtures keep pages ≤1000 px so the quirk is unobservable anyway).
    """
    h, w = arr.shape
    if h <= max_size and w <= max_size:
        return arr
    scale = min(max_size / h, max_size / w)
    return resize_bilinear(arr, max(1, int(h * scale)), max(1, int(w * scale)))


def otsu_threshold(arr: np.ndarray) -> int:
    """Otsu's threshold over a 256-bin histogram (cv2.THRESH_OTSU analog,
    reference ``criteria.py:49-51``). Returns the integer threshold t; the
    INV binarization rule is ``pixel <= t → foreground``."""
    hist = np.bincount(arr.ravel(), minlength=256).astype(np.float64)
    total = hist.sum()
    if total == 0:
        return 0
    p = hist / total
    omega = np.cumsum(p)
    mu = np.cumsum(p * np.arange(256))
    mu_t = mu[-1]
    denom = omega * (1.0 - omega)
    with np.errstate(divide="ignore", invalid="ignore"):
        sigma_b = np.where(denom > 0, (mu_t * omega - mu) ** 2 / denom, 0.0)
    return int(np.argmax(sigma_b))


def connected_component_boxes(mask: np.ndarray) -> list[tuple[int, int, int, int]]:
    """8-connected component bounding boxes over a boolean mask.

    Run-based two-pass labeling with union-find (fast: unions are per
    row-adjacent run pair, not per pixel). Returns (x, y, w, h) boxes like
    cv2.boundingRect (reference ``criteria.py:52-60``).
    """
    h, w = mask.shape
    if h == 0 or w == 0 or not mask.any():
        return []
    padded = np.zeros((h, w + 2), dtype=np.int8)
    padded[:, 1:-1] = mask
    d = np.diff(padded, axis=1)
    srows_np, scols_np = np.nonzero(d == 1)  # run starts (inclusive)
    _, ecols_np = np.nonzero(d == -1)  # run ends (exclusive)
    # runs are emitted row-major by nonzero → starts/ends align pairwise;
    # plain python ints from here on (boxed numpy scalars are ~5× slower in
    # the merge loop below)
    srows = srows_np.tolist()
    starts = scols_np.tolist()
    ends = (ecols_np - 1).tolist()  # inclusive end col
    n = len(starts)
    parent = list(range(n))

    def find(i: int) -> int:
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != root:
            parent[i], i = root, parent[i]
        return root

    # row boundaries into the run arrays
    row_first = np.searchsorted(srows_np, np.arange(h), side="left").tolist()
    row_last = np.searchsorted(srows_np, np.arange(h), side="right").tolist()
    for r in range(1, h):
        i, i_end = row_first[r - 1], row_last[r - 1]
        j, j_end = row_first[r], row_last[r]
        while i < i_end and j < j_end:
            # 8-connectivity: overlap with ±1 dilation
            if ends[i] + 1 >= starts[j] - 1 and starts[i] - 1 <= ends[j] + 1:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
            if ends[i] <= ends[j]:
                i += 1
            else:
                j += 1
    boxes: dict[int, list[int]] = {}
    for k in range(n):
        root = find(k)
        r = srows[k]
        b = boxes.get(root)
        if b is None:
            boxes[root] = [starts[k], r, ends[k], r]
        else:
            if starts[k] < b[0]:
                b[0] = starts[k]
            if ends[k] > b[2]:
                b[2] = ends[k]
            if r < b[1]:
                b[1] = r
            if r > b[3]:
                b[3] = r
    return [(x0, y0, x1 - x0 + 1, y1 - y0 + 1) for x0, y0, x1, y1 in boxes.values()]


# ---------------------------------------------------------------------------
# K1 — content ratio (text density / missing pages)
# ---------------------------------------------------------------------------


def content_ratio(arr: np.ndarray) -> float:
    """% of 'ink' pixels: binarize at 200, dark fraction × 100
    (reference ``calculate_content_ratio``, ``criteria.py:134-137``)."""
    if arr.size == 0:
        return 0.0
    return float(np.count_nonzero(arr < 200)) / arr.size * 100.0


# ---------------------------------------------------------------------------
# K2 — trimmed brightness
# ---------------------------------------------------------------------------


def brightness_with_trim(arr: np.ndarray) -> float:
    """Mean gray of the bounding box of pixels ≥220; if none (fully dark
    image), mean of the whole image (reference
    ``calculate_brightness_with_trim``, ``criteria.py:152-169`` — getbbox on
    the ≥220 binarization; a blank white page yields 255, asserted by
    reference ``tests/test_criteria.py:203-208``)."""
    bright = arr >= 220
    if not bright.any():
        return float(arr.mean())
    rows = np.nonzero(bright.any(axis=1))[0]
    cols = np.nonzero(bright.any(axis=0))[0]
    crop = arr[rows[0] : rows[-1] + 1, cols[0] : cols[-1] + 1]
    return float(crop.mean())


# ---------------------------------------------------------------------------
# K3 — blur (Laplacian variance)
# ---------------------------------------------------------------------------


def blur_laplacian_var(arr: np.ndarray) -> float:
    """Variance of the 3×3 Laplacian [[0,1,0],[1,-4,1],[0,1,0]] with
    REFLECT_101 borders — exactly cv2.Laplacian(img, CV_64F).var()
    (reference ``criteria.py:254-258``; np.pad 'reflect' == BORDER_REFLECT_101)."""
    if arr.size == 0 or min(arr.shape) < 2:
        return 0.0
    # int16 arithmetic (range ±1020) — 4× less memory traffic than float64;
    # np.var promotes to float64 so the variance itself is exact
    a = arr.astype(np.int16)
    p = np.pad(a, 1, mode="reflect")
    lap = p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:] - 4 * a
    return float(lap.var())


# ---------------------------------------------------------------------------
# K4 — skew (projection-profile search over integer angles)
# ---------------------------------------------------------------------------


def skew_degrees(arr: np.ndarray) -> float:
    """Best integer skew angle in [-5, 5] by maximizing the variance of
    per-row dark-pixel counts after rotation (reference ``calculate_skew``,
    ``criteria.py:72-90``).

    Forward-rotates the coordinates of dark pixels (<128) about the image
    center and histograms their rows over the expanded canvas — O(dark·11)
    instead of O(pixels·11), same projection-profile metric. Empty rows of
    the expanded canvas contribute zeros to the variance exactly as the
    reference's ``fillcolor=255`` rows do.
    """
    a = thumbnail_fit(arr, 1000)
    h, w = a.shape
    ys, xs = np.nonzero(a < 128)
    n = len(ys)
    if n == 0:
        return 0.0
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yc = (ys - cy).astype(np.float64)
    xc = (xs - cx).astype(np.float64)
    angles = np.arange(-5, 6)
    best_score, best_angle = -1.0, 0
    for ang in angles:
        t = np.deg2rad(ang)
        c, s = np.cos(t), np.sin(t)
        out_h = int(round(abs(h * c) + abs(w * s)))
        if out_h <= 0:
            continue
        # image rotated CCW by ang ⇒ content coordinates rotate CW in y-down
        ny = xc * s + yc * c
        rows = np.rint(ny + (out_h - 1) / 2.0).astype(np.int64)
        np.clip(rows, 0, out_h - 1, out=rows)
        counts = np.bincount(rows, minlength=out_h)
        # var of counts via E[x²]−E[x]² (counts sum to n by construction)
        sumsq = float(np.dot(counts, counts))
        score = sumsq / out_h - (n / out_h) ** 2
        if score > best_score:
            best_score, best_angle = score, int(ang)
    return float(best_angle)


# ---------------------------------------------------------------------------
# K5 — watermark (FFT peak-to-mean)
# ---------------------------------------------------------------------------


_FFT_N = 256


def watermark_fft(arr: np.ndarray) -> float:
    """Periodic-watermark score: resize to a fixed square, 20·log(|FFT|+1),
    zero the DC axes, peak/mean, normalize clip((score−1.5)·20, 0, 100)
    (reference ``detect_watermark_fft``, ``criteria.py:93-131``).

    Perf-tuned vs the reference's recipe (semantics owned by this engine, the
    oracle shares this function): 256² instead of 512² and no fftshift — the
    shifted 2-px center lines map to unshifted rows/cols {0, N-1}, which we
    zero directly. Peak/mean of the log-magnitude spectrum is unchanged by
    the shift permutation."""
    a = _resize_bilinear_f32(arr, _FFT_N, _FFT_N)
    f = np.fft.fft2(a)
    mag = 20.0 * np.log(np.abs(f) + 1.0)
    mag[0, :] = 0.0
    mag[_FFT_N - 1, :] = 0.0
    mag[:, 0] = 0.0
    mag[:, _FFT_N - 1] = 0.0
    mean_val = mag.mean()
    score = (mag.max() / (mean_val + 1e-9)) if mean_val > 0 else 0.0
    return float(max(0.0, min(100.0, (score - 1.5) * 20.0)))


# ---------------------------------------------------------------------------
# K6 — noise (median-residual percentage)
# ---------------------------------------------------------------------------


def median3x3(arr: np.ndarray) -> np.ndarray:
    """3×3 median filter, edge-replicate padding (PIL MedianFilter analog).

    Median-of-9 via a 19-exchange minimax network on uint8 views — no
    float64 promotion, no sort; ~4× faster than np.median of the 9-stack."""
    p = np.pad(arr, 1, mode="edge")
    h, w = arr.shape
    v = [p[i : i + h, j : j + w].copy() if (i, j) == (0, 0) else p[i : i + h, j : j + w]
         for i in range(3) for j in range(3)]
    v = [x.copy() for x in v]

    def srt(i: int, j: int) -> None:
        lo = np.minimum(v[i], v[j])
        np.maximum(v[i], v[j], out=v[j])
        v[i] = lo

    # classic median-of-9 exchange network (Smith 1996)
    srt(1, 2); srt(4, 5); srt(7, 8)
    srt(0, 1); srt(3, 4); srt(6, 7)
    srt(1, 2); srt(4, 5); srt(7, 8)
    srt(0, 3); srt(5, 8); srt(4, 7)
    srt(3, 6); srt(1, 4); srt(2, 5)
    srt(4, 7); srt(4, 2); srt(6, 4)
    srt(4, 2)
    return v[4]


def noise_percent(arr: np.ndarray) -> float:
    """% of pixels whose |orig − median3×3| exceeds 30 (reference noise
    branch, ``criteria.py:281-296``).

    Computed on a 2× row-subsampled view when the page is tall enough — the
    residual fraction is a density estimate and row-subsampling leaves it
    statistically unchanged (salt-and-pepper fixtures measure within 0.2pp)
    while halving the most memory-bound kernel's traffic (engine and oracle
    share this definition)."""
    if arr.size == 0:
        return 0.0
    a = np.ascontiguousarray(arr[::2]) if arr.shape[0] >= 64 else arr
    diff = np.abs(a.astype(np.int16) - median3x3(a).astype(np.int16))
    return float(np.count_nonzero(diff > 30)) / a.size * 100.0


# ---------------------------------------------------------------------------
# K7 — compression (histogram entropy)
# ---------------------------------------------------------------------------


def entropy256(arr: np.ndarray) -> float:
    """Shannon entropy of the 256-bin normalized histogram
    (reference compression branch, ``criteria.py:298-308``)."""
    hist = np.bincount(arr.ravel(), minlength=256).astype(np.float64)
    s = hist.sum()
    if s == 0:
        return 0.0
    p = hist / s
    return float(-np.sum(p * np.log2(p + 1e-10)))


# ---------------------------------------------------------------------------
# K8 — smart DPI estimation from character heights
# ---------------------------------------------------------------------------


def estimate_dpi(arr: np.ndarray, expected_char_height_mm: float = 2.5) -> float:
    """Otsu-INV binarize, connected-component boxes, keep 10<h<100 with
    aspect 0.1<w/h<1.5, dpi = median(h)/(char_mm/25.4); no boxes → 0.0
    (reference ``estimate_dpi_from_image``, ``criteria.py:44-69``)."""
    try:
        t = otsu_threshold(arr)
        mask = arr <= t
        heights = [
            bh
            for (_, _, bw, bh) in connected_component_boxes(mask)
            if 10 < bh < 100 and 0.1 < (bw / bh) < 1.5
        ]
        if not heights:
            return 0.0
        return float(np.median(np.array(heights, dtype=np.float64))) / (
            expected_char_height_mm / 25.4
        )
    except Exception:
        return 0.0


# ---------------------------------------------------------------------------
# page-level aggregation (reference _aggregate, criteria.py:140-149)
# ---------------------------------------------------------------------------


def aggregate(values: list[float], mode: str = "min") -> float:
    """Page-score list → scalar. Empty → 0; unknown mode → min (the shipped
    config's ``all_pass`` falls through here, reference ``criteria.py:140-149``)."""
    if not values:
        return 0.0
    if mode == "max":
        return float(max(values))
    if mode == "avg":
        return float(sum(values) / len(values))
    return float(min(values))  # "min" and any unknown mode


def score_page(arr: np.ndarray) -> dict[str, float]:
    """All per-page kernels in one pass over one decoded page (the engine's
    single-decode optimization mirrors the reference's extract-once design,
    ``criteria.py:176-197``)."""
    return {
        "content_ratio": content_ratio(arr),
        "brightness": brightness_with_trim(arr),
        "lap_var": blur_laplacian_var(arr),
        "skew_deg": skew_degrees(arr),
        "watermark": watermark_fft(arr),
        "noise_pct": noise_percent(arr),
        "entropy": entropy256(arr),
    }
