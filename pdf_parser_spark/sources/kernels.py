"""Native perception kernels (SURVEY.md §2.9 K1-K6) — real implementations.

The reference's CV chain re-implemented as pure-numpy array kernels so
the engine's native decode path is actual code, unit-testable in any
environment, with only the two genuinely external calls import-gated:

- page rasterization (pypdfium2 — K1, /root/reference/extractor.py:960-976)
- Tesseract OCR (pytesseract — K4/K5, extractor.py:987-989)

Everything else — the preprocess chain (extractor.py:108-137), template
matching (extractor.py:139-153), and the HSV highlight-recovery image
pipeline (response_extractor.py:822-869) — runs here in numpy with no
cv2/PIL dependency, matching the documented semantics of the PIL/OpenCV
calls the reference makes:

  preprocess: PIL SHARPEN → PIL Contrast(1.15) → CLAHE(clip=2.0, tile=8)
              on the LAB L channel → unsharp mask (GaussianBlur σ=1.2,
              addWeighted 1.3/−0.3) on grayscale, re-expanded to RGB
  match:      cv2.matchTemplate TM_CCOEFF_NORMED ≥ 0.6 vs 37×37 templates
  highlight:  HSV inRange (18,60,140)-(40,255,255) → white-out →
              adaptiveThreshold(MEAN_C, 21, 9) → 2×2 dilate →
              OCR whitelist YESNO @ PSM 7

Bit-exactness caveat (documented, not hidden): PIL/OpenCV use fixed-point
lookup tables internally whose low-bit rounding varies across builds;
these kernels implement the published formulas in float with final
rounding. OCR output dominates any ±1 LSB pixel difference, and the
downstream geometry consumes OCR tokens, not pixels.

Vectorization: every kernel is whole-array numpy (no Python per-pixel
loops); template match uses FFT cross-correlation + integral-image
window statistics, O(HW log HW) per page independent of template count
position — the same complexity class as OpenCV's DFT path.
"""

from __future__ import annotations

import numpy as np

# Optional OpenCV acceleration: when cv2 is installed (real executors),
# the heavy kernels delegate to the library the reference's semantics
# are DEFINED against (cv2.matchTemplate, cv2.GaussianBlur,
# cv2.createCLAHE, cvtColor, adaptiveThreshold, dilate) — 10-100× the
# numpy path's speed, which matters at 10^12 pages. The numpy
# implementations below remain the tested semantic reference (and the
# only path exercised in this sandbox); ``set_use_cv2(False)`` forces
# numpy everywhere, e.g. to cross-check the two paths where cv2 exists.
try:  # pragma: no cover - cv2 absent in this sandbox
    import cv2 as _cv2
except ImportError:
    _cv2 = None

_USE_CV2 = _cv2 is not None


def set_use_cv2(flag: bool) -> None:
    global _USE_CV2
    _USE_CV2 = bool(flag) and _cv2 is not None

# ---------------------------------------------------------------------------
# K2a — PIL-equivalent sharpen + contrast
# ---------------------------------------------------------------------------

# PIL ImageFilter.SHARPEN: 3×3 kernel, divisor 16, offset 0
_SHARPEN_KERNEL = np.array(
    [[-2, -2, -2], [-2, 32, -2], [-2, -2, -2]], dtype=np.float64
)


def _clip_u8(a: np.ndarray) -> np.ndarray:
    return np.clip(np.rint(a), 0, 255).astype(np.uint8)


def sharpen_rgb(rgb: np.ndarray) -> np.ndarray:
    """PIL ``ImageFilter.SHARPEN`` on an HxWx3 uint8 array.

    PIL's 3×3 convolution leaves the one-pixel border unfiltered
    (copied from the source) — reproduced here. The kernel
    (-2 everywhere, 34 center... i.e. 32 center, /16) decomposes as
    34·center − 2·(3×3 box sum), so one integral image replaces nine
    shifted multiplies.
    """
    out = rgb.copy()
    if rgb.shape[0] < 3 or rgb.shape[1] < 3:
        return out
    img = rgb.astype(np.int32)
    rows = img[:-2] + img[1:-1] + img[2:]  # vertical 3-sums
    box = rows[:, :-2] + rows[:, 1:-1] + rows[:, 2:]  # 3x3 box sums at interior
    acc = 34 * img[1:-1, 1:-1] - 2 * box
    out[1:-1, 1:-1] = _clip_u8(acc.astype(np.float32) / 16.0)
    return out


def luminance_l(rgb: np.ndarray) -> np.ndarray:
    """PIL ``convert("L")``: ITU-R 601-2, fixed-point as Pillow computes it."""
    r = rgb[..., 0].astype(np.uint32)
    g = rgb[..., 1].astype(np.uint32)
    b = rgb[..., 2].astype(np.uint32)
    return ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(np.uint8)


def contrast_rgb(rgb: np.ndarray, factor: float = 1.15) -> np.ndarray:
    """PIL ``ImageEnhance.Contrast(img).enhance(factor)``: blend toward the
    solid mean-luminance gray; factor > 1 extrapolates away from it."""
    mean = int(np.mean(luminance_l(rgb)) + 0.5)
    return _clip_u8(mean + factor * (rgb.astype(np.float64) - mean))


# ---------------------------------------------------------------------------
# K2b — colorspace conversions (OpenCV-documented formulas)
# ---------------------------------------------------------------------------

_SRGB2XYZ = np.array(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ]
)
_XYZ2SRGB = np.linalg.inv(_SRGB2XYZ)
_D65 = np.array([0.950456, 1.0, 1.088754])


def _srgb_linearize(v: np.ndarray) -> np.ndarray:
    return np.where(v <= 0.04045, v / 12.92, ((v + 0.055) / 1.055) ** 2.4)


# uint8 input has 256 possible values → table-driven linearization
# (the same trick OpenCV's fixed-point Lab path uses)
_LINEARIZE_LUT = _srgb_linearize(np.arange(256) / 255.0).astype(np.float32)

# delinearization via a dense 64k-entry uint8 output table: linear
# value quantized to 1/65535 → table holds the final rounded 0..255
# level. Max quantization error ≈ slope(12.92) · (1/131070) · 255
# ≈ 0.025 gray levels — far below the rounding step.
_DELIN_STEPS = 65535
_DELIN_KNOTS = np.linspace(0.0, 1.0, _DELIN_STEPS + 1)
_DELIN_LUT8 = np.clip(
    np.rint(
        np.where(
            _DELIN_KNOTS <= 0.0031308,
            _DELIN_KNOTS * 12.92,
            1.055 * _DELIN_KNOTS ** (1 / 2.4) - 0.055,
        )
        * 255.0
    ),
    0,
    255,
).astype(np.uint8)


def _srgb_delinearize(v: np.ndarray) -> np.ndarray:
    """Float delinearization (kept for generic callers/tests)."""
    vv = np.clip(v, 0.0, 1.0)
    return np.where(vv <= 0.0031308, vv * 12.92, 1.055 * vv ** (1 / 2.4) - 0.055)


def _delinearize_to_u8(lin: np.ndarray) -> np.ndarray:
    idx = np.clip(np.rint(lin * _DELIN_STEPS), 0, _DELIN_STEPS).astype(np.int32)
    return _DELIN_LUT8[idx]


def rgb_to_lab_u8(rgb: np.ndarray) -> np.ndarray:
    """cv2 ``COLOR_RGB2LAB`` on uint8 (sRGB gamma, D65), 8-bit encoding
    L*255/100, a+128, b+128."""
    if _USE_CV2:  # pragma: no cover - sandbox lacks cv2
        return _cv2.cvtColor(np.ascontiguousarray(rgb), _cv2.COLOR_RGB2LAB)
    lin = _LINEARIZE_LUT[rgb]
    xyz = lin @ (_SRGB2XYZ.T / _D65).astype(np.float32)
    f = np.where(xyz > 0.008856, np.cbrt(xyz), 7.787 * xyz + np.float32(16.0 / 116.0))
    L = 116.0 * f[..., 1] - 16.0
    a = 500.0 * (f[..., 0] - f[..., 1]) + 128.0
    b = 200.0 * (f[..., 1] - f[..., 2]) + 128.0
    return _clip_u8(np.stack([L * 255.0 / 100.0, a, b], axis=-1))


def lab_to_rgb_u8(lab: np.ndarray) -> np.ndarray:
    """cv2 ``COLOR_LAB2RGB`` inverse of :func:`rgb_to_lab_u8`."""
    if _USE_CV2:  # pragma: no cover
        return _cv2.cvtColor(np.ascontiguousarray(lab), _cv2.COLOR_LAB2RGB)
    L = lab[..., 0].astype(np.float32) * np.float32(100.0 / 255.0)
    a = lab[..., 1].astype(np.float32) - np.float32(128.0)
    b = lab[..., 2].astype(np.float32) - np.float32(128.0)
    fy = (L + 16.0) / np.float32(116.0)
    fx = fy + a / np.float32(500.0)
    fz = fy - b / np.float32(200.0)
    f = np.stack([fx, fy, fz], axis=-1)
    f3 = f * f * f
    xyz = np.where(f3 > 0.008856, f3, (f - np.float32(16.0 / 116.0)) / np.float32(7.787))
    xyz *= _D65.astype(np.float32)
    lin = xyz @ _XYZ2SRGB.T.astype(np.float32)
    return _delinearize_to_u8(np.clip(lin, 0.0, 1.0))


def rgb_to_gray_u8(rgb: np.ndarray) -> np.ndarray:
    """cv2 ``COLOR_RGB2GRAY``: 0.299R + 0.587G + 0.114B, OpenCV's
    14-bit fixed-point rounding."""
    if _USE_CV2:  # pragma: no cover
        return _cv2.cvtColor(np.ascontiguousarray(rgb), _cv2.COLOR_RGB2GRAY)
    r = rgb[..., 0].astype(np.uint32)
    g = rgb[..., 1].astype(np.uint32)
    b = rgb[..., 2].astype(np.uint32)
    return ((r * 4899 + g * 9617 + b * 1868 + 8192) >> 14).astype(np.uint8)


def rgb_to_hsv_u8(rgb: np.ndarray) -> np.ndarray:
    """cv2 8-bit HSV (H in 0..179). The reference converts the crop
    RGB→BGR→HSV (response_extractor.py:839-840), which equals RGB→HSV
    of the original array."""
    if _USE_CV2:  # pragma: no cover
        return _cv2.cvtColor(np.ascontiguousarray(rgb), _cv2.COLOR_RGB2HSV)
    arr = rgb.astype(np.float64)
    r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
    v = arr.max(axis=-1)
    mn = arr.min(axis=-1)
    diff = v - mn
    s = np.where(v > 0, 255.0 * diff / np.where(v > 0, v, 1), 0.0)
    safe = np.where(diff > 0, diff, 1)
    h = np.where(
        diff <= 0,
        0.0,
        np.where(
            v == r,
            60.0 * (g - b) / safe,
            np.where(v == g, 120.0 + 60.0 * (b - r) / safe, 240.0 + 60.0 * (r - g) / safe),
        ),
    )
    h = np.where(h < 0, h + 360.0, h) / 2.0
    hq = np.rint(h)
    hq = np.where(hq >= 180, hq - 180, hq)  # hue is circular: 360° ≡ 0°
    return np.stack([hq.astype(np.uint8), _clip_u8(s), v.astype(np.uint8)], axis=-1)


# ---------------------------------------------------------------------------
# K2c — CLAHE (clip 2.0, tile 8×8) — OpenCV's algorithm
# ---------------------------------------------------------------------------


def clahe_u8(channel: np.ndarray, clip_limit: float = 2.0, tiles: int = 8) -> np.ndarray:
    """Contrast-limited adaptive histogram equalization, OpenCV semantics
    (reference: cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8,8)) applied
    to the LAB L channel, /root/reference/extractor.py:119-121):

    - image padded to a tile-grid multiple with BORDER_REFLECT_101
    - per-tile 256-bin histogram, clipped at
      ``max(int(clip_limit * tile_area / 256), 1)`` with the clipped mass
      redistributed (uniform batch + residual over strided bins)
    - per-tile LUT = round(cdf * 255 / tile_area)
    - output = bilinear interpolation between the four surrounding tile
      LUTs at each pixel (tile centers as knots, edges clamped)
    """
    if _USE_CV2:  # pragma: no cover
        clahe = _cv2.createCLAHE(clipLimit=clip_limit, tileGridSize=(tiles, tiles))
        return clahe.apply(np.ascontiguousarray(channel))
    h, w = channel.shape
    th = -(-h // tiles)  # ceil
    tw = -(-w // tiles)
    pad_y, pad_x = th * tiles - h, tw * tiles - w
    src = np.pad(channel, ((0, pad_y), (0, pad_x)), mode="reflect") if (pad_y or pad_x) else channel

    tile_area = th * tw
    clip = max(int(clip_limit * tile_area / 256.0), 1)

    # histograms for all tiles at once: (tiles, tiles, 256)
    tiled = src.reshape(tiles, th, tiles, tw).transpose(0, 2, 1, 3).reshape(tiles, tiles, -1)
    hist = np.zeros((tiles, tiles, 256), dtype=np.int64)
    for ty in range(tiles):
        for tx in range(tiles):
            hist[ty, tx] = np.bincount(tiled[ty, tx], minlength=256)

    clipped = np.maximum(hist - clip, 0).sum(axis=-1)  # excess mass per tile
    hist = np.minimum(hist, clip)
    batch = clipped // 256
    residual = clipped - batch * 256
    hist += batch[..., None]
    # residual: OpenCV adds 1 to bins 0, step, 2*step, ... until exhausted
    for ty in range(tiles):
        for tx in range(tiles):
            res = int(residual[ty, tx])
            if res:
                step = max(256 // res, 1)
                idx = np.arange(0, 256, step)[:res]
                hist[ty, tx, idx] += 1

    scale = 255.0 / tile_area
    luts = np.rint(np.cumsum(hist, axis=-1) * scale).clip(0, 255)  # (T,T,256)

    # bilinear interpolation between tile LUTs over the ORIGINAL extent
    ys = np.arange(h)
    xs = np.arange(w)
    tyf = ys / th - 0.5
    txf = xs / tw - 0.5
    ty1 = np.floor(tyf).astype(int)
    tx1 = np.floor(txf).astype(int)
    ya = (tyf - ty1)[:, None]
    xa = (txf - tx1)[None, :]
    ty1c = np.clip(ty1, 0, tiles - 1)[:, None]
    ty2c = np.clip(ty1 + 1, 0, tiles - 1)[:, None]
    tx1c = np.clip(tx1, 0, tiles - 1)[None, :]
    tx2c = np.clip(tx1 + 1, 0, tiles - 1)[None, :]

    v = channel[:h, :w]
    p11 = luts[ty1c, tx1c, v]
    p12 = luts[ty1c, tx2c, v]
    p21 = luts[ty2c, tx1c, v]
    p22 = luts[ty2c, tx2c, v]
    out = (p11 * (1 - xa) + p12 * xa) * (1 - ya) + (p21 * (1 - xa) + p22 * xa) * ya
    return _clip_u8(out)


# ---------------------------------------------------------------------------
# K2d — Gaussian blur + unsharp mask
# ---------------------------------------------------------------------------


def gaussian_kernel_1d(sigma: float, ksize: int = 0) -> np.ndarray:
    """cv2 ``getGaussianKernel``; ksize 0 → OpenCV's 8-bit auto size
    ``round(sigma*3*2+1) | 1``."""
    if ksize <= 0:
        ksize = int(round(sigma * 3 * 2 + 1)) | 1
    half = (ksize - 1) / 2.0
    x = np.arange(ksize) - half
    k = np.exp(-(x**2) / (2.0 * sigma * sigma))
    return k / k.sum()


def gaussian_blur_u8(gray: np.ndarray, sigma: float) -> np.ndarray:
    """cv2 ``GaussianBlur(src, (0,0), sigma)``: separable kernel,
    BORDER_REFLECT_101 (numpy 'reflect')."""
    if _USE_CV2:  # pragma: no cover
        return _cv2.GaussianBlur(np.ascontiguousarray(gray), (0, 0), sigma)
    k = gaussian_kernel_1d(sigma)
    r = len(k) // 2
    padded = np.pad(gray.astype(np.float64), r, mode="reflect")
    # horizontal then vertical pass via strided dot
    tmp = np.zeros((padded.shape[0], gray.shape[1]))
    for i, kv in enumerate(k):
        tmp += kv * padded[:, i : i + gray.shape[1]]
    out = np.zeros(gray.shape)
    for i, kv in enumerate(k):
        out += kv * tmp[i : i + gray.shape[0], :]
    return _clip_u8(out)


def add_weighted_u8(a: np.ndarray, alpha: float, b: np.ndarray, beta: float, gamma: float = 0.0) -> np.ndarray:
    """cv2 ``addWeighted`` with uint8 saturation."""
    return _clip_u8(a.astype(np.float64) * alpha + b.astype(np.float64) * beta + gamma)


def unsharp_gray(gray: np.ndarray, radius: float = 1.2, amount: float = 1.3) -> np.ndarray:
    """The reference's manual unsharp mask (extractor.py:130-136):
    ``addWeighted(gray, amount, GaussianBlur(gray, (0,0), radius), 1-amount, 0)``."""
    blur = gaussian_blur_u8(gray, radius)
    return add_weighted_u8(gray, amount, blur, 1.0 - amount)


def preprocess_page(rgb: np.ndarray, clahe: bool = True) -> np.ndarray:
    """K2 — the full preprocess chain (extractor.py:108-137):
    SHARPEN → Contrast(1.15) → CLAHE(2.0, 8×8) on LAB-L → unsharp
    grayscale re-expanded to RGB (the reference's final step collapses
    the page to enhanced grayscale replicated across channels)."""
    img = sharpen_rgb(rgb)
    img = contrast_rgb(img, 1.15)
    if clahe:
        lab = rgb_to_lab_u8(img)
        lab[..., 0] = clahe_u8(lab[..., 0], 2.0, 8)
        img = lab_to_rgb_u8(lab)
    sharp = unsharp_gray(rgb_to_gray_u8(img), 1.2, 1.3)
    return np.repeat(sharp[..., None], 3, axis=-1)


# ---------------------------------------------------------------------------
# K3 — template match (cv2.TM_CCOEFF_NORMED)
# ---------------------------------------------------------------------------


def _xcorr_valid(img: np.ndarray, tmpl: np.ndarray) -> np.ndarray:
    """Valid-mode cross-correlation via FFT (no scipy)."""
    H, W = img.shape
    h, w = tmpl.shape
    F = np.fft.rfft2(img)
    T = np.fft.rfft2(tmpl, s=(H, W))
    corr = np.fft.irfft2(F * np.conj(T), s=(H, W))
    return corr[: H - h + 1, : W - w + 1]


def match_template_ccoeff_normed(gray: np.ndarray, tmpl: np.ndarray) -> np.ndarray:
    """cv2 ``matchTemplate(..., TM_CCOEFF_NORMED)``:

    R(x,y) = Σ T'·I' / sqrt(Σ T'² · Σ I'²) with both sides mean-centered
    per window. Window statistics via integral images; numerator via one
    FFT cross-correlation with the centered template. Degenerate-window
    handling mirrors OpenCV's crossCorr epilogue (flat window → 0, near-
    saturated ratio → ±1).
    """
    if _USE_CV2:  # pragma: no cover
        return _cv2.matchTemplate(
            np.ascontiguousarray(gray), np.ascontiguousarray(tmpl),
            _cv2.TM_CCOEFF_NORMED,
        )
    img = gray.astype(np.float64)
    t = tmpl.astype(np.float64)
    h, w = t.shape
    n = h * w
    t_c = t - t.mean()
    t_norm2 = float((t_c**2).sum())

    num = _xcorr_valid(img, t_c)

    ii = np.pad(img, ((1, 0), (1, 0))).cumsum(0).cumsum(1)
    ii2 = np.pad(img**2, ((1, 0), (1, 0))).cumsum(0).cumsum(1)
    H, W = img.shape
    ys = np.arange(H - h + 1)
    xs = np.arange(W - w + 1)
    win_sum = ii[ys[:, None] + h, xs[None, :] + w] - ii[ys[:, None], xs[None, :] + w] \
        - ii[ys[:, None] + h, xs[None, :]] + ii[ys[:, None], xs[None, :]]
    win_sum2 = ii2[ys[:, None] + h, xs[None, :] + w] - ii2[ys[:, None], xs[None, :] + w] \
        - ii2[ys[:, None] + h, xs[None, :]] + ii2[ys[:, None], xs[None, :]]

    var = np.maximum(win_sum2 - win_sum**2 / n, 0.0)
    denom = np.sqrt(var * t_norm2)

    out = np.zeros_like(num)
    ok = denom > np.finfo(np.float64).eps * n
    np.divide(num, denom, out=out, where=ok)
    # OpenCV clamps |num| slightly above denom to ±1, beyond that to 0
    absn = np.abs(num)
    near = ok & (absn >= denom) & (absn < denom * 1.125)
    out[near] = np.sign(num[near])
    out[ok & (absn >= denom * 1.125)] = 0.0
    out[~ok] = 0.0
    return out.astype(np.float32)


def match_template_boxes(gray: np.ndarray, tmpl: np.ndarray, status: str,
                         threshold: float = 0.6) -> list[dict]:
    """K3 emission (extractor.py:139-153): every location with
    R ≥ threshold, raster order (``np.where`` row-major), score rounded
    to 2 decimals; box size = template size."""
    res = match_template_ccoeff_normed(gray, tmpl)
    ys, xs = np.where(res >= threshold)
    h, w = tmpl.shape
    return [
        {"x": int(x), "y": int(y), "w": int(w), "h": int(h),
         "status": status, "score": round(float(res[y, x]), 2)}
        for y, x in zip(ys.tolist(), xs.tolist())
    ]


# ---------------------------------------------------------------------------
# K6 — highlight-recovery image pipeline (response_extractor.py:822-869)
# ---------------------------------------------------------------------------

HSV_YELLOW_LO = (18, 60, 140)
HSV_YELLOW_HI = (40, 255, 255)


def in_range_u8(img: np.ndarray, lo: tuple, hi: tuple) -> np.ndarray:
    """cv2 ``inRange``: 255 where every channel within [lo, hi]."""
    m = np.ones(img.shape[:2], dtype=bool)
    for c in range(img.shape[-1]):
        m &= (img[..., c] >= lo[c]) & (img[..., c] <= hi[c])
    return np.where(m, 255, 0).astype(np.uint8)


def box_mean_u8(gray: np.ndarray, block: int) -> np.ndarray:
    """cv2 normalized ``boxFilter`` with BORDER_REPLICATE (the blur
    adaptiveThreshold uses)."""
    r = block // 2
    padded = np.pad(gray.astype(np.float64), r, mode="edge")
    ii = np.pad(padded, ((1, 0), (1, 0))).cumsum(0).cumsum(1)
    H, W = gray.shape
    ys = np.arange(H)
    xs = np.arange(W)
    s = ii[ys[:, None] + block, xs[None, :] + block] - ii[ys[:, None], xs[None, :] + block] \
        - ii[ys[:, None] + block, xs[None, :]] + ii[ys[:, None], xs[None, :]]
    return s / (block * block)


def adaptive_threshold_mean(gray: np.ndarray, max_value: int = 255,
                            block: int = 21, c: float = 9.0) -> np.ndarray:
    """cv2 ``adaptiveThreshold(ADAPTIVE_THRESH_MEAN_C, THRESH_BINARY)``:
    dst = maxval where src > round(local_mean) − ceil(C)."""
    if _USE_CV2:  # pragma: no cover
        return _cv2.adaptiveThreshold(
            np.ascontiguousarray(gray), max_value, _cv2.ADAPTIVE_THRESH_MEAN_C,
            _cv2.THRESH_BINARY, block, c,
        )
    mean = np.rint(box_mean_u8(gray, block))
    return np.where(gray.astype(np.int32) > mean - int(np.ceil(c)), max_value, 0).astype(np.uint8)


def dilate_u8(img: np.ndarray, ksize: int = 2, iterations: int = 1) -> np.ndarray:
    """cv2 ``dilate`` with a ksize×ksize ones kernel, default anchor
    (ksize//2): max over the kernel footprint, out-of-bounds ignored."""
    if _USE_CV2:  # pragma: no cover
        kernel = np.ones((ksize, ksize), np.uint8)
        return _cv2.dilate(np.ascontiguousarray(img), kernel, iterations=iterations)
    out = img
    anchor = ksize // 2
    for _ in range(iterations):
        H, W = out.shape
        acc = np.zeros_like(out)
        for dy in range(ksize):
            for dx in range(ksize):
                oy = dy - anchor
                ox = dx - anchor
                ys0, ys1 = max(0, -oy), min(H, H - oy)
                xs0, xs1 = max(0, -ox), min(W, W - ox)
                acc[ys0:ys1, xs0:xs1] = np.maximum(
                    acc[ys0:ys1, xs0:xs1], out[ys0 + oy : ys1 + oy, xs0 + ox : xs1 + ox]
                )
        out = acc
    return out


def highlight_preprocess(rgb_page: np.ndarray, box: dict,
                         pad_x: int = 15, pad_y: int = 12) -> np.ndarray:
    """K6, pure-image stage (response_extractor.py:830-851): pad+crop the
    answer window, mask broad-yellow pixels to white, grayscale,
    adaptive-threshold, 2×2 dilate. Returns the binarized crop ready for
    whitelist OCR; empty (0,0) array when the padded box has no area.

    Crop semantics mirror the reference exactly: left/top are clamped
    to 0 (``max(0, ..)`` at response_extractor.py:835-836) but
    right/bottom are NOT — ``PIL.Image.crop`` zero-pads beyond the
    page edge, so an answer box near the right/bottom edge feeds a
    black-padded crop to the threshold stage rather than a truncated
    one (round-2 ADVICE: the earlier clamp diverged here)."""
    xs = max(0, int(box["x_start"]) - pad_x)
    ys = max(0, int(box["y_start"]) - pad_y)
    xe = int(box["x_end"]) + pad_x
    ye = int(box["y_end"]) + pad_y
    if xe <= xs or ye <= ys:
        return np.zeros((0, 0), dtype=np.uint8)
    crop = np.zeros((ye - ys, xe - xs, 3), dtype=rgb_page.dtype)
    in_ye = min(rgb_page.shape[0], ye)
    in_xe = min(rgb_page.shape[1], xe)
    if in_ye > ys and in_xe > xs:
        crop[: in_ye - ys, : in_xe - xs] = rgb_page[ys:in_ye, xs:in_xe]
    hsv = rgb_to_hsv_u8(crop)
    mask = in_range_u8(hsv, HSV_YELLOW_LO, HSV_YELLOW_HI)
    crop[mask > 0] = (255, 255, 255)
    gray = rgb_to_gray_u8(crop)
    thr = adaptive_threshold_mean(gray, 255, 21, 9)
    return dilate_u8(thr, 2, 1)


def normalize_yesno(txt: str) -> str:
    """K6 OCR-noise normalization (response_extractor.py:856-866)."""
    txt = txt.replace("\n", " ").strip()
    low = txt.lower()
    if low.startswith("yes"):
        return "Yes"
    if low.startswith("no"):
        return "No"
    if txt in {"Y", "y"}:
        return "Yes"
    if txt in {"N", "n"}:
        return "No"
    return ""


# ---------------------------------------------------------------------------
# K1 / K4 — the import-gated external calls
# ---------------------------------------------------------------------------


def rasterize_pdf_page(data: bytes, page_index: int, dpi: int = 300) -> np.ndarray:
    """K1, single page — render ONLY page ``page_index`` of the PDF.
    The paged pipeline references multi-page files one span per page
    (``#page=N`` fragments); rendering just the requested page keeps
    per-task memory at one page instead of a whole 500-page document."""
    try:
        import pypdfium2 as pdfium
    except ImportError as e:  # pragma: no cover - lib absent in sandbox
        raise NotImplementedError(
            "pypdfium2 is required for native PDF rasterization"
        ) from e
    doc = pdfium.PdfDocument(data)
    bitmap = doc[page_index].render(scale=float(dpi) / 72.0)
    return _bitmap_to_rgb(bitmap)


def _bitmap_to_rgb(bitmap) -> np.ndarray:
    arr = bitmap.to_numpy()
    if arr.ndim == 2:  # FPDFBitmap_Gray
        return np.ascontiguousarray(np.repeat(arr[..., None], 3, axis=-1))
    if arr.shape[-1] == 4:
        arr = arr[..., :3]  # drop alpha FIRST (BGRA → BGR)
    # pdfium channel orders 2=BGR, 3=BGRx, 4=BGRA are all blue-first
    # after the alpha drop → reverse to RGB
    if bitmap.format in (2, 3, 4):
        arr = arr[..., ::-1]
    return np.ascontiguousarray(arr)


def rasterize_pdf_bytes(data: bytes, dpi: int = 300) -> list[np.ndarray]:
    """K1 — PDF bytes → list of HxWx3 uint8 page arrays at ``dpi``
    (reference: pypdfium2 at scale dpi/72, extractor.py:960-976)."""
    try:
        import pypdfium2 as pdfium
    except ImportError as e:  # pragma: no cover - lib absent in sandbox
        raise NotImplementedError(
            "pypdfium2 is required for native PDF rasterization"
        ) from e
    doc = pdfium.PdfDocument(data)
    scale = float(dpi) / 72.0
    return [_bitmap_to_rgb(doc[i].render(scale=scale)) for i in range(len(doc))]


def tesseract_image_to_data(img: np.ndarray, psm: int = 6, lang: str | None = None,
                            config: str = "") -> list[dict]:
    """K4 — OCR an image array into token rows in the engine's
    TOKEN_STRUCT shape (reference: pytesseract.image_to_data
    Output.DICT, PSM 6 — extractor.py:987-989, constants.py:59).
    ``tok_seq`` is the raw Tesseract emission index (the reference
    consumes the parallel arrays positionally, extractor.py:289-301)."""
    try:
        from PIL import Image
        import pytesseract
    except ImportError as e:  # pragma: no cover - lib absent in sandbox
        raise NotImplementedError("pytesseract/PIL are required for native OCR") from e
    cfg = f"--psm {psm}" + (f" -l {lang}" if lang else "") + (f" {config}" if config else "")
    pil = Image.fromarray(img if img.ndim == 3 else np.repeat(img[..., None], 3, axis=-1))
    d = pytesseract.image_to_data(pil, config=cfg, output_type=pytesseract.Output.DICT)
    return [
        {
            "tok_seq": i,
            "text": d["text"][i],
            "x": int(d["left"][i]),
            "y": int(d["top"][i]),
            "w": int(d["width"][i]),
            "h": int(d["height"][i]),
            "block": int(d["block_num"][i]),
            "par": int(d["par_num"][i]),
            "line": int(d["line_num"][i]),
        }
        for i in range(len(d["text"]))
    ]


def tesseract_yesno(img: np.ndarray) -> str:
    """K6 OCR stage: whitelist YESNO, PSM 7
    (response_extractor.py:852-855)."""
    try:
        from PIL import Image
        import pytesseract
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("pytesseract/PIL are required for native OCR") from e
    pil = Image.fromarray(img)
    cfg = "--psm 7 -c tessedit_char_whitelist=YESNOyesno"
    return pytesseract.image_to_string(pil, config=cfg).strip()


def load_template(path: str) -> np.ndarray:
    """S4 — load a grayscale checkbox template. Accepts ``.npy`` directly
    (no image libs needed); PNG/JPEG via PIL when available."""
    if path.endswith(".npy"):
        return np.load(path)
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "PIL is required to load image templates; use a .npy template instead"
        ) from e
    return np.array(Image.open(path).convert("L"))


# ---------------------------------------------------------------------------
# Native page perception: compose K1-K4 into the decoder contract
# ---------------------------------------------------------------------------


def native_page_perception(
    rgb_page: np.ndarray,
    ticked_tmpl: np.ndarray,
    empty_tmpl: np.ndarray,
    threshold: float = 0.6,
    ocr=tesseract_image_to_data,
) -> tuple[list[dict], list[dict], np.ndarray]:
    """One page: preprocess → template match (both templates) → OCR.

    Returns (tokens, matches, preprocessed_rgb). Matches carry ``seq``
    in the reference's match-list order — all ticked hits in raster
    order, then all empty hits in raster order (match_template scans
    row-major and ticked is matched first, extractor.py:186-188);
    downstream NMS (J1) consumes them pre-deduped, exactly as the
    synthetic decoder emits them. ``ocr`` is injectable so tests can
    swap in a deterministic recognizer for the gated Tesseract call.
    """
    pre = preprocess_page(rgb_page)
    gray = rgb_to_gray_u8(pre)
    ticked = match_template_boxes(gray, ticked_tmpl, "ticked", threshold)
    empty = match_template_boxes(gray, empty_tmpl, "empty", threshold)
    matches = [dict(m, seq=i) for i, m in enumerate(ticked + empty)]
    tokens = ocr(pre)
    return tokens, matches, pre
