"""Numpy image primitives.

The reference implements these with OpenCV; this sandbox has no cv2, so
they are rebuilt on numpy with identical *semantics* where it matters:

- rotate_expand     ~ cv2.warpAffine with expanded bbox
                      (reference deskew math, app/ocr/preprocessing/steps/deskew.py:46-96)
- otsu_threshold    ~ cv2.threshold(..., THRESH_OTSU)
                      (steps/binarization.py:45-56)
- adaptive_threshold~ cv2.adaptiveThreshold(ADAPTIVE_THRESH_GAUSSIAN_C)
                      approximated with a box-mean via integral image
                      (steps/binarization.py:58-86: block = clamp(min(h,w)//20, 11, 101), C=11)
- median3x3         ~ cv2.medianBlur(k=3) (stand-in for fastNlMeansDenoising,
                      steps/noise_removal.py:12-53 — same role: kill salt&pepper)
- estimate_skew     ~ Canny+HoughLines median angle (analyzer.py:123-155),
                      rebuilt as the projection-profile method (Postl 1988):
                      the angle whose de-sheared horizontal projection has
                      maximal variance.

All functions take/return uint8 or bool 2-D arrays and are deterministic.
"""
from __future__ import annotations

import numpy as np

__all__ = [
    "rotate_expand",
    "otsu_threshold",
    "adaptive_threshold",
    "median3x3",
    "box_mean",
    "estimate_skew",
    "integral_image",
    "resize_factor",
]


def resize_factor(img: np.ndarray, factor: float) -> np.ndarray:
    """Scale by ``factor`` (reference ScalingStep, steps/scaling.py:12-136:
    INTER_CUBIC up / INTER_AREA down — here bilinear up / box-mean down,
    the same roles without cv2).

    Upscale: separable bilinear sampling. Downscale: integer box mean
    when the factor is close to 1/k, else bilinear."""
    if factor == 1.0:
        return img
    h, w = img.shape
    nh, nw = max(1, int(round(h * factor))), max(1, int(round(w * factor)))
    if factor < 1.0:
        k = int(round(1.0 / factor))
        if k >= 2 and abs(1.0 / k - factor) < 0.01 and h % k == 0 and w % k == 0:
            return (
                img.reshape(h // k, k, w // k, k).mean(axis=(1, 3)).round()
                .astype(np.uint8)
            )
    sy = np.clip((np.arange(nh, dtype=np.float32) + 0.5) * (h / nh) - 0.5, 0, h - 1)
    sx = np.clip((np.arange(nw, dtype=np.float32) + 0.5) * (w / nw) - 0.5, 0, w - 1)
    y0 = np.minimum(sy.astype(np.int32), h - 2)
    x0 = np.minimum(sx.astype(np.int32), w - 2)
    fy = (sy - y0)[:, None].astype(np.float32)
    fx = (sx - x0)[None, :].astype(np.float32)
    im = img.astype(np.float32)
    rows0 = im[y0]
    rows1 = im[y0 + 1]
    top = rows0[:, x0] * (1 - fx) + rows0[:, x0 + 1] * fx
    bot = rows1[:, x0] * (1 - fx) + rows1[:, x0 + 1] * fx
    out = top * (1 - fy) + bot * fy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def rotate_expand(img: np.ndarray, angle_deg: float, fill: int = 255) -> np.ndarray:
    """Rotate by ``angle_deg`` (counter-clockwise, like cv2 convention used by
    the reference deskew) onto an expanded canvas, bilinear interpolation,
    borders filled with ``fill``.

    Expanded size matches the reference formula
    (deskew.py: new_w = h*|sin| + w*|cos|, new_h = h*|cos| + w*|sin|).
    """
    if abs(angle_deg) < 1e-9:
        return img.copy()
    h, w = img.shape[:2]
    theta = np.deg2rad(angle_deg)
    c, s = np.cos(theta), np.sin(theta)
    new_w = int(np.ceil(h * abs(s) + w * abs(c)))
    new_h = int(np.ceil(h * abs(c) + w * abs(s)))
    # inverse mapping: for each output pixel, source coordinate
    cy_o, cx_o = (new_h - 1) / 2.0, (new_w - 1) / 2.0
    cy_i, cx_i = (h - 1) / 2.0, (w - 1) / 2.0
    # separable inverse mapping in float32: source coords = outer sums of
    # per-row and per-column terms (no full meshgrid materialization)
    oy = np.arange(new_h, dtype=np.float32) - np.float32(cy_o)
    ox = np.arange(new_w, dtype=np.float32) - np.float32(cx_o)
    c32, s32 = np.float32(c), np.float32(s)
    sx = (c32 * ox)[None, :] + (-s32 * oy)[:, None] + np.float32(cx_i)
    sy = (s32 * ox)[None, :] + (c32 * oy)[:, None] + np.float32(cy_i)
    x0 = np.floor(sx).astype(np.int32)
    y0 = np.floor(sy).astype(np.int32)
    fx = sx - x0
    fy = sy - y0
    valid = (sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1)
    x0c = np.clip(x0, 0, w - 2)
    y0c = np.clip(y0, 0, h - 2)
    im = img.astype(np.float32)
    # flat take beats 2-D fancy indexing ~1.7x for the 4-tap gather
    flat = im.ravel()
    base_idx = y0c * np.int32(w) + x0c
    v00 = flat.take(base_idx)
    v01 = flat.take(base_idx + 1)
    v10 = flat.take(base_idx + w)
    v11 = flat.take(base_idx + w + 1)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    out = top * (1 - fy) + bot * fy
    out = np.where(valid, out, np.float32(fill))
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def otsu_threshold(img: np.ndarray) -> tuple[int, np.ndarray]:
    """Return (threshold, binary) where binary is uint8 {0,255}; pixels
    > threshold become 255 (matches cv2 THRESH_BINARY+OTSU semantics)."""
    hist = np.bincount(img.ravel(), minlength=256).astype(np.float64)
    total = hist.sum()
    if total == 0:
        return 0, np.zeros_like(img)
    omega = np.cumsum(hist)
    mu = np.cumsum(hist * np.arange(256))
    mu_t = mu[-1]
    w0 = omega
    w1 = total - omega
    with np.errstate(divide="ignore", invalid="ignore"):
        sigma_b = np.where(
            (w0 > 0) & (w1 > 0),
            (mu_t * w0 - mu) ** 2 / (w0 * w1),
            0.0,
        )
    t = int(np.argmax(sigma_b))
    return t, np.where(img > t, 255, 0).astype(np.uint8)


def integral_image(img: np.ndarray) -> np.ndarray:
    ii = np.zeros((img.shape[0] + 1, img.shape[1] + 1), dtype=np.float64)
    np.cumsum(np.cumsum(img, axis=0), axis=1, out=ii[1:, 1:])
    return ii


def box_mean(img: np.ndarray, k: int) -> np.ndarray:
    """Local mean over a k x k window (edge-clamped), float64 output."""
    if k % 2 == 0:
        k += 1
    r = k // 2
    padded = np.pad(img.astype(np.float64), r, mode="edge")
    ii = integral_image(padded)
    h, w = img.shape
    ys = np.arange(h)
    xs = np.arange(w)
    y0, y1 = ys[:, None], ys[:, None] + k
    x0, x1 = xs[None, :], xs[None, :] + k
    s = ii[y1, x1] - ii[y0, x1] - ii[y1, x0] + ii[y0, x0]
    return s / (k * k)


def adaptive_threshold(img: np.ndarray, block: int = 0, c: int = 11) -> np.ndarray:
    """Adaptive mean threshold: pixel > local_mean - c -> 255 else 0.

    ``block`` defaults to the reference rule clamp(min(h,w)//20, 11, 101)
    forced odd (steps/binarization.py:69-76)."""
    h, w = img.shape
    if block <= 0:
        block = min(h, w) // 20
    block = max(11, min(101, block))
    if block % 2 == 0:
        block += 1
    local = box_mean(img, block)
    return np.where(img.astype(np.float64) > local - c, 255, 0).astype(np.uint8)


def median3x3(img: np.ndarray) -> np.ndarray:
    """3x3 median filter (edge-clamped) — median-of-9 selection network
    (19 elementwise min/max pairs) instead of a full sort per pixel."""
    pad = np.pad(img, 1, mode="edge")
    h, w = img.shape
    p = [pad[dy : dy + h, dx : dx + w] for dy in (0, 1, 2) for dx in (0, 1, 2)]

    def srt(i: int, j: int) -> None:
        lo = np.minimum(p[i], p[j])
        p[j] = np.maximum(p[i], p[j])
        p[i] = lo

    for i, j in (
        (1, 2), (4, 5), (7, 8), (0, 1), (3, 4), (6, 7), (1, 2), (4, 5),
        (7, 8), (0, 3), (5, 8), (4, 7), (3, 6), (1, 4), (2, 5), (4, 7),
        (4, 2), (6, 4), (4, 2),
    ):
        srt(i, j)
    return np.ascontiguousarray(p[4])


def _projection_sharpness(ys: np.ndarray, xs: np.ndarray, tan_t: float, nbins: int) -> float:
    # variance of the binned horizontal projection: maximal when rows of
    # ink align. (Gradient energy is sharper on line art but rewards the
    # high-frequency fluctuation of smeared dense patterns; variance is
    # robust across both. 1-px bins: finer sub-binning interacts badly
    # with integer pixel coordinates at t=0.) E[c^2]-E[c]^2 via dot —
    # E[c] is the constant npoints/nbins, so one pass suffices.
    # (An all-angles (A, N) shear-matrix variant was benchmarked 2x
    # SLOWER — memory-bandwidth bound vs this cache-resident scan — and
    # the component costs here are ufunc-dispatch + bincount, already
    # near C-optimal. The scan is the synthetic engine's "model
    # inference"; it is the useful compute, not overhead.)
    proj = ys - xs * tan_t
    bins = np.clip(np.rint(proj).astype(np.int64), 0, nbins - 1)
    counts = np.bincount(bins, minlength=nbins).astype(np.float64)
    mean = ys.size / nbins
    return float(counts @ counts / nbins - mean * mean)


def estimate_skew(
    img: np.ndarray,
    max_angle: float = 6.0,
    coarse_step: float = 0.5,
    fine_step: float = 0.02,
    ink_threshold: int = 128,
    max_points: int = 25_000,
) -> float:
    """Estimate page skew; returns the CORRECTION angle in degrees, i.e.
    ``rotate_expand(img, estimate_skew(img))`` straightens the page.

    Projection-profile method (Postl 1988): choose the de-shear angle
    maximizing gradient energy of the horizontal ink projection; coarse
    scan then local refine. Plays the role of the reference's
    Canny+Hough median-angle detector (analyzer.py:123-155) with the
    same contract (degrees in (-max_angle, max_angle), 0.0 = no signal).
    """
    dark = img < ink_threshold
    ys, xs = np.nonzero(dark)
    if ys.size < 50:
        return 0.0
    if ys.size > max_points:
        sel = np.linspace(0, ys.size - 1, max_points).astype(np.int64)
        ys, xs = ys[sel], xs[sel]
    ys = ys.astype(np.float64)
    xs = xs.astype(np.float64)
    # pad so projections stay in [0, nbins) for BOTH shear directions —
    # clamping would pile mass into an edge bin and fake a variance peak
    pad = img.shape[1] * np.tan(np.deg2rad(max_angle))
    nbins = img.shape[0] + 2 * int(np.ceil(pad)) + 2
    ys = ys + pad

    def best_in(angles: np.ndarray) -> float:
        # per-angle loop on purpose: an (angles, points) shear matrix is
        # memory-bandwidth bound and measured 2x SLOWER than the
        # cache-resident one-angle-at-a-time scan
        scores = [
            _projection_sharpness(ys, xs, np.tan(np.deg2rad(a)), nbins) for a in angles
        ]
        return float(angles[int(np.argmax(scores))])

    # 3-stage coarse-to-fine: ~40 evaluations instead of a dense scan
    a0 = best_in(np.arange(-max_angle, max_angle + coarse_step / 2, coarse_step))
    mid_step = 0.1
    a1 = best_in(np.arange(a0 - coarse_step, a0 + coarse_step + mid_step / 2, mid_step))
    a2 = best_in(np.arange(a1 - mid_step, a1 + mid_step + fine_step / 2, fine_step))
    return float(np.round(a2, 3))
