"""Per-image quality analysis (reference: app/ocr/preprocessing/analyzer.py).

Numpy re-implementations of the reference's OpenCV analyzers, same
scalar contracts (SURVEY.md §2.2 A1-A9). One image in, a flat dict of
scalar features out; the ``needs_*`` flags drive the preprocessing
``should_apply`` predicates exactly like the reference
(``ImageQualityAnalyzer.analyze``, analyzer.py:29-93).
"""
from __future__ import annotations

import numpy as np

from .imageops import estimate_skew

__all__ = ["analyze_image", "blur_score", "noise_level", "contrast", "brightness", "is_inverted", "has_text"]


def _laplacian(img: np.ndarray) -> np.ndarray:
    f = img.astype(np.float64)
    p = np.pad(f, 1, mode="edge")
    return p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:] - 4 * f


def blur_score(img: np.ndarray) -> float:
    """A1 — Laplacian variance; higher = sharper (analyzer.py:95-103).
    Computed on a 2x-subsampled view: the score feeds no predicate and
    the statistic is stable under decimation (~4x less memory traffic)."""
    return float(np.var(_laplacian(np.ascontiguousarray(img[::2, ::2]))))


def noise_level(img: np.ndarray) -> float:
    """A2 — noise estimate in [0,1] (role of analyzer.py:105-121).

    The reference's median-normalized local variance underestimates
    sparse impulse noise, so this uses a direct impulse detector:
    fraction of pixels deviating > 100 from ALL 8 neighbors (a corner of
    a solid glyph always agrees with part of its neighborhood, a
    salt&pepper impulse with none), scaled so p>=0.004 crosses the 0.1
    threshold (impulses overlapping glyphs are invisible, so the
    effective isolated fraction is ~0.7p on text pages)."""
    # 2x-subsampled view: impulse pixels stay isolated against their
    # (now 2px-distant) neighbors and the fraction estimate is unbiased;
    # 4x less memory traffic on the 8 shifted comparisons
    f = np.ascontiguousarray(img[::2, ::2]).astype(np.int16)
    p = np.pad(f, 1, mode="edge")
    h, w = f.shape
    isolated = np.ones((h, w), dtype=bool)
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            if dy == 1 and dx == 1:
                continue
            isolated &= np.abs(f - p[dy : dy + h, dx : dx + w]) > 100
    return float(min(1.0, isolated.mean() * 40.0))


def contrast(img: np.ndarray) -> float:
    """A4 — Michelson contrast (max-min)/(max+min) (analyzer.py:157-170)."""
    mx, mn = float(img.max()), float(img.min())
    if mx + mn == 0:
        return 0.0
    return (mx - mn) / (mx + mn)


def brightness(img: np.ndarray) -> float:
    """A5 — mean/255 (analyzer.py:172-178)."""
    return float(img.mean() / 255.0)


def is_inverted(img: np.ndarray) -> bool:
    """A8 — light-on-dark detector. The reference compares edge-region
    mean to overall background (analyzer.py:231-245); for page images
    the equivalent, cheaper test is a dark border: mean of the 4-px
    border < 128 means the background (and fill) is dark."""
    b = 4
    border = np.concatenate(
        [
            img[:b, :].ravel(),
            img[-b:, :].ravel(),
            img[:, :b].ravel(),
            img[:, -b:].ravel(),
        ]
    )
    return float(border.mean()) < 128.0


def has_text(img: np.ndarray) -> bool:
    """A7 — edge-density text presence (analyzer.py:216-229): fraction of
    strong-gradient pixels in (0.01, 0.5)."""
    f = img.astype(np.float64)
    gy = np.abs(np.diff(f, axis=0)).mean(axis=None)
    gx = np.abs(np.diff(f, axis=1)).mean(axis=None)
    g = np.abs(np.diff(f, axis=0))
    density = float((g > 40).mean())
    _ = gy, gx
    return 0.001 < density < 0.5


def estimate_dpi(img: np.ndarray) -> int:
    """A6 — aspect-ratio heuristic vs A4/Letter widths, clamped [72,600]
    (analyzer.py:180-214)."""
    h, w = img.shape[:2]
    long_side = max(h, w)
    # assume ~11in long side like the reference's letter heuristic
    dpi = int(round(long_side / 11.0))
    return max(72, min(600, dpi))


def analyze_image(
    img: np.ndarray,
    *,
    noise_threshold: float = 0.10,
    deskew_min_angle: float = 0.3,
    contrast_threshold: float = 0.5,
    skip_skew: bool = False,
) -> dict:
    """A9 — full analysis (analyzer.py:29-93): runs A1-A8 and derives the
    needs_* flags from thresholds. ``skew_angle`` here is the CORRECTION
    angle (see imageops.estimate_skew).

    Inversion is detected on the raw image; all other features are
    measured on the ink-normalized (un-inverted) view so one analysis
    pass serves the whole preprocessing chain.
    """
    inverted = is_inverted(img)
    work = (255 - img) if inverted else img
    noise = noise_level(work)
    skew = 0.0 if skip_skew else estimate_skew(work)
    c = contrast(work)
    return {
        "blur_score": blur_score(work),
        "noise_level": noise,
        "skew_angle": skew,
        "contrast": c,
        "brightness": brightness(work),
        "estimated_dpi": estimate_dpi(work),
        "has_text": has_text(work),
        "is_inverted": inverted,
        "needs_denoising": noise > noise_threshold,
        "needs_deskewing": abs(skew) > deskew_min_angle,
        "needs_contrast": c < contrast_threshold,
    }
