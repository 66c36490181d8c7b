"""Conditional preprocessing chain (reference: app/ocr/preprocessing/).

Same plug-in shape as the reference (`PreprocessingStep` with
name/should_apply/apply, preprocessing/base.py:117-194; fixed order
grayscale -> invert -> noise -> deskew -> normalize -> binarize -> scale,
pipeline.py:94-104; orchestrator records steps_applied/steps_skipped,
pipeline.py:111-170) — but as pure numpy callables usable inside
``map_batches`` and by the single-process oracle alike.

Grayscale (P1) is implicit here: the synthetic codec produces single
channel images; ``to_gray`` is provided for 3-channel inputs.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np

from ..config import PreprocessConfig
from . import analysis as _an
from .imageops import (
    adaptive_threshold,
    median3x3,
    otsu_threshold,
    resize_factor,
    rotate_expand,
)

__all__ = ["PreprocessStep", "build_steps", "preprocess_image", "to_gray"]


def to_gray(img: np.ndarray) -> np.ndarray:
    """P1 — RGB(A) -> gray (steps/grayscale.py:11-63), ITU-R 601 weights."""
    if img.ndim == 2:
        return img
    rgb = img[..., :3].astype(np.float64)
    g = rgb[..., 0] * 0.299 + rgb[..., 1] * 0.587 + rgb[..., 2] * 0.114
    return np.clip(np.rint(g), 0, 255).astype(np.uint8)


@dataclass(frozen=True)
class PreprocessStep:
    """User-extension surface, mirroring the reference step contract
    (base.py:117-194): a named (predicate, transform) pair."""

    name: str
    should_apply: Callable[[np.ndarray, dict], bool]
    apply: Callable[[np.ndarray, dict], np.ndarray]


def _invert(img: np.ndarray, _a: dict) -> np.ndarray:
    # P2 (steps/invert.py:10-28)
    return (255 - img).astype(np.uint8)


def _denoise(img: np.ndarray, _a: dict) -> np.ndarray:
    # P3 — median 3x3 stands in for fastNlMeansDenoising (steps/noise_removal.py)
    return median3x3(img)


def _deskew(img: np.ndarray, a: dict) -> np.ndarray:
    # P4 (steps/deskew.py:12-109): rotate by the correction angle onto an
    # expanded canvas, white fill. When the first estimate leaves a
    # measurable residual, re-rotate the ORIGINAL by the refined total
    # angle — never rotate twice (each interpolation pass blurs glyph
    # edges; two passes visibly corrupt fine structure).
    from .imageops import estimate_skew

    angle = a["skew_angle"]
    out = rotate_expand(img, angle, fill=255)
    for _ in range(2):
        # residuals are small by construction: search a narrow range only
        resid = estimate_skew(out, max_angle=0.9, coarse_step=0.1)
        if abs(resid) <= 0.1:
            break
        angle += resid
        out = rotate_expand(img, angle, fill=255)
    return out


def _normalize(img: np.ndarray, _a: dict) -> np.ndarray:
    # P5 (steps/normalization.py:11-50): min-max stretch to [0,255]
    mn, mx = int(img.min()), int(img.max())
    if mx <= mn:
        return img
    f = (img.astype(np.float64) - mn) * (255.0 / (mx - mn))
    return np.clip(np.rint(f), 0, 255).astype(np.uint8)


def _make_binarize(cfg: PreprocessConfig) -> Callable[[np.ndarray, dict], np.ndarray]:
    def binarize(img: np.ndarray, _a: dict) -> np.ndarray:
        # P6 (steps/binarization.py:12-86)
        if cfg.binarization == "adaptive":
            block = min(img.shape) // cfg.adaptive_block_divisor
            return adaptive_threshold(img, block=block, c=cfg.adaptive_c)
        _, b = otsu_threshold(img)
        return b

    return binarize


def _make_scale(cfg: PreprocessConfig):
    """P7 ScalingStep (steps/scaling.py:12-136): upscale to the target
    DPI by target/estimated, clamped to max_scale_factor; skip when the
    factor is < 1.1 (reference rule)."""

    def scale(img: np.ndarray, a: dict) -> np.ndarray:
        factor = min(cfg.scale_to_dpi / max(a["estimated_dpi"], 1), cfg.max_scale_factor)
        if factor < 1.1:
            return img
        return resize_factor(img, factor)

    return scale


def build_steps(cfg: PreprocessConfig) -> list[PreprocessStep]:
    """The fixed reference order (pipeline.py:94-104), minus grayscale
    (implicit); scaling participates only when cfg.scale_to_dpi > 0
    (the synthetic corpus is exact-scale, and the synth decoder's cell
    grid is scale-sensitive, so the synth engines keep it off)."""
    steps = [
        PreprocessStep(
            "invert",
            lambda img, a: cfg.auto_invert and a["is_inverted"],
            _invert,
        ),
        PreprocessStep(
            "denoise",
            lambda img, a: cfg.denoise and a["noise_level"] > cfg.denoise_threshold,
            _denoise,
        ),
        PreprocessStep(
            "deskew",
            lambda img, a: cfg.auto_deskew and abs(a["skew_angle"]) > cfg.deskew_min_angle,
            _deskew,
        ),
        PreprocessStep(
            "normalize",
            lambda img, a: cfg.normalize and a["needs_contrast"],
            _normalize,
        ),
        PreprocessStep(
            "binarize",
            lambda img, a: cfg.binarization != "none" and np.unique(img).size > 2,
            _make_binarize(cfg),
        ),
    ]
    if cfg.scale_to_dpi > 0:
        # scale runs LAST (reference order, pipeline.py:94-104)
        steps.append(
            PreprocessStep(
                "scale",
                lambda img, a: (
                    a["estimated_dpi"] < cfg.scale_to_dpi and cfg.max_scale_factor > 1.0
                ),
                _make_scale(cfg),
            )
        )
    return steps


def preprocess_image(
    img: np.ndarray,
    cfg: PreprocessConfig,
    steps: list[PreprocessStep] | None = None,
    analysis: dict | None = None,
) -> tuple[np.ndarray, list[str], dict]:
    """P9 — orchestrator (pipeline.py:111-170): analyze once, then thread
    the image through the conditional chain. Returns
    (image, steps_applied, analysis); steps_applied is the lineage that
    becomes a column in the Ray pipeline."""
    img = to_gray(img)
    if analysis is None:
        analysis = _an.analyze_image(
            img,
            noise_threshold=cfg.denoise_threshold,
            deskew_min_angle=cfg.deskew_min_angle,
            contrast_threshold=cfg.contrast_threshold,
            skip_skew=not cfg.auto_deskew,
        )
    applied: list[str] = []
    for step in steps if steps is not None else build_steps(cfg):
        if step.should_apply(img, analysis):
            img = step.apply(img, analysis)
            applied.append(step.name)
            if step.name == "invert":
                analysis = dict(analysis, is_inverted=False)
    return img, applied, analysis
