"""Span extraction core — pure functions shared by the Ray Data stages
(ocr_ray.stages) and the single-process oracle (ocr_ray.pipelines.oracle)
so the two implementations cannot diverge (SURVEY.md §7.3).

Flow per media page image (reference ImageProcessor.process_with_ocr,
app/ocr/processor.py:281-344, re-ordered for a streaming engine):

    preprocess (invert/denoise/GLOBAL deskew/normalize/binarize)
      -> smart_split (projection -> grid cascade)
      -> per-chunk decode ("the OCR model")
      -> merge_chunk_texts (reading order + overlap dedup)

Deviation from the reference, by design: the reference deskews globally
but runs the rest of preprocessing per chunk (processor.py:136-221).
Here the whole conditional chain runs once per page BEFORE splitting —
one pass over the pixels instead of N overlapping ones; per-chunk
re-analysis can only disagree with the global analysis on synthetic
degradations that are global anyway.
"""
from __future__ import annotations

import numpy as np

from ..config import EngineConfig
from .merge import merge_chunk_texts
from .preprocess import preprocess_image
from .split import smart_split

__all__ = [
    "unit_confidence",
    "ocr_page",
    "page_block",
    "join_units",
    "extract_span_text",
]


def unit_confidence(text: str) -> float:
    """Per-unit extraction confidence, the synth engine's stand-in for a
    model-reported score (reference OCRResult.confidence,
    app/ocr/base.py:25-34): every decoded char passed a CRC check, so
    confidence grows with the verified payload (c/(c+1), 0.0 for an
    empty/failed decode, -> 1.0 for long verified text). A real engine
    reports its own score through the same column."""
    c = len(text)
    return round(c / (c + 1.0), 6)


def ocr_page(
    img: np.ndarray, engine: EngineConfig, steps: list | None = None
) -> tuple[str, list[str], str, float]:
    """Full OCR of one page image.
    Returns (text, steps_applied, split_method, confidence). ``steps``
    lets actor callers pass their warm-loaded step chain (built once per
    actor in ``__init__``) instead of rebuilding it per page."""
    from ..synth.media import decode_bands  # deterministic "model"; see synth/__init__.py

    processed, applied, _analysis = preprocess_image(img, engine.preprocess, steps=steps)
    chunks, method, _was_split = smart_split(processed, engine.split)
    for chunk in chunks:
        chunk["text"] = "\n\n".join(decode_bands(chunk["image"]))
    text = merge_chunk_texts(chunks, engine.merge)
    return text, applied, method, unit_confidence(text)


def page_block(page_number: int, total_pages: int, text: str, engine: EngineConfig) -> str:
    """One PDF page as a marked block (reference page concat,
    app/worker/tasks.py:190-192: '=== Page {i} of {N} ===')."""
    marker = engine.stitch.page_marker.format(i=page_number, n=total_pages)
    return f"{marker}{engine.stitch.page_separator}{text}"


def join_units(texts: list[str], engine: EngineConfig) -> str:
    """Associative unit join for multi-unit spans (pdf pages / salted
    partials): plain separator join of already-marked blocks."""
    return engine.stitch.page_separator.join(texts)


def extract_span_text(
    kind: str, text: str, media_ref: str, engine: EngineConfig
) -> tuple[str, float]:
    """Extract one span's content (single-process reference semantics;
    the Ray pipeline computes the same value via its staged path).
    Returns (text, confidence); confidence is the MIN over the span's
    units (weakest link — the same associative combine the staged
    premerge/stitch path applies). Text/html spans report 1.0."""
    from ..synth import media as synth_media
    from .html import strip_boilerplate

    if kind == "text":
        return text, 1.0
    if kind == "html":
        return strip_boilerplate(text), 1.0
    if kind == "image":
        img = synth_media.render_ref(media_ref)
        out, _, _, conf = ocr_page(img, engine)
        return out, conf
    if kind == "pdf":
        params = synth_media.parse_ref(media_ref)
        n = params["pages"]
        blocks = []
        conf = 1.0
        for i in range(1, n + 1):
            img = synth_media.render_ref(media_ref, page_number=i)
            page_text, _, _, c = ocr_page(img, engine)
            conf = min(conf, c)
            blocks.append(page_block(i, n, page_text, engine))
        return join_units(blocks, engine), conf
    raise ValueError(f"unknown span kind {kind!r}")
