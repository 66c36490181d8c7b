"""The reference oracle: a small, pure-Python, single-process extractor
with exactly the per-document semantics of SURVEY.md §2 (the graft's
judged ground truth, SURVEY.md §5.1).

The Ray pipeline (pipelines/extraction.py) must produce span-sequence
equality (kind, text, media_ref, order) against this oracle per doc_id.
Both share the pure modules in ocr_ray.functions, so agreement checks
the *orchestration* (explode / route / fan-out / salted stitch), not
two copies of the math.
"""
from __future__ import annotations

from collections.abc import Iterable

from ..config import EngineConfig, get_engine
from ..functions.extract import extract_span_text

__all__ = ["extract_doc", "extract_corpus"]


def extract_doc(doc: dict, engine: EngineConfig) -> dict:
    """Extract one document row {doc_id, spans:[{kind,text,media_ref,offset}]}.
    Output spans are in offset order with extracted content in ``text``;
    ``confidence`` is the doc-level min over span confidences (same
    weakest-link combine as the staged premerge/stitch path)."""
    out_spans = []
    conf = 1.0
    for span in sorted(doc["spans"], key=lambda s: s["offset"]):
        text, c = extract_span_text(
            span["kind"], span["text"], span["media_ref"], engine
        )
        conf = min(conf, c)
        out_spans.append(
            {
                "kind": span["kind"],
                "text": text,
                "media_ref": span["media_ref"],
                "offset": span["offset"],
            }
        )
    return {"doc_id": doc["doc_id"], "spans": out_spans, "confidence": conf}


def extract_corpus(docs: Iterable[dict], engine_name: str = "synth") -> list[dict]:
    engine = get_engine(engine_name)
    return [extract_doc(d, engine) for d in docs]
