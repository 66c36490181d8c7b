"""Adapter: flat documents table (testdata `documents` schema:
doc_id:int64, text, lang, source, n_chars) -> interleaved span docs.

Lets the driver-provided tables feed the flagship pipeline: every row
becomes a doc whose span 0 is its real text; deterministic subsets get
an extra synthetic html / image / pdf span so every kind path runs.
"""
from __future__ import annotations

import pyarrow as pa

from ..synth import media
from ..synth.corpus import DOC_SCHEMA


def docs_to_interleaved(
    batch: pa.Table,
    image_every: int = 10,
    pdf_every: int = 25,
    html_every: int = 7,
) -> pa.Table:
    rows = []
    for doc_id, text in zip(
        batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
    ):
        did = f"tdoc-{doc_id:08d}"
        spans = [{"kind": "text", "text": text, "media_ref": "", "offset": 0}]
        if html_every and doc_id % html_every == 0:
            html = f"<html><body><nav><a href='/'>home</a></nav><p>{text[:120]}</p><footer>f</footer></body></html>"
            spans.append({"kind": "html", "text": html, "media_ref": "", "offset": len(spans)})
        if image_every and doc_id % image_every == 0:
            ref = media.build_image_ref(
                did, len(spans), text[:160],
                skew=float((doc_id % 5) - 2), invert=doc_id % 3 == 0,
                noise=0.01 if doc_id % 4 == 0 else 0.0, seed=int(doc_id),
            )
            spans.append({"kind": "image", "text": "", "media_ref": ref, "offset": len(spans)})
        if pdf_every and doc_id % pdf_every == 0:
            ref = media.build_pdf_ref(
                did, len(spans), pages=1 + int(doc_id) % 3, seed=int(doc_id),
                skew=1.5, noise=0.005,
            )
            spans.append({"kind": "pdf", "text": "", "media_ref": ref, "offset": len(spans)})
        rows.append({"doc_id": did, "spans": spans})
    return pa.Table.from_pylist(rows, schema=DOC_SCHEMA)
