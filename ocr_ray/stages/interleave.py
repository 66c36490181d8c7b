"""Adapter: flat documents table (testdata `documents` schema:
doc_id:int64, text, lang, source, n_chars) -> interleaved span docs.

Lets the driver-provided tables feed the flagship pipeline: every row
becomes a doc whose span 0 is its real text; deterministic subsets get
an extra synthetic html / image / pdf span so every kind path runs.

Arrow-native: the common case (one text span per doc) is pure numpy /
Arrow array assembly — only the sparse html/image/pdf subsets touch
Python (wrapper f-string, base64 ref builders), and the output
list<struct> column is built from flattened arrays + offsets rather
than per-row dicts.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..synth import media
from ..synth.corpus import DOC_SCHEMA, SPAN_STRUCT


def docs_to_interleaved(
    batch: pa.Table,
    image_every: int = 10,
    pdf_every: int = 25,
    html_every: int = 7,
) -> pa.Table:
    doc_ids = np.asarray(batch.column("doc_id").to_numpy(zero_copy_only=False),
                         dtype=np.int64)
    n = doc_ids.size
    texts = batch.column("text").to_pylist()

    has_html = (doc_ids % html_every == 0) if html_every else np.zeros(n, bool)
    has_img = (doc_ids % image_every == 0) if image_every else np.zeros(n, bool)
    has_pdf = (doc_ids % pdf_every == 0) if pdf_every else np.zeros(n, bool)
    counts = 1 + has_html.astype(np.int64) + has_img + has_pdf
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    starts = offsets[:-1]
    total = int(offsets[-1])

    kind_flat = np.empty(total, dtype=object)
    text_flat = np.empty(total, dtype=object)
    ref_flat = np.empty(total, dtype=object)
    off_flat = np.zeros(total, dtype=np.int32)
    ref_flat[:] = ""

    # span 0: the real text, every doc
    kind_flat[starts] = "text"
    text_flat[starts] = np.array(texts, dtype=object)

    # unicode width sized from the data: astype("U8") would silently
    # TRUNCATE ids over 8 digits (zfill only pads, never shrinks back)
    id_width = max(8, len(str(int(doc_ids.max())))) if n else 8
    dids = np.char.add("tdoc-", np.char.zfill(doc_ids.astype(f"U{id_width}"), 8))

    pos = starts[has_html] + 1
    kind_flat[pos] = "html"
    text_flat[pos] = np.array(
        [
            f"<html><body><nav><a href='/'>home</a></nav><p>{t[:120]}</p>"
            f"<footer>f</footer></body></html>"
            for t in (texts[i] for i in np.flatnonzero(has_html))
        ],
        dtype=object,
    )
    off_flat[pos] = 1

    img_off = 1 + has_html[has_img].astype(np.int32)
    pos = starts[has_img] + img_off
    kind_flat[pos] = "image"
    text_flat[pos] = ""
    img_idx = np.flatnonzero(has_img)
    ref_flat[pos] = np.array(
        [
            media.build_image_ref(
                dids[i], int(img_off[j]), texts[i][:160],
                skew=float((doc_ids[i] % 5) - 2), invert=doc_ids[i] % 3 == 0,
                noise=0.01 if doc_ids[i] % 4 == 0 else 0.0, seed=int(doc_ids[i]),
            )
            for j, i in enumerate(img_idx)
        ],
        dtype=object,
    )
    off_flat[pos] = img_off

    pdf_off = (1 + has_html[has_pdf] + has_img[has_pdf]).astype(np.int32)
    pos = starts[has_pdf] + pdf_off
    kind_flat[pos] = "pdf"
    text_flat[pos] = ""
    pdf_idx = np.flatnonzero(has_pdf)
    ref_flat[pos] = np.array(
        [
            media.build_pdf_ref(
                dids[i], int(pdf_off[j]), pages=1 + int(doc_ids[i]) % 3,
                seed=int(doc_ids[i]), skew=1.5, noise=0.005,
                title=f"Synthetic PDF {dids[i]}",
            )
            for j, i in enumerate(pdf_idx)
        ],
        dtype=object,
    )
    off_flat[pos] = pdf_off

    struct = pa.StructArray.from_arrays(
        [
            pa.array(kind_flat, pa.string()),
            pa.array(text_flat, pa.string()),
            pa.array(ref_flat, pa.string()),
            pa.array(off_flat, pa.int32()),
        ],
        fields=list(SPAN_STRUCT),
    )
    spans = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), struct)
    return pa.table({"doc_id": pa.array(dids, pa.string()), "spans": spans},
                    schema=DOC_SCHEMA)
