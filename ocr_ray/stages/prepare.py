"""Stage 1: explode docs to span-unit rows + cheap extraction + pdf fan-out.

One stateless ``map_batches`` (pyarrow in/out, zero-copy from the
object store) that:

- explodes ``spans`` lists to rows (F7, the inverse of the final
  stitch) using vectorized Arrow kernels (list_flatten /
  list_parent_indices) — no Python loop for the common path;
- extracts text spans (identity) and html spans (boilerplate strip)
  immediately — they never pay the OCR actor pool;
- fans a pdf span out to one row PER PAGE (S4/F6,
  app/services/pdf_service.py:61-164): page granularity is what keeps
  a 80-page doc from serializing on one worker (the reference's only
  skew handling was a page-scaled timeout, ocr.py:271);
- emits the uniform unit-row schema all later stages share:

    doc_id:string, offset:int32, kind:string, media_ref:string,
    unit:int32, total_units:int32, text:string, done:bool

  ``unit`` = page_number for pdf pages, 0 otherwise. ``done`` marks
  rows whose ``text`` is already extracted.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.html import strip_boilerplate
from ..synth.media import parse_ref

UNIT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("offset", pa.int32()),
        ("kind", pa.string()),
        ("media_ref", pa.string()),
        ("unit", pa.int32()),
        ("total_units", pa.int32()),
        ("salt", pa.int32()),
        ("text", pa.string()),
        ("done", pa.bool_()),
    ]
)


def explode_docs(batch: pa.Table, passthrough: list[str] | None = None) -> pa.Table:
    """docs(doc_id, spans) -> span rows (doc_id, kind, text, media_ref, offset).

    ``passthrough`` names extra DOC-level columns of the input batch to
    repeat onto each span row (vectorized take by parent index) — e.g.
    the checkpoint partition id."""
    spans = batch.column("spans").combine_chunks()
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    parent = pc.list_parent_indices(spans)
    flat = pc.list_flatten(spans)
    doc_ids = pc.take(batch.column("doc_id"), parent)
    cols = {
        "doc_id": doc_ids,
        "kind": flat.field("kind"),
        "text": flat.field("text"),
        "media_ref": flat.field("media_ref"),
        "offset": flat.field("offset"),
    }
    for name in passthrough or ():
        cols[name] = pc.take(batch.column(name), parent)
    return pa.table(cols)


def prepare_batch(
    batch: pa.Table, salt_width: int = 0, passthrough: list[str] | None = None
) -> pa.Table:
    """Full stage-1 transform: explode + cheap extract + pdf fan-out.

    Arrow-native on the hot path: doc_id/offset/media_ref columns never
    round-trip through Python — only the html subset's text drops to
    Python for the (inherently per-string) boilerplate regexes, spliced
    back via ``replace_with_mask``; the pdf page fan-out is a vectorized
    repeat/take.

    ``salt_width`` > 0 assigns each pdf page row a salt
    ``(page-1) // salt_width`` (0 for single-unit rows) so the salted
    premerge groupby needs no extra add_column operator downstream.

    ``passthrough`` doc-level columns ride along on every unit row
    (and survive the OCR/premerge/stitch stages unchanged)."""
    passthrough = list(passthrough or ())
    rows = explode_docs(batch, passthrough=passthrough)
    out_schema = UNIT_SCHEMA
    for name in passthrough:
        out_schema = out_schema.append(rows.schema.field(name))
    kind = rows.column("kind")
    is_pdf = pc.equal(kind, "pdf")
    parts: list[pa.Table] = []

    non_pdf = rows.filter(pc.invert(is_pdf))
    n = non_pdf.num_rows
    if n:
        kinds = non_pdf.column("kind").combine_chunks()
        texts = non_pdf.column("text").combine_chunks()
        if isinstance(kinds, pa.ChunkedArray):
            kinds = kinds.combine_chunks()
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        is_html = pc.equal(kinds, "html")
        is_image = pc.equal(kinds, "image")
        new_text = texts
        html_np = np.asarray(is_html.to_numpy(zero_copy_only=False))
        if html_np.any():
            # per-string regex work only for the html subset
            stripped = [
                strip_boilerplate(t)
                for t in texts.filter(is_html).to_pylist()
            ]
            new_text = pc.replace_with_mask(
                new_text, is_html, pa.array(stripped, pa.string())
            )
        n_img = int(pc.sum(is_image).as_py() or 0)
        if n_img:
            new_text = pc.replace_with_mask(
                new_text, is_image, pa.array([""] * n_img, pa.string())
            )
        cols = {
            "doc_id": non_pdf.column("doc_id"),
            "offset": pc.cast(non_pdf.column("offset"), pa.int32()),
            "kind": kinds,
            "media_ref": non_pdf.column("media_ref"),
            "unit": pa.array(np.zeros(n, np.int32)),
            "total_units": pa.array(np.ones(n, np.int32)),
            "salt": pa.array(np.zeros(n, np.int32)),
            "text": new_text,
            "done": pc.invert(is_image),
        }
        for name in passthrough:
            cols[name] = non_pdf.column(name)
        parts.append(pa.table(cols, schema=out_schema))

    pdfs = rows.filter(is_pdf)
    if pdfs.num_rows:
        pages = np.array(
            [parse_ref(r)["pages"] for r in pdfs.column("media_ref").to_pylist()],
            dtype=np.int64,
        )
        parent = np.repeat(np.arange(pdfs.num_rows), pages)
        total = int(pages.sum())
        starts = np.repeat(np.cumsum(pages) - pages, pages)
        unit = (np.arange(total) - starts + 1).astype(np.int32)  # 1..pages per pdf
        idx = pa.array(parent)
        cols = {
            "doc_id": pc.take(pdfs.column("doc_id"), idx),
            "offset": pc.cast(pc.take(pdfs.column("offset"), idx), pa.int32()),
            "kind": pc.take(pdfs.column("kind"), idx),
            "media_ref": pc.take(pdfs.column("media_ref"), idx),
            "unit": pa.array(unit),
            "total_units": pa.array(np.repeat(pages, pages).astype(np.int32)),
            "salt": pa.array(
                ((unit - 1) // salt_width).astype(np.int32)
                if salt_width > 0
                else np.zeros(total, np.int32)
            ),
            "text": pa.array([""] * total, pa.string()),
            "done": pa.array(np.zeros(total, dtype=bool)),
        }
        for name in passthrough:
            cols[name] = pc.take(pdfs.column(name), idx)
        parts.append(pa.table(cols, schema=out_schema))

    if not parts:
        return out_schema.empty_table()
    return pa.concat_tables(parts) if len(parts) > 1 else parts[0]
