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


def explode_docs(batch: pa.Table) -> pa.Table:
    """docs(doc_id, spans) -> span rows (doc_id, kind, text, media_ref, offset)."""
    spans = batch.column("spans").combine_chunks()
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    parent = pc.list_parent_indices(spans)
    flat = pc.list_flatten(spans)
    doc_ids = pc.take(batch.column("doc_id"), parent)
    return pa.table(
        {
            "doc_id": doc_ids,
            "kind": flat.field("kind"),
            "text": flat.field("text"),
            "media_ref": flat.field("media_ref"),
            "offset": flat.field("offset"),
        }
    )


def prepare_batch(batch: pa.Table, salt_width: int = 0) -> pa.Table:
    """Full stage-1 transform: explode + cheap extract + pdf fan-out.

    ``salt_width`` > 0 assigns each pdf page row a salt
    ``(page-1) // salt_width`` (0 for single-unit rows) so the salted
    premerge groupby needs no extra add_column operator downstream."""
    rows = explode_docs(batch)
    kind = rows.column("kind")
    is_text = pc.equal(kind, "text")
    is_html = pc.equal(kind, "html")
    is_pdf = pc.equal(kind, "pdf")

    out: dict[str, list] = {name: [] for name in UNIT_SCHEMA.names}

    # vectorized bulk append for non-pdf rows
    non_pdf = rows.filter(pc.invert(is_pdf))
    n = non_pdf.num_rows
    if n:
        texts = non_pdf.column("text").to_pylist()
        kinds = non_pdf.column("kind").to_pylist()
        extracted = [
            strip_boilerplate(t) if k == "html" else (t if k == "text" else "")
            for k, t in zip(kinds, texts)
        ]
        out["doc_id"].extend(non_pdf.column("doc_id").to_pylist())
        out["offset"].extend(non_pdf.column("offset").to_pylist())
        out["kind"].extend(kinds)
        out["media_ref"].extend(non_pdf.column("media_ref").to_pylist())
        out["unit"].extend([0] * n)
        out["total_units"].extend([1] * n)
        out["salt"].extend([0] * n)
        out["text"].extend(extracted)
        out["done"].extend([k != "image" for k in kinds])

    pdfs = rows.filter(is_pdf)
    for doc_id, ref, offset in zip(
        pdfs.column("doc_id").to_pylist(),
        pdfs.column("media_ref").to_pylist(),
        pdfs.column("offset").to_pylist(),
    ):
        pages = parse_ref(ref)["pages"]
        for page in range(1, pages + 1):
            out["doc_id"].append(doc_id)
            out["offset"].append(offset)
            out["kind"].append("pdf")
            out["media_ref"].append(ref)
            out["unit"].append(page)
            out["total_units"].append(pages)
            out["salt"].append((page - 1) // salt_width if salt_width > 0 else 0)
            out["text"].append("")
            out["done"].append(False)
    _ = is_text, is_html
    return pa.table(out, schema=UNIT_SCHEMA)
