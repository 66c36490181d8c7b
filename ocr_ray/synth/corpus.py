"""Deterministic interleaved-document corpus generator (FIXTURES.md §1).

Produces the engine's primary input: a table of documents

    doc_id : string
    spans  : list<struct<kind: string, text: string, media_ref: string, offset: int32>>

- offsets are 0..n_spans-1 but stored SHUFFLED within the list — the
  stitch stage must re-sort by offset, never trust list order;
- kind mix ~55% text / 20% html / 15% image / 10% pdf;
- ~1% "heavy" docs carry many-page pdf spans / many-band images — the
  skew the north rule requires explicit handling for (mirrors the
  reference's page-count-scaled timeout, app/api/routes/ocr.py:271);
- media payloads are synth:// refs (synth.media) rendered on demand;
  nothing external.

Parquet stands in for Lance in this sandbox (no lance wheel); the
schema is Lance-compatible.
"""
from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import media, textgen

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
DOC_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", pa.list_(SPAN_STRUCT))])

_KINDS = ("text", "html", "image", "pdf")
_KIND_P = (0.55, 0.20, 0.15, 0.10)


def _make_html(rng: np.random.Generator) -> tuple[str, str]:
    """Returns (html, expected_content). Content blocks are paragraphs;
    boilerplate: nav/header/script/footer/link-farm blocks."""
    # content paragraphs use >=2 sentences so every block clears the
    # stripper's min_text_chars floor
    blocks = [
        textgen.make_paragraph(rng, int(rng.integers(2, 4)))
        for _ in range(int(rng.integers(1, 4)))
    ]
    words = [textgen.make_sentence(rng).split()[0] for _ in range(4)]
    nav = "<nav>" + " | ".join(f'<a href="/{w}">{w}</a>' for w in words) + "</nav>"
    header = f"<header><h1>{words[0]} site</h1></header>"
    script = "<script>var t = Date.now(); track(t);</script>"
    farm = (
        '<div class="promo">'
        + " ".join(f'<a href="/buy/{w}">{w} deals</a>' for w in words)
        + "</div>"
    )
    footer = f"<footer>(c) 2026 {words[1]} inc. <a href='/tos'>terms</a></footer>"
    body = "".join(f"<p>{b}</p>" for b in blocks)
    maybe_farm = farm if rng.random() < 0.7 else ""
    html = (
        f"<html><head><title>{words[2]}</title>{script}</head><body>"
        + nav
        + header
        + body
        + maybe_farm
        + footer
        + "</body></html>"
    )
    return html, "\n".join(blocks)


def _make_span(rng: np.random.Generator, doc_id: str, offset: int, heavy: bool) -> tuple[dict, str | None]:
    """Returns (span_dict, truth) — truth None for pdf (page texts are
    derived via synth.media/textgen, the oracle computes the stitch)."""
    kind = _KINDS[int(rng.choice(4, p=_KIND_P))]
    skew = float(rng.choice([0.0, 0.0, -3.0, -1.5, 1.0, 2.5, 3.8]))
    invert = bool(rng.random() < 0.2)
    noise = float(rng.choice([0.0, 0.0, 0.005, 0.01, 0.02]))
    seed = int(rng.integers(0, 2**31 - 1))
    if kind == "text":
        text = textgen.make_paragraph(rng, int(rng.integers(1, 4)))
        return {"kind": "text", "text": text, "media_ref": "", "offset": offset}, text
    if kind == "html":
        html, truth = _make_html(rng)
        return {"kind": "html", "text": html, "media_ref": "", "offset": offset}, truth
    if kind == "image":
        n_paras = int(rng.integers(5, 9)) if heavy else int(rng.integers(1, 4))
        payload = textgen.make_text(rng, n_paras)
        ref = media.build_image_ref(
            doc_id, offset, payload, skew=skew, invert=invert, noise=noise, seed=seed
        )
        return {"kind": "image", "text": "", "media_ref": ref, "offset": offset}, payload
    pages = int(rng.integers(20, 81)) if heavy else int(rng.integers(1, 5))
    ref = media.build_pdf_ref(
        doc_id, offset, pages, seed=seed, skew=skew, invert=invert, noise=noise
    )
    return {"kind": "pdf", "text": "", "media_ref": ref, "offset": offset}, None


def make_doc(rng: np.random.Generator, i: int, heavy_frac: float = 0.01) -> tuple[dict, list]:
    doc_id = f"doc-{i:08d}"
    heavy = bool(rng.random() < heavy_frac)
    n_spans = int(rng.integers(1, 9))
    spans = []
    truths = []
    for off in range(n_spans):
        span, truth = _make_span(rng, doc_id, off, heavy)
        spans.append(span)
        truths.append(truth)
    order = rng.permutation(n_spans)  # shuffled storage order
    return {"doc_id": doc_id, "spans": [spans[j] for j in order]}, truths


def generate_docs(n_docs: int, seed: int = 42, heavy_frac: float = 0.01, start: int = 0) -> pa.Table:
    rows = []
    for i in range(start, start + n_docs):
        rng = np.random.default_rng(np.uint64(seed) * np.uint64(2_654_435_761) + np.uint64(i))
        doc, _ = make_doc(rng, i, heavy_frac)
        rows.append(doc)
    return pa.Table.from_pylist(rows, schema=DOC_SCHEMA)


def write_corpus(
    out_dir: str, n_docs: int, seed: int = 42, heavy_frac: float = 0.01, n_files: int = 8
) -> str:
    """Write the corpus as n_files parquet shards (parallel-readable;
    one shard ~= one input partition for checkpointing). Idempotent:
    skips generation when the marker file matches."""
    marker = os.path.join(out_dir, f"_SYNTH_{n_docs}_{seed}_{heavy_frac}_{n_files}")
    if os.path.exists(marker):
        return out_dir
    # parameters changed (or first write): clear any stale shards —
    # fewer n_files than before would otherwise leave orphan files that
    # silently inflate the corpus
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    per = int(np.ceil(n_docs / n_files))
    start = 0
    for f in range(n_files):
        count = min(per, n_docs - start)
        if count <= 0:
            break
        table = generate_docs(count, seed=seed, heavy_frac=heavy_frac, start=start)
        pq.write_table(table, os.path.join(out_dir, f"docs-{f:04d}.parquet"))
        start += count
    with open(marker, "w") as fh:
        fh.write("ok\n")
    return out_dir
