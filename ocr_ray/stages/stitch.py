"""Stages 3-4: salted partial merge + per-doc stitch.

The re-stitch required by the north rule (and the analogue of the
reference's ordered page concat, app/worker/tasks.py:177-223 /
chunk-order merge, merger.py:119-147): group extracted unit rows by
``doc_id``, re-establish order by sorting carried provenance columns
``(offset, unit)`` INSIDE the group — global dataset order is never
relied on, so the streaming executor runs unordered at full speed
(SURVEY.md §4.3).

Skew handling (SURVEY.md §4.2 "salted keys"): a heavy pdf span (up to
~80 page rows here, unbounded in the wild) first goes through an
optional pre-merge grouped by ``(doc_id, offset, salt)`` with
``salt = (page-1) // salt_width`` — partial merges of CONTIGUOUS page
ranges, which makes the final per-doc merge an associative concat of a
few partials instead of one task holding every page of the hottest
document. Both groupbys shuffle only post-extraction text rows (a few
percent of input bytes).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute

from ..config import EngineConfig
from ..functions.extract import join_units
from ..synth.corpus import DOC_SCHEMA


def make_salt_premerge(engine: EngineConfig):
    """Grouped partial merge of pdf-page unit rows; identity for
    single-unit groups. Input/output: unit-row schema (pyarrow groups —
    per-group overhead is ~5-10x lower than pandas groups)."""
    sep = engine.stitch.page_separator

    def premerge(group: pa.Table) -> pa.Table:
        if group.num_rows == 1:
            return group
        order = pa.compute.sort_indices(group.column("unit"))
        g = group.take(order)
        merged = sep.join(g.column("text").to_pylist())
        row = {name: g.column(name)[0] for name in g.schema.names}
        row["text"] = merged
        row["done"] = True
        row["steps"] = ""
        row["split_method"] = ""
        if "confidence" in g.schema.names:
            # weakest-link combine: min is associative, so partial
            # merges compose with the final stitch min exactly
            row["confidence"] = float(pa.compute.min(g.column("confidence")).as_py())
        if "error" in g.schema.names:
            # error union is associative too: ';'-join the non-empty
            # unit errors so the final stitch can count them exactly
            row["error"] = ";".join(e for e in g.column("error").to_pylist() if e)
        # partials stay ordered by their smallest page number (already
        # row 0 after the sort); dtypes inherited from the input schema
        return pa.table(
            {
                name: pa.array(
                    [
                        row[name]
                        if isinstance(row[name], (str, bool, int, float))
                        else row[name].as_py()
                    ],
                    type=g.schema.field(name).type,
                )
                for name in g.schema.names
            }
        )

    return premerge


OUT_SCHEMA = pa.schema(
    list(DOC_SCHEMA)
    + [pa.field("confidence", pa.float64()), pa.field("n_errors", pa.int64())]
)


def make_doc_stitch(engine: EngineConfig, passthrough: list[str] | None = None):
    """Final per-doc stitch: unit rows -> one (doc_id, spans, confidence)
    row with spans ordered by offset (list<struct> matching the input
    schema). ``confidence`` is the doc-level min over all unit scores
    (weakest link; the reference threads per-chunk/page confidence the
    same way, app/ocr/base.py:25-34 / app/worker/tasks.py:206-213).

    Pure pyarrow/numpy per group (no pandas frame per doc — the same
    cheaper idiom as the premerge): one two-key sort, numpy run-length
    offsets, Python only for the final (few-element) span list.

    ``passthrough`` columns are doc-constant and copied from the
    group's first row onto the output row."""
    passthrough = list(passthrough or ())

    def stitch(group: pa.Table) -> pa.Table:
        order = pa.compute.sort_indices(
            group,
            sort_keys=[("offset", "ascending"), ("unit", "ascending")],
        )
        g = group.take(order)
        has_conf = "confidence" in g.schema.names
        offs = g.column("offset").to_numpy()
        texts = g.column("text").to_pylist()
        kinds = g.column("kind")
        refs = g.column("media_ref")
        starts = np.flatnonzero(np.r_[True, offs[1:] != offs[:-1]])
        ends = np.r_[starts[1:], len(offs)]
        spans = []
        for s, e in zip(starts, ends):
            text = texts[s] if e - s == 1 else join_units(texts[s:e], engine)
            spans.append(
                {
                    "kind": kinds[s].as_py(),
                    "text": text,
                    "media_ref": refs[s].as_py(),
                    "offset": int(offs[s]),
                }
            )
        conf = (
            float(pa.compute.min(g.column("confidence")).as_py())
            if has_conf
            else 1.0
        )
        n_errors = 0
        if "error" in g.schema.names:
            # units carry ';'-joined error tags (premerge unions them);
            # the doc-level count is the error-side observability column
            # (the reference's per-job error field, app/schemas/job.py:47)
            n_errors = sum(
                len([seg for seg in e.split(";") if seg])
                for e in g.column("error").to_pylist()
                if e
            )
        row = {"doc_id": g.column("doc_id")[0].as_py(), "spans": spans,
               "confidence": conf, "n_errors": n_errors}
        schema = OUT_SCHEMA
        for name in passthrough:
            row[name] = g.column(name)[0].as_py()
            schema = schema.append(g.schema.field(name))
        return pa.Table.from_pylist([row], schema=schema)

    return stitch
