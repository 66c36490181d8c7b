"""Stage 2: the OCR actor pool.

A callable CLASS for ``map_batches(..., concurrency=N)`` — the Ray
Data actor-pool pattern standing in for the reference's
load-once/extract-many engine contract (BaseOCREngine,
app/ocr/base.py:37-116; GOT/Qari/DeepSeek engines §2.5 M1-M4):
expensive setup once per actor in ``__init__`` (here: engine config +
prebuilt preprocessing step chain; for a real model: weights), then
per-batch extraction in ``__call__``.

Rows with ``done=True`` (text/html) pass through untouched; media rows
(image spans, pdf pages) are rendered from their synth:// ref (the
stand-in for fetching payload bytes) and OCR'd via the shared pure
core (functions/extract.ocr_page). PDF pages get their page marker
here so later joins are plain associative concatenations.

Lineage: ``steps`` (comma-joined preprocessing steps applied — mirror
of the reference's steps_applied, pipeline.py:162-170) and ``split_method``
columns are added for media rows.
"""
from __future__ import annotations

import pyarrow as pa

from ..config import get_engine
from ..functions.extract import ocr_page, page_block
from ..functions.preprocess import build_steps
from ..synth.media import render_ref

OCR_SCHEMA_EXTRA = [
    ("steps", pa.string()),
    ("split_method", pa.string()),
    ("confidence", pa.float64()),
]


class OcrPageExtractor:
    """Actor: OCR every not-yet-done row of a unit-row batch.

    Engine "switching" (reference OCRModelManager.switch_model,
    app/ocr/manager.py:168-241) is dissolved into per-row ROUTING: the
    actor warm-loads every engine named in ``engine_names`` once, and a
    row carrying an ``engine`` column is extracted with that engine's
    config; rows without one use ``engine_name``. No shared mutable
    state, no drain/reload — two kinds of documents just take different
    code paths through the same pool."""

    def __init__(self, engine_name: str = "synth", engine_names: list[str] | None = None):
        self.default_name = engine_name
        self.engine = get_engine(engine_name)
        self.engines = {n: get_engine(n) for n in (engine_names or [engine_name])}
        self.engines.setdefault(engine_name, self.engine)
        # prebuilt per-engine step chains ~ model warm-load (once per
        # actor); threaded into every ocr_page call below so the chain
        # is never rebuilt per page
        self.steps = {n: build_steps(e.preprocess) for n, e in self.engines.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        done = batch.column("done").to_pylist()
        kinds = batch.column("kind").to_pylist()
        refs = batch.column("media_ref").to_pylist()
        units = batch.column("unit").to_pylist()
        totals = batch.column("total_units").to_pylist()
        texts = batch.column("text").to_pylist()
        routes = (
            batch.column("engine").to_pylist()
            if batch.schema.get_field_index("engine") >= 0
            else None
        )
        steps_col = [""] * len(done)
        method_col = [""] * len(done)
        error_col = [""] * len(done)
        # already-extracted rows (text/html) carry full confidence; the
        # engine reports per-unit scores for media rows below
        conf_col = [1.0] * len(done)
        for i, is_done in enumerate(done):
            if is_done:
                continue
            name = routes[i] if routes and routes[i] in self.engines else self.default_name
            engine = self.engines[name]
            steps = self.steps[name]
            try:
                if kinds[i] == "pdf":
                    img = render_ref(refs[i], page_number=units[i])
                else:
                    img = render_ref(refs[i])
                text, applied, method, conf = ocr_page(img, engine, steps=steps)
            except Exception as ex:  # noqa: BLE001
                # error-side semantics: one unreadable ref must never
                # kill the job (the reference 400s the request,
                # file_validation.py; a 100TB pipeline tags the row)
                texts[i] = ""
                conf_col[i] = 0.0
                # ';' is the premerge's error-union separator and the
                # stitch's n_errors split token — keep it out of tags
                error_col[i] = f"{type(ex).__name__}: {ex}"[:200].replace(";", ",")
                continue
            if kinds[i] == "pdf":
                text = page_block(units[i], totals[i], text, engine)
            texts[i] = text
            conf_col[i] = conf
            steps_col[i] = ",".join(applied)
            method_col[i] = method
        out = batch.set_column(
            batch.schema.get_field_index("text"), "text", pa.array(texts, pa.string())
        )
        out = out.set_column(
            out.schema.get_field_index("done"),
            "done",
            pa.array([True] * len(done), pa.bool_()),
        )
        out = out.append_column("steps", pa.array(steps_col, pa.string()))
        out = out.append_column("split_method", pa.array(method_col, pa.string()))
        out = out.append_column("confidence", pa.array(conf_col, pa.float64()))
        return out.append_column("error", pa.array(error_col, pa.string()))
