"""The flagship pipeline: interleaved docs -> extracted, re-stitched docs.

    read_parquet(corpus)                          # Lance-shaped table; parquet stands in
      -> map_batches(prepare_batch)               # explode + text/html extract + pdf page fan-out
      -> map_batches(OcrPageExtractor, actors)    # media OCR, warm engines
      -> [groupby(doc_id, offset, salt).map_groups(premerge)]   # salted partial page merge
      -> groupby(doc_id).map_groups(stitch)       # offset-ordered span re-stitch
      -> write_parquet / return

All stages stream; nothing materializes the full dataset. The OCR
actor pool is sized from ``ray.cluster_resources()`` at build time so
the same code exercises proportional pools at every parallelism level
(the N vs 4N scaling criterion, SURVEY.md §7.3).
"""
from __future__ import annotations

import ray
import ray.data

from ..config import PipelineConfig, get_engine
from ..stages.ocr import OcrPageExtractor
from ..stages.prepare import prepare_batch
from ..stages.stitch import make_doc_stitch, make_salt_premerge

__all__ = ["read_corpus", "build_extraction", "run_extraction"]


def read_corpus(path: str) -> ray.data.Dataset:
    # via sources.read_docs so .lance paths route to the Lance reader
    # (or its clear ImportError) — the pipeline never names a format
    from ..sources import read_docs

    return read_docs(path)


def _pool_size(cfg: PipelineConfig) -> int:
    if cfg.ocr_pool_size > 0:
        return cfg.ocr_pool_size
    cpus = int(ray.cluster_resources().get("CPU", 4))
    # nearly the whole node: the read fuses into the pool's input and
    # the stitch shuffle only runs after the pool drains, so reserving
    # CPUs for other stages just idles them during the OCR phase
    return max(2, cpus - 1)


def _stitch_partitions(cfg: PipelineConfig) -> int:
    """Shuffle width for the stitch groupbys: proportional to the
    cluster (so N vs 4N runs scale), floored so tiny clusters still
    parallelize. Coalescing the many small post-OCR blocks before the
    sort removes most per-task shuffle overhead."""
    if cfg.stitch_partitions > 0:
        return cfg.stitch_partitions
    cpus = int(ray.cluster_resources().get("CPU", 4))
    return max(8, cpus // 2)


def build_extraction(
    ds: ray.data.Dataset,
    engine_name: str = "synth",
    cfg: PipelineConfig | None = None,
    salted: bool | None = None,
    passthrough: list[str] | None = None,
) -> ray.data.Dataset:
    """``salted=None`` (default) reads ``cfg.salt_premerge``: the salted
    partial merge is the skew ESCAPE HATCH for corpora whose heaviest
    documents would overload a single stitch task (>~10^4 units/doc).
    It costs one extra shuffle of the (small) text rows, so it stays off
    when the unit-count distribution is bounded — same correctness
    either way (tests run both paths).

    ``passthrough`` names doc-level input columns (beyond doc_id/spans)
    to carry through every stage onto the output rows — e.g. the
    checkpoint partition id."""
    cfg = cfg or PipelineConfig()
    engine = get_engine(engine_name)
    if salted is None:
        salted = cfg.salt_premerge
    if salted == "auto":
        # no input path here to sample — run_extraction resolves "auto"
        # before calling; a bare Dataset defaults to the cheap path
        salted = False
    use_salt = salted and engine.stitch.salt_width > 0
    units = ds.map_batches(
        prepare_batch,
        fn_kwargs={
            "salt_width": engine.stitch.salt_width if use_salt else 0,
            "passthrough": passthrough,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    pool = _pool_size(cfg)
    if use_salt:
        # pathological-doc REBALANCE (round-5 finding): Ray fuses the
        # read -> prepare -> OCR chain into one operator, so task
        # granularity is the INPUT block — a single 24k-page document
        # explodes inside ONE actor task and serializes the whole job
        # (measured 320 s vs ~60 s of aggregate pool work at 8k docs).
        # When skew mode is on (same auto probe as the salted stitch),
        # pay one barrier here to spread the exploded unit rows evenly
        # across ~4 blocks per actor; the common bounded-skew case keeps
        # the fully fused streaming path. The barrier is global to the
        # dataset this call was given: unit rows are refs + inline text
        # (pixels decode downstream in the actor pool), so the shuffled
        # bytes are a small multiple of the input corpus — and a
        # checkpointed run can bound it further by resuming in waves
        # (run_checkpointed(max_partitions_this_run=...)), which scopes
        # the barrier to one wave's partitions per process.
        units = units.repartition(4 * pool)
    extracted = units.map_batches(
        OcrPageExtractor,
        fn_constructor_kwargs={"engine_name": engine_name},
        batch_format="pyarrow",
        batch_size=cfg.ocr_batch_size,
        concurrency=pool,
        num_cpus=1,
    )
    # coalesce the many small post-OCR blocks so the shuffle's per-task
    # overhead doesn't swamp the (small) stitch compute
    extracted = extracted.repartition(_stitch_partitions(cfg))
    if use_salt:
        extracted = extracted.groupby(["doc_id", "offset", "salt"]).map_groups(
            make_salt_premerge(engine), batch_format="pyarrow"
        )
    return extracted.groupby("doc_id").map_groups(
        make_doc_stitch(engine, passthrough=passthrough), batch_format="pyarrow"
    )


def _sample_max_units(input_path: str, sample_rows: int = 512) -> int:
    """Driver-side skew probe for salt_premerge="auto": peek at the
    first ``sample_rows`` docs' pdf refs (one row-group read, no Ray
    job) and return the max unit count seen. A SAMPLE can miss rare
    heavy docs — callers that know their corpus has a pathological tail
    pass ``salted=True`` explicitly."""
    import pyarrow.dataset as pads

    from ..synth.media import parse_ref

    try:
        # parquet-only probe: .lance / exotic layouts degrade to 1 (auto
        # stays off there — pass salted=True explicitly for such corpora)
        head = pads.dataset(input_path, format="parquet").head(
            sample_rows, columns=["spans"]
        )
    except Exception:  # noqa: BLE001 - probe is best-effort
        return 1
    mx = 1
    for spans in head.column("spans").to_pylist():
        for s in spans or ():
            if s.get("kind") == "pdf" and s.get("media_ref"):
                try:
                    mx = max(mx, int(parse_ref(s["media_ref"]).get("pages", 1)))
                except Exception:  # noqa: BLE001
                    continue
    return mx


def run_extraction(
    input_path: str,
    output_path: str | None = None,
    engine_name: str = "synth",
    cfg: PipelineConfig | None = None,
    salted: bool | None = None,
) -> ray.data.Dataset:
    cfg = cfg or PipelineConfig()
    if salted is None and cfg.salt_premerge == "auto":
        salted = _sample_max_units(input_path) > cfg.salt_auto_units
    out = build_extraction(read_corpus(input_path), engine_name, cfg, salted)
    if output_path is not None:
        import os

        if os.path.isdir(output_path) and os.listdir(output_path):
            # write_parquet APPENDS fragment files — writing into a
            # non-empty dir silently duplicates rows for any consumer
            raise ValueError(
                f"output_path {output_path!r} is not empty; clear it or "
                "use run_checkpointed for resumable append semantics"
            )
        out.write_parquet(output_path)
    return out
