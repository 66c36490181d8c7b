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
    return ray.data.read_parquet(path)


def _pool_size(cfg: PipelineConfig) -> int:
    if cfg.ocr_pool_size > 0:
        return cfg.ocr_pool_size
    cpus = int(ray.cluster_resources().get("CPU", 4))
    # leave headroom for the stateless prepare/stitch stages so the
    # pipeline doesn't serialize behind the pool
    return max(2, cpus - max(2, cpus // 8))


def build_extraction(
    ds: ray.data.Dataset,
    engine_name: str = "synth",
    cfg: PipelineConfig | None = None,
    salted: bool = True,
) -> ray.data.Dataset:
    cfg = cfg or PipelineConfig()
    engine = get_engine(engine_name)
    units = ds.map_batches(prepare_batch, batch_format="pyarrow", zero_copy_batch=True)
    extracted = units.map_batches(
        OcrPageExtractor,
        fn_constructor_kwargs={"engine_name": engine_name},
        batch_format="pyarrow",
        batch_size=cfg.ocr_batch_size,
        concurrency=_pool_size(cfg),
        num_cpus=1,
    )
    if salted and engine.stitch.salt_width > 0:
        w = engine.stitch.salt_width
        extracted = extracted.add_column(
            "salt", lambda df: (df["unit"].astype(int).clip(lower=1) - 1) // w,
            batch_format="pandas",
        )
        extracted = extracted.groupby(["doc_id", "offset", "salt"]).map_groups(
            make_salt_premerge(engine), batch_format="pandas"
        )
    return extracted.groupby("doc_id").map_groups(
        make_doc_stitch(engine), batch_format="pyarrow"
    )


def run_extraction(
    input_path: str,
    output_path: str | None = None,
    engine_name: str = "synth",
    cfg: PipelineConfig | None = None,
    salted: bool = True,
) -> ray.data.Dataset:
    out = build_extraction(read_corpus(input_path), engine_name, cfg, salted)
    if output_path is not None:
        out.write_parquet(output_path)
    return out
