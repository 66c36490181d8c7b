"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash ->
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()``/``ray.shutdown()`` here or anywhere in ocr_ray.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline at sf0.001: load the driver's documents table,
    interleave it with deterministic synthetic media spans (every kind
    path: text / html / image / pdf), run the full extraction pipeline
    (explode -> OCR actor pool -> salted stitch) and return the
    re-stitched docs as a Dataset."""
    import ray.data

    from ocr_ray.pipelines.extraction import build_extraction
    from ocr_ray.stages.interleave import docs_to_interleaved

    ray.data.DataContext.get_current().enable_progress_bars = False
    docs = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet")
    interleaved = docs.map_batches(docs_to_interleaved, batch_format="pyarrow")
    return build_extraction(interleaved)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 —
    see ocr_ray.queries for the catalog."""
    from ocr_ray.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from ocr_ray.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
