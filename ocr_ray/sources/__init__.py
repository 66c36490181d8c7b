"""Readers / writers.

Lance is the target table format per the north rule; this sandbox has
no lance wheel, so parquet (same Arrow schema, directory-of-fragments
layout) stands in. ``read_docs``/``write_docs`` isolate that choice.
"""
from __future__ import annotations

import ray.data


def read_docs(path: str, **kwargs) -> ray.data.Dataset:
    """Read an interleaved-documents table (parquet standing in for Lance)."""
    return ray.data.read_parquet(path, **kwargs)


def write_docs(ds: ray.data.Dataset, path: str, **kwargs) -> None:
    ds.write_parquet(path, **kwargs)
