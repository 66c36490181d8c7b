"""Readers / writers.

Lance is the target table format per the north rule; this sandbox has
no lance wheel, so parquet (same Arrow schema, directory-of-fragments
layout) stands in. ``read_docs``/``write_docs`` isolate that choice:
a ``.lance`` path routes to ``ray.data.read_lance``/``write_lance``
when the ``lance`` package is importable, with a clear error when it
is not — the rest of the engine never references a format.
"""
from __future__ import annotations

import ray.data


def _is_lance(path) -> bool:
    return isinstance(path, str) and path.rstrip("/").endswith(".lance")


def _require_lance(op: str) -> None:
    try:
        import lance  # noqa: F401
    except ImportError as ex:
        raise ImportError(
            f"{op} on a .lance path requires the 'lance' package "
            "(pip install pylance); in environments without it, use a "
            "parquet directory — identical Arrow schema and semantics"
        ) from ex


def read_docs(path, **kwargs) -> ray.data.Dataset:
    """Read an interleaved-documents table. ``.lance`` paths use the
    native Lance reader (column pruning + fragment-level parallelism);
    anything else is a parquet file / directory / list of files."""
    if _is_lance(path):
        _require_lance("read_docs")
        return ray.data.read_lance(path, **kwargs)
    return ray.data.read_parquet(path, **kwargs)


def write_docs(ds: ray.data.Dataset, path: str, **kwargs) -> None:
    if _is_lance(path):
        _require_lance("write_docs")
        ds.write_lance(path, **kwargs)
        return
    ds.write_parquet(path, **kwargs)
