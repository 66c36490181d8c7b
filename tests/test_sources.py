

def test_lance_paths_routed_with_clear_error():
    """A .lance path must route to the Lance reader/writer; without the
    lance wheel (this sandbox) that is a clear ImportError naming the
    package, never a silent parquet fallback."""
    import pytest

    from ocr_ray.sources import _is_lance, read_docs

    assert _is_lance("/data/corpus.lance") and _is_lance("/data/corpus.lance/")
    assert not _is_lance("/data/corpus") and not _is_lance(["a.parquet"])
    try:
        import lance  # noqa: F401
        has_lance = True
    except ImportError:
        has_lance = False
    if not has_lance:
        with pytest.raises(ImportError, match="lance"):
            read_docs("/tmp/nope.lance")
