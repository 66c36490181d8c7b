

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


def test_cli_entry_runs_and_resumes(ray_session, tmp_path):
    """python -m ocr_ray.run (the `ray job submit` surface): one run
    extracts, a re-run resumes (nothing processed, nothing read)."""
    from ocr_ray.run import main
    from ocr_ray.synth.corpus import write_corpus

    corpus = str(tmp_path / "in")
    write_corpus(corpus, 8, seed=21, n_files=2)
    out = str(tmp_path / "out")
    s1 = main(["--input", corpus, "--output", out, "--partitions", "2"])
    assert s1["rows"] == 8 and s1["files_read"] == 2
    s2 = main(["--input", corpus, "--output", out, "--partitions", "2"])
    assert s2["processed_partitions"] == [] and s2["files_read"] == 0


def test_cli_max_partitions_staged_resume(ray_session, tmp_path):
    """--max-partitions N through the argv surface: a capped first run
    processes only N partitions (reading only their files), the
    resubmit finishes the rest, and the final output holds every doc
    exactly once."""
    import pyarrow.dataset as pads

    from ocr_ray.run import main
    from ocr_ray.synth.corpus import write_corpus

    corpus = str(tmp_path / "in")
    write_corpus(corpus, 12, seed=33, n_files=4)
    out = str(tmp_path / "out")
    s1 = main(["--input", corpus, "--output", out, "--partitions", "4",
               "--max-partitions", "2"])
    assert s1["processed_partitions"] == [0, 1] and s1["files_read"] == 2
    s2 = main(["--input", corpus, "--output", out, "--partitions", "4"])
    assert s2["processed_partitions"] == [2, 3] and s2["files_read"] == 2
    assert sorted(s2["skipped_partitions"]) == [0, 1]
    docs = pads.dataset(out, format="parquet", partitioning="hive") \
        .to_table(columns=["doc_id"]).column("doc_id").to_pylist()
    assert len(docs) == 12 and len(set(docs)) == 12
