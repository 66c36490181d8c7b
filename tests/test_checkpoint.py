"""Kill-and-resume semantics: a partial run + a resume produce exactly
the same output table as a single-shot run, and finished partitions
are not re-extracted (SURVEY.md §5.4). File mode must additionally
skip finished partitions at the input FILE LIST (read volume drops
proportionally); hash mode's vectorized crc32 must equal zlib's."""
import json
import os
import zlib

import numpy as np
import pyarrow.dataset as pads
import pytest

from ocr_ray.state.checkpoint import (
    Manifest,
    crc32_batch,
    doc_partition,
    run_checkpointed,
)
from ocr_ray.synth.corpus import write_corpus

N_DOCS = 12
P = 4


def _read_all(output_dir):
    ds = pads.dataset(output_dir, format="parquet", partitioning="hive")
    tbl = ds.to_table()
    rows = {}
    for r in tbl.to_pylist():
        rows[r["doc_id"]] = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
    return rows


@pytest.mark.parametrize("mode", ["file", "hash"])
def test_partial_then_resume_equals_oneshot(ray_session, tmp_path, mode):
    corpus = str(tmp_path / "in")
    write_corpus(corpus, N_DOCS, seed=3, n_files=P)

    oneshot = str(tmp_path / "full")
    s0 = run_checkpointed(corpus, oneshot, num_partitions=P, partition_by=mode)
    assert sorted(s0["processed_partitions"]) == list(range(P))

    out = str(tmp_path / "resumable")
    s1 = run_checkpointed(corpus, out, num_partitions=P,
                          max_partitions_this_run=2, partition_by=mode)
    assert len(s1["processed_partitions"]) == 2
    # manifest records per-partition lineage
    m = json.load(open(os.path.join(out, "_manifest.json")))
    assert len(m["partitions"]) == 2
    for v in m["partitions"].values():
        assert v["status"] == "done" and "docs_per_sec" in v and "fingerprint" in v
        assert v["lineage"]["partition_by"] == mode
        if mode == "file":
            # per-partition input-file provenance recorded
            assert len(v["lineage"]["input_files"]) == 1

    s2 = run_checkpointed(corpus, out, num_partitions=P, partition_by=mode)
    assert sorted(s1["processed_partitions"] + s2["processed_partitions"]) == list(range(P))
    assert sorted(s2["skipped_partitions"]) == sorted(s1["processed_partitions"])
    if mode == "file":
        # the resume run must touch ONLY the unfinished partitions'
        # files — read volume drops proportionally to progress
        assert s0["files_read"] == s0["files_total"] == P
        assert s1["files_read"] == 2
        assert s2["files_read"] == 2

    assert _read_all(out) == _read_all(oneshot)

    # third run: everything done, nothing processed (and in file mode,
    # nothing read at all)
    s3 = run_checkpointed(corpus, out, num_partitions=P, partition_by=mode)
    assert s3["processed_partitions"] == []
    assert s3["files_read"] == 0


def test_file_and_hash_modes_agree(ray_session, tmp_path):
    corpus = str(tmp_path / "in")
    write_corpus(corpus, N_DOCS, seed=9, n_files=3)
    a = str(tmp_path / "by_file")
    b = str(tmp_path / "by_hash")
    run_checkpointed(corpus, a, num_partitions=P, partition_by="file")
    run_checkpointed(corpus, b, num_partitions=P, partition_by="hash")
    assert _read_all(a) == _read_all(b)


def test_doc_partition_stable():
    assert doc_partition("doc-00000001", 16) == doc_partition("doc-00000001", 16)
    parts = {doc_partition(f"doc-{i:08d}", 8) for i in range(100)}
    assert len(parts) == 8  # spreads


def test_crc32_batch_matches_zlib():
    ids = [f"doc-{i:08d}" for i in range(50)] + ["", "x", "tdoc-123456789",
                                                 "a" * 63, "Z" * 64]
    got = crc32_batch(np.array(ids, dtype=object))
    want = np.array([zlib.crc32(s.encode()) for s in ids], dtype=np.uint32)
    assert np.array_equal(got, want)
    # non-ASCII falls back to the per-row path, same values
    uni = ["tête-à-tête", "doc-Ω", "plain"]
    got_u = crc32_batch(np.array(uni, dtype=object))
    want_u = np.array([zlib.crc32(s.encode("utf-8")) for s in uni], dtype=np.uint32)
    assert np.array_equal(got_u, want_u)


def test_fingerprint_invalidates_on_input_change(tmp_path):
    corpus = str(tmp_path / "in")
    write_corpus(corpus, 4, seed=5, n_files=1)
    from ocr_ray.state.checkpoint import _fingerprint

    fp1 = _fingerprint(corpus)
    with open(os.path.join(corpus, "extra.parquet"), "wb") as fh:
        fh.write(b"x")
    assert _fingerprint(corpus) != fp1
    m = Manifest(str(tmp_path / "out"))
    m.mark_done(0, fp1, 10, 1.0, 10.0)
    assert m.done_partitions("different") == set()


def test_partial_partition_cleared_on_retry(ray_session, tmp_path):
    """Crash-mid-write simulation: a stray part=K directory with
    leftover files (not marked done in the manifest) must be cleared on
    the next run — never duplicated rows."""
    corpus = str(tmp_path / "in")
    write_corpus(corpus, N_DOCS, seed=13, n_files=P)
    out = str(tmp_path / "out")
    stray = os.path.join(out, "part=1")
    os.makedirs(stray)
    with open(os.path.join(stray, "garbage.parquet"), "wb") as fh:
        fh.write(b"not parquet")
    s = run_checkpointed(corpus, out, num_partitions=P)
    assert sorted(s["processed_partitions"]) == list(range(P))
    assert not os.path.exists(os.path.join(stray, "garbage.parquet"))
    assert s["rows"] == N_DOCS
    rows = _read_all(out)
    assert len(rows) == N_DOCS  # one output row per doc, no duplicates


def test_cross_scheme_resume_refused(ray_session, tmp_path):
    """Resuming an output dir under a different partitioning scheme
    would silently skip/duplicate documents — it must REFUSE instead."""
    corpus = str(tmp_path / "in")
    write_corpus(corpus, N_DOCS, seed=17, n_files=P)
    out = str(tmp_path / "out")
    run_checkpointed(corpus, out, num_partitions=P, partition_by="hash",
                     max_partitions_this_run=2)
    with pytest.raises(ValueError, match="partition_by"):
        run_checkpointed(corpus, out, num_partitions=P, partition_by="file")
    with pytest.raises(ValueError, match="num_partitions"):
        run_checkpointed(corpus, out, num_partitions=2 * P, partition_by="hash")
    # same scheme still resumes fine
    s = run_checkpointed(corpus, out, num_partitions=P, partition_by="hash")
    assert len(s["skipped_partitions"]) == 2


def test_file_mode_refuses_parquetless_input(ray_session, tmp_path):
    """file mode must never report rows=0 success over an input layout
    it cannot see (.lance dir, nested/hive layout, empty dir)."""
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(ValueError, match="no top-level"):
        run_checkpointed(str(empty), str(tmp_path / "o1"))
    lance_like = tmp_path / "corpus.lance"
    lance_like.mkdir()
    (lance_like / "data.lance").write_bytes(b"x")
    with pytest.raises(ValueError, match="hash"):
        run_checkpointed(str(lance_like), str(tmp_path / "o2"))


def test_cli_no_checkpoint_refuses_nonempty_output(ray_session, tmp_path):
    from ocr_ray.run import main

    corpus = str(tmp_path / "in")
    write_corpus(corpus, 4, seed=23, n_files=1)
    out = tmp_path / "out"
    out.mkdir()
    (out / "old.parquet").write_bytes(b"x")
    with pytest.raises(SystemExit, match="non-empty"):
        main(["--input", corpus, "--output", str(out), "--no-checkpoint"])


def test_checkpoint_refuses_loose_parquet_output(ray_session, tmp_path):
    """An output dir polluted with non-partitioned parquet (e.g. a prior
    --no-checkpoint run) would read as old+new rows — refuse it."""
    corpus = str(tmp_path / "in")
    write_corpus(corpus, 4, seed=29, n_files=1)
    out = tmp_path / "out"
    out.mkdir()
    (out / "stale.parquet").write_bytes(b"x")
    with pytest.raises(ValueError, match="loose parquet"):
        run_checkpointed(corpus, str(out))


def test_run_extraction_refuses_nonempty_output(ray_session, tmp_path):
    from ocr_ray.pipelines.extraction import run_extraction

    corpus = str(tmp_path / "in")
    write_corpus(corpus, 4, seed=31, n_files=1)
    out = tmp_path / "out"
    out.mkdir()
    (out / "old.parquet").write_bytes(b"x")
    with pytest.raises(ValueError, match="not empty"):
        run_extraction(corpus, output_path=str(out))


def test_stale_fingerprint_does_not_veto_scheme(ray_session, tmp_path):
    """After the input legitimately changes (new fingerprint — full
    recompute anyway), records from the OLD input must not refuse a
    re-chosen scheme: only current-fingerprint partitions participate
    in the scheme check."""
    corpus = str(tmp_path / "in")
    write_corpus(corpus, N_DOCS, seed=23, n_files=P)
    out = str(tmp_path / "out")
    run_checkpointed(corpus, out, num_partitions=P, partition_by="hash")
    # input changes -> old partition records are stale
    write_corpus(str(tmp_path / "in2"), N_DOCS + 4, seed=24, n_files=P + 2)
    corpus2 = str(tmp_path / "in2")
    s = run_checkpointed(corpus2, out, num_partitions=2 * P, partition_by="file")
    assert s["rows"] > 0 and not s["skipped_partitions"]
    # the NEW scheme is now the recorded one for the new fingerprint:
    # same-input resume under a different scheme still refuses
    with pytest.raises(ValueError, match="partition_by"):
        run_checkpointed(corpus2, out, num_partitions=2 * P, partition_by="hash")


def test_cli_argv_partial_then_resume(ray_session, tmp_path):
    """The `ray job submit` surface (ocr_ray.run.main) driven through
    its real argv path: a --max-partitions partial run, then the same
    command again — the resume must skip the committed partitions and
    the final directory must equal a one-shot run's content."""
    from ocr_ray.run import main

    corpus = str(tmp_path / "in")
    write_corpus(corpus, N_DOCS, seed=41, n_files=P)
    out = str(tmp_path / "out")
    argv = ["--input", corpus, "--output", out, "--partitions", str(P)]
    s1 = main(argv + ["--max-partitions", "2"])
    assert len(s1["processed_partitions"]) == 2
    s2 = main(argv)
    assert sorted(s2["skipped_partitions"]) == sorted(s1["processed_partitions"])
    assert sorted(s1["processed_partitions"] + s2["processed_partitions"]) \
        == list(range(P))
    oneshot = str(tmp_path / "oneshot")
    main(["--input", corpus, "--output", oneshot, "--partitions", str(P)])
    assert _read_all(out) == _read_all(oneshot)


def test_stale_partitions_purged_on_input_change(ray_session, tmp_path):
    """After an input change, a resume with FEWER partitions than the
    old scheme must not leave the old part=K (K >= P_new) directories
    on disk: a dataset reader of output_dir would silently mix old and
    new rows. Stale dirs + manifest entries are deleted at plan time."""
    corpus = str(tmp_path / "in")
    write_corpus(corpus, N_DOCS, seed=37, n_files=P)
    out = str(tmp_path / "out")
    run_checkpointed(corpus, out, num_partitions=P, partition_by="hash")
    assert set(os.listdir(out)) >= {f"part={p}" for p in range(P)}
    # input changes -> new fingerprint; resume with HALF the partitions
    corpus2 = str(tmp_path / "in2")
    write_corpus(corpus2, N_DOCS + 2, seed=38, n_files=2)
    s = run_checkpointed(corpus2, out, num_partitions=P // 2,
                         partition_by="hash")
    assert s["rows"] == N_DOCS + 2
    on_disk = sorted(n for n in os.listdir(out) if n.startswith("part="))
    assert on_disk == [f"part={p}" for p in range(P // 2)], on_disk
    with open(os.path.join(out, "_manifest.json")) as fh:
        manifest = json.load(fh)
    assert sorted(manifest["partitions"]) == [str(p) for p in range(P // 2)]
    # the directory now reads as EXACTLY the new corpus — no mixing
    assert len(_read_all(out)) == N_DOCS + 2
    # orphan dirs (crash before mark_done under an older scheme) are
    # swept too: plant one and resume — nothing to do, dir still removed
    orphan = os.path.join(out, f"part={P + 3}")
    os.makedirs(orphan, exist_ok=True)
    s2 = run_checkpointed(corpus2, out, num_partitions=P // 2,
                          partition_by="hash")
    assert s2["processed_partitions"] == []
    assert not os.path.isdir(orphan)
