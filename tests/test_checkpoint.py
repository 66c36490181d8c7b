"""Kill-and-resume semantics: a partial run + a resume produce exactly
the same output table as a single-shot run, and finished partitions
are not re-extracted (SURVEY.md §5.4)."""
import json
import os

import pyarrow.dataset as pads

from ocr_ray.state.checkpoint import Manifest, doc_partition, run_checkpointed
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


def test_partial_then_resume_equals_oneshot(ray_session, tmp_path):
    corpus = str(tmp_path / "in")
    write_corpus(corpus, N_DOCS, seed=3, n_files=2)

    oneshot = str(tmp_path / "full")
    s0 = run_checkpointed(corpus, oneshot, num_partitions=P)
    assert sorted(s0["processed_partitions"]) == list(range(P))

    out = str(tmp_path / "resumable")
    s1 = run_checkpointed(corpus, out, num_partitions=P, max_partitions_this_run=2)
    assert len(s1["processed_partitions"]) == 2
    # manifest records per-partition lineage
    m = json.load(open(os.path.join(out, "_manifest.json")))
    assert len(m["partitions"]) == 2
    for v in m["partitions"].values():
        assert v["status"] == "done" and "docs_per_sec" in v and "fingerprint" in v

    s2 = run_checkpointed(corpus, out, num_partitions=P)
    assert sorted(s1["processed_partitions"] + s2["processed_partitions"]) == list(range(P))
    assert sorted(s2["skipped_partitions"]) == sorted(s1["processed_partitions"])

    assert _read_all(out) == _read_all(oneshot)

    # third run: everything done, nothing processed
    s3 = run_checkpointed(corpus, out, num_partitions=P)
    assert s3["processed_partitions"] == []


def test_doc_partition_stable():
    assert doc_partition("doc-00000001", 16) == doc_partition("doc-00000001", 16)
    parts = {doc_partition(f"doc-{i:08d}", 8) for i in range(100)}
    assert len(parts) == 8  # spreads


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
