"""Checkpoint manifest + resumable partitioned extraction runs.

What "resumable from checkpoint" means for a batch pipeline
(SURVEY.md §4.2): output is laid out as one hive partition per
deterministic unit of input (``part=K/``), plus a small JSON manifest
recording, per partition: status, row count, throughput and the input
fingerprint. On restart, partitions already marked done are skipped and
their files are left untouched; unfinished partitions have their
directories cleared first, so a crash mid-write can never leave
duplicates.

Two partition granularities:

- ``partition_by="file"`` (the 100 TB path): partition K = every K-th
  input file. Resume passes ONLY the unfinished partitions' files to
  ``read_parquet`` — finished partitions are skipped at the FILE LIST,
  so a resume's read volume drops proportionally to what's already
  done (zero scan amplification). The partition id rides through the
  pipeline as a passthrough column; no per-row hashing at all.
- ``partition_by="hash"``: partition K = crc32(doc_id) % P, for inputs
  whose file layout is not a usable unit (one giant file, or doc_ids
  must co-locate regardless of source file). Resume re-reads the input
  but filters rows with a VECTORIZED crc32 (byte-matrix kernel below —
  a loop over byte positions, never over rows).

This replaces the reference's Redis job store + stale-job sweep
(app/services/job_service.py:47-228) with immutable files — the only
state a multi-node Ray job needs.
"""
from __future__ import annotations

import json
import os
import shutil
import time
import zlib

import numpy as np
import pyarrow.dataset as pads
import ray

from ..config import PipelineConfig
from ..pipelines.extraction import build_extraction
from ..sources import read_docs

__all__ = ["doc_partition", "crc32_batch", "Manifest", "run_checkpointed"]


def doc_partition(doc_id: str, num_partitions: int) -> int:
    """Stable partition key (independent of PYTHONHASHSEED / process)."""
    return zlib.crc32(doc_id.encode("utf-8")) % num_partitions


_CRC_TAB: np.ndarray | None = None


def _crc_table() -> np.ndarray:
    global _CRC_TAB
    if _CRC_TAB is None:
        t = np.arange(256, dtype=np.uint32)
        for _ in range(8):
            t = np.where(t & 1, np.uint32(0xEDB88320) ^ (t >> 1), t >> 1)
        _CRC_TAB = t
    return _CRC_TAB


def crc32_batch(ids) -> np.ndarray:
    """Vectorized ``zlib.crc32`` over a sequence of str (or bytes)
    ids: pack into one fixed-width byte matrix, then run the
    table-driven CRC as a loop over BYTE POSITIONS (<= max id length).
    The only per-row Python work is one ``len()`` pass — LOAD-BEARING
    for correctness, do not replace with byte-matrix length inference:
    numpy S-dtype padding is indistinguishable from a real trailing
    ``\\x00``, which would silently drop suffix NUL bytes and diverge
    from zlib.crc32/doc_partition. Non-ASCII ids fall back to the
    per-row zlib path (numpy's U->S cast is ASCII-only)."""
    if isinstance(ids, np.ndarray) and ids.dtype.kind == "S":
        raise TypeError(
            "crc32_batch takes a sequence of str/bytes objects, not an "
            "S-dtype array (indexing one strips trailing NULs, losing bytes)"
        )
    ids = list(ids)  # materialize once: generators, pandas, object arrays
    try:
        arr = np.asarray(ids, dtype="S")
    except UnicodeEncodeError:
        return np.array(
            [zlib.crc32(str(d).encode("utf-8")) for d in ids], dtype=np.uint32
        )
    if arr.size == 0:
        return np.zeros(0, dtype=np.uint32)
    width = arr.dtype.itemsize
    mat = arr.view(np.uint8).reshape(len(arr), width)
    lengths = np.fromiter(map(len, ids), dtype=np.int64, count=len(arr))
    tab = _crc_table()
    crc = np.full(len(arr), 0xFFFFFFFF, np.uint32)
    for j in range(width):
        active = lengths > j
        nxt = tab[(crc ^ mat[:, j]) & np.uint32(0xFF)] ^ (crc >> np.uint32(8))
        crc = np.where(active, nxt, crc)
    return crc ^ np.uint32(0xFFFFFFFF)


def _fingerprint(input_path: str) -> str:
    """Cheap input fingerprint: file names + sizes."""
    parts = []
    if os.path.isdir(input_path):
        for name in sorted(os.listdir(input_path)):
            full = os.path.join(input_path, name)
            if os.path.isfile(full):
                parts.append(f"{name}:{os.path.getsize(full)}")
    else:
        parts.append(f"{os.path.basename(input_path)}:{os.path.getsize(input_path)}")
    return format(zlib.crc32(";".join(parts).encode()), "08x")


class Manifest:
    """Per-partition lineage + metrics record, JSON on disk, written
    atomically (temp + rename)."""

    def __init__(self, output_dir: str):
        # "_" prefix: ignored by pyarrow/Ray parquet dataset discovery
        self.path = os.path.join(output_dir, "_manifest.json")
        self.data: dict = {"partitions": {}}
        if os.path.exists(self.path):
            with open(self.path) as fh:
                self.data = json.load(fh)

    def done_partitions(self, fingerprint: str) -> set[int]:
        return {
            int(k)
            for k, v in self.data["partitions"].items()
            if v.get("status") == "done" and v.get("fingerprint") == fingerprint
        }

    def check_scheme(
        self, partition_by: str, num_partitions: int, fingerprint: str | None = None
    ) -> None:
        """A partition index only names a document set RELATIVE to the
        partitioning scheme; resuming an output dir under a different
        scheme would silently skip/duplicate documents. Refuse instead.

        Only partitions recorded against the CURRENT input fingerprint
        participate: when the input legitimately changed, the stale
        records are dead weight (done_partitions already ignores them,
        every partition recomputes) and must not veto a re-clamped or
        re-chosen scheme for the new input."""
        for k, v in self.data["partitions"].items():
            if fingerprint is not None and v.get("fingerprint") != fingerprint:
                continue
            lin = v.get("lineage") or {}
            prev_by = lin.get("partition_by")
            prev_n = lin.get("num_partitions")
            if prev_by is None:
                continue
            if prev_by != partition_by or prev_n != num_partitions:
                raise ValueError(
                    f"output dir was checkpointed with partition_by="
                    f"{prev_by!r}, num_partitions={prev_n} (partition {k}); "
                    f"resuming with partition_by={partition_by!r}, "
                    f"num_partitions={num_partitions} would skip or duplicate "
                    "documents — pass the original settings or use a fresh "
                    "output dir"
                )

    def mark_done(
        self,
        part: int,
        fingerprint: str,
        rows: int,
        secs: float,
        docs_per_sec: float,
        lineage: dict | None = None,
    ) -> None:
        rec = {
            "status": "done",
            "fingerprint": fingerprint,
            "rows": rows,
            "wall_time_sec": round(secs, 3),
            "docs_per_sec": round(docs_per_sec, 3),
            "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        if lineage:
            rec["lineage"] = lineage
        self.data["partitions"][str(part)] = rec

    def save(self) -> None:
        tmp = self.path + ".tmp"
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        with open(tmp, "w") as fh:
            json.dump(self.data, fh, indent=1, sort_keys=True)
        os.replace(tmp, self.path)


def _count_rows(output_dir: str, part: int) -> int:
    part_dir = os.path.join(output_dir, f"part={part}")
    if not os.path.isdir(part_dir):
        return 0
    ds = pads.dataset(part_dir, format="parquet")
    return sum(f.count_rows() for f in ds.get_fragments())


def _input_files(input_path: str) -> list[str]:
    if os.path.isdir(input_path):
        return sorted(
            os.path.join(input_path, n)
            for n in os.listdir(input_path)
            if n.endswith(".parquet")
        )
    return [input_path]


def run_checkpointed(
    input_path: str,
    output_dir: str,
    num_partitions: int = 16,
    engine_name: str = "synth",
    cfg: PipelineConfig | None = None,
    max_partitions_this_run: int | None = None,
    partition_by: str = "file",
) -> dict:
    """One (possibly partial) run. Returns a summary dict. Call again
    after a crash / with a larger ``max_partitions_this_run`` to finish;
    finished partitions are skipped — at the input FILE LIST in
    ``partition_by="file"`` mode (resume reads only unfinished
    partitions' files), at a vectorized row filter in ``"hash"`` mode.

    INVARIANT for ``partition_by="file"``: each doc_id must live in
    exactly ONE input file. The file owns the doc, so a doc_id spanning
    files owned by different partitions would emit one stitched row in
    a one-shot run but one row PER owning partition after a partial-run
    resume (the stitch only sees spans within a partition's files). For
    inputs where doc_ids repeat across files, use
    ``partition_by="hash"`` — it co-locates a doc_id's rows regardless
    of source file."""
    if partition_by not in ("file", "hash"):
        raise ValueError(f"partition_by must be 'file' or 'hash', got {partition_by!r}")
    os.makedirs(output_dir, exist_ok=True)
    loose = [n for n in os.listdir(output_dir)
             if n.endswith(".parquet") and not n.startswith("_")]
    if loose:
        # an output dir holding non-partitioned parquet (e.g. from a
        # prior --no-checkpoint run) would be read as old+new rows by
        # any dataset consumer — refuse rather than silently mix
        raise ValueError(
            f"output dir {output_dir!r} contains loose parquet files "
            f"(e.g. {loose[0]!r}) that are not part of a checkpointed "
            "layout; clear it or use a fresh directory"
        )
    fp = _fingerprint(input_path)
    manifest = Manifest(output_dir)
    files = _input_files(input_path)
    if partition_by == "file":
        if not files or not any(f.endswith(".parquet") for f in files):
            # never report success over an input file mode cannot see
            # (.lance dir, hive-nested layout, typo'd path)
            raise ValueError(
                f"partition_by='file' found no top-level *.parquet files in "
                f"{input_path!r} — for .lance or nested layouts use "
                "partition_by='hash' (reads via read_docs), or point at the "
                "directory that holds the parquet shards"
            )
        num_partitions = min(num_partitions, len(files))
    manifest.check_scheme(partition_by, num_partitions, fp)
    # purge stale partitions BEFORE planning: records written against a
    # DIFFERENT input fingerprint are dead weight for resume (every
    # partition recomputes) — but their part=K directories would be read
    # by any dataset consumer of output_dir ALONGSIDE the new data, and
    # indices K >= num_partitions are never revisited by the todo loop
    # at all (a resume with fewer partitions would silently mix old and
    # new rows). Delete dir + manifest entry for both classes, and sweep
    # orphan part=K dirs (K >= num_partitions) left by a crash before
    # mark_done under an older scheme.
    stale = [k for k, v in manifest.data["partitions"].items()
             if v.get("fingerprint") != fp or int(k) >= num_partitions]
    for k in stale:
        shutil.rmtree(os.path.join(output_dir, f"part={int(k)}"),
                      ignore_errors=True)
        manifest.data["partitions"].pop(k)
    for name in os.listdir(output_dir):
        if name.startswith("part="):
            try:
                idx = int(name.split("=", 1)[1])
            except ValueError:
                continue
            if idx >= num_partitions:
                shutil.rmtree(os.path.join(output_dir, name),
                              ignore_errors=True)
    if stale:
        manifest.save()
    done = manifest.done_partitions(fp)
    todo = [p for p in range(num_partitions) if p not in done]
    if max_partitions_this_run is not None:
        todo = todo[:max_partitions_this_run]
    if not todo:
        return {"processed_partitions": [], "skipped_partitions": sorted(done),
                "rows": 0, "files_read": 0, "files_total": len(files)}

    # idempotence: clear any partial output of unfinished partitions
    for p in todo:
        shutil.rmtree(os.path.join(output_dir, f"part={p}"), ignore_errors=True)

    P = num_partitions
    t0 = time.time()
    files_read = len(files)
    # resolve the "auto" skew probe HERE too (build_extraction has no
    # input path to sample) — the checkpointed/CLI surface gets the same
    # salted-premerge auto-enablement as run_extraction
    cfg = cfg or PipelineConfig()
    salted = None
    if cfg.salt_premerge == "auto":
        from ..pipelines.extraction import _sample_max_units

        salted = _sample_max_units(input_path) > cfg.salt_auto_units
    if partition_by == "file":
        # partition p owns every P-th input file; resume reads ONLY the
        # todo partitions' files and tags p as a doc-level passthrough
        # column — no per-row hashing, no scan of finished partitions
        import pyarrow as pa

        def tag(p: int):
            def f(batch: pa.Table) -> pa.Table:
                return batch.append_column(
                    "part", pa.array(np.full(batch.num_rows, p, np.int32))
                )

            return f

        groups = {p: files[p::P] for p in todo}
        files_read = sum(len(g) for g in groups.values())
        per_part = [
            read_docs(groups[p]).map_batches(tag(p), batch_format="pyarrow")
            for p in todo
            if groups[p]
        ]
        ds = per_part[0].union(*per_part[1:]) if len(per_part) > 1 else per_part[0]
        out = build_extraction(ds, engine_name=engine_name, cfg=cfg,
                               salted=salted, passthrough=["part"])
    else:
        todo_arr = np.zeros(P, dtype=bool)
        todo_arr[todo] = True

        def keep_todo(batch):
            parts = crc32_batch(
                batch.column("doc_id").to_numpy(zero_copy_only=False)
            ) % P
            return batch.filter(pa_mask(todo_arr[parts]))

        def add_part(batch):
            import pyarrow as pa

            parts = crc32_batch(
                batch.column("doc_id").to_numpy(zero_copy_only=False)
            ) % P
            return batch.append_column("part", pa.array(parts.astype(np.int32)))

        def pa_mask(m: np.ndarray):
            import pyarrow as pa

            return pa.array(m)

        ds = read_docs(input_path).map_batches(keep_todo, batch_format="pyarrow")
        out = build_extraction(ds, engine_name=engine_name, cfg=cfg, salted=salted)
        out = out.map_batches(add_part, batch_format="pyarrow")
    out.write_parquet(output_dir, partition_cols=["part"])
    secs = max(time.time() - t0, 1e-9)

    from dataclasses import asdict

    engine_cfg = None
    try:
        from ..config import get_engine

        engine_cfg = format(
            zlib.crc32(json.dumps(asdict(get_engine(engine_name)), sort_keys=True).encode()),
            "08x",
        )
    except Exception:  # noqa: BLE001 - lineage is best-effort metadata
        pass
    lineage = {"engine": engine_name, "engine_config_crc": engine_cfg,
               "num_partitions": num_partitions, "partition_by": partition_by}
    per_part_rows = {p: _count_rows(output_dir, p) for p in todo}
    total_rows = sum(per_part_rows.values())
    for p in todo:
        part_lineage = dict(lineage)
        if partition_by == "file":
            # input provenance: exactly which files this partition owns
            # (resume debugging / re-derivation without rehashing)
            part_lineage["input_files"] = [
                os.path.basename(f) for f in files[p::P]
            ]
        manifest.mark_done(
            p, fp, per_part_rows[p], secs / len(todo),
            total_rows / secs / len(todo), lineage=part_lineage,
        )
    manifest.save()
    _ = ray  # session owned by caller
    return {
        "processed_partitions": todo,
        "skipped_partitions": sorted(done),
        "rows": total_rows,
        "wall_time_sec": round(secs, 3),
        "docs_per_sec": round(total_rows / secs, 3),
        "files_read": files_read,
        "files_total": len(files),
    }
