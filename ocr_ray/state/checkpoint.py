"""Checkpoint manifest + resumable partitioned extraction runs.

What "resumable from checkpoint" means for a batch pipeline
(SURVEY.md §4.2): output is laid out as one hive partition per
deterministic key range (``part=K/``, K = crc32(doc_id) % P), plus a
small JSON manifest recording, per partition: status, row count,
throughput and the input fingerprint. On restart, partitions already
marked done are filtered OUT of the input at the read stage and their
files are left untouched; unfinished partitions have their directories
cleared first, so a crash mid-write can never leave duplicates.

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

import pyarrow.dataset as pads
import ray

from ..config import PipelineConfig
from ..pipelines.extraction import build_extraction
from ..sources import read_docs

__all__ = ["doc_partition", "Manifest", "run_checkpointed"]


def doc_partition(doc_id: str, num_partitions: int) -> int:
    """Stable partition key (independent of PYTHONHASHSEED / process)."""
    return zlib.crc32(doc_id.encode("utf-8")) % num_partitions


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


def run_checkpointed(
    input_path: str,
    output_dir: str,
    num_partitions: int = 16,
    engine_name: str = "synth",
    cfg: PipelineConfig | None = None,
    max_partitions_this_run: int | None = None,
) -> dict:
    """One (possibly partial) run. Returns a summary dict. Call again
    after a crash / with a larger ``max_partitions_this_run`` to finish;
    finished partitions are skipped at the READ, not re-extracted."""
    os.makedirs(output_dir, exist_ok=True)
    fp = _fingerprint(input_path)
    manifest = Manifest(output_dir)
    done = manifest.done_partitions(fp)
    todo = [p for p in range(num_partitions) if p not in done]
    if max_partitions_this_run is not None:
        todo = todo[:max_partitions_this_run]
    if not todo:
        return {"processed_partitions": [], "skipped_partitions": sorted(done), "rows": 0}

    # idempotence: clear any partial output of unfinished partitions
    for p in todo:
        shutil.rmtree(os.path.join(output_dir, f"part={p}"), ignore_errors=True)

    todo_set = set(todo)
    P = num_partitions

    def keep_todo(batch):
        import pyarrow as pa

        ids = batch.column("doc_id").to_pylist()
        mask = pa.array([doc_partition(d, P) in todo_set for d in ids], pa.bool_())
        return batch.filter(mask)

    def add_part(batch):
        import pyarrow as pa

        ids = batch.column("doc_id").to_pylist()
        return batch.append_column(
            "part", pa.array([doc_partition(d, P) for d in ids], pa.int32())
        )

    t0 = time.time()
    ds = read_docs(input_path).map_batches(keep_todo, batch_format="pyarrow")
    out = build_extraction(ds, engine_name=engine_name, cfg=cfg)
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
               "num_partitions": num_partitions}
    per_part_rows = {p: _count_rows(output_dir, p) for p in todo}
    total_rows = sum(per_part_rows.values())
    for p in todo:
        manifest.mark_done(
            p, fp, per_part_rows[p], secs / len(todo),
            total_rows / secs / len(todo), lineage=lineage,
        )
    manifest.save()
    _ = ray  # session owned by caller
    return {
        "processed_partitions": todo,
        "skipped_partitions": sorted(done),
        "rows": total_rows,
        "wall_time_sec": round(secs, 3),
        "docs_per_sec": round(total_rows / secs, 3),
    }
