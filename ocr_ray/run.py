"""CLI entry point — the ``ray job submit`` surface of the engine.

    ray job submit --working-dir . -- \
        python -m ocr_ray.run --input /data/corpus --output /data/out \
            --partitions 256 --engine synth

Runs the flagship extraction checkpointed (partitioned output + manifest;
re-submitting the same command after a failure resumes, skipping finished
partitions at the input file list). Prints one JSON summary line.

This script OWNS the Ray session only when none exists (``ray job
submit`` normally provides one via the cluster; standalone runs
auto-init local). Library modules never call ray.init (driver contract).
"""
from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> dict:
    p = argparse.ArgumentParser(prog="ocr_ray.run", description=__doc__)
    p.add_argument("--input", required=True, help="corpus dir (parquet or .lance)")
    p.add_argument("--output", required=True, help="output dir (hive part=K/ + manifest)")
    p.add_argument("--engine", default="synth")
    p.add_argument("--partitions", type=int, default=16)
    p.add_argument("--partition-by", choices=["file", "hash"], default="file")
    p.add_argument("--max-partitions", type=int, default=None,
                   help="cap partitions this run (resume later for the rest)")
    p.add_argument("--no-checkpoint", action="store_true",
                   help="single-shot write_parquet, no manifest/resume")
    p.add_argument("--salted", choices=["auto", "on", "off"], default="auto",
                   help="salted premerge for pathologically heavy docs: "
                        "auto = corpus sample probe, on/off force it")
    args = p.parse_args(argv)
    salted = {"auto": None, "on": True, "off": False}[args.salted]

    import os

    if args.no_checkpoint and os.path.isdir(args.output) and os.listdir(args.output):
        # refuse BEFORE paying Ray startup: write_parquet appends, so a
        # rerun into a non-empty dir would silently duplicate rows
        raise SystemExit(
            f"--no-checkpoint refuses non-empty output dir {args.output!r} "
            "(a rerun would append duplicate rows); clear it, pick a fresh "
            "dir, or drop --no-checkpoint to get resumable semantics"
        )

    import ray

    owns = not ray.is_initialized()
    if owns:
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    from .config import PipelineConfig

    cfg = None if salted is None else PipelineConfig(salt_premerge=salted)
    try:
        if args.no_checkpoint:
            from .pipelines.extraction import run_extraction

            import time

            t0 = time.time()
            run_extraction(args.input, output_path=args.output,
                           engine_name=args.engine, cfg=cfg)
            import pyarrow.dataset as pads

            rows = pads.dataset(args.output, format="parquet").count_rows()
            secs = time.time() - t0
            summary = {"rows": rows, "wall_time_sec": round(secs, 3),
                       "docs_per_sec": round(rows / max(secs, 1e-9), 3)}
        else:
            from .state.checkpoint import run_checkpointed

            summary = run_checkpointed(
                args.input, args.output,
                num_partitions=args.partitions,
                engine_name=args.engine,
                cfg=cfg,
                partition_by=args.partition_by,
                max_partitions_this_run=args.max_partitions,
            )
    finally:
        if owns:
            ray.shutdown()
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    sys.exit(0 if main() is not None else 1)
