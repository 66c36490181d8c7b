#!/usr/bin/env python
"""Benchmark harness.

Default: one timed run of the flagship extraction pipeline over the
deterministic synthetic interleaved corpus (size scaled to
$GRAFT_SF_DIR's sf) plus a representative query subset over the
testdata tables; prints ONE JSON line.

--scaling: runs the same headline job in two fresh processes at
num_cpus=8 and num_cpus=32 on identical input and reports both
throughputs + scaling efficiency (the sandbox stand-in for the
north rule's N vs 4N node clusters).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "pricing_summary",
    "revenue_topk",
    "order_priority_revenue",
    "hourly_user_windows",
    "dedup_exact",
    "dedup_minhash",
    "knn_bruteforce",
    "embedding_similar_pairs",
]


def corpus_for(sf: float) -> tuple[str, int]:
    n_docs = max(100, int(sf * 20_000))
    out = f"/tmp/ocr_ray_corpus/bench_sf{sf:g}"
    return out, n_docs


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from ocr_ray.pipelines.extraction import run_extraction
    from ocr_ray.synth.corpus import write_corpus
    from ocr_ray import queries as Q

    sf = float(os.path.basename(os.path.normpath(SF_DIR)).replace("sf", "") or 0.1)
    corpus_dir, n_docs = corpus_for(sf)
    write_corpus(corpus_dir, n_docs, seed=42, heavy_frac=0.01, n_files=32)

    # warm the page cache so we measure compute+shuffle, not first-read I/O
    ray.data.read_parquet(corpus_dir).count()

    t0 = time.time()
    out_dir = f"/tmp/ocr_ray_bench_out/{NUM_CPUS}"
    os.system(f"rm -rf {out_dir}")
    n_out = run_extraction(corpus_dir, output_path=out_dir).count()
    headline = time.time() - t0

    qtimes: dict[str, float] = {}
    for name in BENCH_QUERIES:
        t0 = time.time()
        res = Q.QUERIES[name](SF_DIR)
        if hasattr(res, "to_pandas") and not hasattr(res, "columns"):
            res.to_pandas()
        qtimes[name] = round(time.time() - t0, 3)

    result = {
        "metric": "extraction_wall_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "docs": n_out,
        "docs_per_sec": round(n_out / headline, 3),
        "queries": qtimes,
        "sf": sf,
        "num_cpus": NUM_CPUS,
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo = one(lo)
    r_hi = one(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "num_cpus_lo": lo,
        "num_cpus_hi": hi,
        "sec_lo": r_lo["value"],
        "sec_hi": r_hi["value"],
        "docs_per_sec_lo": r_lo["docs_per_sec"],
        "docs_per_sec_hi": r_hi["docs_per_sec"],
        "sf": r_lo["sf"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
