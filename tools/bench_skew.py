#!/usr/bin/env python
"""Skew stress at bench scale (VERDICT r4 item 5).

8,000 docs with 10% heavy 20-80-page PDFs, PLUS one planted
pathological ~4,000-page document (inside the first 512 rows so the
``salt_premerge="auto"`` probe's one-row-group sample sees it — corpora
whose pathological tail hides outside any sample must pass
``salted=True``, as documented in pipelines/extraction.py).

Shows three things, recorded in BENCH_skew_r5.json:
1. the auto probe TRIPS (_sample_max_units > salt_auto_units=2048);
2. forced-unsalted vs forced-salted wall times at 32 CPUs
   (page-granularity fan-out before the OCR pool is the primary skew
   defense; the salted premerge bounds the single-doc stitch task);
3. both paths produce content-identical output.

Run on an idle host; single timed runs per path after a warm-up.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_DOCS = int(os.environ.get("SKEW_DOCS", 8_000))
N_FILES = 64
PLANT_IDX = 123       # inside the probe's 512-row sample window
PLANT_PAGES = int(os.environ.get("SKEW_PAGES", 4_000))
BASE = f"/tmp/ocr_ray_skew_{N_DOCS}_{PLANT_PAGES}"
IN = f"{BASE}/in"


def build_corpus() -> None:
    import pyarrow.parquet as pq

    from ocr_ray.synth import media
    from ocr_ray.synth.corpus import DOC_SCHEMA, generate_docs

    marker = os.path.join(IN, f"_SKEW_{N_DOCS}_{N_FILES}_{PLANT_PAGES}")
    if os.path.exists(marker):
        return
    subprocess.run(["rm", "-rf", IN], check=True)
    os.makedirs(IN, exist_ok=True)
    docs = generate_docs(N_DOCS, seed=5, heavy_frac=0.1).to_pylist()
    d = docs[PLANT_IDX]
    d["spans"] = [{
        "kind": "pdf", "text": "",
        "media_ref": media.build_pdf_ref(d["doc_id"], 0, PLANT_PAGES, seed=99),
        "offset": 0,
    }]
    import pyarrow as pa

    per = -(-len(docs) // N_FILES)
    for i in range(N_FILES):
        chunk = docs[i * per:(i + 1) * per]
        if not chunk:
            break
        pq.write_table(pa.Table.from_pylist(chunk, schema=DOC_SCHEMA),
                       os.path.join(IN, f"docs-{i:05d}.parquet"))
    open(marker, "w").close()


_CHILD = """
import json, sys, time
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
import ray.data
ray.data.DataContext.get_current().enable_progress_bars = False
from ocr_ray.config import PipelineConfig
from ocr_ray.pipelines.extraction import run_extraction
cfg = PipelineConfig(salt_premerge={salted})
t0 = time.time()
run_extraction({inp!r}, output_path={out!r}, engine_name="synth", cfg=cfg)
print(json.dumps({{"wall": time.time() - t0}}))
ray.shutdown()
"""


def _run(salted: bool, out: str) -> float:
    subprocess.run(["rm", "-rf", out], check=True)
    proc = subprocess.run(
        [sys.executable, "-c",
         _CHILD.format(repo=REPO, salted=salted, inp=IN, out=out)],
        cwd=REPO, capture_output=True, text=True, check=True,
    )
    return json.loads(proc.stdout.strip().splitlines()[-1])["wall"]


def _content(output_dir: str) -> dict:
    import pyarrow.dataset as pads

    tbl = pads.dataset(output_dir, format="parquet").to_table()
    rows = {}
    for r in tbl.to_pylist():
        spans = tuple(
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in sorted(r["spans"], key=lambda s: s["offset"])
        )
        rows[r["doc_id"]] = (spans, round(float(r.get("confidence", 0.0)), 9))
    return rows


def main() -> dict:
    build_corpus()

    from ocr_ray.config import PipelineConfig
    from ocr_ray.pipelines.extraction import _sample_max_units

    mx = _sample_max_units(IN)
    auto_trips = mx > PipelineConfig().salt_auto_units
    print(f"probe: max sampled units = {mx}, auto trips = {auto_trips}",
          flush=True)
    assert auto_trips, "planted doc must trip the auto probe"

    _run(False, f"{BASE}/warmup")  # page cache + worker imports
    t_unsalted = _run(False, f"{BASE}/unsalted")
    print(f"unsalted: {t_unsalted:.1f}s", flush=True)
    t_salted = _run(True, f"{BASE}/salted")
    print(f"salted:   {t_salted:.1f}s", flush=True)

    a = _content(f"{BASE}/unsalted")
    b = _content(f"{BASE}/salted")
    assert a == b, "salted and unsalted outputs must be identical"

    result = {
        "metric": f"skew_stress_{N_DOCS}docs_planted_{PLANT_PAGES}pages",
        "unit": "sec",
        "docs": N_DOCS,
        "planted_pages": PLANT_PAGES,
        "probe_max_units": mx,
        "auto_probe_trips": True,
        "t_unsalted_sec": round(t_unsalted, 3),
        "t_salted_sec": round(t_salted, 3),
        "salted_speedup": round(t_unsalted / t_salted, 3),
        "content_identical": True,
        "num_cpus": 32,
        "protocol": "single timed runs per path after one warm-up run, "
                    "idle host window",
        "storage": "parquet (lance unavailable in sandbox)",
    }
    tag = os.environ.get("SKEW_TAG", "")
    with open(os.path.join(REPO, f"BENCH_skew_r5{tag}.json"), "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
