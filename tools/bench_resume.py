#!/usr/bin/env python
"""Kill-and-resume at bench scale (VERDICT r4 item 4).

Protocol — three fresh processes over the SAME 5x corpus (40,000 docs /
256 files), num_partitions=16, partition_by=file:

1. ONE-SHOT reference: `python -m ocr_ray.run` over a clean output dir;
   wall time T_oneshot, output content C_oneshot.
2. KILLED run: a child process loops `run_checkpointed(...,
   max_partitions_this_run=4)` waves (manifest commits per wave) and is
   SIGKILLed — whole process group, simulating a node crash — at
   ~T_oneshot/2. Committed waves survive; the in-flight wave is lost.
3. RESUME: `python -m ocr_ray.run` again over the same output dir. It
   must (a) skip every committed partition AT THE INPUT FILE LIST
   (files_read proportional to remaining work — the state/checkpoint.py
   file-mode promise), (b) finish the rest, and (c) produce output
   CONTENT-IDENTICAL to the one-shot run (doc_id -> ordered span
   sequence + confidence).

Writes BENCH_resume_r5.json at the repo root. Run with an idle host —
wall times are the artifact.
"""
from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = "/tmp/ocr_ray_resume5x"
IN = f"{BASE}/in"
OUT_ONESHOT = f"{BASE}/oneshot"
OUT_KILLED = f"{BASE}/killed"
# env-overridable so the protocol can be smoke-tested small first
N_DOCS = int(os.environ.get("RESUME_DOCS", 40_000))
N_FILES = int(os.environ.get("RESUME_FILES", 256))
P = int(os.environ.get("RESUME_PARTS", 16))
WAVE = int(os.environ.get("RESUME_WAVE", 4))

_KILLED_CHILD = f"""
import json, sys
sys.path.insert(0, {REPO!r})
import ray
ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
import ray.data
ray.data.DataContext.get_current().enable_progress_bars = False
from ocr_ray.state.checkpoint import run_checkpointed
while True:
    s = run_checkpointed({IN!r}, {OUT_KILLED!r}, num_partitions={P},
                         max_partitions_this_run={WAVE})
    print("WAVE " + json.dumps(s), flush=True)
    if not s["processed_partitions"]:
        break
ray.shutdown()
"""


def _run_cli(output: str) -> tuple[float, dict]:
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "ocr_ray.run", "--input", IN,
         "--output", output, "--partitions", str(P)],
        cwd=REPO, capture_output=True, text=True, check=True,
    )
    secs = time.time() - t0
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    return secs, summary


def _content(output_dir: str) -> dict:
    import pyarrow.dataset as pads

    tbl = pads.dataset(output_dir, format="parquet", partitioning="hive") \
        .to_table()
    rows = {}
    for r in tbl.to_pylist():
        spans = tuple(
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in sorted(r["spans"], key=lambda s: s["offset"])
        )
        rows[r["doc_id"]] = (spans, round(float(r.get("confidence", 0.0)), 9))
    return rows


def main() -> dict:
    from ocr_ray.synth.corpus import write_corpus

    write_corpus(IN, N_DOCS, seed=77, heavy_frac=0.01, n_files=N_FILES)
    for d in (OUT_ONESHOT, OUT_KILLED):
        subprocess.run(["rm", "-rf", d], check=True)

    t_oneshot, s_oneshot = _run_cli(OUT_ONESHOT)
    print(f"one-shot: {t_oneshot:.1f}s {s_oneshot}", flush=True)

    # killed run: own process GROUP so SIGKILL takes the Ray daemons too
    child = subprocess.Popen(
        [sys.executable, "-c", _KILLED_CHILD], cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        start_new_session=True,
    )
    kill_after = t_oneshot * 0.5
    time.sleep(kill_after)
    os.killpg(os.getpgid(child.pid), signal.SIGKILL)
    child.wait()
    print(f"killed child after {kill_after:.1f}s", flush=True)

    with open(os.path.join(OUT_KILLED, "_manifest.json")) as fh:
        done_at_kill = sorted(
            int(k) for k, v in json.load(fh)["partitions"].items()
            if v.get("status") == "done"
        )
    print(f"partitions committed at kill: {done_at_kill}", flush=True)
    assert 0 < len(done_at_kill) < P, (
        "kill point must land mid-job for the experiment to mean anything"
    )

    t_resume, s_resume = _run_cli(OUT_KILLED)
    print(f"resume: {t_resume:.1f}s {s_resume}", flush=True)
    assert sorted(s_resume["skipped_partitions"]) == done_at_kill
    assert sorted(s_resume["processed_partitions"]) == sorted(
        set(range(P)) - set(done_at_kill))
    # file-mode promise: resume reads ONLY the unfinished partitions'
    # files — read volume proportional to remaining work. Derive the
    # expectation from the ACTUAL shard count (write_corpus ceil-splits,
    # so n_files is an upper bound: 40,000/256 packs into 255 shards)
    ft = s_resume["files_total"]
    expected_files = sum(
        len(range(p, ft, P)) for p in s_resume["processed_partitions"]
    )
    assert s_resume["files_read"] == expected_files, (
        s_resume["files_read"], expected_files)

    a, b = _content(OUT_ONESHOT), _content(OUT_KILLED)
    assert a == b, "resume output differs from the one-shot run"

    frac_remaining = (P - len(done_at_kill)) / P
    result = {
        "metric": "kill_and_resume_5x_corpus",
        "unit": "sec",
        "docs": N_DOCS,
        "n_files": N_FILES,
        "num_partitions": P,
        "t_oneshot_sec": round(t_oneshot, 3),
        "t_killed_at_sec": round(kill_after, 3),
        "partitions_done_at_kill": len(done_at_kill),
        "t_resume_sec": round(t_resume, 3),
        "resume_files_read": s_resume["files_read"],
        "files_total": s_resume["files_total"],
        "frac_work_remaining": round(frac_remaining, 3),
        "resume_over_oneshot": round(t_resume / t_oneshot, 3),
        "content_identical": True,
        "protocol": "single timed runs, idle host; SIGKILL of the whole "
                    f"process group mid-wave (waves of {WAVE} partitions, "
                    "manifest commits per wave)",
        "storage": "parquet (lance unavailable in sandbox)",
    }
    with open(os.path.join(REPO, "BENCH_resume_r5.json"), "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
