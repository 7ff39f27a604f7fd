#!/usr/bin/env python
"""Round-5 chain bench-slot finisher (installed as $SNAP/bench.py).

The v4 night chain (scripts/tpu_night_r5c.sh) reserves its last ~40 min
for `python bench.py`. Tonight's relay weather runs the canonical legs
~25% slower than v3 (0.84-0.93 vs 0.64-0.73 s/iter), so the 20k run may
reach ~18-19k when the leg loop's budget guard trips — and the chain
would then skip the dense eval, the round's #1 deliverable
(/root/reference/code/run_Panc.sh -> test_Pancreas.py:58-72).

This script makes the bench slot adaptive:
  * if the chain already ran the dense eval (test_eval_r5.log exists,
    i.e. training DID reach 20000 in time), exec the real bench.py
    (kept as bench_real.py) — the normal confirm;
  * otherwise: resume-legs until iteration 20000 or the leg deadline,
    then run the dense offline eval on the best checkpoint, copy the
    artifacts into /root/repo/bench_results, commit them, and print one
    JSON line. The driver's round-end bench.py run (repo copy,
    untouched) remains the official perf number.

All deadlines are absolute epochs chosen so the chain ends before the
round driver needs the TPU.
"""
from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys
import time

SNAP = os.path.dirname(os.path.abspath(__file__))
REPO = "/root/repo"
WORK = os.path.join(REPO, ".scratch", "canon20k")
DATA = os.path.join(WORK, "Pancreas")
RUNS = os.path.join(WORK, "runs")

# Deadlines extended at 05:50 UTC (mirrored into the live snapshot copy
# before its bench slot fired): the follow-on builder session owns the
# TPU window well past the chain's original 09:45 hard-stop guess, so
# the run can actually REACH 20000 and the dense eval isn't squeezed
# against a subprocess kill (a timeout kill mid-compile risks wedging
# the relay, CLAUDE.md). The tail orchestrator
# (scripts/tpu_tail_r5_final.sh) reruns the eval if it is skipped here.
LEG_DEADLINE = 1787220600  # 10:10 UTC — no new training leg work past this
EVAL_START_CUTOFF = 1787220600  # 10:10 UTC — still worth starting the eval
HARD_ABORT = 1787223000  # 10:50 UTC — subprocess timeout bound


def say(msg: str) -> None:
    print(f"[finisher {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def last_iter() -> int:
    it = 0
    for path in glob.glob(os.path.join(WORK, "leg*.log")):
        try:
            with open(path) as f:
                for m in re.finditer(r"Iteration (\d+) :", f.read()):
                    it = max(it, int(m.group(1)))
        except OSError:
            pass
    return it


def commit_artifacts(msg: str) -> None:
    subprocess.run(["git", "-C", REPO, "add", "bench_results"], check=False)
    r = subprocess.run(
        ["git", "-C", REPO, "diff", "--cached", "--quiet"], check=False
    )
    if r.returncode != 0:
        subprocess.run(["git", "-C", REPO, "commit", "-q", "-m", msg], check=False)
        say(f"committed: {msg}")


def refresh_metrics() -> None:
    runs = glob.glob(os.path.join(RUNS, "PancreasCT", "*max_iterations20000*"))
    if runs:
        src = os.path.join(runs[0], "metrics.jsonl")
        dst = os.path.join(REPO, "bench_results", "r05_canonical20k_metrics.jsonl")
        try:
            with open(src, "rb") as f, open(dst, "wb") as g:
                g.write(f.read())
        except OSError:
            pass


def main() -> None:
    # Case 1: the chain already evaluated — defer to the real bench.
    if os.path.exists(os.path.join(WORK, "test_eval_r5.log")):
        say("dense eval already done by the chain — running the real bench")
        os.execv(sys.executable, [sys.executable, os.path.join(SNAP, "bench_real.py")])

    it = last_iter()
    say(f"bench slot repurposed: training is at iteration {it}/20000")
    leg = 0
    while it < 20000 and time.time() < LEG_DEADLINE:
        budget = min(1500, int(LEG_DEADLINE - time.time()))
        if budget < 180:
            break
        say(f"finishing leg F{leg}: from iter {it}, budget {budget}s")
        log = os.path.join(WORK, f"legF{leg}.log")
        try:
            with open(log, "w") as f:
                subprocess.run(
                    [sys.executable, "-u", "-m",
                     "dycon_paper_replication_tpu.cli.train_pancreas",
                     "--root_dir", DATA, "--snapshot_root", RUNS,
                     "--max_iterations", "20000", "--save_every", "1000",
                     "--compute_dtype", "bfloat16", "--resume", "auto",
                     "--time_budget_s", str(budget)],
                    cwd=SNAP, stdout=f, stderr=subprocess.STDOUT,
                    timeout=max(300.0, HARD_ABORT - time.time()), check=False,
                )
        except subprocess.TimeoutExpired:
            # last-resort bound only (the leg's internal --time_budget_s
            # should always exit first); the session is about to end
            say("finishing leg hit the hard abort bound")
            break
        new_it = last_iter()
        say(f"finishing leg F{leg}: iter {it} -> {new_it}")
        refresh_metrics()
        if new_it <= it:
            say("no progress — stopping the finishing loop")
            break
        it = new_it
        leg += 1
        time.sleep(15)

    result = {"metric": "canonical20k_finisher", "unit": "iterations",
              "value": it, "vs_baseline": it / 20000.0}

    if time.time() < EVAL_START_CUTOFF:
        say(f"dense offline eval on best checkpoint (reached iter {it})")
        eval_log = os.path.join(WORK, "test_eval_r5.log")
        try:
            with open(eval_log, "w") as f:
                subprocess.run(
                    [sys.executable, "-u", "-m",
                     "dycon_paper_replication_tpu.cli.test_pancreas",
                     "--root_path", DATA, "--snapshot_root", RUNS,
                     "--max_iterations", "20000"],
                    cwd=SNAP, stdout=f, stderr=subprocess.STDOUT,
                    timeout=max(300, HARD_ABORT - time.time()), check=False,
                )
        except subprocess.TimeoutExpired:
            say("dense eval hit the hard abort bound")
        try:
            txt = open(eval_log).read()
            m = re.search(
                r"FINAL AVERAGE METRICS:\s*\n.*\n\s*([0-9.]+)\s+([0-9.]+)"
                r"\s+([0-9.]+)\s+([0-9.]+)", txt)
            if m:
                result["dense_eval"] = {
                    "dice": float(m.group(1)), "jaccard": float(m.group(2)),
                    "hd95": float(m.group(3)), "asd": float(m.group(4)),
                }
            with open(os.path.join(REPO, "bench_results",
                                   "r05_canonical20k_test_eval.log"), "w") as g:
                g.write(txt)
        except OSError:
            pass
    refresh_metrics()
    commit_artifacts(
        f"Canonical 20k: finishing legs to iter {it} + dense offline eval"
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
