#!/usr/bin/env python
"""Summarize the round-5 canonical 20k Pancreas run into markdown.

Parses the night-chain artifacts (metrics.jsonl TB-tag stream, chain
orchestrator log, dense offline eval log) and prints the rows for the
BASELINE.md "full canonical run" section. Pure-host, O(file size) — safe
to run next to a live TPU leg on the 1-core VM.

Protocol being evidenced: /root/reference/code/run_Panc.sh (20k iters,
labelnum 12, bs 8, patch 112x112x96) followed by test_Pancreas.py:58-72
(dense sliding-window eval on the best checkpoint).

Usage: python scripts/summarize_canon20k.py \
    [--metrics bench_results/r05_canonical20k_metrics.jsonl] \
    [--chain bench_results/r05_night_chain.log] \
    [--eval bench_results/r05_canonical20k_test_eval.log]
"""
from __future__ import annotations

import argparse
import json
import re
import statistics


def load_metrics(path):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--metrics", default="bench_results/r05_canonical20k_metrics.jsonl")
    ap.add_argument("--chain", default="bench_results/r05_night_chain.log")
    ap.add_argument("--eval", dest="eval_log",
                    default="bench_results/r05_canonical20k_test_eval.log")
    args = ap.parse_args()

    rows = load_metrics(args.metrics)
    by_tag = {}
    for r in rows:
        by_tag.setdefault(r["tag"], []).append((r["step"], r["value"]))

    max_step = max(s for s, _ in by_tag["info/loss"])
    val = sorted(by_tag.get("info/Dice", []))
    best = max((v for _, v in val), default=float("nan"))
    sps = [v for _, v in by_tag.get("perf/steps_per_sec", [])]
    p50 = [v for _, v in by_tag.get("perf/step_ms_p50", [])]
    rss = [v for _, v in by_tag.get("perf/host_rss_gb", [])]

    print(f"max training iteration reached : {max_step}")
    print(f"validations (every 200 iters)  : {len(val)}")
    print(f"best val Dice                  : {best:.5f}")
    if val:
        milestones = [s for s in (1000, 2000, 5000, 10000, 15000, 20000) if s <= max_step]
        curve = {s: v for s, v in val}
        line = ", ".join(
            f"{m}:{curve[max(k for k in curve if k <= m)]:.4f}" for m in milestones
        )
        print(f"val Dice at milestones         : {line}")
    if sps:
        print(f"steps/sec median (35-val win)  : {statistics.median(sps):.4f}"
              f"  -> wall/iter {1.0/statistics.median(sps):.3f} s")
    if p50:
        # under the pipelined loop (fetch_ahead=1, the TPU default) this
        # timer spans dispatch -> deferred fetch, i.e. ~2 device steps +
        # host overhead — NOT the bare step time (416 ms for this config,
        # BASELINE.md); it is the per-iteration pipeline latency.
        print(f"dispatch->fetch latency ms p50 : {statistics.median(p50):.1f}"
              f"  (~2 steps under fetch_ahead=1)")
    if rss:
        print(f"host RSS GB (min/median/max)   : {min(rss):.1f}/"
              f"{statistics.median(rss):.1f}/{max(rss):.1f}")

    # leg boundaries from the chain log
    try:
        legs = []
        chain_lines = list(open(args.chain))
        # auxiliary leg sources: the bench-slot finisher logs to stderr
        # (captured as bench_r5.err) and the tail orchestrator keeps its
        # own log — scan them too when present
        for extra in (
            ".scratch/canon20k/bench_r5.err",
            "bench_results/r05_finisher.log",
            "bench_results/r05_tail_final.log",
        ):
            try:
                chain_lines += list(open(extra))
            except OSError:
                pass
        for line in chain_lines:
            # chain legs: "leg3 rc=0: iter X -> Y"; bench-slot finisher
            # legs: "finishing leg F1: iter X -> Y"; tail-orchestrator
            # legs: "tail leg T0 rc=0: iter X -> Y"
            m = re.search(
                r"leg ?([FT]?\d+)(?: rc=(\d+))?: iter (\d+) -> (\d+)", line
            )
            if m:
                legs.append((m.group(1), m.group(2) or "-",
                             int(m.group(3)), int(m.group(4))))
        if legs:
            print("\nresume legs (leg rc from -> to):")
            for leg in legs:
                print(f"  leg{leg[0]} rc={leg[1]}: {leg[2]} -> {leg[3]}")
    except OSError:
        pass

    # dense offline eval table
    try:
        txt = open(args.eval_log).read()
        m = re.search(
            r"FINAL AVERAGE METRICS:\s*\n.*\n\s*([0-9.]+)\s+([0-9.]+)\s+([0-9.]+)\s+([0-9.]+)",
            txt,
        )
        ck = re.search(r"init weight from (.*)", txt)
        if m:
            d, j, hd, asd = (float(x) for x in m.groups())
            print("\ndense offline eval (patch 96^3, stride 16/4, best ckpt):")
            if ck:
                print(f"  checkpoint: {ck.group(1).strip()}")
            print(f"  | Dice | Jaccard | HD95 | ASD |")
            print(f"  |---|---|---|---|")
            print(f"  | {d:.5f} | {j:.5f} | {hd:.3f} | {asd:.5f} |")
    except OSError:
        print("\n(no dense eval log yet)")


if __name__ == "__main__":
    main()
