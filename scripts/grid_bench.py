"""Measure the reference's two benchmark grids on the TPU (VERDICT item 2).

Runs each (C, M, s) config of the jolt-demo (AND, C=8, M=2^16, N=2^128) and
halo2-comparison (AND, C=1, M=2^16) suites TWICE in-process: pass 1 pays
compiles + tunnel warm-up, pass 2 is the steady state a proving service
sees.  Appends one JSON line per config to the output file as it goes (the
grid takes a while; partial results survive interrupts).

Reference grids: /root/reference/src/benches/bench.rs:90-233.

Usage: python scripts/grid_bench.py [--suite jolt-demo|halo2-comparison]
           [--max-log-s N] [--out results.jsonl]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_config(strategy_name, c, m, s):
    from lasso_tpu.benches.bench import single_pass_lasso

    t0 = time.perf_counter()
    r1 = single_pass_lasso(strategy_name, c, m, s)
    cold_total = time.perf_counter() - t0
    r2 = single_pass_lasso(strategy_name, c, m, s)
    return {
        "strategy": strategy_name, "C": c,
        "log_m": (m - 1).bit_length(), "log_s": (s - 1).bit_length(),
        "prove_cold_s": round(r1.prove_s, 3),
        "verify_cold_s": round(r1.verify_s, 3),
        "prove_s": round(r2.prove_s, 3),
        "verify_s": round(r2.verify_s, 3),
        "cold_total_s": round(cold_total, 1),
        "lookups_per_s": round(s / r2.prove_s, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--suite", default="both",
                    choices=["jolt-demo", "halo2-comparison", "both"])
    ap.add_argument("--max-log-s", type=int, default=20)
    ap.add_argument("--min-log-s", type=int, default=10)
    ap.add_argument("--step", type=int, default=2)
    ap.add_argument("--out", default="grid_results.jsonl")
    args = ap.parse_args()

    suites = []
    if args.suite in ("jolt-demo", "both"):
        suites.append(("jolt-demo", 8))
    if args.suite in ("halo2-comparison", "both"):
        suites.append(("halo2-comparison", 1))

    for name, c in suites:
        for log_s in range(args.min_log_s, args.max_log_s + 1, args.step):
            t0 = time.perf_counter()
            try:
                rec = run_config("and", c, 1 << 16, 1 << log_s)
            except Exception as e:  # record OOM/compile failures, keep going
                rec = {"strategy": "and", "C": c, "log_m": 16,
                       "log_s": log_s, "error": repr(e)[:300]}
            rec["suite"] = name
            line = json.dumps(rec)
            print(line, flush=True)
            with open(args.out, "a") as f:
                f.write(line + "\n")
            print(f"  [{name} s=2^{log_s}] wall {time.perf_counter()-t0:.0f}s",
                  file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
