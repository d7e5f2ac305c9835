"""Bench CLI (reference: src/main.rs).

    python -m lasso_tpu.cli --name jolt-demo [--chart] [--s-max 16]

--chart prints the texray-style nested span chart instead of per-pass lines.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="lasso-tpu")
    parser.add_argument("--name", required=True,
                        choices=["jolt-demo", "halo2-comparison"])
    parser.add_argument("--chart", action="store_true",
                        help="print a span-duration chart after the run")
    parser.add_argument("--s-min", type=int, default=None,
                        help="min log2 sparsity (default: suite default)")
    parser.add_argument("--s-max", type=int, default=None,
                        help="max log2 sparsity (default: suite default)")
    args = parser.parse_args(argv)

    from lasso_tpu.benches.bench import SUITES
    from lasso_tpu.utils.tracing import print_span_tree

    s_range = None
    if args.s_min is not None or args.s_max is not None:
        lo = args.s_min if args.s_min is not None else 10
        hi = args.s_max if args.s_max is not None else lo
        s_range = [1 << k for k in range(lo, hi + 1, 2)]

    results = SUITES[args.name](s_range)
    for r in results:
        print(f"{r.name}: prove {r.prove_s * 1e3:.1f}ms  "
              f"verify {r.verify_s * 1e3:.1f}ms")
    if args.chart:
        print_span_tree(file=sys.stdout)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
