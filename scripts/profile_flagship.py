"""Profile the flagship shape (AND, C=1, M=2^16, s=2^14) twice in-process.

Pass 1 pays compiles + tunnel first-contact; pass 2 is steady state.  Prints
the span tree of pass 2 only, which is the per-phase profile that matters
for a proving service.

Usage: python scripts/profile_flagship.py [log_s] [c]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lasso_tpu.benches.bench import single_pass_lasso
from lasso_tpu.utils.tracing import print_span_tree, reset_spans


def main():
    log_s = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    s = 1 << log_s

    t0 = time.perf_counter()
    r1 = single_pass_lasso("and", c, 1 << 16, s)
    print(f"pass1 (cold): prove {r1.prove_s:.2f}s verify {r1.verify_s:.2f}s "
          f"(total incl. setup {time.perf_counter() - t0:.1f}s)", flush=True)

    reset_spans()
    r2 = single_pass_lasso("and", c, 1 << 16, s)
    print(f"pass2 (warm): prove {r2.prove_s:.2f}s verify {r2.verify_s:.2f}s",
          flush=True)
    print_span_tree(file=sys.stdout)


if __name__ == "__main__":
    main()
