"""North-star benchmark: primary-sumcheck prove time at 2^24 lookups
(BASELINE.md target table; reference grid tops out at s=2^24 in the
halo2-comparison suite, src/benches/bench.rs:224-231).

Measures `prove_arbitrary` over the [E_1..E_alpha, eq] stack exactly as the
Surge prover runs it (surge.py), for the AND strategy.  C=1 gives the
halo2-comparison shape (alpha=1); pass c=8 for the jolt-demo collation
(alpha=8).  AND's g is linear in each E_i, so the sumcheck degree is
g_degree + 1 = 2 at any C.

Pass 1 pays compiles; pass 2 is steady state.

Usage: python scripts/sumcheck_northstar.py [log_s] [c]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    log_s = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    c = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    s = 1 << log_s
    m = 1 << 16

    import lasso_tpu.subtables.bitwise  # noqa: F401
    from lasso_tpu.field.jfield import JFr
    from lasso_tpu.subprotocols.sumcheck import prove_arbitrary
    from lasso_tpu.subtables.base import get_strategy
    from lasso_tpu.transcript.proof_transcript import ProofTranscript

    strategy = get_strategy("and", c, m)
    alpha = strategy.num_memories
    degree = strategy.sumcheck_poly_degree()
    comb = strategy.comb_eq_device()

    rng = np.random.default_rng(7)
    # E_i values are table entries (< M); eq row is field-sized -- model it
    # with random 64-bit values (the kernel cost is value-independent)
    stack_u64 = np.concatenate([
        rng.integers(0, m, size=(alpha, s)).astype(np.uint64),
        rng.integers(0, 1 << 63, size=(1, s)).astype(np.uint64)])
    zs = JFr.encode_u64_array(stack_u64)
    zs.block_until_ready()

    for label in ("cold", "warm"):
        t0 = time.perf_counter()
        proof, r, final_evals, _ = prove_arbitrary(
            zs, comb, degree, log_s, ProofTranscript(b"northstar"))
        dt = time.perf_counter() - t0
        print(f"{label}: sumcheck prove (alpha={alpha}, degree={degree}, "
              f"s=2^{log_s}): {dt:.3f}s  "
              f"({s / dt / 1e6:.2f}M lookups/s)", flush=True)


if __name__ == "__main__":
    main()
