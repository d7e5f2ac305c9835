"""MSM perf ladder (VERDICT round-2 item 6).

1. Window-size sweep of the device Pippenger kernel at n in {2^16, 2^18,
   2^20} with 16-bit scalars (the small-scalar workload) and full-width
   253-bit scalars at 2^20.
2. Native host Pippenger (single-core C++, lasso_tpu/native) at the same
   shapes -- the measurable FLOOR for the reference's CPU MSM, replacing the
   round-1 documented estimate.
3. A speed-of-light utilization estimate from the measured fused Montgomery
   multiply throughput (~1.5G muls/s: one padd = 9 Fp muls, hwcd 2008).

Usage: python scripts/msm_sweep.py [--host-only]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, reps=2):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def host_floor():
    """Native single-core host Pippenger at 2^16 (scaled estimate for 2^20:
    Pippenger is ~linear in n for fixed window plan)."""
    import numpy as np

    from lasso_tpu.curve.host import GENERATOR, msm_host
    from lasso_tpu.field.host import Fr

    rng = np.random.default_rng(1)
    out = {}
    for log_n in (14, 16):
        n = 1 << log_n
        pts = [GENERATOR.mul(i + 1) for i in range(64)]
        points = [pts[i % 64] for i in range(n)]
        scalars = [int(x) for x in rng.integers(0, 1 << 16, size=n)]
        dt = timed(lambda: msm_host(points, scalars), reps=1)
        out[f"host_msm_2^{log_n}_16bit_pts_per_s"] = round(n / dt, 1)

        scalars_full = [int.from_bytes(rng.bytes(32), "little") % Fr.p
                        for _ in range(n)]
        dt = timed(lambda: msm_host(points, scalars_full), reps=1)
        out[f"host_msm_2^{log_n}_fullwidth_pts_per_s"] = round(n / dt, 1)
    return out


def device_sweep():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lasso_tpu.curve.host import GENERATOR
    from lasso_tpu.curve.jcurve import from_host_points, to_host_point
    from lasso_tpu.field.jfield import JFr
    from lasso_tpu.ops.msm import _msm_kernel, window_plan

    rng = np.random.default_rng(12345)
    base = from_host_points([GENERATOR.mul(i + 1) for i in range(64)])

    baseline = jax.jit(lambda p: p[0, :1, :1])
    _ = np.asarray(baseline(base))
    t_base = min(timed(lambda: np.asarray(baseline(base)), reps=3), 1.0)

    results = {}
    for log_n, scalar_bits in [(16, 16), (18, 16), (20, 16), (20, 253)]:
        n = 1 << log_n
        reps_tile = -(-n // 64)
        points = jnp.tile(base, (1, 1, reps_tile))[..., :n]
        if scalar_bits == 16:
            sc = JFr.to_int_limbs(JFr.encode_u64_array(
                rng.integers(0, 1 << 16, size=n).astype(np.uint64)))
        else:
            from lasso_tpu.field.host import Fr
            vals = [int.from_bytes(rng.bytes(32), "little") % Fr.p
                    for _ in range(n)]
            sc = JFr.to_int_limbs(JFr.encode_ints(vals))

        c_def, w_def = window_plan(n, scalar_bits)
        cands = sorted({max(3, c_def - 2), c_def - 1, c_def,
                        min(16, c_def + 1), min(16, c_def + 2)})
        for c in cands:
            num_windows = -(-scalar_bits // c)
            iters = 4 if scalar_bits == 16 else 2

            @jax.jit
            def run_k(pts, scs, c=c, num_windows=num_windows, iters=iters):
                s = scs
                out = None
                for _ in range(iters):
                    out = _msm_kernel(pts, s, c=c, num_windows=num_windows)
                    s = s.at[0, 0].add(1)
                return out[..., :1]

            _ = np.asarray(run_k(points, sc))  # compile+warm
            dt = (timed(lambda: np.asarray(run_k(points, sc)), reps=2)
                  - t_base) / iters
            key = f"msm_2^{log_n}_{scalar_bits}bit_c{c}"
            results[key] = round(n / max(dt, 1e-9), 1)
            tag = " <= default" if c == c_def else ""
            print(f"{key}: {results[key]:.3e} pts/s{tag}", flush=True)

    # speed-of-light: measured fused Montgomery mul throughput
    n = 1 << 20
    a = JFr.encode_u64_array(rng.integers(1, 1 << 60, size=n).astype(np.uint64))

    @jax.jit
    def mul_k(x):
        y = x
        for _ in range(8):
            y = JFr.mul(y, x)
        return y[:1]

    _ = np.asarray(mul_k(a))
    dt = (timed(lambda: np.asarray(mul_k(a)), reps=2) - t_base) / 8
    results["fused_mont_mul_per_s"] = round(n / max(dt, 1e-9), 1)
    return results


def main():
    out = {}
    out.update(host_floor())
    print(json.dumps(out, indent=1), flush=True)
    if "--host-only" not in sys.argv:
        out.update(device_sweep())
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
