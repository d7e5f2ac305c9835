"""Headline benchmark: Pippenger MSM throughput, 2^20 points, small-scalar path.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference (a16z/Lasso) publishes no numbers and the Rust toolchain is not
available in this image (BASELINE.md), so `vs_baseline` is MEASURED against
this repo's own native C++ host Pippenger (lasso_tpu/native/host_crypto.cpp,
the same fat-window plan) run in-process on the bench host: a single-core
floor for the reference's CPU MSM (reference: src/msm/mod.rs:96-116; its
rayon build would be ~(cores)x this floor on a multicore box — scale
accordingly when comparing against multicore CPU numbers).

Structure (round-5 hardening, after the round-4 bench timed out leaving NO
parsed artifact): the measurement runs in a CHILD process under a wall-clock
budget; if the child cannot finish (e.g. a pathological XLA compile), the
parent retries with a 1-iteration chained program (the persistent compile
cache makes the retry cheap if the kernel itself compiled), and as a last
resort prints the measured native host floor — so a timeout still yields a
parsed JSON line.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _host_floor_pps(scalar_bits: int = 16) -> float:
    """Measured single-core native host Pippenger throughput (points/s) at
    2^14 points with small scalars — the floor the device number is
    compared against (see module docstring)."""
    import numpy as np

    from lasso_tpu.curve.host import GENERATOR, msm_host

    n = 1 << 14
    pts = [GENERATOR.mul(i + 1) for i in range(64)]
    points = [pts[i % 64] for i in range(n)]
    rng = np.random.default_rng(1)
    scalars = [int(x) for x in rng.integers(0, 1 << scalar_bits, size=n)]
    dt = _timed(lambda: msm_host(points, scalars))
    return n / dt


def child_main():
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
    reps = -(-n // base.shape[-1])
    points = jnp.tile(base, (1, 1, reps))[..., :n]

    rng = np.random.default_rng(12345)
    scalars_int = JFr.encode_u64_array(
        rng.integers(0, 1 << scalar_bits, size=n).astype(np.uint64))
    # canonical integer limbs (skip the Montgomery decode path: the bench
    # measures the MSM kernel itself)
    scalars_int = JFr.to_int_limbs(scalars_int)

    c = window_size(n)
    num_windows = (scalar_bits + c) // c

    # compile + persist the core kernel FIRST: if the chained program below
    # blows the budget, the retry with iters=1 hits this cache entry
    out = _msm_kernel(points, scalars_int, c=c, num_windows=num_windows)
    assert to_host_point(out).is_on_curve()

    # NB: on the tunneled TPU backend, block_until_ready returns before the
    # device finishes -- the only reliable sync is a host transfer.  Chain
    # `iters` kernel invocations inside one jit (perturbing the scalars so
    # nothing is CSE'd away), then force a tiny transfer, and subtract the
    # measured transfer/dispatch baseline.
    iters = int(os.environ.get("LASSO_BENCH_ITERS", "8"))

    @jax.jit
    def run_k(pts, scs):
        s = scs
        out = None
        for _ in range(iters):
            out = _msm_kernel(pts, s, c=c, num_windows=num_windows)
            s = s.at[0, 0].add(1)
        return out[..., :1]

    baseline = jax.jit(lambda p: p[0, :1, :1])
    _ = np.asarray(baseline(points))
    _ = np.asarray(run_k(points, scalars_int))  # compile + warmup

    t_base = min(
        _timed(lambda: np.asarray(baseline(points))) for _ in range(3))
    dt_total = min(
        _timed(lambda: np.asarray(run_k(points, scalars_int)))
        for _ in range(2))
    dt = max(dt_total - t_base, 1e-9) / iters

    pps = n / dt
    baseline_pps = _host_floor_pps(scalar_bits)
    print(json.dumps({
        "metric": f"msm_points_per_sec_2^{n.bit_length()-1}_smallscalar",
        "value": round(pps, 1),
        "unit": "points/s",
        # measured in-process: this repo's native C++ single-core Pippenger
        # on the bench host (the reference's CPU floor), NOT an estimate
        "vs_baseline": round(pps / baseline_pps, 3),
    }))


def _run_child(extra_env: dict, budget: float) -> dict | None:
    env = dict(os.environ)
    env["LASSO_BENCH_CHILD"] = "1"
    env.update(extra_env)
    try:
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=budget)
    except subprocess.TimeoutExpired:
        return None
    for line in reversed(res.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def main():
    if os.environ.get("LASSO_BENCH_CHILD"):
        child_main()
        return
    budget = float(os.environ.get("LASSO_BENCH_BUDGET", "420"))
    result = _run_child({}, budget)
    if result is None:
        # retry with a 1-iteration chained program: tiny wrapper compile,
        # and the core kernel compile (persisted by the first child if it
        # got that far) is reused from the cache
        result = _run_child({"LASSO_BENCH_ITERS": "1"}, budget / 2)
    if result is None:
        # last resort: the measured native single-core host floor, flagged
        # as such in the metric name (vs_baseline 1.0 by construction)
        pps = _host_floor_pps()
        result = {
            "metric": "msm_points_per_sec_hostfloor_fallback",
            "value": round(pps, 1),
            "unit": "points/s",
            "vs_baseline": 1.0,
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
