"""Stage-by-stage timing of the device Pippenger kernel at a given size.

Times (a) digit extraction + argsort, (b) the point gather, (c) the
segmented-scan bucket accumulation, (d) the bucket weighted sum + Horner --
each as its own jitted program over the same inputs -- plus the full fused
kernel, so the dominant stage is measurable rather than guessed.  Stage
sums exceed the fused time (XLA fuses across stages); the point is the
RATIO between stages.

Usage: python scripts/msm_profile.py [log_n] [scalar_bits]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, reps=3):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from lasso_tpu.curve.host import GENERATOR
    from lasso_tpu.curve.jcurve import W, from_host_points
    from lasso_tpu.field.jfield import JFr
    from lasso_tpu.ops import msm as M

    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    bits = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n = 1 << log_n

    base = from_host_points([GENERATOR.mul(i + 1) for i in range(64)])
    reps = -(-n // 64)
    points = jnp.tile(base, (1, 1, reps))[..., :n]
    rng = np.random.default_rng(5)
    scalars = JFr.to_int_limbs(JFr.encode_u64_array(
        rng.integers(0, 1 << bits, size=n).astype(np.uint64)))
    c, k = M.window_plan(n, bits)
    nb = (1 << c) - 1
    print(f"n=2^{log_n} bits={bits} -> c={c} windows={k} buckets={nb}",
          flush=True)

    @functools.partial(jax.jit, static_argnames=("c", "k"))
    def stage_sort(scalars, c, k):
        ids = M._extract_digits(scalars, c, k)
        order = jnp.argsort(ids, axis=1)
        return jnp.take_along_axis(ids, order, axis=1), order

    @jax.jit
    def stage_gather(points, order):
        pts_pm = points.reshape(4 * W, n).T
        return jnp.take(pts_pm, order.reshape(-1), axis=0)

    @functools.partial(jax.jit, static_argnames=("nb",))
    def stage_scan(sorted_pm, sorted_ids, nb):
        pts = jnp.transpose(
            sorted_pm.reshape(k, n, 4 * W), (0, 2, 1)).reshape(k, 4, W, n)
        return jax.vmap(
            lambda p, i: M._segmented_sum_sorted(p, i, nb))(pts, sorted_ids)

    @jax.jit
    def stage_weight(buckets):
        return jax.vmap(M._bucket_weighted_sum)(buckets[..., :nb])

    sorted_ids, order = jax.block_until_ready(stage_sort(scalars, c, k))
    sorted_pm = jax.block_until_ready(stage_gather(points, order))
    buckets = jax.block_until_ready(stage_scan(sorted_pm, sorted_ids, nb))
    _ = jax.block_until_ready(stage_weight(buckets))
    full = M._msm_kernel(points, scalars, c=c, num_windows=k)
    _ = np.asarray(full)

    def sync(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0][..., :1])

    t_sort = timed(lambda: sync(stage_sort(scalars, c, k)))
    t_gather = timed(lambda: sync(stage_gather(points, order)))
    t_scan = timed(lambda: sync(stage_scan(sorted_pm, sorted_ids, nb)))
    t_weight = timed(lambda: sync(stage_weight(buckets)))
    t_full = timed(lambda: sync(M._msm_kernel(points, scalars, c=c,
                                              num_windows=k)))
    base_t = timed(lambda: sync(points))
    for name, t in [("digits+sort", t_sort), ("gather", t_gather),
                    ("segmented-scan", t_scan), ("weighted-sum", t_weight),
                    ("FULL kernel", t_full), ("(sync baseline)", base_t)]:
        print(f"{name:>16}: {1e3 * t:8.1f} ms", flush=True)
    print(f"points/s (full, sync-adjusted): "
          f"{n / max(t_full - base_t, 1e-9):,.0f}", flush=True)


if __name__ == "__main__":
    main()
