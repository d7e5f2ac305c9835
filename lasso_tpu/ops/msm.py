"""Multi-scalar multiplication on TPU (Pippenger, small-scalar optimized).

Replaces the reference's hand-rolled MSM (reference: src/msm/mod.rs) with a
formulation built for a vector machine rather than scalar cores:

  * signed digit decomposition (wNAF-style recentering, negation is cheap on
    twisted Edwards) -- same windowing policy as the reference, including the
    small-scalar optimization: windows are sized to the actual max bit width
    of the scalars, bailing to full width past 60 bits
    (reference: src/msm/mod.rs:96-116).
  * bucket accumulation WITHOUT scatter-add contention: sort points by bucket
    id, then a segmented Hillis-Steele scan of curve additions reduces every
    equal-bucket run in parallel; a `while_loop` exits after
    ceil(log2(longest run)) rounds, so uniform digit distributions cost
    ~log(n/#buckets) batched adds instead of n sequential ones.
  * bucket weighted sum  sum_b b*B_b  as a suffix-scan + tree reduction
    (log #buckets batched adds), replacing the reference's serial running sum.
  * window combine by Horner with c doublings per step.

All windows are processed batched (leading axis), so one jitted kernel per
(n, c, #windows) configuration covers the whole MSM.
"""

from __future__ import annotations

import functools
import os
import math

import jax
import jax.numpy as jnp
import numpy as np

from lasso_tpu.curve import host as hostcurve
from lasso_tpu.curve.jcurve import (identity, padd, pdbl, pneg, pselect,
                                    to_host_point, tree_sum)
from lasso_tpu.field.jfield import JFr, W


def _ln_without_floats(n: int) -> int:
    # matches ark's window heuristic: log2(n) * ln(2)
    return int(math.log2(n) * 69 / 100) if n > 1 else 1


def window_size(n: int) -> int:
    if n < 32:
        return 3
    # cap at 16 so a digit never spans more than two 16-bit limbs
    return min(_ln_without_floats(n) + 2, 16)


def _extract_digits(scalars, c: int, num_windows: int):
    """Signed base-2^c digits of canonical integer limbs [n, W].

    Returns (bucket_ids [k, n] int32 with sentinel 2^(c-1) for digit 0,
             is_neg [k, n] bool).
    Digits lie in [-2^(c-1), 2^(c-1)]; bucket id = |digit| - 1.
    """
    n = scalars.shape[0]
    half = 1 << (c - 1)
    radix = 1 << c
    mask = radix - 1

    raw = []
    for w in range(num_windows):
        off = w * c
        k, sh = off // 16, off % 16
        lo = scalars[:, k] >> sh
        if k + 1 < W and sh > 0:
            lo = lo | (scalars[:, k + 1] << (16 - sh))
        raw.append(lo & mask)

    digits = []
    carry = jnp.zeros((n,), dtype=jnp.int32)
    for w in range(num_windows):
        coef = carry + raw[w].astype(jnp.int32)
        carry = (coef + half) >> c
        digits.append(coef - (carry << c))
    # final carry folds into the last digit (as in ark's make_digits)
    digits[-1] = digits[-1] + (carry << c)

    digits = jnp.stack(digits)  # [k, n] int32, |digit| <= 2^(c-1)
    is_neg = digits < 0
    absd = jnp.abs(digits)
    bucket_ids = jnp.where(absd == 0, half, absd - 1)  # sentinel = half
    return bucket_ids.astype(jnp.int32), is_neg


def _segmented_sum_sorted(points, ids, num_buckets: int):
    """points [4,W,n] sorted by ids [n]; returns per-bucket sums
    [4,W,num_buckets+1] (last slot is the sentinel bucket, to be dropped)."""
    n = points.shape[-1]
    idx = jnp.arange(n)

    def same_at(x_ids, stride):
        rolled = jnp.roll(x_ids, stride)
        return (idx >= stride) & (rolled == x_ids)

    def cond(state):
        pts, stride = state
        return (stride < n) & jnp.any(same_at(ids, stride))

    def body(state):
        pts, stride = state
        same = same_at(ids, stride)
        rolled = jnp.roll(pts, stride, axis=-1)
        pts = pselect(same, padd(pts, rolled), pts)
        return pts, stride * 2

    pts, _ = jax.lax.while_loop(cond, body, (points, jnp.int32(1)))

    # last element of each run holds the run total
    next_ids = jnp.concatenate([ids[1:], jnp.full((1,), -1, ids.dtype)])
    is_last = ids != next_ids
    scatter_ids = jnp.where(is_last, ids, num_buckets)
    vals = pselect(is_last, pts, identity(n))
    buckets = identity(num_buckets + 1).at[..., scatter_ids].set(vals)
    return buckets


def _bucket_weighted_sum(buckets):
    """sum_b (b+1) * buckets[b] via suffix scan + tree sum (buckets [B,4,W]).

    Both the Hillis-Steele suffix scan and the final tree reduction run as
    fori_loops with fixed-shape bodies so the curve-add subgraph compiles
    once, not once per round.
    """
    b = buckets.shape[-1]
    if b == 1:
        return buckets
    idx = jnp.arange(b)
    rounds = (b - 1).bit_length()

    def body(i, x):
        stride = jnp.int32(1) << i
        rolled = jnp.roll(x, -stride, axis=-1)
        valid = idx < (b - stride)
        return pselect(valid, padd(x, rolled), x)

    x = jax.lax.fori_loop(0, rounds, body, buckets)
    # x[i] = sum_{j >= i} buckets[j]; total = sum_i x[i]
    return tree_sum(x)


@functools.partial(jax.jit, static_argnames=("c", "num_windows"))
def _msm_kernel(points, scalars, c: int, num_windows: int):
    """points [4,W,n] (extended, Montgomery limbs); scalars [n,W] canonical
    integer limbs. Returns [4,W,1] point."""
    n = points.shape[-1]
    half = 1 << (c - 1)

    bucket_ids, is_neg = _extract_digits(scalars, c, num_windows)  # [k, n]
    signed_pts = jnp.where(is_neg[:, None, None, :], pneg(points)[None],
                           points[None])  # [k, 4, W, n]

    order = jnp.argsort(bucket_ids, axis=1)  # [k, n]
    sorted_ids = jnp.take_along_axis(bucket_ids, order, axis=1)
    sorted_pts = jnp.take_along_axis(
        signed_pts, order[:, None, None, :], axis=-1)

    window_sums = jax.vmap(
        lambda p, i: _bucket_weighted_sum(
            _segmented_sum_sorted(p, i, half)[..., :half]
        )
    )(sorted_pts, sorted_ids)  # [k, 4, W, 1]

    # Horner from the top window down: total = ((W_{k-1} * 2^c) + W_{k-2}) ...
    # fori_loops keep the HLO graph small (one pdbl/padd body instead of
    # num_windows * c unrolled doublings)
    def outer(i, total):
        total = jax.lax.fori_loop(0, c, lambda _, t: pdbl(t), total)
        return padd(total, window_sums[num_windows - 2 - i])

    total = window_sums[num_windows - 1]
    if num_windows > 1:
        total = jax.lax.fori_loop(0, num_windows - 1, outer, total)
    return total


def max_scalar_bits(scalar_int_limbs) -> int:
    """Exact max bit-width across scalars (one tiny device->host pull).

    Uses per-limb column maxima: the max scalar bit width equals
    max_j (16*j + bitlen(max of column j)) since bitlen is monotone.
    """
    col_max = np.asarray(jnp.max(scalar_int_limbs, axis=0))
    val = 0
    for i, limb in enumerate(col_max):
        if limb:
            val = max(val, 16 * i + int(limb).bit_length())
    return max(val, 1)


# MSMs below this size run on host (Python Pippenger): they are latency
# bound -- a kernel launch (let alone a fresh XLA compile for a new shape)
# costs more than the arithmetic.  The Bullet reduction's tail rounds and
# verifier-side recombinations all land here; throughput MSMs stay on device.
MSM_HOST_MAX = int(os.environ.get("LASSO_TPU_MSM_HOST_MAX", "256"))


def msm_device(points, scalars_mont, modulus_bits: int = 253):
    """MSM with reference window policy. `scalars_mont`: [n,W] Montgomery Fr.

    Returns a device point [4, W].
    """
    n = points.shape[-1]
    assert scalars_mont.shape[0] == n
    if n == 0:
        return identity(1)
    if n <= MSM_HOST_MAX:
        from lasso_tpu.curve.jcurve import from_host_points, to_host_points
        host_pts = to_host_points(points)
        host_scalars = JFr.decode(scalars_mont)
        res = hostcurve.msm_host(host_pts, host_scalars)
        return from_host_points([res])
    scalars_int = JFr.to_int_limbs(scalars_mont)
    max_bits = max_scalar_bits(scalars_int)
    if max_bits > 60:
        max_bits = modulus_bits
    c = window_size(n)
    # +1 bit so the top signed digit (<= 2^(c-1) after the final carry fold)
    # always fits the half-size bucket array
    num_windows = (max_bits + c) // c
    return _msm_kernel(points, scalars_int, c=c, num_windows=num_windows)


def msm(points, scalars_mont) -> hostcurve.Point:
    """Device MSM returning a host Point."""
    return to_host_point(msm_device(points, scalars_mont))


_msm_kernel_rows = jax.jit(
    jax.vmap(_msm_kernel, in_axes=(None, 0, None, None)),
    static_argnames=("c", "num_windows"))


def msm_batch_device(points, scalars_mont_rows, modulus_bits: int = 253,
                     row_chunk: int = 128):
    """Many MSMs sharing one basis (the Hyrax row-commit shape).

    points: [n, 4, W]; scalars_mont_rows: [rows, n, W] Montgomery Fr.
    Returns [rows, 4, W].  Rows are vmapped into one kernel; large row counts
    are chunked to bound the gather working set.
    """
    rows, n, _ = scalars_mont_rows.shape
    if n == 0 or rows == 0:
        return identity(1, (rows,))
    if rows * n <= 4 * MSM_HOST_MAX:
        from lasso_tpu.curve.jcurve import from_host_points, to_host_points
        host_pts = to_host_points(points)
        flat = JFr.decode(scalars_mont_rows.reshape(rows * n, W))
        res = [hostcurve.msm_host(host_pts, flat[i * n:(i + 1) * n])
               for i in range(rows)]
        # [rows, 4, W, 1] to match the device branch
        return jnp.moveaxis(from_host_points(res), -1, 0)[..., None]
    scalars_int = JFr.to_int_limbs(scalars_mont_rows.reshape(rows * n, W))
    max_bits = max_scalar_bits(scalars_int)
    if max_bits > 60:
        max_bits = modulus_bits
    scalars_int = scalars_int.reshape(rows, n, W)
    c = window_size(n)
    num_windows = (max_bits + c) // c

    outs = []
    for start in range(0, rows, row_chunk):
        chunk = scalars_int[start: start + row_chunk]
        outs.append(_msm_kernel_rows(points, chunk, c, num_windows))
    return jnp.concatenate(outs, axis=0)
