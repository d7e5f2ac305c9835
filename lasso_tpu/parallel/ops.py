"""Sharded compute primitives for multi-chip proving.

Layout: the hypercube axis is sharded CYCLICALLY -- global index
k = j*D + d lives on device d at local offset j.  Because the sumcheck bind
pairs k with k + n/2 (same residue mod D), every local array behaves exactly
like a smaller hypercube: the single-chip kernels run unchanged inside
shard_map, and the only cross-device traffic is

  * a psum of 16-limb lazy column partials per sumcheck round (tiny,
    latency-bound, rides ICI)
  * an all_gather of one curve point per shard for MSM / grand-product
    combines

Field addition is exactly associative/commutative, so any reduction order
yields bit-identical canonical values -- multi-host determinism is free
(SURVEY.md section 5.8).  The final log(D) sumcheck variables (the device
id bits) are a tiny replicated epilogue handled by the host loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from lasso_tpu.field.jfield import JFr, W, _split_shift_renorm
from lasso_tpu.parallel.mesh import AXIS


def cyclic_permute(x, d: int):
    """[n, ...] -> cyclic layout: out[d*m + j] = x[j*D + d].

    Applied once at setup; with the output block-sharded on axis 0, device d
    holds exactly the residue class k = d (mod D)."""
    n = x.shape[0]
    m = n // d
    return jnp.swapaxes(x.reshape(m, d, *x.shape[1:]), 0, 1).reshape(x.shape)


def cyclic_unpermute(x, d: int):
    n = x.shape[0]
    m = n // d
    return jnp.swapaxes(x.reshape(d, m, *x.shape[1:]), 0, 1).reshape(x.shape)


def _put(mesh, x, spec):
    """Move an input onto the mesh with the given layout (no-op if placed)."""
    from jax.sharding import NamedSharding
    return jax.device_put(x, NamedSharding(mesh, spec))


def _psum_wide(cols, axis_name):
    """psum lazy sum columns (limbs < 2^17 per shard) and renormalize."""
    total = jax.lax.psum(cols, axis_name)
    return _split_shift_renorm(total)


def sharded_sum(mesh: Mesh, x) -> jnp.ndarray:
    """Modular sum along the (sharded) axis 0 of [n, ..., W]: local lazy
    column sums -> psum of limb partials -> one Montgomery collapse."""

    @functools.partial(shard_map, mesh=mesh, check_vma=False, in_specs=P(AXIS), out_specs=P())
    def _go(xs):
        return JFr.finish_sum(_psum_wide(JFr.sum_columns(xs), AXIS))

    return _go(_put(mesh, x, P(AXIS)))


def sharded_dot(mesh: Mesh, a, b) -> jnp.ndarray:
    """<a, b> over the sharded leading axis (both [n, W] Montgomery)."""

    @functools.partial(
        shard_map, mesh=mesh, check_vma=False, in_specs=(P(AXIS), P(AXIS)), out_specs=P())
    def _go(xa, xb):
        cols = JFr.sum_columns(JFr.mul(xa, xb))
        return JFr.finish_sum(_psum_wide(cols, AXIS))

    return _go(_put(mesh, a, P(AXIS)), _put(mesh, b, P(AXIS)))


def sharded_round_evals(mesh: Mesh, zs, comb, degree: int):
    """One sumcheck round over the cyclic-sharded hypercube.

    zs: [alpha, n, W] with the n axis sharded (cyclic layout).  Returns
    [degree+1, W] replicated round-polynomial evaluations.
    """

    @functools.partial(
        shard_map, mesh=mesh, check_vma=False, in_specs=P(None, AXIS), out_specs=P())
    def _go(z):
        half = z.shape[1] // 2
        lo, hi = z[:, :half], z[:, half:]
        evals = [JFr.sum_columns(comb(lo)), JFr.sum_columns(comb(hi))]
        diff = JFr.sub(hi, lo)
        cur = hi
        for _ in range(2, degree + 1):
            cur = JFr.add(cur, diff)
            evals.append(JFr.sum_columns(comb(cur)))
        stacked = jnp.stack(evals)  # [degree+1, W+levels]
        return JFr.finish_sum(_psum_wide(stacked, AXIS))

    return _go(_put(mesh, zs, P(None, AXIS)))


def sharded_bind_top(mesh: Mesh, zs, r):
    """Bind the top hypercube variable: [alpha, n, W] -> [alpha, n/2, W],
    entirely local under the cyclic layout."""

    @functools.partial(
        shard_map, mesh=mesh, check_vma=False, in_specs=(P(None, AXIS), P()),
        out_specs=P(None, AXIS))
    def _go(z, r_limb):
        half = z.shape[1] // 2
        lo, hi = z[:, :half], z[:, half:]
        return JFr.add(lo, JFr.mul(r_limb, JFr.sub(hi, lo)))

    return _go(_put(mesh, zs, P(None, AXIS)), _put(mesh, r, P()))


def sharded_eq_table(mesh: Mesh, r_dev_hi, r_dev_lo):
    """eq(r, .) table in cyclic layout.

    r_dev_hi: [l - log D] challenges for the local (j) variables;
    r_dev_lo: [log D] challenges for the device-id variables.  Device d
    builds eq(r_hi, .) locally and scales by the scalar eq(r_lo, bits(d)).
    """

    @functools.partial(
        shard_map, mesh=mesh, check_vma=False, in_specs=(P(None, None), P(None, None)),
        out_specs=P(AXIS))
    def _go(r_hi, r_lo):
        d = jax.lax.axis_index(AXIS)
        e = JFr.ones(1)
        for i in range(r_hi.shape[0]):
            t = JFr.mul(e, r_hi[i])
            e = jnp.stack([JFr.sub(e, t), t], axis=1).reshape(-1, W)
        scale = JFr.ones(())
        log_d = r_lo.shape[0]
        for i in range(log_d):
            bit = (d >> (log_d - 1 - i)) & 1
            ri = r_lo[i]
            scale = JFr.mul(scale, jnp.where(bit == 1, ri,
                                             JFr.sub(JFr.ones(()), ri)))
        return JFr.mul(e, scale[None])

    return _go(_put(mesh, r_dev_hi, P(None, None)),
               _put(mesh, r_dev_lo, P(None, None)))


def sharded_msm_partials(mesh: Mesh, points, scalars_int, c: int,
                         num_windows: int):
    """Per-shard Pippenger partials: points/scalars block-sharded on axis 0.

    Returns [D, 4, W] gathered shard partials (replicated); the caller folds
    them with a log(D) tree (curve addition is associative).
    """
    from lasso_tpu.ops.msm import _msm_kernel

    @functools.partial(
        shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(None, None, AXIS), P(AXIS)), out_specs=P())
    def _go(pts, scs):
        local = _msm_kernel(pts, scs, c=c, num_windows=num_windows)
        return jax.lax.all_gather(local[..., 0], AXIS)  # [D, 4, W]

    return _go(_put(mesh, points, P(None, None, AXIS)),
               _put(mesh, scalars_int, P(AXIS)))


def sharded_msm(mesh: Mesh, points, scalars_mont, modulus_bits: int = 253):
    """Full sharded MSM: [n,4,W] points + [n,W] Montgomery scalars -> [4,W]."""
    from lasso_tpu.curve.jcurve import tree_sum
    from lasso_tpu.ops.msm import max_scalar_bits, window_size

    n = points.shape[-1]
    d = mesh.devices.size
    scalars_int = JFr.to_int_limbs(scalars_mont)
    max_bits = max_scalar_bits(scalars_int)
    if max_bits > 60:
        max_bits = modulus_bits
    c = window_size(max(n // d, 2))
    num_windows = (max_bits + c) // c
    partials = sharded_msm_partials(mesh, points, scalars_int, c, num_windows)
    return tree_sum(jnp.moveaxis(partials, 0, -1))  # [4, W, 1]


def sharded_grand_product_layer(mesh: Mesh, inputs):
    """One layer of batched grand-product trees on cyclic-sharded leaves:
    [I, n, W] -> [I, n/2, W], multiplying (left, right) halves locally."""

    @functools.partial(
        shard_map, mesh=mesh, check_vma=False, in_specs=P(None, AXIS), out_specs=P(None, AXIS))
    def _go(x):
        half = x.shape[1] // 2
        return JFr.mul(x[:, :half], x[:, half:])

    return _go(_put(mesh, inputs, P(None, AXIS)))
