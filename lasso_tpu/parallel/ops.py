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

Program caching: every sharded primitive is built ONCE per (mesh, static
config) by an lru_cached builder and wrapped in jax.jit, so repeat calls hit
jax's in-memory executable cache (C++ fast path).  Building the shard_map
closure inline per call -- the round-2 design -- re-traced, re-lowered and
re-deserialized the persistent-cache entry on EVERY call, which dominated
wall time on both the CPU mesh and the tunneled TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from lasso_tpu.field.jfield import JFr, W, _split_shift_renorm
from lasso_tpu.parallel.mesh import AXIS

_memo = functools.lru_cache(maxsize=None)


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


@_memo
def _sum_prog(mesh: Mesh):
    @jax.jit
    @functools.partial(shard_map, mesh=mesh, check_vma=False,
                       in_specs=P(AXIS), out_specs=P())
    def _go(xs):
        return JFr.finish_sum(_psum_wide(JFr.sum_columns(xs), AXIS))

    return _go


def sharded_sum(mesh: Mesh, x) -> jnp.ndarray:
    """Modular sum along the (sharded) axis 0 of [n, ..., W]: local lazy
    column sums -> psum of limb partials -> one Montgomery collapse."""
    return _sum_prog(mesh)(_put(mesh, x, P(AXIS)))


@_memo
def _dot_prog(mesh: Mesh):
    @jax.jit
    @functools.partial(shard_map, mesh=mesh, check_vma=False,
                       in_specs=(P(AXIS), P(AXIS)), out_specs=P())
    def _go(xa, xb):
        cols = JFr.sum_columns(JFr.mul(xa, xb))
        return JFr.finish_sum(_psum_wide(cols, AXIS))

    return _go


def sharded_dot(mesh: Mesh, a, b) -> jnp.ndarray:
    """<a, b> over the sharded leading axis (both [n, W] Montgomery)."""
    return _dot_prog(mesh)(_put(mesh, a, P(AXIS)), _put(mesh, b, P(AXIS)))


@_memo
def _round_evals_prog(mesh: Mesh, comb, degree: int):
    @jax.jit
    @functools.partial(shard_map, mesh=mesh, check_vma=False,
                       in_specs=P(None, AXIS), out_specs=P())
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

    return _go


def sharded_round_evals(mesh: Mesh, zs, comb, degree: int):
    """One sumcheck round over the cyclic-sharded hypercube.

    zs: [alpha, n, W] with the n axis sharded (cyclic layout).  Returns
    [degree+1, W] replicated round-polynomial evaluations.
    """
    return _round_evals_prog(mesh, comb, degree)(_put(mesh, zs, P(None, AXIS)))


@_memo
def _bind_top_prog(mesh: Mesh):
    @jax.jit
    @functools.partial(shard_map, mesh=mesh, check_vma=False,
                       in_specs=(P(None, AXIS), P()), out_specs=P(None, AXIS))
    def _go(z, r_limb):
        half = z.shape[1] // 2
        lo, hi = z[:, :half], z[:, half:]
        return JFr.add(lo, JFr.mul(r_limb, JFr.sub(hi, lo)))

    return _go


def sharded_bind_top(mesh: Mesh, zs, r):
    """Bind the top hypercube variable: [alpha, n, W] -> [alpha, n/2, W],
    entirely local under the cyclic layout."""
    return _bind_top_prog(mesh)(_put(mesh, zs, P(None, AXIS)),
                                _put(mesh, r, P()))


@_memo
def _eq_table_prog(mesh: Mesh):
    @jax.jit
    @functools.partial(shard_map, mesh=mesh, check_vma=False,
                       in_specs=(P(None, None), P(None, None)),
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

    return _go


def sharded_eq_table(mesh: Mesh, r_dev_hi, r_dev_lo):
    """eq(r, .) table in cyclic layout.

    r_dev_hi: [l - log D] challenges for the local (j) variables;
    r_dev_lo: [log D] challenges for the device-id variables.  Device d
    builds eq(r_hi, .) locally and scales by the scalar eq(r_lo, bits(d)).
    """
    return _eq_table_prog(mesh)(_put(mesh, r_dev_hi, P(None, None)),
                                _put(mesh, r_dev_lo, P(None, None)))


@_memo
def _msm_partials_prog(mesh: Mesh, c: int, num_windows: int):
    from lasso_tpu.ops.msm import TINY_MSM_MAX, _msm_kernel, _msm_tiny_kernel

    @jax.jit
    @functools.partial(shard_map, mesh=mesh, check_vma=False,
                       in_specs=(P(None, None, AXIS), P(AXIS)), out_specs=P())
    def _go(pts, scs):
        if scs.shape[0] <= TINY_MSM_MAX:
            local = _msm_tiny_kernel(pts, scs, num_bits=c * num_windows)
        else:
            local = _msm_kernel(pts, scs, c=c, num_windows=num_windows)
        return jax.lax.all_gather(local[..., 0], AXIS)  # [D, 4, W]

    return _go


def sharded_msm_partials(mesh: Mesh, points, scalars_int, c: int,
                         num_windows: int):
    """Per-shard Pippenger partials: points/scalars block-sharded on axis 0.

    Returns [D, 4, W] gathered shard partials (replicated); the caller folds
    them with a log(D) tree (curve addition is associative).
    """
    return _msm_partials_prog(mesh, c, num_windows)(
        _put(mesh, points, P(None, None, AXIS)),
        _put(mesh, scalars_int, P(AXIS)))


def sharded_msm(mesh: Mesh, points, scalars_mont, modulus_bits: int = 253):
    """Full sharded MSM: [4,W,n] limb-major points + [n,W] Montgomery
    scalars -> [4,W,1] (the limb-major convention used everywhere else)."""
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


@_memo
def _gp_layer_prog(mesh: Mesh):
    @jax.jit
    @functools.partial(shard_map, mesh=mesh, check_vma=False,
                       in_specs=P(None, AXIS), out_specs=P(None, AXIS))
    def _go(x):
        half = x.shape[1] // 2
        return JFr.mul(x[:, :half], x[:, half:])

    return _go


def sharded_grand_product_layer(mesh: Mesh, inputs):
    """One layer of batched grand-product trees on cyclic-sharded leaves:
    [I, n, W] -> [I, n/2, W], multiplying (left, right) halves locally."""
    return _gp_layer_prog(mesh)(_put(mesh, inputs, P(None, AXIS)))


# ---------------------------------------------------------------------------
# End-to-end prover primitives (round 2): everything below serves
# parallel/eprover.prove_sharded -- the full Lasso prove under the mesh.
#
# Layout invariant: D | s, D | M, D | r_size for every Hyrax matrix.  Under
# cyclic sharding the merged multilinears keep a crucial property: for
# n = K * s (D | s), global element (row, col) of the Hyrax view lives on
# device (col mod D), so L-folds are fully device-local along rows and the
# row-MSM commit needs only an all_gather of per-device partial points.
# ---------------------------------------------------------------------------


def cyclic_permute_axis(x, d: int, axis: int):
    """Cyclic layout along an arbitrary axis."""
    x = jnp.moveaxis(x, axis, 0)
    return jnp.moveaxis(cyclic_permute(x, d), 0, axis)


def cyclic_unpermute_axis(x, d: int, axis: int):
    x = jnp.moveaxis(x, axis, 0)
    return jnp.moveaxis(cyclic_unpermute(x, d), 0, axis)


def gather_natural(x_sharded, d: int, axis: int = 0):
    """Materialize a cyclic-sharded array in NATURAL order on the default
    device (the tiny-epilogue hand-off: tail sumcheck rounds, bullet
    reductions and top product trees run replicated)."""
    import numpy as np
    arr = jnp.asarray(np.asarray(x_sharded))
    return cyclic_unpermute_axis(arr, d, axis)


@_memo
def _split_halves_prog(mesh: Mesh):
    @jax.jit
    @functools.partial(shard_map, mesh=mesh, check_vma=False,
                       in_specs=P(None, AXIS),
                       out_specs=(P(None, AXIS), P(None, AXIS)))
    def _go(z):
        half = z.shape[1] // 2
        return z[:, :half], z[:, half:]

    return _go


def sharded_split_halves(mesh: Mesh, x):
    """[I, n, W] cyclic-sharded -> (left, right) halves, both cyclic-sharded
    over n/2 (pairing k, k + n/2 is local under the cyclic layout)."""
    return _split_halves_prog(mesh)(_put(mesh, x, P(None, AXIS)))


@_memo
def _gather_lookups_prog(mesh: Mesh, sub_of: tuple, dim_of: tuple):
    @jax.jit
    @functools.partial(shard_map, mesh=mesh, check_vma=False,
                       in_specs=(P(None, None, None), P(None, AXIS)),
                       out_specs=P(None, AXIS))
    def _go(tbl, idx):
        outs = [jnp.take(tbl[si], idx[di], axis=0)
                for si, di in zip(sub_of, dim_of)]
        return jnp.stack(outs)

    return _go


def sharded_gather_lookups(mesh: Mesh, tables, nz, sub_of, dim_of):
    """E_i = T_{sub(i)}[nz_{dim(i)}] with the s-axis cyclic-sharded.

    tables: [NS, M, W] replicated; nz: [C, s] int32 cyclic-sharded.
    Gathers are elementwise in the s index, so the cyclic layout passes
    straight through.  Returns [alpha, s, W] cyclic-sharded."""
    return _gather_lookups_prog(mesh, tuple(sub_of), tuple(dim_of))(
        _put(mesh, tables, P(None, None, None)), _put(mesh, nz, P(None, AXIS)))


@_memo
def _comb_sum_prog(mesh: Mesh, comb):
    @jax.jit
    @functools.partial(shard_map, mesh=mesh, check_vma=False,
                       in_specs=P(None, AXIS), out_specs=P())
    def _go(z):
        return JFr.finish_sum(_psum_wide(JFr.sum_columns(comb(z)), AXIS))

    return _go


def sharded_comb_sum(mesh: Mesh, zs, comb):
    """sum_k comb(zs)[k] over the cyclic-sharded hypercube axis.

    zs: [alpha, n, W] sharded. Returns [W] replicated (exact canonical --
    field addition is associative, so psum order is immaterial)."""
    return _comb_sum_prog(mesh, comb)(_put(mesh, zs, P(None, AXIS)))


@_memo
def _weighted_evals_prog(mesh: Mesh):
    @jax.jit
    @functools.partial(shard_map, mesh=mesh, check_vma=False,
                       in_specs=(P(None, AXIS), P(AXIS)), out_specs=P())
    def _go(st, w):
        prods = JFr.mul(st, w[None])
        cols = JFr.sum_columns(jnp.moveaxis(prods, 1, 0))  # [K, wide]
        return JFr.finish_sum(_psum_wide(cols, AXIS))

    return _go


def sharded_weighted_evals(mesh: Mesh, stack, weights):
    """Evaluate K stacked MLEs at a point given its (sharded) eq table.

    stack: [K, n, W] cyclic-sharded; weights: [n, W] same layout.
    Returns [K, W] replicated."""
    return _weighted_evals_prog(mesh)(_put(mesh, stack, P(None, AXIS)),
                                      _put(mesh, weights, P(AXIS)))


@_memo
def _merged_cyclic_prog(mesh: Mesh, pad_local: int):
    @jax.jit
    @functools.partial(shard_map, mesh=mesh, check_vma=False,
                       in_specs=P(None, AXIS), out_specs=P(AXIS))
    def _go(st):
        flat = st.reshape(-1, W)
        if pad_local:
            flat = jnp.concatenate(
                [flat, jnp.zeros((pad_local, W), jnp.uint32)], axis=0)
        return flat

    return _go


def merged_cyclic(mesh: Mesh, stack, pad_to: int):
    """Merge K cyclic-sharded length-s polynomials into the cyclic-sharded
    merged polynomial of length pad_to (zero-padded like DensePolynomial.merge).

    Works because D | s: merged index k = i*s + t has k mod D = t mod D, so
    device d's merged shard is just its per-polynomial shards concatenated in
    order -- no communication.  stack: [K, s, W] -> [pad_to, W] sharded."""
    k_cnt, s = stack.shape[0], stack.shape[1]
    d = mesh.devices.size
    assert s % d == 0 and (pad_to - k_cnt * s) % d == 0
    pad_local = (pad_to - k_cnt * s) // d
    return _merged_cyclic_prog(mesh, pad_local)(_put(mesh, stack, P(None, AXIS)))


@_memo
def _bound_fold_prog(mesh: Mesh, l_size: int, r_size: int):
    d = mesh.devices.size

    @jax.jit
    @functools.partial(shard_map, mesh=mesh, check_vma=False,
                       in_specs=(P(AXIS), P(None, None)), out_specs=P(AXIS))
    def _go(zl, lv):
        zmat = zl.reshape(l_size, r_size // d, W)
        return JFr.sum(JFr.mul(zmat, lv[:, None, :]))

    return _go


def sharded_bound_fold(mesh: Mesh, z, l_mont, l_size: int, r_size: int):
    """Hyrax L-fold on a merged-cyclic polynomial: LZ = L @ mat(Z).

    z: [l_size*r_size, W] cyclic-sharded; l_mont: [l_size, W] replicated.
    Global element (row, col) lives on device (col mod D) at local
    (row, col div D), so the row reduction is fully local.  Returns
    [r_size, W] cyclic-sharded over columns."""
    assert r_size % mesh.devices.size == 0
    return _bound_fold_prog(mesh, l_size, r_size)(
        _put(mesh, z, P(AXIS)), _put(mesh, l_mont, P(None, None)))


@_memo
def _commit_rows_prog(mesh: Mesh, l_size: int, r_size: int, c: int,
                      num_windows: int):
    from lasso_tpu.ops.msm import TINY_MSM_MAX, _msm_kernel, _msm_tiny_kernel
    d = mesh.devices.size

    @jax.jit
    @functools.partial(shard_map, mesh=mesh, check_vma=False,
                       in_specs=(P(AXIS), P(None, None, AXIS)), out_specs=P())
    def _go(zl, pts):
        zmat = zl.reshape(l_size, r_size // d, W)
        ints = JFr.to_int_limbs(zmat.reshape(-1, W)).reshape(
            l_size, r_size // d, W)
        if r_size // d <= TINY_MSM_MAX:
            local = jax.vmap(_msm_tiny_kernel, in_axes=(None, 0, None))(
                pts, ints, c * num_windows)  # [l_size, 4, W, 1]
        else:
            local = jax.vmap(_msm_kernel, in_axes=(None, 0, None, None))(
                pts, ints, c, num_windows)  # [l_size, 4, W, 1]
        return jax.lax.all_gather(local[..., 0], AXIS)  # [D, l_size, 4, W]

    return _go


def sharded_commit_rows(mesh: Mesh, z, bases_cyc, l_size: int, r_size: int,
                        c: int, num_windows: int):
    """Hyrax row commitments on a merged-cyclic polynomial.

    z: [l_size*r_size, W] cyclic-sharded (Montgomery); bases_cyc: [4, W,
    r_size] generator points cyclically permuted along the point axis and
    block-sharded, so device d holds G[col] for its columns col = c*D + d.
    Each device runs one batched-row Pippenger over its column subset;
    per-device partial points are all_gathered and tree-combined by the
    caller (curve addition is associative -> canonical points identical to
    the single-chip commit).  Returns [D, l_size, 4, W] replicated."""
    assert r_size % mesh.devices.size == 0
    return _commit_rows_prog(mesh, l_size, r_size, c, num_windows)(
        _put(mesh, z, P(AXIS)), _put(mesh, bases_cyc, P(None, None, AXIS)))


def _fp(a, v, t, g, g2, tau):
    """h(a, v, t) = t*gamma^2 + v*gamma + a - tau (matches
    lasso/memory_checking._fingerprint)."""
    return JFr.sub(JFr.add(JFr.add(JFr.mul(t, g2), JFr.mul(v, g)), a), tau)


@_memo
def _rw_fingerprints_prog(mesh: Mesh):
    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(None, AXIS), P(None, AXIS), P(None, AXIS), P(), P(), P()),
        out_specs=P(None, AXIS))
    def _go(dm, vo, rd, g, g2, tu):
        alpha, sl = dm.shape[0], dm.shape[1]
        fp_r = _fp(dm, vo, rd, g, g2, tu)
        one = JFr.ones((alpha, sl))
        fp_w = _fp(dm, vo, JFr.add(rd, one), g, g2, tu)
        return jnp.stack([fp_r, fp_w], axis=1).reshape(2 * alpha, sl, W)

    return _go


def sharded_rw_fingerprints(mesh: Mesh, dim, vops, read, gamma, gamma_sq, tau):
    """Read/write fingerprints over the cyclic-sharded s-cube, interleaved
    [read_0, write_0, read_1, ...] like the reference's batching order.

    dim, vops, read: [alpha, s, W] sharded.  Returns [2*alpha, s, W] sharded."""
    return _rw_fingerprints_prog(mesh)(
        _put(mesh, dim, P(None, AXIS)), _put(mesh, vops, P(None, AXIS)),
        _put(mesh, read, P(None, AXIS)), _put(mesh, gamma, P()),
        _put(mesh, gamma_sq, P()), _put(mesh, tau, P()))


@_memo
def _if_fingerprints_prog(mesh: Mesh):
    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(AXIS), P(None, AXIS), P(None, AXIS), P(), P(), P()),
        out_specs=P(None, AXIS))
    def _go(ad, vm, fn, g, g2, tu):
        alpha, ml = vm.shape[0], vm.shape[1]
        zero = jnp.zeros((alpha, ml, W), jnp.uint32)
        fp_i = _fp(ad[None], vm, zero, g, g2, tu)
        fp_f = _fp(ad[None], vm, fn, g, g2, tu)
        return jnp.stack([fp_i, fp_f], axis=1).reshape(2 * alpha, ml, W)

    return _go


def sharded_if_fingerprints(mesh: Mesh, addr, vmem, final, gamma, gamma_sq,
                            tau):
    """Init/final fingerprints over the cyclic-sharded M-cube, interleaved
    [init_0, final_0, ...].  addr: [M, W]; vmem, final: [alpha, M, W]."""
    return _if_fingerprints_prog(mesh)(
        _put(mesh, addr, P(AXIS)), _put(mesh, vmem, P(None, AXIS)),
        _put(mesh, final, P(None, AXIS)), _put(mesh, gamma, P()),
        _put(mesh, gamma_sq, P()), _put(mesh, tau, P()))


@_memo
def _scalar_maxbits_prog(mesh: Mesh):
    @jax.jit
    @functools.partial(shard_map, mesh=mesh, check_vma=False,
                       in_specs=P(AXIS), out_specs=P())
    def _go(zl):
        ints = JFr.to_int_limbs(zl)
        return jax.lax.pmax(jnp.max(ints, axis=0), AXIS)

    return _go


def sharded_scalar_maxbits(mesh: Mesh, z) -> int:
    """Exact max bit-width across a cyclic-sharded Montgomery vector
    (the MSM small-scalar window scan, ops/msm.max_scalar_bits)."""
    import numpy as np
    col_max = np.asarray(_scalar_maxbits_prog(mesh)(_put(mesh, z, P(AXIS))))
    val = 0
    for i, limb in enumerate(col_max):
        if limb:
            val = max(val, 16 * i + int(limb).bit_length())
    return max(val, 1)


@_memo
def _append_row_prog(mesh: Mesh):
    @jax.jit
    @functools.partial(shard_map, mesh=mesh, check_vma=False,
                       in_specs=(P(None, AXIS), P(AXIS)),
                       out_specs=P(None, AXIS))
    def _go(st, rw):
        return jnp.concatenate([st, rw[None]], axis=0)

    return _go


def sharded_append_row(mesh: Mesh, stack, row):
    """[K, n, W] sharded stack + [n, W] sharded row -> [K+1, n, W] sharded
    (the primary-sumcheck stack append of the eq polynomial)."""
    return _append_row_prog(mesh)(_put(mesh, stack, P(None, AXIS)),
                                  _put(mesh, row, P(AXIS)))


@_memo
def _cubic_round_evals_prog(mesh: Mesh):
    @jax.jit
    @functools.partial(shard_map, mesh=mesh, check_vma=False,
                       in_specs=(P(None, AXIS), P(None, AXIS), P(AXIS)),
                       out_specs=P())
    def _go(al, bl, cl):
        half = al.shape[1] // 2
        a_lo, a_hi = al[:, :half], al[:, half:]
        b_lo, b_hi = bl[:, :half], bl[:, half:]
        c_lo, c_hi = cl[:half], cl[half:]

        def prod3(x, y, z):
            return JFr.mul(JFr.mul(x, y), z)

        def cols(v):  # [I, half, W] -> [I, wide]
            return JFr.sum_columns(jnp.moveaxis(v, 1, 0))

        out = [cols(prod3(a_lo, b_lo, c_lo[None]))]
        a_d, b_d, c_d = (JFr.sub(a_hi, a_lo), JFr.sub(b_hi, b_lo),
                         JFr.sub(c_hi, c_lo))
        a2, b2, c2 = JFr.add(a_hi, a_d), JFr.add(b_hi, b_d), JFr.add(c_hi, c_d)
        out.append(cols(prod3(a2, b2, c2[None])))
        a3, b3, c3 = JFr.add(a2, a_d), JFr.add(b2, b_d), JFr.add(c2, c_d)
        out.append(cols(prod3(a3, b3, c3[None])))
        return JFr.finish_sum(_psum_wide(jnp.stack(out), AXIS))

    return _go


def sharded_cubic_round_evals(mesh: Mesh, a, b, c):
    """One batched-cubic sumcheck round over the cyclic-sharded cube.

    a, b: [I, n, W] sharded; c: [n, W] shared eq poly, same layout.
    Returns [3, I, W] replicated sums at t in {0, 2, 3}."""
    return _cubic_round_evals_prog(mesh)(
        _put(mesh, a, P(None, AXIS)), _put(mesh, b, P(None, AXIS)),
        _put(mesh, c, P(AXIS)))
