"""Fused Montgomery multiplication as a Pallas TPU kernel.

The XLA elementwise formulation of a 256-bit Montgomery multiply
(field/jfield.py) materializes ~30 intermediate [n, 33] tensors per multiply
-- several KB of HBM traffic per element.  This kernel keeps the whole
schoolbook product + REDC + carry/conditional-subtract pipeline in VMEM:
traffic drops to the 3x64B/element minimum and the VPU runs the ~1500
unrolled uint32 ops back to back.

Layout: LIMB-MAJOR [W, n] blocks -- limbs live on the 16 sublanes, batch
elements on the lanes, so every limb op is a full-width vector op.  The
wrapper transposes from the library's [n, W] convention at the boundary
(one cheap XLA pass each way).

Matches field/jfield.py's algorithm bit-for-bit: same lazy column bounds
(< 2^21 pre-REDC, < 2^22 during), same final conditional subtract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lasso_tpu.field import constants as K

W = K.NUM_LIMBS
B = K.LIMB_BITS
MASK = np.uint32(K.LIMB_MASK)

TILE = 1024  # batch tile per limb: one full native (8, 128) uint32 vreg tile


def _mont_mul_body(a, b, p_limbs, n0inv):
    """a, b: [W, 8, 128] uint32 (one full vreg tile per limb).

    Returns [W, 8, 128] canonical product.  Every op below is a whole-tile
    VPU op at full sublane/lane utilization."""
    p = [np.uint32(x) for x in p_limbs]
    n0 = np.uint32(n0inv)

    # schoolbook product columns col[0..2W] (each < 2^21)
    zero = jnp.zeros_like(a[0])
    cols = [zero for _ in range(2 * W + 1)]
    for i in range(W):
        ai = a[i]
        for j in range(W):
            prod = ai * b[j]
            cols[i + j] = cols[i + j] + (prod & MASK)
            cols[i + j + 1] = cols[i + j + 1] + (prod >> B)

    # Montgomery REDC: 16 steps, each cancels the lowest live column
    for i in range(W):
        m = (cols[i] * n0) & MASK
        lo0 = (m * p[0]) & MASK
        carry = (cols[i] + lo0) >> B
        for j in range(W):
            prod = m * p[j]
            cols[i + j] = cols[i + j] + (prod & MASK)
            cols[i + j + 1] = cols[i + j + 1] + (prod >> B)
        cols[i + 1] = cols[i + 1] + carry

    # carry propagation over the surviving W+1 columns
    res = []
    c = zero
    for j in range(W, 2 * W + 1):
        v = cols[j] + c
        res.append(v & MASK)
        c = v >> B
    # top column is zero (result < 2p < 2^256); conditional subtract p
    borrow = jnp.zeros(a[0].shape, jnp.int32)
    diffs = []
    for j in range(W):
        v = res[j].astype(jnp.int32) - np.int32(p_limbs[j]) - borrow
        diffs.append(v & jnp.int32(MASK))
        borrow = (v >> 31) & 1
    take = borrow == 0
    out = [jnp.where(take, d.astype(jnp.uint32), r)
           for d, r in zip(diffs, res[:W])]
    return jnp.stack(out, axis=0)


def _make_kernel(p_limbs, n0inv):
    def kernel(a_ref, b_ref, o_ref):
        o_ref[...] = _mont_mul_body(a_ref[...], b_ref[...], p_limbs, n0inv)

    return kernel


@functools.partial(jax.jit, static_argnames=("p_limbs", "n0inv", "interpret"))
def _mont_mul_lm(a_lm, b_lm, p_limbs, n0inv, interpret=False):
    """Limb-major entry: a_lm, b_lm [W, N/128, 128], N a multiple of TILE."""
    rows = a_lm.shape[1]  # N / 128
    grid = (rows // 8,)
    spec = pl.BlockSpec((W, 8, 128), lambda i: (0, i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_kernel(p_limbs, n0inv),
        out_shape=jax.ShapeDtypeStruct(a_lm.shape, jnp.uint32),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(a_lm, b_lm)


@functools.partial(jax.jit, static_argnames=("p_limbs", "n0inv", "interpret"))
def _mont_mul_lm_batched(a, b, p_limbs, n0inv, interpret=False):
    """Batched limb-major multiply: a, b [K, W, R, 128] (R multiple of 8)."""
    k, _, rows, _ = a.shape
    grid = (k, rows // 8)
    spec = pl.BlockSpec((1, W, 8, 128), lambda i, j: (i, 0, j, 0),
                        memory_space=pltpu.VMEM)

    def kernel(a_ref, b_ref, o_ref):
        o_ref[0] = _mont_mul_body(a_ref[0], b_ref[0], p_limbs, n0inv)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(a, b)


def mont_mul_lm(a, b, p_limbs, n0inv, interpret=False):
    """Limb-major multiply on [..., W, n] tensors (broadcasting leading dims).

    n is padded to a multiple of 1024 internally; limbs stay on sublanes so
    no transposes are needed anywhere.
    """
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    lead = shape[:-2]
    n = shape[-1]
    k = int(np.prod(lead)) if lead else 1
    pad = (-n) % TILE
    a2 = a.reshape(k, W, n)
    b2 = b.reshape(k, W, n)
    if pad:
        zz = jnp.zeros((k, W, pad), jnp.uint32)
        a2 = jnp.concatenate([a2, zz], axis=-1)
        b2 = jnp.concatenate([b2, zz], axis=-1)
    m = a2.shape[-1]
    out = _mont_mul_lm_batched(
        a2.reshape(k, W, m // 128, 128), b2.reshape(k, W, m // 128, 128),
        p_limbs, n0inv, interpret)
    out = out.reshape(k, W, m)
    if pad:
        out = out[..., :n]
    return out.reshape(shape)


# ---------------------------------------------------------------------------
# fused curve kernels: one Pallas launch per twisted Edwards group op
# ---------------------------------------------------------------------------

def _add_t(a, b, p_limbs):
    """Canonical limb add on [W, ...] tiles (carry ripple + cond-subtract)."""
    s = a + b
    outs = []
    c = jnp.zeros_like(s[0])
    for j in range(W):
        v = s[j] + c
        outs.append(v & MASK)
        c = v >> B
    return _cond_sub_t(outs, p_limbs)


def _sub_t(a, b, p_limbs):
    """Canonical limb subtract: a - b + p, ripple, cond-subtract."""
    outs = []
    c = jnp.zeros_like(a[0], ).astype(jnp.int32)
    for j in range(W):
        v = a[j].astype(jnp.int32) - b[j].astype(jnp.int32) \
            + np.int32(p_limbs[j]) + c
        outs.append((v & jnp.int32(MASK)).astype(jnp.uint32))
        c = v >> B
    return _cond_sub_t(outs, p_limbs)


def _cond_sub_t(limbs, p_limbs):
    borrow = jnp.zeros_like(limbs[0]).astype(jnp.int32)
    diffs = []
    for j in range(W):
        v = limbs[j].astype(jnp.int32) - np.int32(p_limbs[j]) - borrow
        diffs.append(v & jnp.int32(MASK))
        borrow = (v >> 31) & 1
    take = borrow == 0
    return jnp.stack([jnp.where(take, d.astype(jnp.uint32), r)
                      for d, r in zip(diffs, limbs)], axis=0)


def _rows(x):
    return [x[j] for j in range(W)]


def _padd_body(p, q, p_limbs, n0inv, a_mont, d_mont):
    """Unified hwcd addition on [4, W, 8, 128] tiles, fully in VMEM."""

    def mul(x, y):
        return _mont_mul_body(x, y, p_limbs, n0inv)

    def mulc(x, const_limbs):
        return _mont_mul_body(
            x, jnp.broadcast_to(
                jnp.asarray(const_limbs, jnp.uint32)[:, None, None], x.shape),
            p_limbs, n0inv)

    x1, y1, z1, t1 = p[0], p[1], p[2], p[3]
    x2, y2, z2, t2 = q[0], q[1], q[2], q[3]
    a_ = mul(x1, x2)
    b_ = mul(y1, y2)
    c_ = mulc(mul(t1, t2), d_mont)
    d_ = mul(z1, z2)
    s1 = _add_t(x1, y1, p_limbs)
    s2 = _add_t(x2, y2, p_limbs)
    e = _sub_t(_sub_t(mul(s1, s2), a_, p_limbs), b_, p_limbs)
    f = _sub_t(d_, c_, p_limbs)
    g = _add_t(d_, c_, p_limbs)
    h = _sub_t(b_, mulc(a_, a_mont), p_limbs)
    return jnp.stack([mul(e, f), mul(g, h), mul(f, g), mul(e, h)], axis=0)


@functools.partial(jax.jit, static_argnames=("p_limbs", "n0inv", "a_mont",
                                             "d_mont", "interpret"))
def _padd_lm_batched(p, q, p_limbs, n0inv, a_mont, d_mont, interpret=False):
    """p, q: [K, 4, W, R, 128] extended points; returns their sums."""
    k, _, _, rows, _ = p.shape
    grid = (k, rows // 8)
    spec = pl.BlockSpec((1, 4, W, 8, 128), lambda i, j: (i, 0, 0, j, 0),
                        memory_space=pltpu.VMEM)

    def kernel(p_ref, q_ref, o_ref):
        o_ref[0] = _padd_body(p_ref[0], q_ref[0], p_limbs, n0inv,
                              a_mont, d_mont)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(p.shape, jnp.uint32),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(p, q)


def padd_pallas(p, q, p_limbs, n0inv, a_mont, d_mont, interpret=False):
    """Fused curve addition on [..., 4, W, n] limb-major points."""
    shape = jnp.broadcast_shapes(p.shape, q.shape)
    p = jnp.broadcast_to(p, shape)
    q = jnp.broadcast_to(q, shape)
    lead = shape[:-3]
    n = shape[-1]
    k = int(np.prod(lead)) if lead else 1
    pad = (-n) % TILE
    p2 = p.reshape(k, 4, W, n)
    q2 = q.reshape(k, 4, W, n)
    if pad:
        zz = jnp.zeros((k, 4, W, pad), jnp.uint32)
        p2 = jnp.concatenate([p2, zz], axis=-1)
        q2 = jnp.concatenate([q2, zz], axis=-1)
    m = p2.shape[-1]
    out = _padd_lm_batched(
        p2.reshape(k, 4, W, m // 128, 128), q2.reshape(k, 4, W, m // 128, 128),
        p_limbs, n0inv, a_mont, d_mont, interpret)
    out = out.reshape(k, 4, W, m)
    if pad:
        out = out[..., :n]
    return out.reshape(shape)


def mont_mul_pallas(a, b, p_limbs, n0inv, interpret=False):
    """Drop-in for jfield._mont_mul on [..., W] tensors (any batch shape)."""
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    a = jnp.broadcast_to(a, shape)
    b = jnp.broadcast_to(b, shape)
    batch = shape[:-1]
    n = int(np.prod(batch)) if batch else 1
    pad = (-n) % TILE
    a2 = a.reshape(n, W)
    b2 = b.reshape(n, W)
    if pad:
        a2 = jnp.concatenate([a2, jnp.zeros((pad, W), jnp.uint32)], axis=0)
        b2 = jnp.concatenate([b2, jnp.zeros((pad, W), jnp.uint32)], axis=0)
    m = a2.shape[0]
    a_lm = a2.T.reshape(W, m // 128, 128)
    b_lm = b2.T.reshape(W, m // 128, 128)
    out_lm = _mont_mul_lm(a_lm, b_lm, p_limbs, n0inv, interpret)
    out = out_lm.reshape(W, m).T
    if pad:
        out = out[:n]
    return out.reshape(shape)
