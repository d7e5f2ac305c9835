"""Batched twisted Edwards curve ops on TPU, limb-major layout.

Points are tensors [..., 4, W, n]: extended coordinates (X, Y, Z, T) over the
base field, each coordinate W=16 Montgomery limbs, with the BATCH of points
on the last (lane) axis and limbs on the sublane axis.  This is the
TPU-native layout: the fused Pallas Montgomery multiply
(ops/field_pallas.py) reads it directly -- limbs on sublanes, batch on
lanes -- with no transposes, and every add/sub/select is a full-width
vector op.

Because a is a QR and d a non-QR for ark-curve25519, the unified hwcd
addition law is *complete*: P+P, P+identity and P+(-P) all flow through the
same formula.  That is the property that makes branch-free, fully vectorized
bucket accumulation possible on the TPU -- no exceptional-case handling in
kernels, masking with the identity point is always safe.

Group-op structure: the ~11 field muls of an addition are packed into 3
stacked mul_lm kernel invocations (leading axes are free for the limb
kernels), minimizing dispatch overhead and maximizing VPU occupancy.

Replaces arkworks `ark-ec` group ops (reference L0) for the TPU compute path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from lasso_tpu.curve import host as hostcurve
from lasso_tpu.field import constants as K
from lasso_tpu.field.host import Fp as HostFp
from lasso_tpu.field.jfield import JFp, W

_fadd = JFp.add_lm
_fsub = JFp.sub_lm
_fmul = JFp.mul_lm

# curve constants in Montgomery form, limb-major [W, 1]
_A_M = np.asarray(JFp.encode_scalar(K.CURVE_A)).reshape(W, 1)
_D_M = np.asarray(JFp.encode_scalar(K.CURVE_D)).reshape(W, 1)
_ONE_M = np.asarray(JFp.mont_one).reshape(W, 1)
_ZERO = np.zeros((W, 1), dtype=np.uint32)

IDENTITY = np.stack([_ZERO, _ONE_M, _ONE_M, _ZERO])  # [4, W, 1]


def identity(n=1, lead=()) -> jnp.ndarray:
    """Identity points: [*lead, 4, W, n]."""
    return jnp.broadcast_to(jnp.asarray(IDENTITY), tuple(lead) + (4, W, n))


def num_points(p) -> int:
    return p.shape[-1]


def _coords(p):
    return (p[..., 0, :, :], p[..., 1, :, :],
            p[..., 2, :, :], p[..., 3, :, :])


_A_TUPLE = tuple(int(x) for x in _A_M[:, 0])
_D_TUPLE = tuple(int(x) for x in _D_M[:, 0])

_FUSED_PADD: bool | None = None


def _use_fused_padd() -> bool:
    """One fused Pallas kernel per curve add on TPU (ops/field_pallas.py);
    the stacked-mul XLA path otherwise.  LASSO_TPU_PALLAS_PADD=0 disables."""
    global _FUSED_PADD
    if _FUSED_PADD is None:
        import os

        env = os.environ.get("LASSO_TPU_PALLAS_PADD", "auto")
        if env in ("0", "off"):
            _FUSED_PADD = False
        elif env in ("1", "on"):
            _FUSED_PADD = True
        else:
            try:
                _FUSED_PADD = jax.default_backend() == "tpu"
            except Exception:
                _FUSED_PADD = False
    return _FUSED_PADD


def padd(p, q):
    """Unified extended twisted Edwards addition (add-2008-hwcd), complete."""
    if _use_fused_padd():
        from lasso_tpu.ops.field_pallas import padd_pallas

        def _fused(a, b):
            return padd_pallas(a, b, JFp.p_limbs, JFp.n0inv,
                               _A_TUPLE, _D_TUPLE)

        try:
            return jax.lax.platform_dependent(p, q, tpu=_fused,
                                              default=_padd_xla)
        except Exception:
            return _padd_xla(p, q)
    return _padd_xla(p, q)


def _padd_xla(p, q):
    """Stacked-mul XLA fallback for non-TPU platforms."""
    shape = jnp.broadcast_shapes(p.shape, q.shape)
    p = jnp.broadcast_to(p, shape)
    q = jnp.broadcast_to(q, shape)
    x1, y1, z1, t1 = _coords(p)
    x2, y2, z2, t2 = _coords(q)

    s1 = _fadd(x1, y1)
    s2 = _fadd(x2, y2)
    u = _fmul(jnp.stack([x1, y1, t1, s1]), jnp.stack([x2, y2, t2, s2]))
    a_, b_, tt, s = u[0], u[1], u[2], u[3]

    consts = jnp.stack([
        jnp.broadcast_to(jnp.asarray(_D_M), tt.shape),
        jnp.broadcast_to(jnp.asarray(_A_M), a_.shape),
        z2,
    ])
    v = _fmul(jnp.stack([tt, a_, z1]), consts)
    c_, a_a, d_ = v[0], v[1], v[2]

    e = _fsub(_fsub(s, a_), b_)
    f = _fsub(d_, c_)
    g = _fadd(d_, c_)
    h = _fsub(b_, a_a)

    w = _fmul(jnp.stack([e, g, f, e]), jnp.stack([f, h, g, h]))
    return jnp.stack([w[0], w[1], w[2], w[3]], axis=-3)


def pdbl(p):
    """Doubling: routed through the complete unified addition (P+P) when the
    fused kernel is active, dedicated dbl-2008-hwcd formulas otherwise."""
    if _use_fused_padd():
        return padd(p, p)
    return _pdbl_xla(p)


def _pdbl_xla(p):
    x1, y1, z1, _ = _coords(p)
    s1 = _fadd(x1, y1)
    u = _fmul(jnp.stack([x1, y1, z1, s1]), jnp.stack([x1, y1, z1, s1]))
    a_, b_, zz, s2 = u[0], u[1], u[2], u[3]
    a_a = _fmul(a_, jnp.asarray(_A_M))
    c_ = _fadd(zz, zz)
    e = _fsub(_fsub(s2, a_), b_)
    g = _fadd(a_a, b_)
    f = _fsub(g, c_)
    h = _fsub(a_a, b_)
    w = _fmul(jnp.stack([e, g, f, e]), jnp.stack([f, h, g, h]))
    return jnp.stack([w[0], w[1], w[2], w[3]], axis=-3)


def pneg(p):
    x, y, z, t = _coords(p)
    return jnp.stack([JFp.neg_lm(x), y, z, JFp.neg_lm(t)], axis=-3)


def pselect(mask, p, q):
    """mask [..., n] bool -> p where true else q (points [..., 4, W, n])."""
    return jnp.where(mask[..., None, None, :], p, q)


padd_jit = jax.jit(padd)
pdbl_jit = jax.jit(pdbl)


def tree_sum(points) -> jnp.ndarray:
    """Sum points along the batch axis: [..., 4, W, n] -> [..., 4, W, 1].

    log(n) halving rounds inside one fori_loop with a fixed-shape body
    (mask + dynamic roll), so the curve-addition subgraph is compiled ONCE
    per shape instead of once per round.
    """
    n = points.shape[-1]
    if n == 0:
        return identity(1, points.shape[:-3])
    pow2 = 1 << (n - 1).bit_length()
    if pow2 != n:
        pad = identity(pow2 - n, points.shape[:-3])
        points = jnp.concatenate([points, pad], axis=-1)
    return _tree_sum_jit(points)


@jax.jit
def _tree_sum_jit(points):
    n = points.shape[-1]
    if n == 1:
        return points
    rounds = (n - 1).bit_length()
    idx = jnp.arange(n)

    def body(i, pts):
        half = n >> (i + 1)
        active = idx < half
        partner = jnp.roll(pts, -half, axis=-1)
        return pselect(active, padd(pts, partner), pts)

    points = jax.lax.fori_loop(0, rounds, body, points)
    return points[..., :1]


# ---------------------------------------------------------------------------
# host <-> device conversion
# ---------------------------------------------------------------------------

def from_host_points(points: list[hostcurve.Point]) -> jnp.ndarray:
    """Host points -> [4, W, n] device tensor (normalized to Z=1 first so the
    encode is cheap and T = X*Y)."""
    n = len(points)
    zinvs = HostFp.batch_inv([p.z for p in points])
    rows = []
    for p, zi in zip(points, zinvs):
        x = p.x * zi % HostFp.p
        y = p.y * zi % HostFp.p
        rows.append((x, y, 1, x * y % HostFp.p))
    flat = [c for row in rows for c in row]
    enc = JFp.encode_ints(flat)  # [4n, W]
    return jnp.transpose(enc.reshape(n, 4, W), (1, 2, 0))


def to_host_points(arr) -> list[hostcurve.Point]:
    """[.., 4, W, n] -> host points (leading dims flattened batch-first)."""
    n = arr.shape[-1]
    flat = jnp.moveaxis(arr.reshape(-1, 4, W, n), -1, 1).reshape(-1, W)
    vals = JFp.decode(flat)
    out = []
    for i in range(0, len(vals), 4):
        out.append(hostcurve.Point(vals[i], vals[i + 1], vals[i + 2], vals[i + 3]))
    return out


def to_host_point(arr) -> hostcurve.Point:
    return to_host_points(arr.reshape(4, W, -1))[0]


# ark serialize_compressed on device --------------------------------------

_HALF_P1 = np.asarray(K.limbs_of((HostFp.p + 1) // 2), dtype=np.uint32)


def affine_int_limbs_device(pts):
    """[4, W, n] extended Montgomery points -> (xa, ya) canonical 16-bit
    int limbs [n, W] of the affine coordinates (sync-free Fermat Z-inverse).
    """
    x_m = jnp.moveaxis(pts[0], -1, -2)  # [n, W] Montgomery
    y_m = jnp.moveaxis(pts[1], -1, -2)
    z_m = jnp.moveaxis(pts[2], -1, -2)
    zinv = JFp.inv_device(z_m)
    xa = JFp.to_int_limbs(JFp.mul(x_m, zinv))  # canonical 16-bit limbs
    ya = JFp.to_int_limbs(JFp.mul(y_m, zinv))
    return xa, ya


def compress_affine_bytes_device(xa, ya) -> jnp.ndarray:
    """Canonical affine int limbs [n, W] -> [n, 32] uint32 compressed bytes,
    byte-exact with host Point.to_compressed_bytes (ark twisted Edwards:
    canonical-LE y with the 'x is negative' flag in the top bit; 'negative'
    means x >= (p+1)/2, evaluated limb-lexicographically)."""
    half = jnp.asarray(_HALF_P1)
    ge = jnp.zeros(xa.shape[:-1], jnp.bool_)
    decided = jnp.zeros(xa.shape[:-1], jnp.bool_)
    for i in range(W - 1, -1, -1):
        gt = xa[..., i] > half[i]
        lt = xa[..., i] < half[i]
        ge = jnp.where(~decided & gt, True, ge)
        decided = decided | gt | lt
    ge = jnp.where(~decided, True, ge)  # x == (p+1)/2 is negative too

    lo = ya & 0xFF
    hi = (ya >> 8) & 0xFF
    by = jnp.stack([lo, hi], axis=-1).reshape(ya.shape[:-1] + (32,))
    return by.at[..., 31].set(by[..., 31] | (ge.astype(jnp.uint32) << 7))


def compress_points_device(pts) -> jnp.ndarray:
    """[4, W, n] extended Montgomery points -> [n, 32] compressed bytes."""
    return compress_affine_bytes_device(*affine_int_limbs_device(pts))
