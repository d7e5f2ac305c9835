"""Batched prime-field arithmetic on TPU (JAX/XLA).

Field elements are tensors of 16 little-endian 16-bit limbs held in uint32
lanes, in Montgomery form (value * 2^256 mod p).  This layout is chosen for
the TPU's 32-bit vector unit:

  * limb product  a_i * b_j < 2^32  -- exact in uint32, no 64-bit emulation
  * 32 partial products accumulate per column without overflow (< 2^21)
  * Montgomery REDC is 16 unrolled vector steps; carries are short chains

Every op is elementwise over an arbitrary batch shape [..., 16], so polynomial
folds, eq-table builds, fingerprint constructions, and curve formulas all
become big vectorized expressions XLA can fuse.  Reductions (sumcheck claims)
use pairwise modular tree-adds, which shard cleanly over a device mesh: local
tree -> psum of 16-limb partials -> one carry pass.

Replaces arkworks `ark-ff` (reference L0) for the TPU compute path; the exact
host oracle lives in field/host.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from lasso_tpu.field import constants as K
from lasso_tpu.field.host import Fp as HostFp
from lasso_tpu.field.host import Fr as HostFr
from lasso_tpu.field.host import HostField

W = K.NUM_LIMBS  # 16 limbs
B = K.LIMB_BITS  # 16 bits
MASK = K.LIMB_MASK

_PALLAS_MUL: bool | None = None


def _use_pallas_mul() -> bool:
    """Fused Pallas multiply on TPU; XLA elementwise elsewhere.

    LASSO_TPU_PALLAS=1/0 forces it on/off (it also runs under CPU interpret
    mode for debugging, but the XLA path is faster there)."""
    global _PALLAS_MUL
    if _PALLAS_MUL is None:
        import os

        env = os.environ.get("LASSO_TPU_PALLAS", "auto")
        if env in ("0", "off"):
            _PALLAS_MUL = False
        elif env in ("1", "on"):
            _PALLAS_MUL = True
        else:
            try:
                _PALLAS_MUL = jax.default_backend() == "tpu"
            except Exception:
                _PALLAS_MUL = False
    return _PALLAS_MUL


# ---------------------------------------------------------------------------
# packing helpers (host <-> limb tensors)
# ---------------------------------------------------------------------------

def pack_int(x: int) -> np.ndarray:
    return np.array(K.limbs_of(x), dtype=np.uint32)

def pack_ints(xs) -> np.ndarray:
    out = np.empty((len(xs), W), dtype=np.uint32)
    for i, x in enumerate(xs):
        v = int(x)
        for j in range(W):
            out[i, j] = (v >> (B * j)) & MASK
    return out

def pack_u64_array(xs: np.ndarray) -> np.ndarray:
    """Vectorized packing of uint64 values into [n, 16] limb tensors."""
    xs = np.asarray(xs, dtype=np.uint64)
    out = np.zeros(xs.shape + (W,), dtype=np.uint32)
    for j in range(4):
        out[..., j] = (xs >> np.uint64(B * j)).astype(np.uint32) & MASK
    return out

def unpack_ints(arr) -> list[int]:
    arr = np.asarray(arr).astype(np.uint64)
    flat = arr.reshape(-1, W)
    shifts = np.uint64(B) * np.arange(W, dtype=np.uint64)
    vals = []
    for row in flat:
        vals.append(int(sum(int(v) << int(s) for v, s in zip(row, shifts))))
    return vals


# ---------------------------------------------------------------------------
# limb kernels (field-generic; modulus baked in as compile-time constants)
# ---------------------------------------------------------------------------

def _carry_prop_u32(x):
    """Propagate carries of lazy uint32 limbs; total value must be < 2^(16W)."""
    c = jnp.zeros_like(x[..., 0])
    outs = []
    for j in range(x.shape[-1]):
        v = x[..., j] + c
        outs.append(v & MASK)
        c = v >> B
    return jnp.stack(outs, axis=-1)


def _carry_prop_i32(x):
    """Signed variant: limbs may be negative; total value must be in [0, 2^(16W))."""
    c = jnp.zeros_like(x[..., 0])
    outs = []
    for j in range(x.shape[-1]):
        v = x[..., j] + c
        outs.append(v & MASK)
        c = v >> B  # arithmetic shift = floor division for negatives
    return jnp.stack(outs, axis=-1)


def _cond_sub(x, m_limbs):
    """x - m if x >= m else x, for canonical-limbed x and constant m."""
    xi = x.astype(jnp.int32)
    borrow = jnp.zeros_like(xi[..., 0])
    diffs = []
    for j in range(W):
        v = xi[..., j] - np.int32(m_limbs[j]) - borrow
        diffs.append(v & MASK)
        borrow = (v >> 31) & 1
    diff = jnp.stack(diffs, axis=-1)
    take = (borrow == 0)[..., None]
    return jnp.where(take, diff, xi).astype(jnp.uint32)


def _add(a, b, p_limbs):
    s = _carry_prop_u32(a + b)
    return _cond_sub(s, p_limbs)


def _sub(a, b, p_limbs):
    d = a.astype(jnp.int32) - b.astype(jnp.int32) + np.asarray(p_limbs, np.int32)
    d = jnp.broadcast_to(d, jnp.broadcast_shapes(a.shape, b.shape))
    s = _carry_prop_i32(d).astype(jnp.uint32)
    return _cond_sub(s, p_limbs)


def _shear_sum(rows, offset: int, total: int):
    """sum_i shift(rows[..., i, :], i + offset) over a [..., W, K] tensor,
    producing [..., total] columns: out[k] = sum_i rows[i, k - i - offset].

    Implemented as a pad + strided reshape ("shear") so the whole reduction is
    elementwise/reshape work that XLA fuses -- no scatters, no
    dynamic-update-slices (those dominate compile time and break fusion).
    """
    k = rows.shape[-1]
    batch = rows.shape[:-2]
    w = rows.shape[-2]
    # row i must land at offset i (+ constant offset): pad rows to width
    # total + 1 so that flattening and re-viewing with stride `total` shifts
    # each successive row by one extra column.
    pad_cols = (total + 1) - k
    padded = jnp.pad(rows, [(0, 0)] * len(batch) + [(0, 0), (0, pad_cols)])
    flat = padded.reshape(batch + (w * (total + 1),))
    flat = flat[..., : w * total]
    sheared = flat.reshape(batch + (w, total))
    out = jnp.sum(sheared, axis=-2)
    if offset:
        out = jnp.concatenate(
            [jnp.zeros(batch + (offset,), rows.dtype), out[..., :-offset]], axis=-1)
    return out


def _product_columns(a, b):
    """Schoolbook product columns: [..., 2W+1] uint32, each column < 2^21."""
    prod = a[..., :, None] * b[..., None, :]  # [..., W, W] uint32, exact
    lo = prod & MASK
    hi = prod >> B
    total = 2 * W + 1
    return _shear_sum(lo, 0, total) + _shear_sum(hi, 1, total)


def _mont_redc(col, p_limbs, n0inv):
    """Montgomery reduction of 2W+1 lazy columns -> canonical W limbs (< p)."""
    p_arr = np.asarray(p_limbs, np.uint32)
    total = 2 * W + 1
    batch = col.shape[:-1]
    t = col
    zeros_prefix = [jnp.zeros(batch + (i,), jnp.uint32) for i in range(W + 2)]

    def shifted(vec, off):
        """Place [..., K] vec at column offset `off` within width `total`."""
        k = vec.shape[-1]
        tail = total - off - k
        parts = []
        if off:
            parts.append(zeros_prefix[off])
        parts.append(vec)
        if tail:
            parts.append(jnp.zeros(batch + (tail,), jnp.uint32))
        return jnp.concatenate(parts, axis=-1)

    for i in range(W):
        m = (t[..., i] * np.uint32(n0inv)) & MASK
        prod = m[..., None] * p_arr
        # carry of limb i once m*p0's low half lands on it (t[i] becomes
        # congruent to 0 mod 2^16; only its carry survives)
        carry = (t[..., i] + (prod[..., 0] & MASK)) >> B
        t = (t + shifted(prod & MASK, i) + shifted(prod >> B, i + 1)
             + shifted(carry[..., None], i + 1))
    res = _carry_prop_u32(t[..., W: 2 * W + 1])
    # top limb is zero because the REDC output is < 2p < 2^256
    res = res[..., :W]
    return _cond_sub(res, p_limbs)


def _mont_mul(a, b, p_limbs, n0inv):
    return _mont_redc(_product_columns(a, b), p_limbs, n0inv)


def _split_shift_renorm(cols):
    """Lazy renormalization of uint32 columns: value-preserving rewrite with
    all limbs < 2^17 and one extra limb of width."""
    lo = cols & MASK
    hi = cols >> B
    batch = cols.shape[:-1]
    z = jnp.zeros(batch + (1,), jnp.uint32)
    return (jnp.concatenate([lo, z], axis=-1)
            + jnp.concatenate([z, hi], axis=-1))


# ---------------------------------------------------------------------------
# limb-major variants: limbs on axis -2, batch on axis -1 ([..., W, n]).
# This is the TPU-native layout for the curve/MSM layer: limbs sit on
# sublanes, batch elements on lanes, so the fused Pallas multiply needs no
# transposes and every add/sub is a full-width vector op.
# ---------------------------------------------------------------------------

def _carry_prop_u32_lm(x):
    c = jnp.zeros_like(x[..., 0, :])
    outs = []
    for j in range(x.shape[-2]):
        v = x[..., j, :] + c
        outs.append(v & MASK)
        c = v >> B
    return jnp.stack(outs, axis=-2)


def _carry_prop_i32_lm(x):
    c = jnp.zeros_like(x[..., 0, :])
    outs = []
    for j in range(x.shape[-2]):
        v = x[..., j, :] + c
        outs.append(v & MASK)
        c = v >> B
    return jnp.stack(outs, axis=-2)


def _cond_sub_lm(x, m_limbs):
    xi = x.astype(jnp.int32)
    borrow = jnp.zeros_like(xi[..., 0, :])
    diffs = []
    for j in range(W):
        v = xi[..., j, :] - np.int32(m_limbs[j]) - borrow
        diffs.append(v & MASK)
        borrow = (v >> 31) & 1
    diff = jnp.stack(diffs, axis=-2)
    take = (borrow == 0)[..., None, :]
    return jnp.where(take, diff, xi).astype(jnp.uint32)


def _add_lm(a, b, p_limbs):
    s = _carry_prop_u32_lm(a + b)
    return _cond_sub_lm(s, p_limbs)


def _sub_lm(a, b, p_limbs):
    d = (a.astype(jnp.int32) - b.astype(jnp.int32)
         + np.asarray(p_limbs, np.int32)[:, None])
    d = jnp.broadcast_to(d, jnp.broadcast_shapes(a.shape, b.shape))
    s = _carry_prop_i32_lm(d).astype(jnp.uint32)
    return _cond_sub_lm(s, p_limbs)


def _canon_wide(x, p_shifts):
    """Reduce a canonical-limbed value < 2^256 to [0, p): conditional subtract
    8p, 4p, 2p, p (each p_shift = limbs of p << k)."""
    for m in p_shifts:
        x = _cond_sub(x, m)
    return x


# ---------------------------------------------------------------------------
# field object
# ---------------------------------------------------------------------------

class JField:
    """Batched field ops over a fixed modulus, jitted per array shape."""

    def __init__(self, host: HostField, name: str):
        self.host = host
        self.name = name
        p = host.p
        self.p_limbs = tuple(K.limbs_of(p))
        self.n0inv = (-pow(p, -1, 1 << B)) % (1 << B)
        # shifted moduli for wide canonicalization (value < 2^256 <= 16p)
        shifts = []
        for k in (3, 2, 1, 0):
            if (p << k) < (1 << 256):
                shifts.append(tuple(K.limbs_of(p << k)))
        self.p_shifts = tuple(shifts)

        self.r2_limbs = pack_int(host.r2)  # R^2 mod p (for encoding)
        self.r3_limbs = pack_int(host.r2 * host.r % p)  # R^3 mod p (challenge reduction)
        self.one_limbs = pack_int(1)  # literal 1 (for decoding)
        self.mont_one = pack_int(host.r % p)  # field one in Montgomery form
        self.zero_limbs = pack_int(0)

        self.add = jax.jit(functools.partial(_add, p_limbs=self.p_limbs))
        self.sub = jax.jit(functools.partial(_sub, p_limbs=self.p_limbs))
        self._mul_xla = jax.jit(functools.partial(_mont_mul, p_limbs=self.p_limbs, n0inv=self.n0inv))
        self._add_lm = jax.jit(functools.partial(_add_lm, p_limbs=self.p_limbs))
        self._sub_lm = jax.jit(functools.partial(_sub_lm, p_limbs=self.p_limbs))
        self._mul_lm_xla = jax.jit(
            lambda a, b: jnp.moveaxis(
                _mont_mul(jnp.moveaxis(a, -2, -1), jnp.moveaxis(b, -2, -1),
                          self.p_limbs, self.n0inv), -1, -2))
        self._canon = jax.jit(functools.partial(_canon_wide, p_shifts=self.p_shifts))
        self._sum = jax.jit(self._sum_impl)

        # p-2 exponent bits, MSB first, for Fermat inversion on device
        e = p - 2
        self._inv_exp_bits = np.asarray(
            [(e >> i) & 1 for i in range(e.bit_length() - 1, -1, -1)],
            dtype=np.uint32)

    def inv_device(self, x) -> jnp.ndarray:
        """Fermat inverse x^(p-2) of Montgomery elements [..., W] on device.

        A fori_loop square-and-multiply over the constant exponent bits;
        ~2*255 sequential small muls, negligible inside a fused kernel and
        sync-free (vs a host round trip for an extended-gcd inverse)."""
        bits = jnp.asarray(self._inv_exp_bits)

        def body(i, acc):
            acc = self.mul(acc, acc)
            return jnp.where(bits[i] == 1, self.mul(acc, x), acc)

        one = jnp.broadcast_to(jnp.asarray(self.mont_one), x.shape)
        return jax.lax.fori_loop(0, bits.shape[0], body, one)

    def mul(self, a, b) -> jnp.ndarray:
        """Montgomery product; the fused Pallas kernel when lowering for
        TPU (ops/field_pallas.py), XLA elementwise otherwise.  The platform
        branch is resolved at lowering time so the same code works inside
        CPU-mesh shard_maps and on the TPU."""
        if not _use_pallas_mul():
            return self._mul_xla(a, b)
        from lasso_tpu.ops.field_pallas import mont_mul_pallas

        def _pallas(x, y):
            return mont_mul_pallas(x, y, self.p_limbs, self.n0inv)

        try:
            return jax.lax.platform_dependent(
                a, b, tpu=_pallas, default=self._mul_xla)
        except Exception:
            return self._mul_xla(a, b)

    # -- limb-major ops ([..., W, n]: limbs on sublanes, batch on lanes) ------
    def add_lm(self, a, b) -> jnp.ndarray:
        return self._add_lm(a, b)

    def sub_lm(self, a, b) -> jnp.ndarray:
        return self._sub_lm(a, b)

    def mul_lm(self, a, b) -> jnp.ndarray:
        """Limb-major Montgomery product (the curve/MSM hot path)."""
        if not _use_pallas_mul():
            return self._mul_lm_xla(a, b)
        from lasso_tpu.ops.field_pallas import mont_mul_lm

        def _pallas(x, y):
            return mont_mul_lm(x, y, self.p_limbs, self.n0inv)

        try:
            return jax.lax.platform_dependent(
                a, b, tpu=_pallas, default=self._mul_lm_xla)
        except Exception:
            return self._mul_lm_xla(a, b)

    def neg_lm(self, a) -> jnp.ndarray:
        return self.sub_lm(jnp.zeros_like(a), a)

    # -- constructors -------------------------------------------------------
    def encode_ints(self, xs) -> jnp.ndarray:
        """Host ints -> device Montgomery limbs [n, W]."""
        return jnp.asarray(pack_ints([self.host.to_mont(int(x) % self.host.p) for x in xs]))

    def encode_scalar(self, x: int) -> jnp.ndarray:
        return jnp.asarray(pack_int(self.host.to_mont(int(x) % self.host.p)))

    def encode_u64_array(self, xs: np.ndarray) -> jnp.ndarray:
        """uint64 values -> Montgomery limbs, with the x*R step done on device."""
        packed = jnp.asarray(pack_u64_array(xs))
        return self.mul(packed, jnp.asarray(self.r2_limbs))

    def zeros(self, shape) -> jnp.ndarray:
        if isinstance(shape, int):
            shape = (shape,)
        return jnp.zeros(tuple(shape) + (W,), dtype=jnp.uint32)

    def ones(self, shape) -> jnp.ndarray:
        if isinstance(shape, int):
            shape = (shape,)
        return jnp.broadcast_to(jnp.asarray(self.mont_one), tuple(shape) + (W,))

    # -- converters ---------------------------------------------------------
    def decode(self, arr) -> list[int]:
        """Device Montgomery limbs -> host ints (canonical values)."""
        vals = unpack_ints(arr)
        return [self.host.from_mont(v) for v in vals]

    def decode_scalar(self, arr) -> int:
        return self.decode(arr)[0]

    def to_int_limbs(self, arr) -> jnp.ndarray:
        """Montgomery form -> canonical integer limbs (for digit decomposition)."""
        return self.mul(arr, jnp.asarray(self.one_limbs))

    # -- reductions -----------------------------------------------------------
    #
    # Field sums exploit the 16/32 limb layout: uint32 lanes hold 16 bits of
    # headroom, so up to 2^12 Montgomery values are accumulated with ONE
    # native jnp.sum (no modular adds at all), lazily renormalized
    # (split+shift, limbs back under 2^17), and summed again hierarchically.
    # The final wide value (< n*p) is collapsed with a single Montgomery REDC
    # + re-encode.  This replaces a log(n)-deep tree of modular adds with
    # native reductions XLA turns into one pass -- the #1 hot reduction in
    # sumcheck rounds, MLE evaluation and Hyrax L-folds.
    def sum_columns(self, x):
        """Lazy hierarchical column sums along axis 0: [n, ..., W] ->
        [..., W+levels] wide columns, each limb < 2^17.  Safe to psum across
        up to 2^15 shards before `finish_sum` (limbs stay under 2^32)."""
        cols = x
        n = cols.shape[0]
        while n > 1:
            chunk = min(n, 4096)
            if n % chunk:
                padn = chunk - n % chunk
                cols = jnp.concatenate(
                    [cols, jnp.zeros((padn,) + cols.shape[1:], jnp.uint32)], axis=0)
                n += padn
            cols = cols.reshape((n // chunk, chunk) + cols.shape[1:]).sum(
                axis=1, dtype=jnp.uint32)
            cols = _split_shift_renorm(cols)  # limbs < 2^17, width + 1
            n = n // chunk
        if cols.shape[0] == 1:
            return cols[0]
        return _split_shift_renorm(cols.sum(axis=0, dtype=jnp.uint32))

    def finish_sum(self, wide):
        """Collapse wide lazy columns (limbs < 2^21, value < R*p) to a
        canonical Montgomery element."""
        width = wide.shape[-1]
        if width < 2 * W + 1:
            wide = jnp.concatenate(
                [wide, jnp.zeros(wide.shape[:-1] + (2 * W + 1 - width,), jnp.uint32)],
                axis=-1)
        # REDC strips one R factor (values are a*R); re-encode with R^2
        s = _mont_redc(wide, self.p_limbs, self.n0inv)
        return _mont_mul(s, jnp.asarray(self.r2_limbs), self.p_limbs, self.n0inv)

    def _sum_impl(self, x):
        return self.finish_sum(self.sum_columns(x))

    def sum(self, x) -> jnp.ndarray:
        """Sum of field elements along axis 0 of [n, ..., W] -> [..., W]."""
        n = x.shape[0]
        if n == 0:
            return jnp.zeros(x.shape[1:], dtype=jnp.uint32)
        return self._sum(x)

    def canon_wide(self, x) -> jnp.ndarray:
        """Reduce canonical-limbed values < 2^256 into [0, p)."""
        return self._canon(x)

    # -- misc -------------------------------------------------------------------
    def neg(self, a) -> jnp.ndarray:
        return self.sub(jnp.zeros_like(a), a)

    def select(self, mask, a, b) -> jnp.ndarray:
        """mask: [...] bool; a, b: [..., W]."""
        return jnp.where(mask[..., None], a, b)


JFr = JField(HostFr, "Fr")
JFp = JField(HostFp, "Fp")
