"""Dense multilinear polynomials on TPU.

Replaces the reference's `DensePolynomial` (reference: src/poly/dense_mlpoly.rs)
with a device-resident evaluation table: [n, 16] Montgomery limb tensors over
Fr.  The sumcheck bind (`bound_var_top`) and the Hyrax L-fold (`bound`) are
single fused vector expressions; `evaluate` is an eq-table build plus a
modular tree reduction -- all shapes static per size, so XLA compiles each
size once and reuses it across rounds and proofs.

Index convention matches the reference: index bit 0 (LSB) is the LAST
variable; `bound_var_top` binds the most significant variable (splits the
table in halves), `bound_var_bot` the least significant (even/odd interleave).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from lasso_tpu.field.host import Fr
from lasso_tpu.field.jfield import JFr, W, pack_u64_array


def _is_pow2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


@jax.jit
def _bound_var_top(z, r):
    half = z.shape[0] // 2
    lo, hi = z[:half], z[half:]
    return JFr.add(lo, JFr.mul(r, JFr.sub(hi, lo)))


@jax.jit
def _bound_var_bot(z, r):
    lo, hi = z[0::2], z[1::2]
    return JFr.add(lo, JFr.mul(r, JFr.sub(hi, lo)))


@jax.jit
def _bound_fold(z, l_vec):
    """L-fold L @ Z over the [L, R] matrix view, ONE program: the row-scaled
    products fuse into the reduction instead of materializing a full-size
    [L, R, W] intermediate (2x the polynomial's HBM at flagship shapes)."""
    l_size = l_vec.shape[0]
    zmat = z.reshape(l_size, -1, W)
    return JFr.sum(JFr.mul(zmat, l_vec[:, None, :]))


@jax.jit
def _eq_evals_stacked(r_stack):
    """[l, W] challenges -> [2^l, W] eq table; one fused dispatch."""
    e = JFr.ones(1)
    for i in range(r_stack.shape[0]):  # static from shape
        t = JFr.mul(e, r_stack[i])  # e * r_j
        rest = JFr.sub(e, t)  # e * (1 - r_j)
        e = jnp.stack([rest, t], axis=1).reshape(-1, W)
    return e


def eq_evals_device(r_list) -> jnp.ndarray:
    """eq(r, .) table over {0,1}^len(r): [2^l, W].

    Layout matches the reference (src/poly/eq_poly.rs:21-38): index MSB
    corresponds to r[0].  One jitted dispatch (an eager per-variable loop
    costs ~50ms of tunnel dispatch per step)."""
    if not r_list:
        return JFr.ones(1)
    return _eq_evals_stacked(jnp.stack(list(r_list)))


class DensePolynomial:
    """Evaluations over the boolean hypercube, on device."""

    def __init__(self, z: jnp.ndarray):
        assert z.ndim == 2 and z.shape[1] == W
        assert _is_pow2(z.shape[0]), "dense MLE length must be a power of two"
        self.z = z

    # -- constructors ---------------------------------------------------------
    @classmethod
    def from_ints(cls, vals) -> "DensePolynomial":
        return cls(JFr.encode_ints(vals))

    @classmethod
    def from_u64(cls, vals) -> "DensePolynomial":
        """From small non-negative ints (e.g. indices/counters), padded to pow2."""
        vals = np.asarray(vals, dtype=np.uint64)
        n = len(vals)
        pow2 = 1 << max((n - 1).bit_length(), 0) if n else 1
        if pow2 != n:
            vals = np.concatenate([vals, np.zeros(pow2 - n, dtype=np.uint64)])
        return cls(JFr.encode_u64_array(vals))

    @classmethod
    def merge(cls, polys) -> "DensePolynomial":
        """Concatenate several polynomials, zero-padded to the next pow2
        (reference: dense_mlpoly.rs:251-261)."""
        zs = [p.z for p in polys]
        total = sum(z.shape[0] for z in zs)
        pow2 = 1 << (total - 1).bit_length()
        if pow2 != total:
            zs.append(jnp.zeros((pow2 - total, W), dtype=jnp.uint32))
        return cls(jnp.concatenate(zs, axis=0))

    # -- metadata ----------------------------------------------------------------
    def __len__(self) -> int:
        return self.z.shape[0]

    @property
    def num_vars(self) -> int:
        return (len(self) - 1).bit_length()

    def clone(self) -> "DensePolynomial":
        return DensePolynomial(self.z)

    def split(self, idx: int):
        return DensePolynomial(self.z[:idx]), DensePolynomial(self.z[idx: 2 * idx])

    # -- core ops ------------------------------------------------------------------
    def bound_var_top(self, r) -> "DensePolynomial":
        """Bind the top variable to scalar r ([W] Montgomery limbs)."""
        return DensePolynomial(_bound_var_top(self.z, r))

    def bound_var_bot(self, r) -> "DensePolynomial":
        return DensePolynomial(_bound_var_bot(self.z, r))

    def bound(self, l_vec: jnp.ndarray) -> jnp.ndarray:
        """L-fold for Hyrax: view Z as [L, R] matrix, return L @ Z ([R, W])."""
        return _bound_fold(self.z, l_vec)

    def evaluate_device(self, r_list) -> jnp.ndarray:
        """Z(r) as [W] device scalar."""
        chis = eq_evals_device(r_list)
        assert chis.shape[0] == len(self)
        return JFr.sum(JFr.mul(self.z, chis))

    def evaluate(self, r_ints: list[int]) -> int:
        """Z(r) as a host int (r given as host field ints)."""
        rs = [JFr.encode_scalar(x) for x in r_ints]
        return JFr.decode(self.evaluate_device(rs)[None])[0]

    def to_ints(self) -> list[int]:
        return JFr.decode(self.z)

    def __getitem__(self, i: int) -> int:
        return JFr.decode(self.z[i][None])[0]


# ---------------------------------------------------------------------------
# host-side helpers for tiny polynomials (n-to-1 reductions over <=32 values)
# ---------------------------------------------------------------------------

def bound_var_bot_host(vals: list[int], r: int) -> list[int]:
    return [(vals[2 * i] + r * (vals[2 * i + 1] - vals[2 * i])) % Fr.p
            for i in range(len(vals) // 2)]


def evaluate_host(vals: list[int], r: list[int]) -> int:
    """MLE evaluation with host ints (verifier-side tiny cases)."""
    assert len(vals) == 1 << len(r)
    chis = eq_evals_host(r)
    return sum(v * c for v, c in zip(vals, chis)) % Fr.p


def eq_evals_host(r: list[int]) -> list[int]:
    evals = [1]
    for rj in r:
        nxt = []
        for e in evals:
            t = e * rj % Fr.p
            nxt.append((e - t) % Fr.p)
            nxt.append(t)
        evals = nxt
    return evals


def eq_evaluate_host(r: list[int], rx: list[int]) -> int:
    """eq(r, rx) (reference: src/poly/eq_poly.rs:14-19)."""
    assert len(r) == len(rx)
    acc = 1
    for a, b in zip(r, rx):
        acc = acc * ((a * b + (1 - a) * (1 - b)) % Fr.p) % Fr.p
    return acc


def factored_lens(ell: int) -> tuple[int, int]:
    return ell // 2, ell - ell // 2
