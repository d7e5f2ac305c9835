"""Sumcheck prover/verifier (reference: src/subprotocols/sumcheck.rs).

TPU decomposition: each round is one fused device kernel that
  1. extrapolates every polynomial's evaluations to the deg+1 round points
     (incremental `prev + (hi - lo)` updates, as vector ops over the half-cube)
  2. combines them with the strategy's g (vectorized over the hypercube)
  3. tree-reduces each round point to a single field element
followed by a host step that interpolates the (deg+1)-point round polynomial,
feeds the Fiat-Shamir transcript, and binds all tables to the challenge with
a second fused kernel.  Shapes halve every round; XLA caches one executable
per (shape, degree, comb) and reuses it across rounds, proofs and batches.

The hypercube axis is the sharding axis for multi-host runs: round-point sums
are shard-local tree reductions followed by a psum of 16-limb partials
(see parallel/).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from lasso_tpu.field.host import Fr
from lasso_tpu.field.jfield import JFr
from lasso_tpu.poly.unipoly import CompressedUniPoly, UniPoly
from lasso_tpu.utils.errors import LassoError
from lasso_tpu.utils.tracing import instrument


@functools.partial(jax.jit, static_argnames=("comb", "degree"))
def _round_evals(zs, comb, degree: int):
    """zs: [alpha, n, W] -> [degree+1, W] sums of comb over the half-cube."""
    half = zs.shape[1] // 2
    lo = zs[:, :half]
    hi = zs[:, half:]
    evals = [JFr.sum(comb(lo)), JFr.sum(comb(hi))]
    diff = JFr.sub(hi, lo)
    cur = hi
    for _ in range(2, degree + 1):
        cur = JFr.add(cur, diff)
        evals.append(JFr.sum(comb(cur)))
    return jnp.stack(evals)


@jax.jit
def _bind_top(zs, r):
    """Bind the top variable of every stacked polynomial: [a, n, W] -> [a, n/2, W]."""
    half = zs.shape[1] // 2
    lo = zs[:, :half]
    hi = zs[:, half:]
    return JFr.add(lo, JFr.mul(r, JFr.sub(hi, lo)))


# ---------------------------------------------------------------------------
# Fixed-size masked round kernels.
#
# Sumcheck shapes halve every round, so exact-shape kernels would trigger one
# fresh XLA compile per round per layer per proof -- hundreds of compiles.
# Below SUMCHECK_FIX, rounds run on a FIXED-size buffer with an active-length
# scalar: pairing uses a dynamic roll (partner j + m/2 lands on lane j), dead
# lanes are masked out of the column sums, and the same compiled kernel is
# reused for every remaining round of every proof.  The wasted lanes are
# negligible at these sizes; the large early rounds still use exact shapes.
# ---------------------------------------------------------------------------

import os as _os

SUMCHECK_FIX = int(_os.environ.get("LASSO_TPU_SUMCHECK_FIX", "4096"))


def _masked_cols(vals, m_half):
    """Zero lanes >= m_half, then lazy column sums ([n, W] -> wide cols)."""
    n = vals.shape[0]
    mask = jnp.arange(n) < m_half
    return JFr.sum_columns(jnp.where(mask[:, None], vals, 0))


@functools.partial(jax.jit, static_argnames=("comb", "degree"))
def _round_evals_masked(zs, m, comb, degree: int):
    """zs: [alpha, N_FIX, W] with active length m (traced).

    Returns [degree+1, W] round-poly evals over the active half-cube."""
    halffix = zs.shape[1] // 2
    m_half = m // 2
    lo = zs[:, :halffix]
    hi = jnp.roll(zs, -m_half, axis=1)[:, :halffix]
    cols = [_masked_cols(comb(lo), m_half), _masked_cols(comb(hi), m_half)]
    diff = JFr.sub(hi, lo)
    cur = hi
    for _ in range(2, degree + 1):
        cur = JFr.add(cur, diff)
        cols.append(_masked_cols(comb(cur), m_half))
    return JFr.finish_sum(jnp.stack(cols))


@jax.jit
def _bind_top_masked(zs, m, r):
    """Masked bind: [a, N_FIX, W] active length m -> same shape, active m/2."""
    fix = zs.shape[1]
    halffix = fix // 2
    m_half = m // 2
    lo = zs[:, :halffix]
    hi = jnp.roll(zs, -m_half, axis=1)[:, :halffix]
    bound = JFr.add(lo, JFr.mul(r, JFr.sub(hi, lo)))
    pad = jnp.zeros(bound.shape[:1] + (fix - halffix,) + bound.shape[2:],
                    jnp.uint32)
    return jnp.concatenate([bound, pad], axis=1)


def _pad_to_fix(zs, fix: int):
    n = zs.shape[1]
    if n >= fix:
        return zs
    pad = jnp.zeros(zs.shape[:1] + (fix - n,) + zs.shape[2:], jnp.uint32)
    return jnp.concatenate([zs, pad], axis=1)


@dataclass
class SumcheckInstanceProof:
    compressed_polys: list[CompressedUniPoly]

    def verify(self, claim: int, num_rounds: int, degree_bound: int, transcript):
        """Host-side verification of the round polynomials.

        Returns (final claim e, challenge point r)."""
        e = claim % Fr.p
        r: list[int] = []
        if len(self.compressed_polys) != num_rounds:
            raise LassoError(f"expected {num_rounds} round polys, got {len(self.compressed_polys)}")
        for cp in self.compressed_polys:
            poly = cp.decompress(e)
            if poly.degree() != degree_bound:
                raise LassoError(
                    f"round poly degree {poly.degree()} != bound {degree_bound}")
            if (poly.eval_at_zero() + poly.eval_at_one()) % Fr.p != e:
                raise LassoError("sumcheck round identity G(0)+G(1) != e failed")
            poly.append_to_transcript(b"poly", transcript)
            r_i = transcript.challenge_scalar(b"challenge_nextround")
            r.append(r_i)
            e = poly.evaluate(r_i)
        return e, r


@dataclass
class ZKSumcheckInstanceProof:
    """ZK sumcheck: committed round polynomials + dot-product decommitments
    (reference: src/subprotocols/sumcheck.rs:331-448, verify-only like the
    reference -- the non-ZK prover is what Lasso uses)."""

    comm_polys: list  # host Points
    comm_evals: list  # host Points
    proofs: list  # DotProductProof

    def verify(self, comm_claim, num_rounds: int, degree_bound: int,
               gens_1, gens_n, transcript):
        """Returns (comm_eval_last, r)."""
        from lasso_tpu.curve.jcurve import from_host_points, to_host_point
        from lasso_tpu.ops.msm import msm_device

        if gens_n.n != degree_bound + 1:
            raise LassoError("ZK sumcheck generator size mismatch")
        if len(self.comm_polys) != num_rounds or len(self.comm_evals) != num_rounds:
            raise LassoError("ZK sumcheck round count mismatch")

        r: list[int] = []
        for i in range(num_rounds):
            comm_poly = self.comm_polys[i]
            transcript.append_point(b"comm_poly", comm_poly)
            r_i = transcript.challenge_scalar(b"challenge_nextround")

            comm_claim_per_round = comm_claim if i == 0 else self.comm_evals[i - 1]
            comm_eval = self.comm_evals[i]
            transcript.append_point(b"comm_claim_per_round", comm_claim_per_round)
            transcript.append_point(b"comm_eval", comm_eval)

            w = transcript.challenge_vector(b"combine_two_claims_to_one", 2)
            comm_target = comm_claim_per_round.mul(w[0]).add(comm_eval.mul(w[1]))

            # decommitment vector: w0 * [2,1,..,1] + w1 * [1, r, r^2, ...]
            a_sc = [1] * (degree_bound + 1)
            a_sc[0] = 2
            a_eval = [1] * (degree_bound + 1)
            for j in range(1, degree_bound + 1):
                a_eval[j] = a_eval[j - 1] * r_i % Fr.p
            a = [(w[0] * x + w[1] * y) % Fr.p for x, y in zip(a_sc, a_eval)]

            self.proofs[i].verify(gens_1, gens_n, transcript, a,
                                  comm_poly, comm_target)
            r.append(r_i)

        return self.comm_evals[-1], r


@instrument("Sumcheck.prove")
def prove_arbitrary(polys_stack, comb, degree: int, num_rounds: int, transcript):
    """Arbitrary-degree sumcheck prover over stacked tables [alpha, n, W].

    `comb` maps [alpha, m, W] -> [m, W] (device).  Returns
    (SumcheckInstanceProof, r (host ints), final_evals (host ints), bound stack).
    """
    zs = polys_stack
    compressed = []
    r_out: list[int] = []
    n = zs.shape[1]
    masked = n <= SUMCHECK_FIX
    if masked:
        zs = _pad_to_fix(zs, SUMCHECK_FIX)
        m = jnp.int32(n)
    for _ in range(num_rounds):
        if masked:
            eval_limbs = _round_evals_masked(zs, m, comb, degree)
        else:
            eval_limbs = _round_evals(zs, comb, degree)
        evals = JFr.decode(eval_limbs)
        round_poly = UniPoly.from_evals(evals)
        round_poly.append_to_transcript(b"poly", transcript)
        r_j = transcript.challenge_scalar(b"challenge_nextround")
        r_out.append(r_j)
        r_dev = JFr.encode_scalar(r_j)
        if masked:
            zs = _bind_top_masked(zs, m, r_dev)
            m = m // 2
            n //= 2
        else:
            zs = _bind_top(zs, r_dev)
            n //= 2
            if n <= SUMCHECK_FIX:
                masked = True
                zs = _pad_to_fix(zs, SUMCHECK_FIX)
                m = jnp.int32(n)
        compressed.append(round_poly.compress())

    final_evals = JFr.decode(zs[:, 0])
    return SumcheckInstanceProof(compressed), r_out, final_evals, zs[:, :n]


@functools.partial(jax.jit, static_argnames=())
def _cubic_round_evals(a, b, c):
    """Batched cubic round evals at t in {0, 2, 3}.

    a, b: [I, n, W]; c: [n, W] shared. Returns [3, I, W] sums
    (t=0, t=2, t=3) per instance."""
    half = a.shape[1] // 2
    a_lo, a_hi = a[:, :half], a[:, half:]
    b_lo, b_hi = b[:, :half], b[:, half:]
    c_lo, c_hi = c[:half], c[half:]

    def prod3(x, y, z):
        return JFr.mul(JFr.mul(x, y), z)

    e0 = JFr.sum(jnp.moveaxis(prod3(a_lo, b_lo, c_lo[None]), 1, 0))  # [I, W]

    a_d, b_d, c_d = JFr.sub(a_hi, a_lo), JFr.sub(b_hi, b_lo), JFr.sub(c_hi, c_lo)
    a2, b2, c2 = JFr.add(a_hi, a_d), JFr.add(b_hi, b_d), JFr.add(c_hi, c_d)
    e2 = JFr.sum(jnp.moveaxis(prod3(a2, b2, c2[None]), 1, 0))

    a3, b3, c3 = JFr.add(a2, a_d), JFr.add(b2, b_d), JFr.add(c2, c_d)
    e3 = JFr.sum(jnp.moveaxis(prod3(a3, b3, c3[None]), 1, 0))
    return jnp.stack([e0, e2, e3])


@jax.jit
def _bind_top_single(z, r):
    half = z.shape[0] // 2
    lo, hi = z[:half], z[half:]
    return JFr.add(lo, JFr.mul(r, JFr.sub(hi, lo)))


@jax.jit
def _cubic_round_evals_masked(a, b, c, m):
    """Masked fixed-size variant of _cubic_round_evals (active length m)."""
    halffix = a.shape[1] // 2
    m_half = m // 2
    mask = jnp.arange(halffix) < m_half

    def split(x, axis):
        lo = jax.lax.slice_in_dim(x, 0, halffix, axis=axis)
        hi = jax.lax.slice_in_dim(jnp.roll(x, -m_half, axis=axis),
                                  0, halffix, axis=axis)
        return lo, hi

    a_lo, a_hi = split(a, 1)
    b_lo, b_hi = split(b, 1)
    c_lo, c_hi = split(c, 0)

    def prod3(x, y, z):
        return JFr.mul(JFr.mul(x, y), z)

    def msum(v):  # [I, halffix, W] -> [I, wide]
        vz = jnp.where(mask[None, :, None], v, 0)
        return JFr.sum_columns(jnp.moveaxis(vz, 1, 0))

    cols = [msum(prod3(a_lo, b_lo, c_lo[None]))]
    a_d, b_d, c_d = JFr.sub(a_hi, a_lo), JFr.sub(b_hi, b_lo), JFr.sub(c_hi, c_lo)
    a2, b2, c2 = JFr.add(a_hi, a_d), JFr.add(b_hi, b_d), JFr.add(c_hi, c_d)
    cols.append(msum(prod3(a2, b2, c2[None])))
    a3, b3, c3 = JFr.add(a2, a_d), JFr.add(b2, b_d), JFr.add(c2, c_d)
    cols.append(msum(prod3(a3, b3, c3[None])))
    return JFr.finish_sum(jnp.stack(cols))  # [3, I, W]


@jax.jit
def _bind_top_single_masked(z, m, r):
    fix = z.shape[0]
    halffix = fix // 2
    m_half = m // 2
    lo = z[:halffix]
    hi = jnp.roll(z, -m_half, axis=0)[:halffix]
    bound = JFr.add(lo, JFr.mul(r, JFr.sub(hi, lo)))
    pad = jnp.zeros((fix - halffix,) + bound.shape[1:], jnp.uint32)
    return jnp.concatenate([bound, pad], axis=0)


@instrument("Sumcheck.prove_batched")
def prove_cubic_batched(claim: int, num_rounds: int, a_stack, b_stack, c_poly,
                        coeffs: list[int], transcript):
    """Batched product-layer sumcheck (reference: sumcheck.rs:27-135).

    a_stack, b_stack: [I, n, W] (left/right inputs per instance);
    c_poly: [n, W] shared eq polynomial; coeffs: host RLC coefficients.

    Returns (proof, r, (claims_A, claims_B, claim_C)).
    """
    e = claim % Fr.p
    a, b, c = a_stack, b_stack, c_poly
    compressed = []
    r_out: list[int] = []
    num_instances = a.shape[0]

    n = a.shape[1]
    masked = n <= SUMCHECK_FIX
    if masked:
        a = _pad_to_fix(a, SUMCHECK_FIX)
        b = _pad_to_fix(b, SUMCHECK_FIX)
        c = _pad_to_fix(c[None], SUMCHECK_FIX)[0]
        m = jnp.int32(n)

    for _ in range(num_rounds):
        if masked:
            evals_limbs = _cubic_round_evals_masked(a, b, c, m)
        else:
            evals_limbs = _cubic_round_evals(a, b, c)  # [3, I, W]
        flat = JFr.decode(evals_limbs.reshape(3 * num_instances, -1))
        e0 = flat[0:num_instances]
        e2 = flat[num_instances:2 * num_instances]
        e3 = flat[2 * num_instances:]

        comb0 = sum(x * y for x, y in zip(e0, coeffs)) % Fr.p
        comb2 = sum(x * y for x, y in zip(e2, coeffs)) % Fr.p
        comb3 = sum(x * y for x, y in zip(e3, coeffs)) % Fr.p
        evals = [comb0, (e - comb0) % Fr.p, comb2, comb3]
        round_poly = UniPoly.from_evals(evals)
        round_poly.append_to_transcript(b"poly", transcript)

        r_j = transcript.challenge_scalar(b"challenge_nextround")
        r_out.append(r_j)
        r_dev = JFr.encode_scalar(r_j)
        if masked:
            a = _bind_top_masked(a, m, r_dev)
            b = _bind_top_masked(b, m, r_dev)
            c = _bind_top_single_masked(c, m, r_dev)
            m = m // 2
            n //= 2
        else:
            a = _bind_top(a, r_dev)
            b = _bind_top(b, r_dev)
            c = _bind_top_single(c, r_dev)
            n //= 2
            if n <= SUMCHECK_FIX:
                masked = True
                a = _pad_to_fix(a, SUMCHECK_FIX)
                b = _pad_to_fix(b, SUMCHECK_FIX)
                c = _pad_to_fix(c[None], SUMCHECK_FIX)[0]
                m = jnp.int32(n)
        e = round_poly.evaluate(r_j)
        compressed.append(round_poly.compress())

    claims_a = JFr.decode(a[:, 0])
    claims_b = JFr.decode(b[:, 0])
    claim_c = JFr.decode(c[0][None])[0]
    return SumcheckInstanceProof(compressed), r_out, (claims_a, claims_b, claim_c)
