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
import numpy as np

from lasso_tpu.field.host import Fr
from lasso_tpu.field.jfield import JFr, W
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


# ---------------------------------------------------------------------------
# On-device sumcheck: transcript + rounds in one jitted fori_loop.
#
# Each round's STROBE byte sequence is identical and every round ends in a
# PRF that deterministically resets the sponge position, so rounds >= 1
# share one loop body: the whole sumcheck costs ONE device dispatch + ONE
# transfer instead of two tunnel round trips per round.  Round 0 runs on
# host to bring the transcript to the canonical post-PRF position.
# ---------------------------------------------------------------------------

_VINV_CACHE: dict[int, np.ndarray] = {}


def _vandermonde_inv_mont(degree: int) -> np.ndarray:
    """[d+1, d+1, W] Montgomery limbs of the inverse Vandermonde over
    evaluation points 0..degree (coeffs = VINV @ evals)."""
    got = _VINV_CACHE.get(degree)
    if got is None:
        from lasso_tpu.field.jfield import pack_int

        d = degree + 1
        p = Fr.p
        # invert V[i][j] = i^j mod p by Gaussian elimination (augmented)
        v = []
        for i in range(d):
            row = [pow(i, j, p) for j in range(d)]
            row += [1 if k == i else 0 for k in range(d)]
            v.append(row)
        for col in range(d):
            piv = next(r for r in range(col, d) if v[r][col] % p != 0)
            v[col], v[piv] = v[piv], v[col]
            inv = pow(v[col][col], p - 2, p)
            v[col] = [x * inv % p for x in v[col]]
            for r in range(d):
                if r != col and v[r][col]:
                    f = v[r][col]
                    v[r] = [(x - f * y) % p for x, y in zip(v[r], v[col])]
        vinv = [[v[i][d + j] for j in range(d)] for i in range(d)]
        # coeffs[j] = sum_k VINV[j][k] * evals[k]
        arr = np.zeros((d, d, 16), dtype=np.uint32)
        for j in range(d):
            for k in range(d):
                arr[j, k] = pack_int(Fr.to_mont(vinv[j][k]))
        got = arr
        _VINV_CACHE[degree] = got
    return got


def _interp_coeffs_device(evals, degree: int):
    """evals [d+1, W] Montgomery -> coefficients [d+1, W] Montgomery."""
    vinv = jnp.asarray(_vandermonde_inv_mont(degree))  # [d+1, d+1, W]
    prods = JFr.mul(vinv, evals[None, :, :])  # [d+1, d+1, W]
    return JFr.finish_sum(_sum_cols_axis1(prods))


def _sum_cols_axis1(x):
    """Lazy column sums over axis 1 of [a, k, W] (k small)."""
    from lasso_tpu.field.jfield import _split_shift_renorm

    return _split_shift_renorm(x.sum(axis=1, dtype=jnp.uint32))


def _append_round_poly_device(dt, coeffs, degree: int) -> None:
    dt.append_message_static(b"poly", b"UniPoly_begin")
    for j in range(degree + 1):
        dt.append_scalar(b"coeff", coeffs[j])
    dt.append_message_static(b"poly", b"UniPoly_end")


def _device_sumcheck_supported(transcript) -> bool:
    import os

    from lasso_tpu.transcript.proof_transcript import (ProofTranscript,
                                                       TestTranscript)

    flag = os.environ.get("LASSO_TPU_DEVICE_TRANSCRIPT", "1")
    if flag in ("0", "off"):
        return False
    if not isinstance(transcript, ProofTranscript) or \
            isinstance(transcript, TestTranscript):
        return False
    if flag == "force":  # parity testing of the device paths off-TPU
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


MAX_DEVICE_ROUNDS = 32


@functools.partial(jax.jit, static_argnames=("comb", "degree", "entry_meta"))
def _device_rounds_arbitrary(state0, zs0, m0, comb, degree: int,
                             num_rounds, entry_meta):
    """Masked sumcheck rounds with the transcript on device.

    state0: [200] strobe bytes; zs0: [alpha, FIX, W]; m0: active length;
    num_rounds: TRACED trip count (accumulators are fixed MAX_DEVICE_ROUNDS
    so one executable serves every layer/proof size).
    entry_meta: (pos, pos_begin, cur_flags) at entry -- ANY static position
    (the bullet-core peel pattern): round 0 is peeled with the call-site
    position and must exit at the canonical post-challenge position, where
    all remaining rounds loop.  This lets the whole sumcheck run as ONE
    dispatch even when the transcript is not parked post-PRF on entry.
    Returns (state, zs, coeffs_acc [MAX, degree+1, W], r_acc [MAX, W]).
    """
    from lasso_tpu.subprotocols.grand_product import _post_challenge_meta
    from lasso_tpu.transcript.device_strobe import DeviceStrobe, DeviceTranscript

    meta = _post_challenge_meta()
    coeffs_acc0 = jnp.zeros((MAX_DEVICE_ROUNDS, degree + 1, W), jnp.uint32)
    r_acc0 = jnp.zeros((MAX_DEVICE_ROUNDS, W), jnp.uint32)

    def round_step(mpos, state, zs, m, coeffs_acc, r_acc, i):
        evals = _round_evals_masked(zs, m, comb, degree)
        coeffs = _interp_coeffs_device(evals, degree)

        dt = DeviceTranscript(DeviceStrobe(state, *mpos))
        _append_round_poly_device(dt, coeffs, degree)
        r = dt.challenge_scalar(b"challenge_nextround")
        # every round must exit at the canonical post-challenge position
        assert (dt.s.pos, dt.s.pos_begin, dt.s.cur_flags) == meta, \
            "strobe trajectory not periodic; device loop invalid"

        zs = _bind_top_masked(zs, m, r)
        coeffs_acc = jax.lax.dynamic_update_slice(
            coeffs_acc, coeffs[None], (i, 0, 0))
        r_acc = jax.lax.dynamic_update_slice(r_acc, r[None], (i, 0))
        return dt.state_tuple(), zs, m // 2, coeffs_acc, r_acc

    # peel round 0 with the call-site entry position
    state, zs, m, coeffs_acc, r_acc = round_step(
        entry_meta, state0, zs0, m0, coeffs_acc0, r_acc0, jnp.int32(0))

    def body(i, carry):
        state, zs, m, coeffs_acc, r_acc = carry
        return round_step(meta, state, zs, m, coeffs_acc, r_acc, i)

    state, zs, _, coeffs_acc, r_acc = jax.lax.fori_loop(
        1, num_rounds, body, (state, zs, m, coeffs_acc, r_acc))
    return state, zs, coeffs_acc, r_acc


@functools.partial(jax.jit, static_argnames=("comb", "degree", "entry_meta"))
def _device_round_unmasked(state0, zs, comb, degree: int, entry_meta):
    """One exact-shape sumcheck round with the transcript on device.

    Rounds ABOVE the masked-buffer size chain these programs back to back:
    the strobe state, round-poly coefficients and challenge stay on device,
    so a 2^24-lookup sumcheck costs ONE host sync total instead of one per
    unmasked round (each ~30ms on the tunneled backend).
    Returns (state, bound zs [alpha, n/2, W], coeffs [degree+1, W], r [W])."""
    from lasso_tpu.subprotocols.grand_product import _post_challenge_meta
    from lasso_tpu.transcript.device_strobe import DeviceStrobe, DeviceTranscript

    evals = _round_evals(zs, comb, degree)
    coeffs = _interp_coeffs_device(evals, degree)
    dt = DeviceTranscript(DeviceStrobe(state0, *entry_meta))
    _append_round_poly_device(dt, coeffs, degree)
    r = dt.challenge_scalar(b"challenge_nextround")
    assert (dt.s.pos, dt.s.pos_begin, dt.s.cur_flags) == \
        _post_challenge_meta(), "strobe round exit not canonical"
    zs = _bind_top(zs, r)
    return dt.state_tuple(), zs, coeffs, r


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
    use_device = _device_sumcheck_supported(transcript)

    if use_device and num_rounds > 0:
        # WHOLE sumcheck on device, one host sync: unmasked rounds chain
        # exact-shape programs (state/coeffs/challenges never leave the
        # device), then the masked remainder runs in one fused fori_loop.
        from lasso_tpu.subprotocols.grand_product import _post_challenge_meta
        from lasso_tpu.transcript.device_strobe import (DeviceStrobe,
                                                        DeviceTranscript)

        dt = DeviceTranscript.from_host(transcript)
        meta = (dt.s.pos, dt.s.pos_begin, dt.s.cur_flags)
        state = dt.s.state
        d1 = degree + 1
        chain: list[jnp.ndarray] = []  # per round: [d1 + 1, W]

        round_idx = 0
        while n > SUMCHECK_FIX and round_idx < num_rounds:
            state, zs, coeffs, r = _device_round_unmasked(
                state, zs, comb, degree, meta)
            meta = _post_challenge_meta()
            chain.append(jnp.concatenate([coeffs, r[None]], axis=0))
            n //= 2
            round_idx += 1

        remaining = num_rounds - round_idx
        if remaining:
            zs = _pad_to_fix(zs, SUMCHECK_FIX)
            state, zs, coeffs_acc, r_acc = _device_rounds_arbitrary(
                state, zs, jnp.int32(n), comb, degree,
                jnp.int32(remaining), meta)
            n >>= remaining

        alpha = zs.shape[0]
        parts = chain + (
            [coeffs_acc[:remaining].reshape(-1, W), r_acc[:remaining]]
            if remaining else [])
        parts.append(zs[:, 0])  # final evals ride the same transfer
        flat = JFr.decode(jnp.concatenate(parts, axis=0))
        # every path ends at the canonical post-challenge position
        out = DeviceTranscript(DeviceStrobe(None, *_post_challenge_meta()))
        out.restore_to_host(transcript, np.asarray(state))

        off = 0
        for _ in range(round_idx):  # chained unmasked rounds
            compressed.append(UniPoly(flat[off: off + d1]).compress())
            r_out.append(flat[off + d1])
            off += d1 + 1
        for k in range(remaining):  # fused masked rounds
            compressed.append(
                UniPoly(flat[off + k * d1: off + (k + 1) * d1]).compress())
        off += remaining * d1
        r_out.extend(flat[off: off + remaining])
        final_evals = flat[off + remaining:]
        assert len(final_evals) == alpha
        return SumcheckInstanceProof(compressed), r_out, final_evals, \
            zs[:, :max(n, 1)]

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
    return SumcheckInstanceProof(compressed), r_out, final_evals, zs[:, :max(n, 1)]


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


def _horner3(coeffs, r):
    """poly(r) for cubic Montgomery coeffs [4, W] at r [W]."""
    e = coeffs[3]
    for j in (2, 1, 0):
        e = JFr.add(JFr.mul(e[None], r[None])[0], coeffs[j])
    return e


@functools.partial(jax.jit, static_argnames=("entry_meta",))
def _device_round_cubic_unmasked(state0, a, b, c, e, rlc, entry_meta):
    """One exact-shape cubic-batched round with the transcript on device.

    Chained for the rounds ABOVE the masked-buffer size (the big grand-
    product layers), so each layer's sumcheck costs one host sync instead of
    one per wide round.  Returns (state, a, b, c, e, coeffs [4, W], r [W])."""
    from lasso_tpu.subprotocols.grand_product import _post_challenge_meta
    from lasso_tpu.transcript.device_strobe import DeviceStrobe, DeviceTranscript

    ev = _cubic_round_evals(a, b, c)  # [3, I, W]

    def rlc_combine(ev_t):
        return JFr.finish_sum(JFr.sum_columns(JFr.mul(ev_t, rlc)))

    comb0 = rlc_combine(ev[0])
    evals4 = jnp.stack(
        [comb0, JFr.sub(e, comb0), rlc_combine(ev[1]), rlc_combine(ev[2])])
    coeffs = _interp_coeffs_device(evals4, 3)

    dt = DeviceTranscript(DeviceStrobe(state0, *entry_meta))
    _append_round_poly_device(dt, coeffs, 3)
    r = dt.challenge_scalar(b"challenge_nextround")
    assert (dt.s.pos, dt.s.pos_begin, dt.s.cur_flags) == \
        _post_challenge_meta(), "strobe round exit not canonical"

    a = _bind_top(a, r)
    b = _bind_top(b, r)
    c = _bind_top_single(c, r)
    return dt.state_tuple(), a, b, c, _horner3(coeffs, r), coeffs, r


@functools.partial(jax.jit, static_argnames=("entry_meta",))
def _device_rounds_cubic(state0, a0, b0, c0, m0, e0, rlc, num_rounds,
                         entry_meta):
    """Masked cubic-batched rounds with the transcript on device.

    a0, b0: [I, FIX, W]; c0: [FIX, W]; e0: [W] running claim (Montgomery);
    rlc: [I, W] Montgomery RLC coefficients; num_rounds TRACED (>= 1).
    entry_meta: static strobe position at entry -- round 0 is peeled with
    the call-site position (the bullet-core peel pattern) and must exit at
    the canonical post-challenge position, where all remaining rounds loop.
    Returns (state, a, b, c, coeffs_acc [MAX, 4, W], r_acc [MAX, W]).
    """
    from lasso_tpu.subprotocols.grand_product import _post_challenge_meta
    from lasso_tpu.transcript.device_strobe import DeviceStrobe, DeviceTranscript

    meta = _post_challenge_meta()
    coeffs_acc0 = jnp.zeros((MAX_DEVICE_ROUNDS, 4, W), jnp.uint32)
    r_acc0 = jnp.zeros((MAX_DEVICE_ROUNDS, W), jnp.uint32)

    def rlc_combine(ev_t):  # [I, W] -> [W]
        return JFr.finish_sum(JFr.sum_columns(JFr.mul(ev_t, rlc)))

    def round_step(mpos, state, a, b, c, m, e, coeffs_acc, r_acc, i):
        ev = _cubic_round_evals_masked(a, b, c, m)  # [3, I, W]
        comb0 = rlc_combine(ev[0])
        comb2 = rlc_combine(ev[1])
        comb3 = rlc_combine(ev[2])
        eval1 = JFr.sub(e, comb0)
        evals4 = jnp.stack([comb0, eval1, comb2, comb3])
        coeffs = _interp_coeffs_device(evals4, 3)

        dt = DeviceTranscript(DeviceStrobe(state, *mpos))
        _append_round_poly_device(dt, coeffs, 3)
        r = dt.challenge_scalar(b"challenge_nextround")
        assert (dt.s.pos, dt.s.pos_begin, dt.s.cur_flags) == meta, \
            "strobe trajectory not periodic; device loop invalid"

        a = _bind_top_masked(a, m, r)
        b = _bind_top_masked(b, m, r)
        c = _bind_top_single_masked(c, m, r)
        coeffs_acc = jax.lax.dynamic_update_slice(
            coeffs_acc, coeffs[None], (i, 0, 0))
        r_acc = jax.lax.dynamic_update_slice(r_acc, r[None], (i, 0))
        return (dt.state_tuple(), a, b, c, m // 2, _horner3(coeffs, r),
                coeffs_acc, r_acc)

    # peel round 0 with the call-site entry position
    state, a, b, c, m, e, coeffs_acc, r_acc = round_step(
        entry_meta, state0, a0, b0, c0, m0, e0, coeffs_acc0, r_acc0,
        jnp.int32(0))

    def body(i, carry):
        state, a, b, c, m, e, coeffs_acc, r_acc = carry
        return round_step(meta, state, a, b, c, m, e, coeffs_acc, r_acc, i)

    state, a, b, c, _, _, coeffs_acc, r_acc = jax.lax.fori_loop(
        1, num_rounds, body, (state, a, b, c, m, e, coeffs_acc, r_acc))
    return state, a, b, c, coeffs_acc, r_acc


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
    # drop the parameter refs: once round 0 rebinds a/b/c the inputs free,
    # even while the caller-side expressions were s-cube-sized slices
    del a_stack, b_stack, c_poly
    compressed = []
    r_out: list[int] = []
    num_instances = a.shape[0]

    n = a.shape[1]
    use_device = _device_sumcheck_supported(transcript)

    if use_device and num_rounds > 0:
        # WHOLE layer sumcheck on device, one host sync: wide rounds chain
        # exact-shape programs, the masked remainder runs in one fused
        # fori_loop (round 0 peeled at the call-site strobe position), and
        # the final claims ride the same transfer.
        from lasso_tpu.subprotocols.grand_product import _post_challenge_meta
        from lasso_tpu.transcript.device_strobe import (DeviceStrobe,
                                                        DeviceTranscript)

        dt = DeviceTranscript.from_host(transcript)
        meta = (dt.s.pos, dt.s.pos_begin, dt.s.cur_flags)
        state = dt.s.state
        rlc = JFr.encode_ints(coeffs)
        e_mont = JFr.encode_scalar(e)
        chain: list[jnp.ndarray] = []  # per round: [5, W]

        round_idx = 0
        while n > SUMCHECK_FIX and round_idx < num_rounds:
            state, a, b, c, e_mont, cfs, r = _device_round_cubic_unmasked(
                state, a, b, c, e_mont, rlc, meta)
            meta = _post_challenge_meta()
            chain.append(jnp.concatenate([cfs, r[None]], axis=0))
            n //= 2
            round_idx += 1

        remaining = num_rounds - round_idx
        if remaining:
            a = _pad_to_fix(a, SUMCHECK_FIX)
            b = _pad_to_fix(b, SUMCHECK_FIX)
            c = _pad_to_fix(c[None], SUMCHECK_FIX)[0]
            state, a, b, c, coeffs_acc, r_acc = _device_rounds_cubic(
                state, a, b, c, jnp.int32(n), e_mont, rlc,
                jnp.int32(remaining), meta)

        parts = chain + (
            [coeffs_acc[:remaining].reshape(-1, W), r_acc[:remaining]]
            if remaining else [])
        parts += [a[:, 0], b[:, 0], c[0][None]]
        flat = JFr.decode(jnp.concatenate(parts, axis=0))
        out = DeviceTranscript(DeviceStrobe(None, *_post_challenge_meta()))
        out.restore_to_host(transcript, np.asarray(state))

        off = 0
        for _ in range(round_idx):  # chained unmasked rounds
            compressed.append(UniPoly(flat[off: off + 4]).compress())
            r_out.append(flat[off + 4])
            off += 5
        for k in range(remaining):  # fused masked rounds
            compressed.append(
                UniPoly(flat[off + k * 4: off + (k + 1) * 4]).compress())
        off += remaining * 4
        r_out.extend(flat[off: off + remaining])
        off += remaining
        claims_a = flat[off: off + num_instances]
        claims_b = flat[off + num_instances: off + 2 * num_instances]
        claim_c = flat[off + 2 * num_instances]
        return (SumcheckInstanceProof(compressed), r_out,
                (claims_a, claims_b, claim_c))

    masked = n <= SUMCHECK_FIX
    if masked:
        a = _pad_to_fix(a, SUMCHECK_FIX)
        b = _pad_to_fix(b, SUMCHECK_FIX)
        c = _pad_to_fix(c[None], SUMCHECK_FIX)[0]
        m = jnp.int32(n)

    round_idx = 0
    while round_idx < num_rounds:
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
        round_idx += 1

    claims_a = JFr.decode(a[:, 0])
    claims_b = JFr.decode(b[:, 0])
    claim_c = JFr.decode(c[0][None])[0]
    return SumcheckInstanceProof(compressed), r_out, (claims_a, claims_b, claim_c)
