"""Bulletproofs-style inner-product reduction (reference: src/subprotocols/bullet.rs).

Each halving round issues two TPU MSMs (for L and R) and three fused folds:
scalar vectors fold as vector field ops, and the basis fold
G_L*u_inv + G_R*u runs as batched double-and-add over all points at once
(a `fori_loop` over scalar bits -- one padd+pdbl per bit for the whole
vector of points).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from lasso_tpu.curve import host as hostcurve
from lasso_tpu.curve.jcurve import identity, padd, pdbl, pselect, to_host_point
from lasso_tpu.field.host import Fr
from lasso_tpu.field.jfield import JFr, W, pack_int
from lasso_tpu.ops.msm import msm_device
from lasso_tpu.utils.errors import InputTooLarge, InvalidInputLength


@jax.jit
def scalar_mul_batch(points, scalar_int_limbs):
    """All points times one scalar (canonical integer limbs [W]).

    points: [..., 4, W, n] limb-major."""

    def body(j, state):
        acc, base = state
        bit = (jnp.take(scalar_int_limbs, j // 16) >> (j % 16)) & 1
        mask = jnp.broadcast_to(bit != 0,
                                acc.shape[:-3] + (acc.shape[-1],))
        acc = pselect(mask, padd(acc, base), acc)
        return acc, pdbl(base)

    acc, _ = lax.fori_loop(
        0, 256, body,
        (identity(points.shape[-1], points.shape[:-3]), points))
    return acc


@jax.jit
def _fold_points(g_lo, g_hi, u_inv_limbs, u_limbs):
    return padd(scalar_mul_batch(g_lo, u_inv_limbs),
                scalar_mul_batch(g_hi, u_limbs))


@jax.jit
def _dot(a, b):
    return JFr.sum(JFr.mul(a, b))


# ---------------------------------------------------------------------------
# Fully on-device bullet reduction.
#
# Every round's L/R commitments are MSMs over FOLDED bases g^(k); folding
# points on device would cost a scalar-mul ladder per round.  Instead the
# fold is carried on the SCALAR side ("delayed fold"): original basis G_j
# appears in g^(k) at position (j mod m) with weight w_j = prod over earlier
# rounds of (u if the round's half-bit of j else u^-1), so
#     L_k = MSM(G, s)  with  s_j = w_j * a_lo[(j mod m) - m/2]  (hi half)
# over the FIXED original bases -- one Pippenger kernel per round, no point
# folds at all.  L/R are ark-compressed on device (Fermat Z-inverse) and
# absorbed by the on-device STROBE transcript, so the whole reduction is
# ONE dispatch + two transfers regardless of round count.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("num_rounds", "entry_meta"))
def _device_bullet(state0, a0, b0, g_pts, qh_pts, blinds_l, blinds_r,
                   num_rounds: int, entry_meta):
    """a0, b0: [n, W] Montgomery (n = 2^num_rounds); g_pts: [4, W, n];
    qh_pts: [4, W, 2] (q, h); blinds_l/r: [num_rounds, W] Montgomery.

    Returns (state, lr_acc [rounds, 2, 4, W] extended points,
    u_acc [rounds, W], a_fin [W], b_fin [W], g_fin [4, W, 1])."""
    from lasso_tpu.curve.jcurve import compress_points_device
    from lasso_tpu.ops.msm import _msm_kernel, window_plan
    from lasso_tpu.transcript.device_strobe import (DeviceStrobe,
                                                    DeviceTranscript)
    from lasso_tpu.subprotocols.grand_product import _post_challenge_meta

    n = a0.shape[0]
    assert n == 1 << num_rounds
    bases = jnp.concatenate([g_pts, qh_pts], axis=-1)  # [4, W, n+2]
    c_w, n_w = window_plan(n + 2, 253)
    c_g, n_g = window_plan(max(n, 2), 253)
    idx = jnp.arange(n)

    lr_acc0 = jnp.zeros((num_rounds, 2, 4, W), jnp.uint32)
    u_acc0 = jnp.zeros((num_rounds, W), jnp.uint32)
    w0 = JFr.ones(n)

    def round_step(state, meta, a, b, w, k, lr_acc, u_acc):
        m = n >> k
        half = m >> 1
        mask_half = (idx < half)[:, None]

        a_hi = jnp.roll(a, -half, axis=0)
        b_hi = jnp.roll(b, -half, axis=0)
        c_l = JFr.finish_sum(JFr.sum_columns(
            jnp.where(mask_half, JFr.mul(a, b_hi), 0)))
        c_r = JFr.finish_sum(JFr.sum_columns(
            jnp.where(mask_half, JFr.mul(a_hi, b), 0)))

        shift = num_rounds - 1 - k if isinstance(k, int) else \
            jnp.int32(num_rounds - 1) - k
        hi_bit = ((idx >> shift) & 1).astype(jnp.bool_)
        pj = idx & (m - 1)
        a_for_l = jnp.take(a, jnp.where(hi_bit, pj - half, 0), axis=0)
        a_for_r = jnp.take(a, jnp.where(hi_bit, 0, pj + half), axis=0)
        s_l = jnp.where(hi_bit[:, None], JFr.mul(w, a_for_l), 0)
        s_r = jnp.where(hi_bit[:, None], 0, JFr.mul(w, a_for_r))

        full_l = jnp.concatenate(
            [s_l, c_l[None], blinds_l[k][None]], axis=0)
        full_r = jnp.concatenate(
            [s_r, c_r[None], blinds_r[k][None]], axis=0)
        l_pt = _msm_kernel(bases, JFr.to_int_limbs(full_l),
                           c=c_w, num_windows=n_w)
        r_pt = _msm_kernel(bases, JFr.to_int_limbs(full_r),
                           c=c_w, num_windows=n_w)
        lr = jnp.concatenate([l_pt, r_pt], axis=-1)  # [4, W, 2]
        cb = compress_points_device(lr)  # [2, 32]

        dt = DeviceTranscript(DeviceStrobe(state, *meta))
        dt.append_point_bytes(b"L", cb[0])
        dt.append_point_bytes(b"R", cb[1])
        u = dt.challenge_scalar(b"u")
        out_meta = (dt.s.pos, dt.s.pos_begin, dt.s.cur_flags)
        u_inv = JFr.inv_device(u)

        a = JFr.add(JFr.mul(a, u[None]), JFr.mul(a_hi, u_inv[None]))
        b = JFr.add(JFr.mul(b, u_inv[None]), JFr.mul(b_hi, u[None]))
        w = JFr.mul(w, jnp.where(hi_bit[:, None], u[None], u_inv[None]))

        lr_ext = jnp.moveaxis(lr, -1, 0)[None]  # [1, 2, 4, W]
        lr_acc = jax.lax.dynamic_update_slice(lr_acc, lr_ext, (k, 0, 0, 0))
        u_acc = jax.lax.dynamic_update_slice(u_acc, u[None], (k, 0))
        return dt.state_tuple(), out_meta, a, b, w, lr_acc, u_acc

    meta = _post_challenge_meta()
    state, out_meta, a, b, w, lr_acc, u_acc = round_step(
        state0, entry_meta, a0, b0, w0, jnp.int32(0), lr_acc0, u_acc0)
    assert out_meta == meta, "bullet peel exit not at canonical position"

    def body(k, carry):
        state, a, b, w, lr_acc, u_acc = carry
        state, om, a, b, w, lr_acc, u_acc = round_step(
            state, meta, a, b, w, k, lr_acc, u_acc)
        assert om == meta, "bullet round trajectory not periodic"
        return state, a, b, w, lr_acc, u_acc

    state, a, b, w, lr_acc, u_acc = jax.lax.fori_loop(
        1, num_rounds, body, (state, a, b, w, lr_acc, u_acc))

    g_fin = _msm_kernel(g_pts, JFr.to_int_limbs(w), c=c_g, num_windows=n_g)
    return state, lr_acc, u_acc, a[0], b[0], g_fin


@dataclass
class BulletReductionProof:
    L_vec: list[hostcurve.Point]
    R_vec: list[hostcurve.Point]

    @staticmethod
    def _prove_device(transcript, q_point, g_dev, h_point, a_vec, b_vec,
                      blind: int, blinds_vec):
        """On-device reduction; bit-exact with the host path."""
        from lasso_tpu.curve.jcurve import from_host_points, to_host_points
        from lasso_tpu.transcript.device_strobe import (DeviceStrobe,
                                                        DeviceTranscript)
        from lasso_tpu.subprotocols.grand_product import _post_challenge_meta

        n = a_vec.shape[0]
        lg_n = (n - 1).bit_length()
        qh_dev = from_host_points([q_point, h_point])
        blinds_l = JFr.encode_ints([bl for bl, _ in blinds_vec])
        blinds_r = JFr.encode_ints([br for _, br in blinds_vec])

        dt = DeviceTranscript.from_host(transcript)
        entry_meta = (dt.s.pos, dt.s.pos_begin, dt.s.cur_flags)
        state, lr_acc, u_acc, a_fin_d, b_fin_d, g_fin = _device_bullet(
            dt.s.state, a_vec, b_vec, g_dev, qh_dev, blinds_l, blinds_r,
            lg_n, entry_meta)

        flat = JFr.decode(jnp.concatenate(
            [u_acc, a_fin_d[None], b_fin_d[None]], axis=0))
        us = flat[:lg_n]
        a_fin, b_fin = flat[lg_n], flat[lg_n + 1]
        # [rounds, 2, 4, W] -> [4, W, 2*rounds] for one batched transfer
        lr_pts = to_host_points(
            jnp.moveaxis(lr_acc.reshape(2 * lg_n, 4, W), 0, -1))
        l_points = lr_pts[0::2]
        r_points = lr_pts[1::2]
        g_fin_host = to_host_points(g_fin)[0]

        out = DeviceTranscript(DeviceStrobe(None, *_post_challenge_meta()))
        out.restore_to_host(transcript, np.asarray(state))

        blind_fin = blind % Fr.p
        for (bl, br), u in zip(blinds_vec, us):
            u_inv = Fr.inv(u)
            blind_fin = (blind_fin + bl * u * u + br * u_inv * u_inv) % Fr.p

        gamma_hat = g_fin_host.mul(a_fin).add(
            q_point.mul(a_fin * b_fin % Fr.p)).add(h_point.mul(blind_fin))
        return (BulletReductionProof(l_points, r_points),
                gamma_hat, a_fin, b_fin, g_fin_host, blind_fin)

    @staticmethod
    def prove(transcript, q_point: hostcurve.Point, g_dev, h_point: hostcurve.Point,
              a_vec, b_vec, blind: int, blinds_vec: list[tuple[int, int]]):
        """a_vec, b_vec: [n, W] device Fr; g_dev: [n, 4, W] device bases.

        Returns (proof, Gamma_hat, a_final, b_final, g_final (host Point),
        blind_fin)."""
        from lasso_tpu.curve.jcurve import from_host_points

        n = a_vec.shape[0]
        assert n & (n - 1) == 0
        lg_n = (n - 1).bit_length()
        assert len(blinds_vec) == 2 * lg_n

        from lasso_tpu.subprotocols.sumcheck import _device_sumcheck_supported
        if n > 1 and _device_sumcheck_supported(transcript):
            return BulletReductionProof._prove_device(
                transcript, q_point, g_dev, h_point, a_vec, b_vec, blind,
                blinds_vec)

        qh_dev = from_host_points([q_point, h_point])
        l_points: list[hostcurve.Point] = []
        r_points: list[hostcurve.Point] = []
        blind_fin = blind % Fr.p
        a, b, g = a_vec, b_vec, g_dev
        blinds_iter = iter(blinds_vec)

        # small tail rounds run entirely on host: they are latency-bound, and
        # per-round device kernels at shrinking shapes cost more in dispatch
        # and compile than the arithmetic (see ops/msm.py MSM_HOST_MAX)
        from lasso_tpu.curve.jcurve import to_host_points
        from lasso_tpu.ops.msm import MSM_HOST_MAX
        host_mode = False

        while n != 1:
            n //= 2
            if not host_mode and n <= MSM_HOST_MAX:
                host_mode = True
                a = JFr.decode(a)
                b = JFr.decode(b)
                g = to_host_points(g)

            blind_l, blind_r = next(blinds_iter)
            if host_mode:
                a_lo, a_hi = a[:n], a[n:]
                b_lo, b_hi = b[:n], b[n:]
                g_lo, g_hi = g[:n], g[n:]
                c_l = sum(x * y for x, y in zip(a_lo, b_hi)) % Fr.p
                c_r = sum(x * y for x, y in zip(a_hi, b_lo)) % Fr.p
                l_pt = hostcurve.msm_host(
                    g_hi + [q_point, h_point], a_lo + [c_l, blind_l])
                r_pt = hostcurve.msm_host(
                    g_lo + [q_point, h_point], a_hi + [c_r, blind_r])
            else:
                a_lo, a_hi = a[:n], a[n:]
                b_lo, b_hi = b[:n], b[n:]
                g_lo, g_hi = g[..., :n], g[..., n:]
                c_l = JFr.decode(_dot(a_lo, b_hi)[None])[0]
                c_r = JFr.decode(_dot(a_hi, b_lo)[None])[0]
                l_scalars = jnp.concatenate(
                    [a_lo, JFr.encode_ints([c_l, blind_l])], axis=0)
                l_bases = jnp.concatenate([g_hi, qh_dev], axis=-1)
                l_pt = to_host_point(msm_device(l_bases, l_scalars, full_width=True))
                r_scalars = jnp.concatenate(
                    [a_hi, JFr.encode_ints([c_r, blind_r])], axis=0)
                r_bases = jnp.concatenate([g_lo, qh_dev], axis=-1)
                r_pt = to_host_point(msm_device(r_bases, r_scalars, full_width=True))

            transcript.append_point(b"L", l_pt)
            transcript.append_point(b"R", r_pt)
            u = transcript.challenge_scalar(b"u")
            u_inv = Fr.inv(u)

            if host_mode:
                a = [(x * u + y * u_inv) % Fr.p for x, y in zip(a_lo, a_hi)]
                b = [(x * u_inv + y * u) % Fr.p for x, y in zip(b_lo, b_hi)]
                try:
                    from lasso_tpu import native
                    folded = native.fold_points(g_lo + g_hi, u, u_inv) \
                        if native.available() else None
                except Exception:
                    folded = None
                g = folded if folded is not None else [
                    pl.mul(u_inv).add(ph.mul(u))
                    for pl, ph in zip(g_lo, g_hi)]
            else:
                u_dev = JFr.encode_scalar(u)
                u_inv_dev = JFr.encode_scalar(u_inv)
                a = JFr.add(JFr.mul(a_lo, u_dev), JFr.mul(a_hi, u_inv_dev))
                b = JFr.add(JFr.mul(b_lo, u_inv_dev), JFr.mul(b_hi, u_dev))
                g = _fold_points(g_lo, g_hi, jnp.asarray(pack_int(u_inv)),
                                 jnp.asarray(pack_int(u)))

            blind_fin = (blind_fin + blind_l * u * u + blind_r * u_inv * u_inv) % Fr.p
            l_points.append(l_pt)
            r_points.append(r_pt)

        if host_mode:
            a_fin, b_fin, g_fin = a[0], b[0], g[0]
        else:
            a_fin = JFr.decode(a)[0]
            b_fin = JFr.decode(b)[0]
            g_fin = to_host_point(g[..., :1])
        gamma_hat = g_fin.mul(a_fin).add(
            q_point.mul(a_fin * b_fin % Fr.p)).add(h_point.mul(blind_fin))

        return (BulletReductionProof(l_points, r_points),
                gamma_hat, a_fin, b_fin, g_fin, blind_fin)

    def verification_scalars(self, n: int, transcript):
        """(u_sq, u_inv_sq, s) for the combined verification MSM."""
        lg_n = len(self.L_vec)
        if lg_n >= 32:
            raise InputTooLarge("bullet proof too large")
        if n != (1 << lg_n):
            raise InvalidInputLength(1 << lg_n, n)

        challenges = []
        for l_pt, r_pt in zip(self.L_vec, self.R_vec):
            transcript.append_point(b"L", l_pt)
            transcript.append_point(b"R", r_pt)
            challenges.append(transcript.challenge_scalar(b"u"))

        challenges_inv = Fr.batch_inv(challenges)
        all_inv = 1
        for c in challenges_inv:
            all_inv = all_inv * c % Fr.p

        u_sq = [c * c % Fr.p for c in challenges]
        u_inv_sq = [c * c % Fr.p for c in challenges_inv]

        s = [all_inv]
        for i in range(1, n):
            lg_i = i.bit_length() - 1
            k = 1 << lg_i
            u_lg_i_sq = u_sq[(lg_n - 1) - lg_i]
            s.append(s[i - k] * u_lg_i_sq % Fr.p)

        return u_sq, u_inv_sq, s

    def verify(self, n: int, a: list[int], transcript, gamma: hostcurve.Point,
               g_dev):
        """Returns (g_hat, gamma_hat, a_hat). g_dev: device bases [n,4,W]."""
        u_sq, u_inv_sq, s = self.verification_scalars(n, transcript)

        g_hat = to_host_point(msm_device(g_dev, JFr.encode_ints(s)))
        a_hat = sum(x * y for x, y in zip(a, s)) % Fr.p

        from lasso_tpu.curve.jcurve import from_host_points
        bases = from_host_points(self.L_vec + self.R_vec + [gamma])
        scalars = JFr.encode_ints(u_sq + u_inv_sq + [1])
        gamma_hat = to_host_point(msm_device(bases, scalars))
        return g_hat, gamma_hat, a_hat
