"""Bulletproofs-style inner-product reduction (reference: src/subprotocols/bullet.rs).

Each halving round issues two TPU MSMs (for L and R) and three fused folds:
scalar vectors fold as vector field ops, and the basis fold
G_L*u_inv + G_R*u runs as batched double-and-add over all points at once
(a `fori_loop` over scalar bits -- one padd+pdbl per bit for the whole
vector of points).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax import lax

from lasso_tpu.curve import host as hostcurve
from lasso_tpu.curve.jcurve import identity, padd, pdbl, pselect, to_host_point
from lasso_tpu.field.host import Fr
from lasso_tpu.field.jfield import JFr, pack_int
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


@dataclass
class BulletReductionProof:
    L_vec: list[hostcurve.Point]
    R_vec: list[hostcurve.Point]

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
