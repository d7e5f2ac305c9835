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
# Fully on-device DotProductProofLog: ONE jitted program runs the Cx
# commitment MSM, every transcript absorb/challenge, all bullet-reduction
# rounds, and the closing sigma protocol (delta, c, z1, z2).
#
# Every round's L/R commitments are MSMs over FOLDED bases g^(k); folding
# points on device would cost a scalar-mul ladder per round.  Instead the
# fold is carried on the SCALAR side ("delayed fold"): original basis G_j
# appears in g^(k) at position (j mod m) with weight w_j = prod over earlier
# rounds of (u if the round's half-bit of j else u^-1), so
#     L_k = MSM(G, s)  with  s_j = w_j * a_lo[(j mod m) - m/2]  (hi half)
# over the FIXED original bases -- no point folds at all.
#
# Latency design (everything here is small-n and serial-depth bound):
#   * every MSM runs over PRE-DOUBLED window bases (ops/msm._msm_kernel_flat)
#     so there is no Horner window combine -- ~max_bits sequential doublings
#     per MSM, the dominant cost, are hoisted into a one-time per-gens
#     precompute;
#   * each round's L and R are ONE vmapped 2-lane MSM (a second lane is free
#     on a vector machine);
#   * the closing delta = g_hat*d + h*r_delta is algebraically expanded to
#     MSM(G ++ h, (d*w, r_delta)) over the same pre-doubled bases, replacing
#     a g_hat MSM plus two 256-step scalar ladders.
#
# All proof outputs (Cx, L/R, delta as canonical affine coordinates; z1/z2
# as canonical limbs) and the final strobe state leave the device in ONE
# flat uint32 transfer, so a whole opening proof costs a single dispatch +
# a single download regardless of round count.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("num_rounds", "c_w", "n_w",
                                             "entry_meta"))
def _device_dppl(state0, x0, b0, pd_bases, cy_bytes, beta_bytes,
                 blind_x, blinds_l, blinds_r, d_mont, r_delta_mont,
                 r_beta_mont, blind_gamma, num_rounds: int, c_w: int,
                 n_w: int, entry_meta):
    """x0 (secret vec), b0 (public vec): [n, W] Montgomery (n = 2^rounds);
    pd_bases: [4, W, n_w*(n+2)] pre-doubled window bases of (G ++ q ++ h)
    under window plan (c_w, n_w) (ops/msm.predoubled_windows);
    cy_bytes/beta_bytes: [32] compressed host-known points;
    blind_x/blind_gamma/d/r_delta/r_beta: [W] Montgomery tape scalars;
    blinds_l/r: [num_rounds, W] Montgomery.

    Returns ONE flat uint32 vector:
      state [200] ++ xa [(2*rounds+2), W] ++ ya [(2*rounds+2), W]
      ++ z [2, W]
    where the point order is [Cx, L_0..L_{k-1}, R_0..R_{k-1}, delta] as
    canonical affine int limbs and z = (z1, z2) canonical int limbs.
    """
    from lasso_tpu.curve.jcurve import (affine_int_limbs_device,
                                        compress_affine_bytes_device)
    from lasso_tpu.ops.msm import _msm_kernel_flat, _msm_kernel_flat_batch
    from lasso_tpu.transcript.device_strobe import (DeviceStrobe,
                                                    DeviceTranscript)
    from lasso_tpu.subprotocols.grand_product import _post_challenge_meta

    n = x0.shape[0]
    assert n == 1 << num_rounds
    assert pd_bases.shape[-1] == n_w * (n + 2)
    idx = jnp.arange(n)

    # -- Cx = <x, G> + blind_x * h (the q slot gets a zero scalar) -----------
    cx_scalars = jnp.concatenate(
        [x0, jnp.zeros((1, W), jnp.uint32), blind_x[None]], axis=0)
    cx_pt = _msm_kernel_flat(pd_bases, JFr.to_int_limbs(cx_scalars),
                             c=c_w, num_windows=n_w)
    cx_xa, cx_ya = affine_int_limbs_device(cx_pt)  # [1, W] each
    cx_bytes = compress_affine_bytes_device(cx_xa, cx_ya)

    dt = DeviceTranscript(DeviceStrobe(state0, *entry_meta))
    dt.append_point_bytes(b"Cx", cx_bytes[0])
    dt.append_point_bytes(b"Cy", cy_bytes)
    dt.append_scalars(b"a", b0)

    # -- bullet rounds -------------------------------------------------------
    lx_acc0 = jnp.zeros((num_rounds, 2, W), jnp.uint32)  # (L, R) affine x
    ly_acc0 = jnp.zeros((num_rounds, 2, W), jnp.uint32)
    w0 = JFr.ones(n)
    bf0 = blind_gamma  # running blind_fin accumulator [W]

    def round_step(state, meta, a, b, w, bf, k, lx_acc, ly_acc):
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
        lr_pts = _msm_kernel_flat_batch(
            pd_bases, JFr.to_int_limbs(jnp.stack([full_l, full_r])),
            c_w, n_w)  # [2, 4, W, 1]
        lr = jnp.moveaxis(lr_pts[..., 0], 0, -1)  # [4, W, 2]
        xa, ya = affine_int_limbs_device(lr)  # [2, W]
        cb = compress_affine_bytes_device(xa, ya)  # [2, 32]

        dt = DeviceTranscript(DeviceStrobe(state, *meta))
        dt.append_point_bytes(b"L", cb[0])
        dt.append_point_bytes(b"R", cb[1])
        u = dt.challenge_scalar(b"u")
        out_meta = (dt.s.pos, dt.s.pos_begin, dt.s.cur_flags)
        u_inv = JFr.inv_device(u)

        a = JFr.add(JFr.mul(a, u[None]), JFr.mul(a_hi, u_inv[None]))
        b = JFr.add(JFr.mul(b, u_inv[None]), JFr.mul(b_hi, u[None]))
        w = JFr.mul(w, jnp.where(hi_bit[:, None], u[None], u_inv[None]))
        # blind_fin += blind_l * u^2 + blind_r * u^-2
        u2 = JFr.mul(u[None], u[None])[0]
        ui2 = JFr.mul(u_inv[None], u_inv[None])[0]
        bf = JFr.add(bf, JFr.add(
            JFr.mul(blinds_l[k][None], u2[None])[0],
            JFr.mul(blinds_r[k][None], ui2[None])[0]))

        lx_acc = jax.lax.dynamic_update_slice(lx_acc, xa[None], (k, 0, 0))
        ly_acc = jax.lax.dynamic_update_slice(ly_acc, ya[None], (k, 0, 0))
        return dt.state_tuple(), out_meta, a, b, w, bf, lx_acc, ly_acc

    meta = _post_challenge_meta()
    mid_meta = (dt.s.pos, dt.s.pos_begin, dt.s.cur_flags)
    state, out_meta, a, b, w, bf, lx_acc, ly_acc = round_step(
        dt.state_tuple(), mid_meta, x0, b0, w0, bf0, jnp.int32(0),
        lx_acc0, ly_acc0)
    assert out_meta == meta, "bullet peel exit not at canonical position"

    def body(k, carry):
        state, a, b, w, bf, lx_acc, ly_acc = carry
        state, om, a, b, w, bf, lx_acc, ly_acc = round_step(
            state, meta, a, b, w, bf, k, lx_acc, ly_acc)
        assert om == meta, "bullet round trajectory not periodic"
        return state, a, b, w, bf, lx_acc, ly_acc

    state, a, b, w, bf, lx_acc, ly_acc = jax.lax.fori_loop(
        1, num_rounds, body, (state, a, b, w, bf, lx_acc, ly_acc))

    # -- closing sigma protocol ----------------------------------------------
    # delta = g_hat*d + h*r_delta with g_hat = MSM(G, w), expanded to ONE
    # fixed-base MSM over (G ++ q ++ h) with scalars (d*w, 0, r_delta)
    delta_scalars = jnp.concatenate(
        [JFr.mul(w, d_mont[None]), jnp.zeros((1, W), jnp.uint32),
         r_delta_mont[None]], axis=0)
    delta_pt = _msm_kernel_flat(pd_bases, JFr.to_int_limbs(delta_scalars),
                                c=c_w, num_windows=n_w)
    d_xa, d_ya = affine_int_limbs_device(delta_pt)
    d_bytes = compress_affine_bytes_device(d_xa, d_ya)

    dt2 = DeviceTranscript(DeviceStrobe(state, *meta))
    dt2.append_point_bytes(b"delta", d_bytes[0])
    dt2.append_point_bytes(b"beta", beta_bytes)
    c_ch = dt2.challenge_scalar(b"c")

    x_hat, a_hat = a[0], b[0]
    y_hat = JFr.mul(x_hat[None], a_hat[None])[0]
    z1 = JFr.add(d_mont, JFr.mul(c_ch[None], y_hat[None])[0])
    z2 = JFr.add(
        JFr.mul(a_hat[None],
                JFr.add(JFr.mul(c_ch[None], bf[None])[0], r_beta_mont)[None]
                )[0],
        r_delta_mont)

    # [Cx, L_0..L_{k-1}, R_0..R_{k-1}, delta]
    xa_all = jnp.concatenate(
        [cx_xa, lx_acc[:, 0], lx_acc[:, 1], d_xa], axis=0)
    ya_all = jnp.concatenate(
        [cx_ya, ly_acc[:, 0], ly_acc[:, 1], d_ya], axis=0)
    z_all = JFr.to_int_limbs(jnp.stack([z1, z2]))

    return jnp.concatenate([
        dt2.state_tuple(), xa_all.reshape(-1), ya_all.reshape(-1),
        z_all.reshape(-1)])


@dataclass
class BulletReductionProof:
    L_vec: list[hostcurve.Point]
    R_vec: list[hostcurve.Point]

    @staticmethod
    def prove(transcript, q_point: hostcurve.Point, g_dev, h_point: hostcurve.Point,
              a_vec, b_vec, blind: int, blinds_vec: list[tuple[int, int]]):
        """a_vec, b_vec: [n, W] device Fr; g_dev: [n, 4, W] device bases.

        Host/hybrid reduction (the fallback when the on-device transcript is
        unavailable; the device path runs the whole DotProductProofLog as one
        program through _device_dppl instead).

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
               g_host: list[hostcurve.Point], gens_n=None):
        """Returns (g_hat, gamma_hat, a_hat). g_host: basis points (host);
        gens_n: the MultiCommitGens the basis came from, if available -- its
        cached device bases avoid a per-verify host->device conversion of n
        points on the device path.

        All verifier MSMs here are latency-bound (n is the sqrt-size Hyrax
        row extent, the L/R combination is 2 log n + 1 points): they run on
        the native host Pippenger unless n is genuinely large."""
        u_sq, u_inv_sq, s = self.verification_scalars(n, transcript)

        from lasso_tpu.ops.msm import MSM_HOST_MAX
        if n <= MSM_HOST_MAX:
            g_hat = hostcurve.msm_host(g_host, s)
        else:
            from lasso_tpu.curve.jcurve import from_host_points
            if gens_n is not None and len(gens_n.G) >= n:
                from lasso_tpu.subprotocols.dot_product import _gens_device
                bases = _gens_device(gens_n)[..., :n]
            else:
                bases = from_host_points(g_host)
            # s entries are products of squared challenges: always
            # field-width, so skip the small-scalar width scan (one wasted
            # device->host sync per verify otherwise)
            g_hat = to_host_point(
                msm_device(bases, JFr.encode_ints(s), full_width=True))
        a_hat = sum(x * y for x, y in zip(a, s)) % Fr.p

        gamma_hat = hostcurve.msm_host(
            self.L_vec + self.R_vec + [gamma], u_sq + u_inv_sq + [1])
        return g_hat, gamma_hat, a_hat
