"""Batched resolution of the opening proofs' final Sigma-protocol checks.

Every Hyrax opening verify (poly/hyrax.PolyEvalProof -> DotProductProofLog
-> BulletReductionProof) ends in ONE equality that is affine in values the
Fiat-Shamir transcript never sees: the bullet basis combination
g_hat = <G, s> (an n-point MSM over the fixed generator basis) and a
handful of proof points with transcript-derived coefficients.  The
challenge stream is therefore already closed when these MSMs run, so the
verifier may draw a uniformly random weight w_k per check and test

    sum_k  w_k * (lhs_k - rhs_k)  ==  identity

with a single multi-scalar multiplication (standard batch verification;
a cheat in any single check survives with probability <= 2^-128 over the
weights).  The per-check relations match the reference's sequential
checks (reference: src/nizk/mod.rs DotProductProofLog::verify,
src/nizk/bullet.rs BulletReductionProof::verification_scalars).

Why this exists: on the tunneled-TPU deployment each device MSM costs a
full host<->device round trip.  A SparsePoly verify performs four opening
verifies (combined derefs twice, ops-variate, mem-variate); deferring
their g_hat MSMs and final checks into this accumulator collapses 4+
round trips into ONE device program issued at the very end of
SparsePolynomialEvaluationProof.verify.

Segments over the same generator basis (e.g. the two derefs openings) are
merged scalar-wise before dispatch, so the device MSM is at most one
segment per distinct basis.
"""

from __future__ import annotations

import secrets

from lasso_tpu.curve import host as hostcurve
from lasso_tpu.field.host import Fr
from lasso_tpu.utils.errors import LassoError


class DeferredOpeningChecks:
    """Accumulates weighted affine point relations; resolve() checks the
    random linear combination with one (batched) MSM."""

    def __init__(self):
        self._first = True
        self._host_pts: list[hostcurve.Point] = []
        self._host_sc: list[int] = []
        # keyed by (id(gens), n): merged scalar list over gens.G[:n]
        self._segments: dict[tuple[int, int], tuple[object, int, list[int]]] = {}
        self._n_checks = 0

    def weight(self) -> int:
        """Fresh random weight for one check (1 for the first: a single
        check needs no randomization, and w=1 keeps the common one-opening
        case bit-deterministic)."""
        self._n_checks += 1
        if self._first:
            self._first = False
            return 1
        return secrets.randbits(128) | 1

    def add_terms(self, points: list[hostcurve.Point], scalars: list[int]):
        """Queue host-point terms sum_i scalars_i * points_i (weights must
        already be folded into `scalars` by the caller)."""
        assert len(points) == len(scalars)
        self._host_pts.extend(points)
        self._host_sc.extend(s % Fr.p for s in scalars)

    def add_gens_msm(self, gens, n: int, scalars: list[int], coeff: int):
        """Queue coeff * <gens.G[:n], scalars>.  Segments sharing the same
        basis object and extent are merged elementwise."""
        assert len(scalars) == n and len(gens.G) >= n
        coeff %= Fr.p
        key = (id(gens), n)
        seg = self._segments.get(key)
        if seg is None:
            self._segments[key] = (
                gens, n, [coeff * s % Fr.p for s in scalars])
        else:
            merged = seg[2]
            for i, s in enumerate(scalars):
                merged[i] = (merged[i] + coeff * s) % Fr.p

    def resolve(self) -> None:
        """Run the single batched check; raises LassoError on failure.

        Basis segments above the host-MSM threshold fuse into ONE device
        MSM (the bases are the device-cached generator tensors, so no
        per-proof point upload happens); small segments and the proof-point
        terms run on the native host Pippenger.
        """
        if not self._n_checks:
            return
        from lasso_tpu.ops.msm import MSM_HOST_MAX

        host_pts = list(self._host_pts)
        host_sc = list(self._host_sc)
        device_segs = []
        for gens, n, scalars in self._segments.values():
            if n <= MSM_HOST_MAX:
                host_pts.extend(gens.G[:n])
                host_sc.extend(scalars)
            else:
                device_segs.append((gens, n, scalars))

        total = hostcurve.msm_host(host_pts, host_sc) if host_pts \
            else hostcurve.Point.identity()

        if device_segs:
            import jax.numpy as jnp

            from lasso_tpu.curve.jcurve import to_host_point
            from lasso_tpu.field.jfield import JFr
            from lasso_tpu.ops.msm import msm_device
            from lasso_tpu.subprotocols.dot_product import _gens_device

            bases = jnp.concatenate(
                [_gens_device(g)[..., :n] for g, n, _ in device_segs],
                axis=-1)
            flat: list[int] = []
            for _, _, scalars in device_segs:
                flat.extend(scalars)
            dev = to_host_point(
                msm_device(bases, JFr.encode_ints(flat), full_width=True))
            total = total.add(dev)

        if not total.is_identity():
            raise LassoError(
                "batched opening verification failed "
                f"({self._n_checks} checks combined)")
