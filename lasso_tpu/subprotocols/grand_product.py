"""Grand product circuits + batched argument (reference: src/subprotocols/grand_product.rs).

TPU shape: a batch of I same-sized product circuits is a single tensor per
layer ([I, len, W]), built bottom-up with one fused modular multiply per
layer.  The batched layer sumcheck (Thaler'13) runs through
subprotocols/sumcheck.prove_cubic_batched with all instances vectorized on
the leading axis.  The product tree is associative, which is what lets
multi-host runs combine shard-local subtrees with a log(#shards) top tree
(see parallel/).
"""

from __future__ import annotations

import functools
import os as _os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from lasso_tpu.field.host import Fr
from lasso_tpu.field.jfield import JFr, W
from lasso_tpu.poly.dense import eq_evals_device, eq_evaluate_host
from lasso_tpu.poly.unipoly import UniPoly
from lasso_tpu.subprotocols.sumcheck import (SUMCHECK_FIX,
                                             SumcheckInstanceProof,
                                             _append_round_poly_device,
                                             _bind_top_masked,
                                             _bind_top_single_masked,
                                             _cubic_round_evals_masked,
                                             _device_sumcheck_supported,
                                             _interp_coeffs_device,
                                             prove_cubic_batched)
from lasso_tpu.utils.errors import LassoError
from lasso_tpu.utils.tracing import instrument


@jax.jit
def _layer_product(vals):
    """[I, n, W] -> [I, n/2, W]: pairwise left*right products, one program
    (the halving slices fuse into the multiply instead of materializing)."""
    half = vals.shape[1] // 2
    return JFr.mul(vals[:, :half], vals[:, half:])


# Product-tree layers whose tensor exceeds this many field elements are NOT
# kept resident: the host-loop suffix recomputes them from the leaves on
# demand (t chained pairwise-product programs, ~2n extra multiplies per big
# layer -- milliseconds) instead of holding every wide layer in HBM for the
# whole argument.  At jolt-demo scale (C=8, s=2^22: 2*alpha*s = 2^26 leaf
# elements) storing the full tree is the difference between fitting and
# RESOURCE_EXHAUSTED.
GP_STORE_ELEMS = int(
    _os.environ.get("LASSO_TPU_GP_STORE_ELEMS", str(1 << 22)))


class _HalfView:
    """Lazy left/right halves of the per-layer product tensors.

    `view[i]` materializes the requested half of layer i on demand (a
    transient slice) instead of the circuit storing BOTH halves of every
    layer as separate copies -- that doubled-resident layout was the single
    biggest HBM consumer at jolt-demo scale (C=8: 2*alpha*s leaves)."""

    def __init__(self, circuit: "BatchedGrandProductCircuit", side: int):
        self._circuit = circuit
        self._side = side

    def __len__(self) -> int:
        return self._circuit.num_layers

    def __getitem__(self, i: int) -> jnp.ndarray:
        return self._circuit.layer_half(i, self._side)


class BatchedGrandProductCircuit:
    """I product-tree circuits over inputs [I, n, W] (n a power of two).

    Storage: the leaves plus every layer small enough for the GP_STORE_ELEMS
    budget (one tensor per layer -- the (left, right) halves the argument
    consumes are lazy `_HalfView` slices).  Wider layers are recomputed from
    the leaves on demand, so resident memory is ~n field elements instead of
    the ~3n of a fully materialized left+right tree.
    """

    def __init__(self, inputs: jnp.ndarray = None, leaves_fn=None,
                 shape: tuple = None):
        """Either hold `inputs` [I, n, W] as the leaves, or -- when the
        leaves are cheaply derivable from data that stays resident anyway
        (the fingerprint case) -- pass `leaves_fn(half)` + `shape=(I, n)`:
        `leaves_fn(None)` returns the full leaves, `leaves_fn(0|1)` just the
        left/right half directly.  The leaves then never stay resident
        (s-cube leaves are the largest tensor in the whole memory check)."""
        if leaves_fn is None:
            assert inputs.ndim == 3
            num_instances, n = inputs.shape[0], inputs.shape[1]
        else:
            num_instances, n = shape
        assert n & (n - 1) == 0 and n >= 2
        self.num_instances = num_instances
        self._num_layers = (n - 1).bit_length()
        self._leaves = inputs
        self._leaves_fn = leaves_fn
        self._stored: dict[int, jnp.ndarray] = {}
        self._memo: tuple[int, jnp.ndarray] | None = None
        cur = inputs if leaves_fn is None else leaves_fn(None)
        t = 0
        while cur.shape[1] > 2:
            cur = _layer_product(cur)
            t += 1
            if cur.size // W <= GP_STORE_ELEMS:
                self._stored[t] = cur
        self._top_t = t  # layer index of the width-2 top (0 when n == 2)
        if t and t not in self._stored:
            self._stored[t] = cur

    def layer(self, t: int) -> jnp.ndarray:
        """Layer t values [I, n / 2^t, W] (recomputed if not resident)."""
        if t == 0:
            return (self._leaves if self._leaves_fn is None
                    else self._leaves_fn(None))
        got = self._stored.get(t)
        if got is not None:
            return got
        if self._memo is not None and self._memo[0] == t:
            return self._memo[1]
        cur = self.layer(0)
        for _ in range(t):
            cur = _layer_product(cur)
        # memoize the most recent recompute: the argument fetches BOTH
        # halves of each layer back-to-back, and without this each fetch
        # would redo the full product chain from the leaves (~4n multiplies
        # per layer instead of ~2n, with the leaves materialized twice)
        self._memo = (t, cur)
        return cur

    def layer_half(self, t: int, side: int) -> jnp.ndarray:
        """Left (side=0) / right (side=1) half of layer t.

        For recomputable leaves the half is produced DIRECTLY by
        `leaves_fn(side)` -- no full-width intermediate, which is what keeps
        the widest grand-product layer's sumcheck inside HBM at s=2^24."""
        if t == 0 and self._leaves_fn is not None:
            return self._leaves_fn(side)
        vals = self.layer(t)
        half = vals.shape[1] // 2
        return vals[:, :half] if side == 0 else vals[:, half:]

    @property
    def left_layers(self) -> _HalfView:
        return _HalfView(self, 0)

    @property
    def right_layers(self) -> _HalfView:
        return _HalfView(self, 1)

    @property
    def num_layers(self) -> int:
        return self._num_layers

    def release(self) -> None:
        """Drop all layer tensors (free HBM once the argument is done)."""
        self._leaves = None
        self._leaves_fn = None
        self._stored = {}
        self._memo = None

    def evaluate(self) -> list[int]:
        """Root products, one per instance (host ints)."""
        top = self.layer(self._top_t)
        root = JFr.mul(top[:, 0], top[:, 1])
        return JFr.decode(root)


class GrandProductCircuit:
    """Single product-tree circuit (reference: grand_product.rs:13-65).

    Thin wrapper over the batched tensor circuit with one instance; the
    prover always uses the batched form (one tensor per layer)."""

    def __init__(self, poly):
        z = poly.z if hasattr(poly, "z") else poly
        self._batched = BatchedGrandProductCircuit(z[None])

    @property
    def num_layers(self) -> int:
        return self._batched.num_layers

    def left_vec(self, layer: int):
        return self._batched.left_layers[layer][0]

    def right_vec(self, layer: int):
        return self._batched.right_layers[layer][0]

    def evaluate(self) -> int:
        return self._batched.evaluate()[0]


@dataclass
class LayerProofBatched:
    proof: SumcheckInstanceProof
    claims_prod_left: list[int]
    claims_prod_right: list[int]


# ---------------------------------------------------------------------------
# Fully-fused device argument (prefix of layers whose length fits the masked
# sumcheck buffers).  The ENTIRE per-layer pipeline -- RLC coefficient draws,
# claim combination, eq-table build, all cubic sumcheck rounds, left/right
# claim appends and the r_layer challenge -- runs inside ONE jitted program
# with the Fiat-Shamir transcript on device (transcript/device_strobe.py).
# The host sees exactly TWO transfers per argument: the decoded round-poly
# coefficients/claims, and the final strobe state.  The per-layer host loop
# it replaces cost ~4 tunnel round trips + an eq rebuild per layer.
# ---------------------------------------------------------------------------

# Prefix layer t has length 2^t; the masked buffer (and therefore the number
# of fused layers) is sized to the LARGEST layer, capped by GP_FIX_CAP and a
# total-buffer budget so high-instance-count workloads don't blow HBM.  With
# M=2^16 tables the whole argument fuses into one device call.
GP_FIX_CAP = 32768
GP_BUDGET_ELEMS = 1 << 24  # layers * instances * fix field elements per side

# Strobe bookkeeping after ANY challenge_scalar: the C-flagged PRF begin-op
# always runs the permutation (resetting pos/pos_begin to 0) and then
# squeezes 64 bytes -- independent of what preceded it.  Every layer both
# starts and ends at this position, which is what makes the per-layer loop
# body trace-periodic.
def _post_challenge_meta():
    from lasso_tpu.transcript.strobe import FLAG_A, FLAG_C, FLAG_I

    return (64, 0, FLAG_I | FLAG_A | FLAG_C)


def _gp_eq_step(eb, r_i):
    """One doubling step of the eq-table build on a fixed [FIX, W] buffer.

    Matches poly/dense.eq_evals_device ordering (index MSB <-> first r):
    active lanes double from the front; garbage lanes are masked downstream.
    """
    fix = eb.shape[0]
    t = JFr.mul(eb, r_i[None])
    half = fix // 2
    lo = JFr.sub(eb[:half], t[:half])
    return jnp.stack([lo, t[:half]], axis=1).reshape(fix, W)


@functools.partial(jax.jit, static_argnames=("num_instances", "entry_meta"))
def _device_gp_prefix(state0, leaves_l, leaves_r, claims0, num_layers,
                      num_instances: int, entry_meta):
    """Run prefix layers 0..num_layers-1 of the batched argument on device.

    state0: [200] strobe bytes at argument entry (static meta `entry_meta`);
    leaves_l/r: [L, I, FIX, W] per-layer left/right inputs (layer t active
    length 2^t, zero-padded); claims0: [I, W] root claims (Montgomery);
    num_layers: TRACED prefix layer count (>= 1, <= L).

    Returns (state, coeffs_acc [L, L-1, 4, W], claims_l [L, I, W],
    claims_r [L, I, W], claims_out [I, W], rand_out [L, W]).
    """
    from lasso_tpu.transcript.device_strobe import DeviceStrobe, DeviceTranscript

    l_max = leaves_l.shape[0]
    r_max = max(l_max - 1, 1)
    fix = leaves_l.shape[2]
    i_cnt = num_instances

    coeffs_acc0 = jnp.zeros((l_max, r_max, 4, W), jnp.uint32)
    cl_acc0 = jnp.zeros((l_max, i_cnt, W), jnp.uint32)
    cr_acc0 = jnp.zeros((l_max, i_cnt, W), jnp.uint32)
    rand0 = jnp.zeros((l_max, W), jnp.uint32)

    def layer(state, meta, rand_acc, claims, t, accs):
        """One layer: coeffs -> rounds -> claim appends -> r_layer.

        t is traced; meta (static strobe bookkeeping) must be identical at
        entry and exit for loop periodicity."""
        coeffs_acc, cl_acc, cr_acc = accs
        dt = DeviceTranscript(DeviceStrobe(state, *meta))
        coeffs = jnp.stack([
            dt.challenge_scalar(b"rand_coeffs_next_layer")
            for _ in range(i_cnt)])  # [I, W]
        e = JFr.finish_sum(JFr.sum_columns(JFr.mul(coeffs, claims)))

        eq = jax.lax.fori_loop(
            0, t, lambda i, eb: _gp_eq_step(eb, rand_acc[i]), JFr.ones(fix))

        a = jax.lax.dynamic_index_in_dim(leaves_l, t, 0, keepdims=False)
        b = jax.lax.dynamic_index_in_dim(leaves_r, t, 0, keepdims=False)
        m0 = jnp.int32(1) << t

        round_meta = (dt.s.pos, dt.s.pos_begin, dt.s.cur_flags)
        lcoeffs0 = jnp.zeros((r_max, 4, W), jnp.uint32)
        lround_r0 = jnp.zeros((r_max, W), jnp.uint32)

        def rlc(ev_t):  # [I, W] -> [W]
            return JFr.finish_sum(JFr.sum_columns(JFr.mul(ev_t, coeffs)))

        def round_body(k, carry):
            st, a, b, c, m, e, lcoeffs, lround_r = carry
            ev = _cubic_round_evals_masked(a, b, c, m)  # [3, I, W]
            comb0, comb2, comb3 = rlc(ev[0]), rlc(ev[1]), rlc(ev[2])
            evals4 = jnp.stack([comb0, JFr.sub(e, comb0), comb2, comb3])
            cfs = _interp_coeffs_device(evals4, 3)

            rdt = DeviceTranscript(DeviceStrobe(st, *round_meta))
            _append_round_poly_device(rdt, cfs, 3)
            r = rdt.challenge_scalar(b"challenge_nextround")
            assert (rdt.s.pos, rdt.s.pos_begin, rdt.s.cur_flags) == round_meta, \
                "strobe round trajectory not periodic"

            a = _bind_top_masked(a, m, r)
            b = _bind_top_masked(b, m, r)
            c = _bind_top_single_masked(c, m, r)
            e_new = cfs[3]
            for j in (2, 1, 0):
                e_new = JFr.add(JFr.mul(e_new[None], r[None])[0], cfs[j])
            lcoeffs = jax.lax.dynamic_update_slice(lcoeffs, cfs[None], (k, 0, 0))
            lround_r = jax.lax.dynamic_update_slice(lround_r, r[None], (k, 0))
            return rdt.state_tuple(), a, b, c, m // 2, e_new, lcoeffs, lround_r

        state_r, a, b, _c, _m, _e, lcoeffs, lround_r = jax.lax.fori_loop(
            0, t, round_body,
            (dt.state_tuple(), a, b, eq, m0, e, lcoeffs0, lround_r0))

        dt2 = DeviceTranscript(DeviceStrobe(state_r, *round_meta))
        a0, b0 = a[:, 0], b[:, 0]  # [I, W]
        for i in range(i_cnt):
            dt2.append_scalar(b"claim_prod_left", a0[i])
            dt2.append_scalar(b"claim_prod_right", b0[i])
        r_layer = dt2.challenge_scalar(b"challenge_r_layer")
        out_meta = (dt2.s.pos, dt2.s.pos_begin, dt2.s.cur_flags)

        claims_new = JFr.add(a0, JFr.mul(r_layer[None], JFr.sub(b0, a0)))
        rand_new = jnp.concatenate(
            [r_layer[None], lround_r[: l_max - 1]], axis=0)
        coeffs_acc = jax.lax.dynamic_update_slice(
            coeffs_acc, lcoeffs[None], (t, 0, 0, 0))
        cl_acc = jax.lax.dynamic_update_slice(cl_acc, a0[None], (t, 0, 0))
        cr_acc = jax.lax.dynamic_update_slice(cr_acc, b0[None], (t, 0, 0))
        return (dt2.state_tuple(), out_meta, rand_new, claims_new,
                (coeffs_acc, cl_acc, cr_acc))

    # peel layer 0 (no rounds) at the true entry meta; its exit meta is the
    # canonical post-challenge position every subsequent layer starts and
    # ends at (verified by trace-time asserts)
    meta = _post_challenge_meta()
    state, out_meta, rand_acc, claims, accs = layer(
        state0, entry_meta, rand0, claims0, jnp.int32(0),
        (coeffs_acc0, cl_acc0, cr_acc0))
    assert out_meta == meta, "strobe peel exit not at canonical position"

    def loop_body(t, carry):
        state, rand_acc, claims, accs = carry
        state, out_meta2, rand_acc, claims, accs = layer(
            state, meta, rand_acc, claims, t, accs)
        assert out_meta2 == meta, "strobe layer trajectory not periodic"
        return state, rand_acc, claims, accs

    state, rand_acc, claims, accs = jax.lax.fori_loop(
        1, num_layers, loop_body, (state, rand_acc, claims, accs))
    coeffs_acc, cl_acc, cr_acc = accs
    return state, coeffs_acc, cl_acc, cr_acc, claims, rand_acc


@dataclass
class BatchedGrandProductArgument:
    proof: list[LayerProofBatched]

    @staticmethod
    @instrument("BatchedGrandProductArgument.prove")
    def prove(circuits: BatchedGrandProductCircuit, transcript):
        """Returns (argument, rand)."""
        num_layers = circuits.num_layers
        claims_to_verify = circuits.evaluate()
        proof_layers: list[LayerProofBatched] = []
        rand: list[int] = []

        start = 0
        if _device_sumcheck_supported(transcript):
            i_cnt = circuits.num_instances
            budget = max(SUMCHECK_FIX, GP_BUDGET_ELEMS // (num_layers * i_cnt))
            budget = 1 << (budget.bit_length() - 1)
            fix = min(1 << (num_layers - 1), GP_FIX_CAP, budget)
            prefix = min(num_layers, fix.bit_length())  # layers with 2^t <= fix
            proof_layers, claims_to_verify, rand = \
                BatchedGrandProductArgument._prove_prefix_device(
                    circuits, claims_to_verify, prefix, fix, transcript)
            start = prefix

        for layer_id in range(num_layers - 1 - start, -1, -1):
            layer_len = 1 << (num_layers - 1 - layer_id)  # width per side
            eq_poly = eq_evals_device([JFr.encode_scalar(x) for x in rand])
            assert eq_poly.shape[0] == layer_len
            num_rounds = (layer_len - 1).bit_length()

            coeffs = transcript.challenge_vector(
                b"rand_coeffs_next_layer", len(claims_to_verify))
            claim = sum(c * v for c, v in zip(coeffs, claims_to_verify)) % Fr.p

            # the left/right slices are passed inline so only the callee
            # holds them -- the prover frees its copy the moment round 0
            # binds, which matters at s-cube layer sizes
            proof, rand_prod, (claims_left, claims_right, _claim_eq) = \
                prove_cubic_batched(
                    claim, num_rounds, circuits.left_layers[layer_id],
                    circuits.right_layers[layer_id], eq_poly, coeffs,
                    transcript)

            for cl, cr in zip(claims_left, claims_right):
                transcript.append_scalar(b"claim_prod_left", cl)
                transcript.append_scalar(b"claim_prod_right", cr)

            r_layer = transcript.challenge_scalar(b"challenge_r_layer")
            claims_to_verify = [
                (cl + r_layer * (cr - cl)) % Fr.p
                for cl, cr in zip(claims_left, claims_right)
            ]
            rand = [r_layer] + rand_prod
            proof_layers.append(LayerProofBatched(proof, claims_left, claims_right))

        return BatchedGrandProductArgument(proof_layers), rand

    @staticmethod
    def _prove_prefix_device(circuits, claims_to_verify, prefix: int,
                             fix: int, transcript):
        """Run the first `prefix` layers through _device_gp_prefix.

        Returns (proof_layers, claims_to_verify, rand) with the host
        transcript advanced to the state after layer prefix-1."""
        from lasso_tpu.transcript.device_strobe import (DeviceStrobe,
                                                        DeviceTranscript)

        num_layers = circuits.num_layers
        i_cnt = circuits.num_instances

        def pad_fix(x):  # [I, n, W] -> [I, FIX, W]
            n = x.shape[1]
            if n == fix:
                return x
            return jnp.concatenate(
                [x, jnp.zeros((i_cnt, fix - n, W), jnp.uint32)], axis=1)

        stack_l, stack_r = [], []
        for t in range(prefix):
            lid = num_layers - 1 - t
            stack_l.append(pad_fix(circuits.left_layers[lid]))
            stack_r.append(pad_fix(circuits.right_layers[lid]))
        leaves_l = jnp.stack(stack_l)
        leaves_r = jnp.stack(stack_r)

        dt = DeviceTranscript.from_host(transcript)
        entry_meta = (dt.s.pos, dt.s.pos_begin, dt.s.cur_flags)
        claims0 = JFr.encode_ints(claims_to_verify)
        state, coeffs_acc, cl_acc, cr_acc, claims_dev, rand_dev = \
            _device_gp_prefix(dt.s.state, leaves_l, leaves_r, claims0,
                              jnp.int32(prefix), i_cnt, entry_meta)

        flat = jnp.concatenate([
            coeffs_acc.reshape(-1, W), cl_acc.reshape(-1, W),
            cr_acc.reshape(-1, W), claims_dev, rand_dev], axis=0)
        vals = JFr.decode(flat)
        r_max = max(prefix - 1, 1)
        off_cf = 0
        off_cl = prefix * r_max * 4
        off_cr = off_cl + prefix * i_cnt
        off_claims = off_cr + prefix * i_cnt
        off_rand = off_claims + i_cnt

        out = DeviceTranscript(DeviceStrobe(None, *_post_challenge_meta()))
        out.restore_to_host(transcript, np.asarray(state))

        proof_layers: list[LayerProofBatched] = []
        for t in range(prefix):
            polys = []
            base = off_cf + t * r_max * 4
            for k in range(t):
                polys.append(UniPoly(vals[base + 4 * k: base + 4 * k + 4])
                             .compress())
            cl = vals[off_cl + t * i_cnt: off_cl + (t + 1) * i_cnt]
            cr = vals[off_cr + t * i_cnt: off_cr + (t + 1) * i_cnt]
            proof_layers.append(
                LayerProofBatched(SumcheckInstanceProof(polys), cl, cr))

        claims_out = vals[off_claims: off_claims + i_cnt]
        rand_out = vals[off_rand: off_rand + prefix]
        return proof_layers, claims_out, rand_out

    def verify(self, claims_prod_vec: list[int], n: int, transcript):
        """Returns (claims_to_verify, rand). Host-side."""
        num_layers = (n - 1).bit_length()
        if len(self.proof) != num_layers:
            raise LassoError("grand product argument has wrong number of layers")
        rand: list[int] = []
        claims_to_verify = list(claims_prod_vec)

        for num_rounds, layer in enumerate(self.proof):
            coeffs = transcript.challenge_vector(
                b"rand_coeffs_next_layer", len(claims_to_verify))
            claim = sum(c * v for c, v in zip(coeffs, claims_to_verify)) % Fr.p

            claim_last, rand_prod = layer.proof.verify(claim, num_rounds, 3, transcript)

            claims_left = layer.claims_prod_left
            claims_right = layer.claims_prod_right
            if len(claims_left) != len(claims_prod_vec) or \
               len(claims_right) != len(claims_prod_vec):
                raise LassoError("claim count mismatch in grand product layer")

            for cl, cr in zip(claims_left, claims_right):
                transcript.append_scalar(b"claim_prod_left", cl)
                transcript.append_scalar(b"claim_prod_right", cr)

            if len(rand) != len(rand_prod):
                raise LassoError("rand length mismatch in grand product layer")
            eq_eval = eq_evaluate_host(rand, rand_prod)
            claim_expected = sum(
                c * (cl * cr % Fr.p * eq_eval) for c, cl, cr in
                zip(coeffs, claims_left, claims_right)) % Fr.p
            if claim_expected != claim_last:
                raise LassoError("grand product layer claim mismatch")

            r_layer = transcript.challenge_scalar(b"challenge_r_layer")
            claims_to_verify = [
                (cl + r_layer * (cr - cl)) % Fr.p
                for cl, cr in zip(claims_left, claims_right)
            ]
            rand = [r_layer] + rand_prod

        return claims_to_verify, rand
