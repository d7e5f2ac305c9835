"""Runtime subtable container + combined-table commitment/eval proof
(reference: src/subtables/mod.rs:95-394).

Materialized subtables live on device as Montgomery limb tensors; the
"dereferenced" lookup polynomials E_i = T_i[nz_i] are ONE batched gather, and
the primary-sumcheck claim  sum_k eq[k] * g(E(k))  is a fused vectorized
combine + modular tree reduction.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from lasso_tpu.field.host import Fr
from lasso_tpu.field.jfield import JFr, W
from lasso_tpu.poly.dense import DensePolynomial, bound_var_bot_host
from lasso_tpu.poly.hyrax import (PolyCommitment, PolyCommitmentGens,
                                  PolyEvalProof, commit_poly)
from lasso_tpu.subtables.base import DeviceOps, SubtableStrategy
from lasso_tpu.utils.errors import LassoError
from lasso_tpu.utils.tracing import instrument


@functools.partial(jax.jit, static_argnames=("sub_of", "dim_of", "pad"))
def _gather_flat(table_vals, nz, sub_of: tuple, dim_of: tuple, pad: int):
    """E_i = T_{sub(i)}[nz_{dim(i)}] for all memories, returned MERGED as one
    flat [next_pow2(alpha*s), W] array (rows are contiguous slices).  One
    fused program: the per-memory gathers concatenate without a separate
    stacked copy ever being resident."""
    rows = [jnp.take(table_vals[k], nz[d], axis=0)
            for k, d in zip(sub_of, dim_of)]
    if pad:
        rows.append(jnp.zeros((pad, W), jnp.uint32))
    return jnp.concatenate(rows, axis=0)


@functools.partial(jax.jit, static_argnames=("comb", "alpha", "s"))
def _claim_kernel(flat, eq_table, comb, alpha: int, s: int):
    """sum_k eq[k] * g(E(k)) from the flat merged lookups; the reshape/slice
    fuse into the combine instead of materializing an [alpha, s, W] copy."""
    stack = flat[: alpha * s].reshape(alpha, s, W)
    return JFr.sum(JFr.mul(comb(stack), eq_table))


@functools.partial(jax.jit, static_argnames=("alpha", "s"))
def _weighted_evals_kernel(flat, chis, alpha: int, s: int):
    stack = flat[: alpha * s].reshape(alpha, s, W)
    prods = JFr.mul(stack, chis[None])
    return JFr.sum(jnp.moveaxis(prods, 1, 0))  # [alpha, W]


@functools.partial(jax.jit, static_argnames=("alpha", "s"))
def _rows_view(flat, alpha: int, s: int):
    return flat[: alpha * s].reshape(alpha, s, W)


class Subtables:
    """Materialized subtables + lookup polynomials for one proof instance.

    Storage: ONE flat merged array (`combined_poly.z`, [next_pow2(alpha*s),
    W]).  The per-memory stack view is materialized lazily on access -- the
    previous layout kept both the stack and the merged copy resident, which
    at jolt-demo scale (alpha=8) costs ~1 GB of duplicate HBM per 2^20
    lookups."""

    @instrument("Subtables.construct")
    def __init__(self, strategy: SubtableStrategy, nz: jnp.ndarray, s: int):
        """nz: [C, s] int32 lookup indices (device)."""
        assert nz.shape == (strategy.c, s)
        self.strategy = strategy
        self.s = s

        tables_u64 = strategy.materialize_subtables()  # [NS, M] uint64
        self.table_vals = JFr.encode_u64_array(tables_u64)  # [NS, M, W]

        alpha = strategy.num_memories
        sub_of = tuple(strategy.memory_to_subtable_index(i)
                       for i in range(alpha))
        dim_of = tuple(strategy.memory_to_dimension_index(i)
                       for i in range(alpha))
        total = alpha * s
        pad = (1 << (total - 1).bit_length()) - total
        flat = _gather_flat(self.table_vals, nz, sub_of, dim_of, pad)
        self.combined_poly = DensePolynomial(flat)

    # -- lazy per-memory views ---------------------------------------------------
    @property
    def lookup_stack(self) -> jnp.ndarray:
        """[alpha, s, W] stacked E_i (materialized on access)."""
        return _rows_view(
            self.combined_poly.z, self.strategy.num_memories, self.s)

    @property
    def lookup_polys(self) -> list:
        stack = self.lookup_stack
        return [DensePolynomial(stack[i])
                for i in range(self.strategy.num_memories)]

    # -- primary sumcheck hooks ------------------------------------------------
    def combine_eq_device(self, zs):
        """comb function for the primary sumcheck: zs [alpha+1, m, W]."""
        vals = [zs[i] for i in range(zs.shape[0])]
        return self.strategy.combine_lookups_eq(vals, DeviceOps)

    @instrument("Subtables.compute_sumcheck_claim")
    def compute_sumcheck_claim(self, eq_table: jnp.ndarray) -> int:
        """sum_k eq[k] * g(E_1[k] .. E_alpha[k]) (reference: mod.rs:186-216)."""
        total = _claim_kernel(
            self.combined_poly.z, eq_table, self.strategy.comb_device(),
            self.strategy.num_memories, self.s)
        return JFr.decode(total[None])[0]

    def evaluate_lookups_at(self, chis: jnp.ndarray) -> list[int]:
        """All E_i evaluated at a point given its eq table ([n, W])."""
        sums = _weighted_evals_kernel(
            self.combined_poly.z, chis, self.strategy.num_memories, self.s)
        return JFr.decode(sums)

    @instrument("Subtables.commit")
    def commit(self, gens: PolyCommitmentGens) -> "CombinedTableCommitment":
        comm, _ = commit_poly(self.combined_poly, gens)
        return CombinedTableCommitment(comm)


@dataclass
class CombinedTableCommitment:
    comm_ops_val: PolyCommitment

    def append_to_transcript(self, label: bytes, transcript) -> None:
        transcript.append_message(
            b"subtable_evals_commitment", b"begin_subtable_evals_commitment")
        self.comm_ops_val.append_to_transcript(label, transcript)
        transcript.append_message(
            b"subtable_evals_commitment", b"end_subtable_evals_commitment")


def _next_pow2(n: int) -> int:
    return 1 << max((n - 1).bit_length(), 0)


@dataclass
class CombinedTableEvalProof:
    """n-to-1 reduction + one joint opening (reference: mod.rs:229-380)."""

    proof_table_eval: PolyEvalProof

    PROTOCOL_NAME = b"Lasso CombinedTableEvalProof"

    @staticmethod
    @instrument("CombinedEval.prove")
    def prove(combined_poly: DensePolynomial, evals: list[int], r: list[int],
              gens: PolyCommitmentGens, transcript, random_tape
              ) -> "CombinedTableEvalProof":
        transcript.append_protocol_name(CombinedTableEvalProof.PROTOCOL_NAME)
        evals = list(evals) + [0] * (_next_pow2(len(evals)) - len(evals))

        transcript.append_scalars(b"evals_ops_val", evals)
        num_ch = (len(evals) - 1).bit_length()
        challenges = transcript.challenge_vector(
            b"challenge_combine_n_to_one", num_ch)

        vals = evals
        for c in reversed(challenges):
            vals = bound_var_bot_host(vals, c)
        assert len(vals) == 1
        joint_eval = vals[0]
        r_joint = challenges + list(r)
        transcript.append_scalar(b"joint_claim_eval", joint_eval)

        proof, _ = PolyEvalProof.prove(
            combined_poly, None, r_joint, joint_eval, None, gens,
            transcript, random_tape)
        return CombinedTableEvalProof(proof)

    def verify(self, r: list[int], evals: list[int], gens: PolyCommitmentGens,
               comm: CombinedTableCommitment, transcript,
               deferred=None) -> None:
        transcript.append_protocol_name(CombinedTableEvalProof.PROTOCOL_NAME)
        evals = list(evals) + [0] * (_next_pow2(len(evals)) - len(evals))

        transcript.append_scalars(b"evals_ops_val", evals)
        num_ch = (len(evals) - 1).bit_length()
        challenges = transcript.challenge_vector(
            b"challenge_combine_n_to_one", num_ch)
        vals = evals
        for c in reversed(challenges):
            vals = bound_var_bot_host(vals, c)
        if len(vals) != 1:
            raise LassoError("combined-eval fold did not reduce to one claim")
        joint_eval = vals[0]
        r_joint = challenges + list(r)
        transcript.append_scalar(b"joint_claim_eval", joint_eval)

        self.proof_table_eval.verify_plain(
            gens, transcript, r_joint, joint_eval, comm.comm_ops_val,
            deferred=deferred)
