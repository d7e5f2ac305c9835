"""Distributed sumcheck prover vs single-chip: proof bytes must be
bit-identical (parallel/prover.py docstring)."""

import random

import jax
import jax.numpy as jnp
import pytest

from lasso_tpu.field.host import Fr
from lasso_tpu.field.jfield import JFr
from lasso_tpu.parallel import ops as pops
from lasso_tpu.parallel.mesh import make_mesh
from lasso_tpu.parallel.prover import prove_arbitrary_sharded
from lasso_tpu.subprotocols.sumcheck import prove_arbitrary
from lasso_tpu.transcript.proof_transcript import ProofTranscript


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices("cpu")) < 8:
        pytest.skip("needs 8 virtual CPU devices (see conftest)")
    return make_mesh(8, platform="cpu")


def test_sharded_sumcheck_proof_identical(mesh):
    rng = random.Random(7)
    n, alpha = 64, 3
    rows = [[rng.randrange(Fr.p) for _ in range(n)] for _ in range(alpha)]
    zs = jnp.stack([JFr.encode_ints(r) for r in rows])

    def comb(z):
        return JFr.mul(JFr.mul(z[0], z[1]), z[2])

    num_rounds = 6
    proof_ref, r_ref, evals_ref, _ = prove_arbitrary(
        zs, comb, 3, num_rounds, ProofTranscript(b"dist"))

    zs_cyc = jnp.stack([pops.cyclic_permute(zs[i], 8) for i in range(alpha)])
    proof_sh, r_sh, evals_sh = prove_arbitrary_sharded(
        mesh, zs_cyc, comb, 3, num_rounds, ProofTranscript(b"dist"))

    assert r_sh == r_ref
    assert evals_sh == evals_ref
    for a, b in zip(proof_sh.compressed_polys, proof_ref.compressed_polys):
        assert a.coeffs_except_linear_term == b.coeffs_except_linear_term

    # and the standard verifier accepts it
    claim = 0
    for k in range(n):
        claim += rows[0][k] * rows[1][k] * rows[2][k]
    claim %= Fr.p
    e, r_v = proof_sh.verify(claim, num_rounds, 3, ProofTranscript(b"dist"))
    assert r_v == r_ref


@pytest.mark.parametrize("c,m,s", [
    (4, 16, 16),     # toy: one sharded round, degenerate L-folds
    (2, 64, 1024),   # wide: multi-round sharded sumchecks, multi-layer
                     # sharded GP trees, non-degenerate sharded L-folds
                     # (VERDICT r4 item 4)
])
def test_sharded_e2e_proof_bytes_identical(mesh, c, m, s):
    """Full sharded prove (commit + primary sumcheck + openings + memory
    checking) on the 8-device CPU mesh: byte-identical proof AND commitment
    vs the single-chip prover, and accepted by the standard verifier."""
    import lasso_tpu.subtables.bitwise  # noqa: F401 (register strategies)
    from lasso_tpu.lasso.densified import DensifiedRepresentation
    from lasso_tpu.lasso.surge import (SparsePolyCommitmentGens,
                                       SparsePolynomialEvaluationProof)
    from lasso_tpu.parallel.eprover import ShardedDensified
    from lasso_tpu.subtables.base import get_strategy
    from lasso_tpu.transcript.random_tape import RandomTape
    from lasso_tpu.utils.fixtures import gen_indices, gen_random_point
    from lasso_tpu.utils.serialize import serialize_commitment, serialize_proof

    log_m, log_s = (m - 1).bit_length(), (s - 1).bit_length()
    strategy = get_strategy("and", c, m)
    nz = gen_indices(s, m, c)
    r = gen_random_point(log_s)

    dense = DensifiedRepresentation(nz, log_m, c)
    gens = SparsePolyCommitmentGens.new(
        b"gens_sparse_poly", c, s, strategy.num_memories, log_m)

    commitment_ref = dense.commit(gens)
    proof_ref = SparsePolynomialEvaluationProof.prove(
        dense, r, gens, strategy, ProofTranscript(b"example"),
        RandomTape(b"proof"))

    sd = ShardedDensified(mesh, dense)
    commitment_sh = sd.commit(gens)
    proof_sh = SparsePolynomialEvaluationProof.prove(
        sd, r, gens, strategy, ProofTranscript(b"example"),
        RandomTape(b"proof"), mesh=mesh)

    assert serialize_commitment(commitment_sh) == \
        serialize_commitment(commitment_ref)
    assert serialize_proof(proof_sh) == serialize_proof(proof_ref)

    # the standard (single-chip) verifier accepts the sharded proof
    proof_sh.verify(commitment_sh, r, gens, ProofTranscript(b"example"))
