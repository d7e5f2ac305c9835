"""End-to-end prove/verify round-trips, mirroring the reference's e2e
instances (/root/reference/src/e2e_test.rs:64-99): densify -> commit ->
prove -> verify for every subtable strategy family.
"""

import pytest

import lasso_tpu.subtables.bitwise  # noqa: F401 (register strategies)
import lasso_tpu.subtables.lt  # noqa: F401
import lasso_tpu.subtables.range_check  # noqa: F401
from lasso_tpu.lasso.densified import DensifiedRepresentation
from lasso_tpu.lasso.surge import (SparsePolyCommitmentGens,
                                   SparsePolynomialEvaluationProof)
from lasso_tpu.subtables.base import get_strategy
from lasso_tpu.transcript.proof_transcript import ProofTranscript
from lasso_tpu.transcript.random_tape import RandomTape
from lasso_tpu.utils.errors import LassoError
from lasso_tpu.utils.fixtures import gen_indices, gen_random_point


def _log2(n):
    return (n - 1).bit_length()


def run_e2e(strategy_name, c, m, sparsity, **kwargs):
    strategy = get_strategy(strategy_name, c, m, **kwargs)
    log_m = _log2(m)

    nz = gen_indices(sparsity, m, c)
    r = gen_random_point(_log2(sparsity))

    dense = DensifiedRepresentation(nz, log_m, c)
    gens = SparsePolyCommitmentGens.new(
        b"gens_sparse_poly", c, sparsity, strategy.num_memories, log_m)
    commitment = dense.commit(gens)

    tape = RandomTape(b"proof")
    prover_transcript = ProofTranscript(b"example")
    proof = SparsePolynomialEvaluationProof.prove(
        dense, r, gens, strategy, prover_transcript, tape)

    verifier_transcript = ProofTranscript(b"example")
    proof.verify(commitment, r, gens, verifier_transcript)
    return proof, commitment, r, gens


def test_prove_4d_lt():
    run_e2e("lt", 4, 16, 16)


def test_prove_4d_lt_big_s():
    run_e2e("lt", 4, 16, 128)


def test_prove_4d_and():
    run_e2e("and", 4, 16, 16)


def test_prove_4d_or():
    run_e2e("or", 4, 16, 16)


def test_prove_4d_xor():
    run_e2e("xor", 4, 16, 16)


def test_prove_3d_range():
    run_e2e("range_check", 3, 256, 16, log_r=40)


def test_tampered_proof_rejected():
    proof, commitment, r, gens = run_e2e("and", 4, 16, 16)
    # tamper with the claimed evaluation
    proof.primary_sumcheck.claimed_evaluation = (
        proof.primary_sumcheck.claimed_evaluation + 1) % (2**252)
    with pytest.raises((LassoError, AssertionError)):
        proof.verify(commitment, r, gens, ProofTranscript(b"example"))


def test_wrong_eq_point_rejected():
    proof, commitment, r, gens = run_e2e("and", 4, 16, 16)
    r_bad = list(r)
    r_bad[0] = (r_bad[0] + 1) % (2**252)
    with pytest.raises((LassoError, AssertionError)):
        proof.verify(commitment, r_bad, gens, ProofTranscript(b"example"))
