"""Flagship-shape regression test: AND, C=1, M=2^16, s=2^14 -- the
halo2-comparison configuration (reference: src/benches/bench.rs:158-233).

Catches both correctness and performance regressions at the shape that
matters: the second (steady-state) pass must prove within a generous wall
bound.  TPU-only -- the shape is intractable on the 1-core CPU host, so the
test skips off-TPU (the fast-CPU CI profile still covers correctness at
small shapes).
"""

import time

import jax
import pytest

import lasso_tpu.subtables.bitwise  # noqa: F401 (register strategies)
from lasso_tpu.lasso.densified import DensifiedRepresentation
from lasso_tpu.lasso.surge import (SparsePolyCommitmentGens,
                                   SparsePolynomialEvaluationProof)
from lasso_tpu.subtables.base import get_strategy
from lasso_tpu.transcript.proof_transcript import ProofTranscript
from lasso_tpu.transcript.random_tape import RandomTape
from lasso_tpu.utils.fixtures import gen_indices, gen_random_point

C, LOG_M, LOG_S = 1, 16, 14

# Generous steady-state bounds (measured ~4.2s prove / ~1.4s verify in round
# 1, with round-2 targets <2s / <0.5s); the bound only exists to catch
# order-of-magnitude regressions, not to flake on tunnel jitter.
PROVE_BOUND_S = 12.0
VERIFY_BOUND_S = 4.0


@pytest.mark.slow
def test_flagship_prove_verify_steady_state():
    if jax.default_backend() != "tpu":
        pytest.skip("flagship shape needs the TPU backend")

    m, s = 1 << LOG_M, 1 << LOG_S
    strategy = get_strategy("and", C, m)
    nz = gen_indices(s, m, C)
    r = gen_random_point(LOG_S)
    dense = DensifiedRepresentation(nz, LOG_M, C)
    gens = SparsePolyCommitmentGens.new(
        b"gens_sparse_poly", C, s, strategy.num_memories, LOG_M)
    commitment = dense.commit(gens)

    # pass 1: pays compiles + tunnel warm-up; correctness only
    proof = SparsePolynomialEvaluationProof.prove(
        dense, r, gens, strategy, ProofTranscript(b"example"),
        RandomTape(b"proof"))
    proof.verify(commitment, r, gens, ProofTranscript(b"example"))

    # pass 2: steady state, timed
    t0 = time.perf_counter()
    proof2 = SparsePolynomialEvaluationProof.prove(
        dense, r, gens, strategy, ProofTranscript(b"example"),
        RandomTape(b"proof"))
    prove_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    proof2.verify(commitment, r, gens, ProofTranscript(b"example"))
    verify_s = time.perf_counter() - t0

    assert prove_s < PROVE_BOUND_S, f"steady-state prove took {prove_s:.1f}s"
    assert verify_s < VERIFY_BOUND_S, f"steady-state verify took {verify_s:.1f}s"
