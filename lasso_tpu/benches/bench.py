"""Benchmark suites (reference: src/benches/bench.rs).

Two suites mirroring the reference grids:
  * jolt_demo:        AND, C=8, M=2^16 (virtual table N=2^128), s in 2^10..2^22
  * halo2_comparison: AND, C=1, M=2^16,                         s in 2^10..2^24

Each config runs the full prove+verify pass under named tracing spans and
verifies the proof (benchmarks double as smoke tests, reference:
bench.rs:67-70).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import lasso_tpu.subtables.bitwise  # noqa: F401 (register strategies)
import lasso_tpu.subtables.lt  # noqa: F401
import lasso_tpu.subtables.range_check  # noqa: F401
from lasso_tpu.lasso.densified import DensifiedRepresentation
from lasso_tpu.lasso.surge import (SparsePolyCommitmentGens,
                                   SparsePolynomialEvaluationProof)
from lasso_tpu.subtables.base import get_strategy
from lasso_tpu.transcript.proof_transcript import ProofTranscript
from lasso_tpu.transcript.random_tape import RandomTape
from lasso_tpu.utils.fixtures import gen_indices, gen_random_point
from lasso_tpu.utils.tracing import print_span_tree, reset_spans, span


@dataclass
class BenchResult:
    name: str
    prove_s: float
    verify_s: float


def _log2(n: int) -> int:
    return (n - 1).bit_length()


def single_pass_lasso(strategy_name: str, c: int, m: int, sparsity: int,
                      **kwargs) -> BenchResult:
    """One full prove+verify pass (reference: single_pass_lasso! macro)."""
    strategy = get_strategy(strategy_name, c, m, **kwargs)
    log_m = _log2(m)
    name = f"Lasso(strategy={strategy_name}, C={c}, M=2^{log_m}, s=2^{_log2(sparsity)})"

    with span(name):
        with span("gen"):
            nz = gen_indices(sparsity, m, c)
            r = gen_random_point(_log2(sparsity))
        dense = DensifiedRepresentation(nz, log_m, c)
        gens = SparsePolyCommitmentGens.new(
            b"gens_sparse_poly", c, sparsity, strategy.num_memories, log_m)
        commitment = dense.commit(gens)

        t0 = time.perf_counter()
        proof = SparsePolynomialEvaluationProof.prove(
            dense, r, gens, strategy, ProofTranscript(b"example"),
            RandomTape(b"proof"))
        prove_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        proof.verify(commitment, r, gens, ProofTranscript(b"example"))
        verify_s = time.perf_counter() - t0

    return BenchResult(name, prove_s, verify_s)


def jolt_demo(s_range=None) -> list[BenchResult]:
    """AND, C=8, M=2^16 => N=2^128 (reference: bench.rs:90-156)."""
    s_range = s_range or [1 << k for k in range(10, 23, 2)]
    return [single_pass_lasso("and", 8, 1 << 16, s) for s in s_range]


def halo2_comparison(s_range=None) -> list[BenchResult]:
    """AND, C=1, M=2^16 (reference: bench.rs:158-233)."""
    s_range = s_range or [1 << k for k in range(10, 25, 2)]
    return [single_pass_lasso("and", 1, 1 << 16, s) for s in s_range]


SUITES = {
    "jolt-demo": jolt_demo,
    "halo2-comparison": halo2_comparison,
}
