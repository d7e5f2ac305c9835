"""Subprotocol prove<->verify round-trips (reference: inline test modules in
src/subprotocols/*.rs) plus the deterministic-challenge sumcheck fixture
(reference: sumcheck.rs:458-513 with TestTranscript)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from lasso_tpu.field.host import Fr
from lasso_tpu.field.jfield import JFr
from lasso_tpu.poly.commitments import MultiCommitGens, commit_scalar
from lasso_tpu.poly.dense import (DensePolynomial, eq_evals_device,
                                  eq_evals_host, eq_evaluate_host)
from lasso_tpu.poly.hyrax import (PolyCommitmentGens, PolyEvalProof,
                                  commit_poly)
from lasso_tpu.poly.unipoly import UniPoly
from lasso_tpu.subprotocols.dot_product import (DotProductProof,
                                                DotProductProofGens,
                                                DotProductProofLog)
from lasso_tpu.subprotocols.grand_product import (BatchedGrandProductArgument,
                                                  BatchedGrandProductCircuit)
from lasso_tpu.subprotocols.sumcheck import prove_arbitrary
from lasso_tpu.transcript.proof_transcript import ProofTranscript, TestTranscript
from lasso_tpu.transcript.random_tape import RandomTape


def _rand_scalars(n, seed=0):
    rng = random.Random(seed)
    return [rng.randrange(Fr.p) for _ in range(n)]


def test_sumcheck_roundtrip_quadratic():
    # sum over cube of A(k)*B(k), degree 2
    n = 16
    a_ints = _rand_scalars(n, 1)
    b_ints = _rand_scalars(n, 2)
    claim = sum(x * y for x, y in zip(a_ints, b_ints)) % Fr.p

    stack = jnp.stack([JFr.encode_ints(a_ints), JFr.encode_ints(b_ints)])

    def comb(zs):
        return JFr.mul(zs[0], zs[1])

    proof, r, final_evals, _ = prove_arbitrary(
        stack, comb, 2, 4, ProofTranscript(b"test"))

    e, r_v = proof.verify(claim, 4, 2, ProofTranscript(b"test"))
    assert r_v == r
    assert e == final_evals[0] * final_evals[1] % Fr.p
    # final evals really are A(r), B(r)
    assert final_evals[0] == DensePolynomial.from_ints(a_ints).evaluate(r)
    assert final_evals[1] == DensePolynomial.from_ints(b_ints).evaluate(r)


def test_sumcheck_pinned_point():
    """TestTranscript pins the challenge point (reference: sumcheck.rs:485-504)."""
    n = 8
    a_ints = _rand_scalars(n, 3)
    b_ints = _rand_scalars(n, 4)
    claim = sum(x * y for x, y in zip(a_ints, b_ints)) % Fr.p
    r_pinned = _rand_scalars(3, 5)

    stack = jnp.stack([JFr.encode_ints(a_ints), JFr.encode_ints(b_ints)])

    def comb(zs):
        return JFr.mul(zs[0], zs[1])

    proof, r, final_evals, _ = prove_arbitrary(
        stack, comb, 2, 3, TestTranscript(scalars=r_pinned))
    assert r == r_pinned

    e, _ = proof.verify(claim, 3, 2, TestTranscript(scalars=r_pinned))
    assert e == final_evals[0] * final_evals[1] % Fr.p


def test_grand_product_roundtrip():
    n, instances = 8, 4
    vals = [_rand_scalars(n, 10 + i) for i in range(instances)]
    inputs = jnp.stack([JFr.encode_ints(v) for v in vals])
    circuits = BatchedGrandProductCircuit(inputs)

    roots = circuits.evaluate()
    for i in range(instances):
        expect = 1
        for x in vals[i]:
            expect = expect * x % Fr.p
        assert roots[i] == expect

    arg, rand = BatchedGrandProductArgument.prove(
        circuits, ProofTranscript(b"test"))
    claims, rand_v = arg.verify(roots, n, ProofTranscript(b"test"))
    assert rand_v == rand
    # claims are the leaf MLEs at rand
    for i in range(instances):
        assert claims[i] == DensePolynomial.from_ints(vals[i]).evaluate(rand)


def test_dot_product_proof_roundtrip():
    n = 8
    x = _rand_scalars(n, 20)
    a = _rand_scalars(n, 21)
    y = sum(p * q for p, q in zip(x, a)) % Fr.p
    gens = DotProductProofGens.new(n, b"test-dot")
    tape = RandomTape(b"proof")

    proof, cx, cy = DotProductProof.prove(
        gens.gens_1, gens.gens_n, ProofTranscript(b"dot"), tape, x, 3, a, y, 5)
    proof.verify(gens.gens_1, gens.gens_n, ProofTranscript(b"dot"), a, cx, cy)

    with pytest.raises(Exception):
        proof.verify(gens.gens_1, gens.gens_n, ProofTranscript(b"dot"),
                     a[:-1] + [(a[-1] + 1) % Fr.p], cx, cy)


def test_dot_product_log_roundtrip():
    n = 16
    x = _rand_scalars(n, 30)
    a = _rand_scalars(n, 31)
    y = sum(p * q for p, q in zip(x, a)) % Fr.p
    gens = DotProductProofGens.new(n, b"test-dotlog")
    tape = RandomTape(b"proof")

    proof, cx, cy = DotProductProofLog.prove(
        gens, ProofTranscript(b"dotlog"), tape,
        JFr.encode_ints(x), 7, JFr.encode_ints(a), y, 9)
    proof.verify(n, gens, ProofTranscript(b"dotlog"), a, cx, cy)


def test_hyrax_commit_open_roundtrip():
    num_vars = 6
    z = _rand_scalars(1 << num_vars, 40)
    poly = DensePolynomial.from_ints(z)
    gens = PolyCommitmentGens.new(num_vars, b"test-hyrax")
    comm, _blinds = commit_poly(poly, gens)

    r = _rand_scalars(num_vars, 41)
    zr = poly.evaluate(r)

    tape = RandomTape(b"proof")
    proof, c_zr = PolyEvalProof.prove(
        poly, None, r, zr, None, gens, ProofTranscript(b"hyrax"), tape)
    proof.verify(gens, ProofTranscript(b"hyrax"), r, c_zr, comm)

    # verify_plain path (zero blind)
    proof2, _ = PolyEvalProof.prove(
        poly, None, r, zr, None, gens, ProofTranscript(b"hyrax2"),
        RandomTape(b"proof"))
    proof2.verify_plain(gens, ProofTranscript(b"hyrax2"), r, zr, comm)


def test_unipoly_interpolation_roundtrip():
    # (reference: unipoly.rs:128-189)
    coeffs = [5, 7, 11, 13]
    poly = UniPoly(coeffs)
    evals = [poly.evaluate(i) for i in range(4)]
    assert UniPoly.from_evals(evals).coeffs == coeffs

    comp = poly.compress()
    hint = (poly.eval_at_zero() + poly.eval_at_one()) % Fr.p
    assert comp.decompress(hint).coeffs == coeffs


def test_eq_factored_cross_check():
    # eq table == outer product of factored (L, R) (reference: dense_mlpoly.rs:528-583)
    r = _rand_scalars(5, 50)
    full = eq_evals_host(r)
    left = eq_evals_host(r[:2])
    right = eq_evals_host(r[2:])
    for i, li in enumerate(left):
        for j, rj in enumerate(right):
            assert full[i * len(right) + j] == li * rj % Fr.p
    # device eq table matches host
    dev = JFr.decode(eq_evals_device([JFr.encode_scalar(x) for x in r]))
    assert dev == full
    # pointwise eq evaluate
    rx = _rand_scalars(5, 51)
    expect = 1
    for a, b in zip(r, rx):
        expect = expect * ((a * b + (1 - a) * (1 - b)) % Fr.p) % Fr.p
    assert eq_evaluate_host(r, rx) == expect
