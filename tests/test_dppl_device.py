"""Fused on-device DotProductProofLog (`bullet._device_dppl`) vs the host
path: every proof component (Cx, L/R points, delta, beta, z1, z2) and the
full transcript state must be bit-identical.

Runs with LASSO_TPU_DEVICE_TRANSCRIPT=force on the CPU backend; n is kept
tiny so the one-program compile (MSMs + keccak absorbs + bullet rounds +
closing sigma protocol) stays tractable on XLA:CPU.
"""

import os

import pytest

from lasso_tpu.field.host import Fr
from lasso_tpu.field.jfield import JFr
from lasso_tpu.subprotocols.dot_product import (DotProductProofGens,
                                                DotProductProofLog)
from lasso_tpu.transcript.proof_transcript import ProofTranscript
from lasso_tpu.transcript.random_tape import RandomTape


N = 8


@pytest.fixture(scope="module")
def instance():
    rng_x = [(0x9E3779B9 * (i + 1)) % Fr.p for i in range(N)]
    rng_a = [(0x61C88647 * (i + 3)) % Fr.p for i in range(N)]
    y = sum(p * q for p, q in zip(rng_x, rng_a)) % Fr.p
    gens = DotProductProofGens.new(N, b"test-dppl-fused")
    return rng_x, rng_a, y, gens


def _run(instance, dev: bool):
    x, a, y, gens = instance
    old = os.environ.get("LASSO_TPU_DEVICE_TRANSCRIPT")
    os.environ["LASSO_TPU_DEVICE_TRANSCRIPT"] = "force" if dev else "0"
    try:
        tr = ProofTranscript(b"dppl-parity")
        tr.append_scalar(b"claim", 0xABCDEF)  # non-canonical entry position
        tape = RandomTape(b"proof")
        proof, cx, cy = DotProductProofLog.prove(
            gens, tr, tape, JFr.encode_ints(x), 7, JFr.encode_ints(a), y, 9)
        post = tr.challenge_scalar(b"post")  # pins the full strobe state
        return proof, cx, cy, post
    finally:
        if old is None:
            os.environ.pop("LASSO_TPU_DEVICE_TRANSCRIPT", None)
        else:
            os.environ["LASSO_TPU_DEVICE_TRANSCRIPT"] = old


def test_fused_dppl_bit_identical(instance):
    proof_h, cx_h, cy_h, post_h = _run(instance, False)
    proof_d, cx_d, cy_d, post_d = _run(instance, True)

    assert post_d == post_h, "transcript states diverged"
    assert cx_d == cx_h
    assert cy_d == cy_h
    assert proof_d.z1 == proof_h.z1 and proof_d.z2 == proof_h.z2
    assert proof_d.delta == proof_h.delta
    assert proof_d.beta == proof_h.beta
    b_d, b_h = proof_d.bullet_reduction_proof, proof_h.bullet_reduction_proof
    assert [p.to_compressed_bytes() for p in b_d.L_vec] == \
        [p.to_compressed_bytes() for p in b_h.L_vec]
    assert [p.to_compressed_bytes() for p in b_d.R_vec] == \
        [p.to_compressed_bytes() for p in b_h.R_vec]

    # and the standard verifier accepts the fused proof
    x, a, y, gens = instance
    tr = ProofTranscript(b"dppl-parity")
    tr.append_scalar(b"claim", 0xABCDEF)
    proof_d.verify(N, gens, tr, a, cx_d, cy_d)
