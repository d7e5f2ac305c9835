"""ZK Sigma-protocol round-trips (reference: zk.rs:310-400) and proof
serialization round-trips (reference: CanonicalSerialize derives)."""

import random

import pytest

from lasso_tpu.field.host import Fr
from lasso_tpu.poly.commitments import MultiCommitGens
from lasso_tpu.subprotocols.zk import (EqualityProof, KnowledgeProof,
                                       ProductProof)
from lasso_tpu.transcript.proof_transcript import ProofTranscript
from lasso_tpu.transcript.random_tape import RandomTape
from lasso_tpu.utils.errors import LassoError


def _gens1():
    return MultiCommitGens.new(1, b"test-zk")


def test_knowledge_proof_roundtrip():
    rng = random.Random(1)
    gens = _gens1()
    x, r = rng.randrange(Fr.p), rng.randrange(Fr.p)
    proof, c = KnowledgeProof.prove(
        gens, ProofTranscript(b"zk"), RandomTape(b"proof"), x, r)
    proof.verify(gens, ProofTranscript(b"zk"), c)
    with pytest.raises(LassoError):
        proof.verify(gens, ProofTranscript(b"zk"), c.mul(2))


def test_equality_proof_roundtrip():
    rng = random.Random(2)
    gens = _gens1()
    v = rng.randrange(Fr.p)
    s1, s2 = rng.randrange(Fr.p), rng.randrange(Fr.p)
    proof, c1, c2 = EqualityProof.prove(
        gens, ProofTranscript(b"zk"), RandomTape(b"proof"), v, s1, v, s2)
    proof.verify(gens, ProofTranscript(b"zk"), c1, c2)
    with pytest.raises(LassoError):
        proof.verify(gens, ProofTranscript(b"zk"), c2, c1)


def test_product_proof_roundtrip():
    rng = random.Random(3)
    gens = _gens1()
    x, y = rng.randrange(Fr.p), rng.randrange(Fr.p)
    z = x * y % Fr.p
    rx, ry, rz = (rng.randrange(Fr.p) for _ in range(3))
    proof, cx, cy, cz = ProductProof.prove(
        gens, ProofTranscript(b"zk"), RandomTape(b"proof"), x, rx, y, ry, z, rz)
    proof.verify(gens, ProofTranscript(b"zk"), cx, cy, cz)
    with pytest.raises(LassoError):
        proof.verify(gens, ProofTranscript(b"zk"), cx, cz, cy)


def test_proof_serialization_roundtrip():
    """Serialize -> deserialize -> the proof still verifies."""
    from lasso_tpu.subtables.base import get_strategy
    from lasso_tpu.utils.serialize import (deserialize_commitment,
                                           deserialize_proof,
                                           serialize_commitment,
                                           serialize_proof)
    from tests.test_e2e import run_e2e

    proof, commitment, r, gens = run_e2e("and", 4, 16, 16)
    blob = serialize_proof(proof)
    comm_blob = serialize_commitment(commitment)

    strategy = get_strategy("and", 4, 16)
    proof2 = deserialize_proof(blob, strategy)
    commitment2 = deserialize_commitment(comm_blob)
    proof2.verify(commitment2, r, gens, ProofTranscript(b"example"))

    # determinism: re-serializing gives identical bytes
    assert serialize_proof(proof2) == blob
    assert serialize_commitment(commitment2) == comm_blob

    # corruption is caught
    bad = bytearray(blob)
    bad[5] ^= 0xFF
    with pytest.raises(Exception):
        p3 = deserialize_proof(bytes(bad), strategy)
        p3.verify(commitment2, r, gens, ProofTranscript(b"example"))
