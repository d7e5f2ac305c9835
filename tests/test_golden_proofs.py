"""Golden proof-byte fixtures: freeze the serialized proof + commitment
bytes for every subtable strategy so ANY transcript/serialization/protocol
regression is caught at the byte level (the bit-exactness pin the reference's
deterministic `test_rng` fixtures provide, /root/reference/src/utils/test.rs:11-32).

Proof bytes are backend-independent (canonical field/point encodings at every
transcript boundary), so fixtures generated on any backend -- CPU profile or
the TPU chip -- must match on every other; the suite therefore doubles as a
host/device cross-check.

Regenerate after an INTENTIONAL protocol change with:
    LASSO_TPU_REGEN_GOLDEN=1 python -m pytest tests/test_golden_proofs.py
then commit the updated tests/fixtures/golden_proofs.json, explaining in the
commit message why the proof bytes changed.
"""

import hashlib
import json
import os

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
from lasso_tpu.utils.fixtures import gen_indices, gen_random_point
from lasso_tpu.utils.serialize import serialize_commitment, serialize_proof

FIXTURE_PATH = os.path.join(
    os.path.dirname(__file__), "fixtures", "golden_proofs.json")

# (name, strategy, c, m, s, kwargs) -- the reference's e2e instances
# (/root/reference/src/e2e_test.rs:64-99) plus or/xor for full coverage
CASES = [
    ("and_4d", "and", 4, 16, 16, {}),
    ("or_4d", "or", 4, 16, 16, {}),
    ("xor_4d", "xor", 4, 16, 16, {}),
    ("lt_4d", "lt", 4, 16, 16, {}),
    ("lt_4d_big_s", "lt", 4, 16, 128, {}),
    ("range_3d", "range_check", 3, 256, 16, {"log_r": 40}),
]


def _log2(n):
    return (n - 1).bit_length()


def _prove_bytes(strategy_name, c, m, sparsity, kwargs):
    strategy = get_strategy(strategy_name, c, m, **kwargs)
    log_m = _log2(m)
    nz = gen_indices(sparsity, m, c)
    r = gen_random_point(_log2(sparsity))

    dense = DensifiedRepresentation(nz, log_m, c)
    gens = SparsePolyCommitmentGens.new(
        b"gens_sparse_poly", c, sparsity, strategy.num_memories, log_m)
    commitment = dense.commit(gens)
    proof = SparsePolynomialEvaluationProof.prove(
        dense, r, gens, strategy, ProofTranscript(b"example"),
        RandomTape(b"proof"))
    return serialize_proof(proof), serialize_commitment(commitment)


def _load_fixtures():
    if not os.path.exists(FIXTURE_PATH):
        return None
    with open(FIXTURE_PATH) as f:
        return json.load(f)


_REGEN = os.environ.get("LASSO_TPU_REGEN_GOLDEN") == "1"
_FIXTURES = _load_fixtures()
_NEW: dict = {}


@pytest.mark.parametrize(
    "name,strategy,c,m,s,kwargs", CASES, ids=[c[0] for c in CASES])
def test_golden_proof_bytes(name, strategy, c, m, s, kwargs):
    proof_bytes, comm_bytes = _prove_bytes(strategy, c, m, s, kwargs)
    entry = {
        "proof_sha256": hashlib.sha256(proof_bytes).hexdigest(),
        "proof_len": len(proof_bytes),
        "commitment_sha256": hashlib.sha256(comm_bytes).hexdigest(),
        "commitment_len": len(comm_bytes),
    }
    if _REGEN:
        _NEW[name] = entry
        os.makedirs(os.path.dirname(FIXTURE_PATH), exist_ok=True)
        existing = _load_fixtures() or {}
        existing[name] = entry
        with open(FIXTURE_PATH, "w") as f:
            json.dump(existing, f, indent=2, sort_keys=True)
            f.write("\n")
        pytest.skip(f"regenerated fixture {name}")
    if _FIXTURES is None or name not in _FIXTURES:
        pytest.fail(
            f"no golden fixture for {name}; run with LASSO_TPU_REGEN_GOLDEN=1 "
            f"to create it (got proof sha256 {entry['proof_sha256']})")
    assert _FIXTURES[name] == entry, (
        f"proof bytes for {name} changed -- transcript/serialization "
        f"regression (or an intentional protocol change: regenerate fixtures "
        f"and document why)")
