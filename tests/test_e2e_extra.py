"""Round-5 e2e additions, in their OWN FILE for process isolation: each
runs a second full prove (fresh compile load), and the XLA:CPU
executable (de)serializer has been observed to segfault when these pile
onto test_e2e.py's eight proves in one process (the same fragility that
motivated `make ci`'s one-process-per-file layout).
"""

import pytest

import lasso_tpu.subtables.bitwise  # noqa: F401 (register strategies)
from lasso_tpu.transcript.proof_transcript import ProofTranscript
from lasso_tpu.utils.errors import LassoError

from test_e2e import run_e2e

def test_gp_recompute_threshold_proof_bytes_identical(monkeypatch):
    """Force the leaf-recompute branch (LASSO_TPU_GP_RECOMPUTE_MIN=1) that
    normally only fires at s=2^23+ and check the proof bytes are identical
    to the resident path (VERDICT r4 item 7; reference:
    src/lasso/memory_checking.rs:236-310 — same fingerprints, one layout)."""
    from lasso_tpu.utils.serialize import serialize_proof

    proof_resident, _, _, _ = run_e2e("and", 2, 16, 64)
    monkeypatch.setenv("LASSO_TPU_GP_RECOMPUTE_MIN", "1")
    proof_recompute, _, _, _ = run_e2e("and", 2, 16, 64)
    assert serialize_proof(proof_recompute) == serialize_proof(proof_resident)


def test_deferred_verifier_msm_path(monkeypatch):
    """Force the verifier's device-MSM branches (MSM_HOST_MAX=0) so the
    deferred g_hat batching path runs: the proof must verify, and a
    tampered proof must still be rejected at resolve time."""
    import lasso_tpu.ops.msm as msm_mod

    proof, commitment, r, gens = run_e2e("and", 2, 16, 64)
    monkeypatch.setattr(msm_mod, "MSM_HOST_MAX", 0)
    proof.verify(commitment, r, gens, ProofTranscript(b"example"))

    # tamper with a bullet L point: the final Sigma-protocol check (which
    # consumes the deferred g_hat) must reject
    bullet = (proof.memory_check.proof_hash_layer.proof_ops.proof
              .bullet_reduction_proof)
    bullet.L_vec[0] = bullet.L_vec[0].double()
    with pytest.raises((LassoError, AssertionError)):
        proof.verify(commitment, r, gens, ProofTranscript(b"example"))
