"""Device-transcript sumcheck (`_device_rounds_arbitrary`) vs the host
path: round polynomials, challenges, final evals and the full transcript
state must be bit-identical.

Unlike the full-proof force test (test_device_open.py), this compiles only
the masked sumcheck program at a small SUMCHECK_FIX, so it is tractable on
XLA:CPU and runs in the fast-CPU CI profile.  The transcript is parked at a
NON-canonical strobe position before the call so the round-0 peel (entry
from an arbitrary call-site position) is exercised.
"""

import os

import numpy as np
import pytest

import lasso_tpu.subtables.bitwise  # noqa: F401 (register strategies)
from lasso_tpu.field.jfield import JFr
from lasso_tpu.subprotocols.sumcheck import SUMCHECK_FIX, prove_arbitrary
from lasso_tpu.subtables.base import get_strategy
from lasso_tpu.transcript.proof_transcript import ProofTranscript


@pytest.fixture(scope="module")
def stack():
    rng = np.random.default_rng(7)
    strategy = get_strategy("and", 2, 16)
    alpha = strategy.num_memories
    vals = rng.integers(1, 1 << 30, size=(alpha + 1, 32)).astype(np.uint64)
    return (JFr.encode_u64_array(vals), strategy.comb_eq_device(),
            strategy.sumcheck_poly_degree())


def _run(stack, dev: bool):
    zs, comb, degree = stack
    old = os.environ.get("LASSO_TPU_DEVICE_TRANSCRIPT")
    os.environ["LASSO_TPU_DEVICE_TRANSCRIPT"] = "force" if dev else "0"
    try:
        tr = ProofTranscript(b"sumcheck-parity")
        # park the strobe at a non-canonical position (mirrors the real call
        # sites: prove_arbitrary runs right after scalar appends)
        tr.append_scalar(b"claim", 0x1234)
        proof, r, finals, _bound = prove_arbitrary(zs, comb, degree, 5, tr)
        post = tr.challenge_scalar(b"post")  # pins the full strobe state
        return proof, r, finals, post
    finally:
        if old is None:
            os.environ.pop("LASSO_TPU_DEVICE_TRANSCRIPT", None)
        else:
            os.environ["LASSO_TPU_DEVICE_TRANSCRIPT"] = old


def test_device_sumcheck_bit_identical(stack):
    assert 32 <= SUMCHECK_FIX, "test needs the masked path from round 0"
    proof_h, r_h, finals_h, post_h = _run(stack, False)
    proof_d, r_d, finals_d, post_d = _run(stack, True)

    assert r_d == r_h
    assert finals_d == finals_h
    assert post_d == post_h, "transcript states diverged"
    assert len(proof_d.compressed_polys) == len(proof_h.compressed_polys)
    for a, b in zip(proof_d.compressed_polys, proof_h.compressed_polys):
        assert a.coeffs_except_linear_term == b.coeffs_except_linear_term


# ---------------------------------------------------------------------------
# Unmasked chained rounds (n > SUMCHECK_FIX): the path every LARGE proof's
# Fiat-Shamir transcript flows through on TPU.  Shrink SUMCHECK_FIX so the
# chain (_device_round_unmasked / _device_round_cubic_unmasked) runs on CPU
# and compare bit-for-bit against the host path, including the final
# transcript state.
# ---------------------------------------------------------------------------

def _run_patched(monkeypatch, dev: bool, fn):
    import lasso_tpu.subprotocols.sumcheck as sc

    monkeypatch.setattr(sc, "SUMCHECK_FIX", 8)
    monkeypatch.setenv("LASSO_TPU_DEVICE_TRANSCRIPT", "force" if dev else "0")
    tr = ProofTranscript(b"sumcheck-unmasked-parity")
    tr.append_scalar(b"claim", 0x9876)  # non-canonical entry position
    out = fn(tr)
    post = tr.challenge_scalar(b"post")
    return out, post


def test_unmasked_chain_arbitrary_bit_identical(monkeypatch):
    rng = np.random.default_rng(11)
    strategy = get_strategy("and", 2, 16)
    alpha = strategy.num_memories
    zs = JFr.encode_u64_array(
        rng.integers(1, 1 << 30, size=(alpha + 1, 32)).astype(np.uint64))
    comb, degree = strategy.comb_eq_device(), strategy.sumcheck_poly_degree()

    def go(tr):
        return prove_arbitrary(zs, comb, degree, 5, tr)

    (ph, rh, fh, _), post_h = _run_patched(monkeypatch, False, go)
    (pd, rd, fd, _), post_d = _run_patched(monkeypatch, True, go)

    assert rd == rh and fd == fh
    assert post_d == post_h, "transcript states diverged (unmasked chain)"
    for a, b in zip(pd.compressed_polys, ph.compressed_polys):
        assert a.coeffs_except_linear_term == b.coeffs_except_linear_term


def test_unmasked_chain_cubic_bit_identical(monkeypatch):
    from lasso_tpu.subprotocols.sumcheck import prove_cubic_batched

    rng = np.random.default_rng(13)
    inst, n = 3, 32
    a = JFr.encode_u64_array(
        rng.integers(1, 1 << 30, size=(inst, n)).astype(np.uint64))
    b = JFr.encode_u64_array(
        rng.integers(1, 1 << 30, size=(inst, n)).astype(np.uint64))
    c = JFr.encode_u64_array(
        rng.integers(1, 1 << 30, size=(n,)).astype(np.uint64))
    coeffs = [3, 5, 7]
    claim = 0xDEADBEEF

    def go(tr):
        return prove_cubic_batched(claim, 5, a, b, c, coeffs, tr)

    (ph, rh, ch), post_h = _run_patched(monkeypatch, False, go)
    (pd, rd, cd), post_d = _run_patched(monkeypatch, True, go)

    assert rd == rh
    assert list(cd[0]) == list(ch[0])
    assert list(cd[1]) == list(ch[1])
    assert cd[2] == ch[2]
    assert post_d == post_h, "transcript states diverged (unmasked cubic)"
    for x, y in zip(pd.compressed_polys, ph.compressed_polys):
        assert x.coeffs_except_linear_term == y.coeffs_except_linear_term
