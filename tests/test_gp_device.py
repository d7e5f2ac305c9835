"""Device-fused grand-product argument vs host path: proofs, rand and the
full transcript state must be bit-identical (grand_product._device_gp_prefix).

Runs only where the device transcript path is supported (TPU backend); on
CPU the host path is the only path and the parity claim is vacuous.
"""

import os

import numpy as np
import pytest

import jax

from lasso_tpu.field.jfield import JFr
from lasso_tpu.subprotocols.grand_product import (BatchedGrandProductArgument,
                                                  BatchedGrandProductCircuit)
from lasso_tpu.transcript.proof_transcript import ProofTranscript


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(3)
    return JFr.encode_u64_array(
        rng.integers(1, 1 << 30, size=(2, 256)).astype(np.uint64))


def _run(inputs, dev: bool):
    old = os.environ.get("LASSO_TPU_DEVICE_TRANSCRIPT")
    os.environ["LASSO_TPU_DEVICE_TRANSCRIPT"] = "1" if dev else "0"
    try:
        circ = BatchedGrandProductCircuit(inputs)
        tr = ProofTranscript(b"gp")
        arg, rand = BatchedGrandProductArgument.prove(circ, tr)
        post = tr.challenge_scalar(b"post")  # pins the full strobe state
        return arg, rand, post
    finally:
        if old is None:
            os.environ.pop("LASSO_TPU_DEVICE_TRANSCRIPT", None)
        else:
            os.environ["LASSO_TPU_DEVICE_TRANSCRIPT"] = old


def test_fused_gp_prefix_bit_identical(inputs):
    if jax.default_backend() != "tpu":
        pytest.skip("device transcript path requires the TPU backend")

    arg_h, rand_h, post_h = _run(inputs, False)
    arg_d, rand_d, post_d = _run(inputs, True)

    assert rand_d == rand_h
    assert post_d == post_h
    assert len(arg_d.proof) == len(arg_h.proof)
    for ld, lh in zip(arg_d.proof, arg_h.proof):
        assert ld.claims_prod_left == lh.claims_prod_left
        assert ld.claims_prod_right == lh.claims_prod_right
        for a, b in zip(ld.proof.compressed_polys, lh.proof.compressed_polys):
            assert a.coeffs_except_linear_term == b.coeffs_except_linear_term

    # the (host) verifier accepts the device-built argument
    circ = BatchedGrandProductCircuit(inputs)
    claims = circ.evaluate()
    out_claims, out_rand = arg_d.verify(claims, 256, ProofTranscript(b"gp"))
    assert out_rand == rand_d


def test_gp_recompute_layers_bit_identical(inputs, monkeypatch):
    """Layers recomputed from the leaves (GP_STORE_ELEMS budget exceeded)
    must yield the exact argument the fully-stored tree yields."""
    import lasso_tpu.subprotocols.grand_product as gp

    def run():
        circ = BatchedGrandProductCircuit(inputs)
        tr = ProofTranscript(b"gp-store")
        arg, rand = BatchedGrandProductArgument.prove(circ, tr)
        post = tr.challenge_scalar(b"post")
        return arg, rand, post

    arg_a, rand_a, post_a = run()
    # store nothing but the top: every host-loop layer is recomputed
    monkeypatch.setattr(gp, "GP_STORE_ELEMS", 1)
    arg_b, rand_b, post_b = run()

    assert rand_b == rand_a
    assert post_b == post_a
    for la, lb in zip(arg_a.proof, arg_b.proof):
        assert la.claims_prod_left == lb.claims_prod_left
        assert la.claims_prod_right == lb.claims_prod_right
        for a, b in zip(la.proof.compressed_polys, lb.proof.compressed_polys):
            assert a.coeffs_except_linear_term == b.coeffs_except_linear_term


def test_gp_leaves_fn_bit_identical(inputs):
    """A circuit whose leaves are recomputed on demand (leaves_fn, incl. the
    direct left/right-half layer-0 path used by the widest sumcheck) must
    yield the exact argument of a circuit holding the leaves resident."""
    def run(circ):
        tr = ProofTranscript(b"gp-fn")
        arg, rand = BatchedGrandProductArgument.prove(circ, tr)
        post = tr.challenge_scalar(b"post")
        return arg, rand, post

    def leaves_fn(half=None):
        lo, hi = {None: (0, 256), 0: (0, 128), 1: (128, 256)}[half]
        return inputs[:, lo:hi]

    arg_a, rand_a, post_a = run(BatchedGrandProductCircuit(inputs))
    arg_b, rand_b, post_b = run(
        BatchedGrandProductCircuit(leaves_fn=leaves_fn, shape=(2, 256)))

    assert rand_b == rand_a
    assert post_b == post_a
    for la, lb in zip(arg_a.proof, arg_b.proof):
        assert la.claims_prod_left == lb.claims_prod_left
        assert la.claims_prod_right == lb.claims_prod_right
        for a, b in zip(la.proof.compressed_polys, lb.proof.compressed_polys):
            assert a.coeffs_except_linear_term == b.coeffs_except_linear_term


def test_gp_release_frees_layers(inputs):
    circ = BatchedGrandProductCircuit(inputs)
    assert circ.num_layers == 8
    roots = circ.evaluate()
    assert len(roots) == 2
    circ.release()
    assert circ._stored == {} and circ._leaves is None
