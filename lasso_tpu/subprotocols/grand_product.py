"""Grand product circuits + batched argument (reference: src/subprotocols/grand_product.rs).

TPU shape: a batch of I same-sized product circuits is a single tensor per
layer ([I, len, W]), built bottom-up with one fused modular multiply per
layer.  The batched layer sumcheck (Thaler'13) runs through
subprotocols/sumcheck.prove_cubic_batched with all instances vectorized on
the leading axis.  The product tree is associative, which is what lets
multi-host runs combine shard-local subtrees with a log(#shards) top tree
(see parallel/).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from lasso_tpu.field.host import Fr
from lasso_tpu.field.jfield import JFr
from lasso_tpu.poly.dense import eq_evals_device, eq_evaluate_host
from lasso_tpu.subprotocols.sumcheck import (SumcheckInstanceProof,
                                             prove_cubic_batched)
from lasso_tpu.utils.errors import LassoError
from lasso_tpu.utils.tracing import instrument


class BatchedGrandProductCircuit:
    """I product-tree circuits over inputs [I, n, W] (n a power of two).

    Layer i stores (left, right) halves, each [I, n / 2^(i+1), W].
    """

    def __init__(self, inputs: jnp.ndarray):
        assert inputs.ndim == 3
        num_instances, n, _ = inputs.shape
        assert n & (n - 1) == 0 and n >= 2
        self.num_instances = num_instances
        self.left_layers: list[jnp.ndarray] = []
        self.right_layers: list[jnp.ndarray] = []
        left, right = inputs[:, : n // 2], inputs[:, n // 2:]
        self.left_layers.append(left)
        self.right_layers.append(right)
        while left.shape[1] > 1:
            prod = JFr.mul(left, right)
            m = prod.shape[1] // 2
            left, right = prod[:, :m], prod[:, m:]
            self.left_layers.append(left)
            self.right_layers.append(right)

    @property
    def num_layers(self) -> int:
        return len(self.left_layers)

    def evaluate(self) -> list[int]:
        """Root products, one per instance (host ints)."""
        root = JFr.mul(self.left_layers[-1][:, 0], self.right_layers[-1][:, 0])
        return JFr.decode(root)


class GrandProductCircuit:
    """Single product-tree circuit (reference: grand_product.rs:13-65).

    Thin wrapper over the batched tensor circuit with one instance; the
    prover always uses the batched form (one tensor per layer)."""

    def __init__(self, poly):
        z = poly.z if hasattr(poly, "z") else poly
        self._batched = BatchedGrandProductCircuit(z[None])

    @property
    def num_layers(self) -> int:
        return self._batched.num_layers

    def left_vec(self, layer: int):
        return self._batched.left_layers[layer][0]

    def right_vec(self, layer: int):
        return self._batched.right_layers[layer][0]

    def evaluate(self) -> int:
        return self._batched.evaluate()[0]


@dataclass
class LayerProofBatched:
    proof: SumcheckInstanceProof
    claims_prod_left: list[int]
    claims_prod_right: list[int]


@dataclass
class BatchedGrandProductArgument:
    proof: list[LayerProofBatched]

    @staticmethod
    @instrument("BatchedGrandProductArgument.prove")
    def prove(circuits: BatchedGrandProductCircuit, transcript):
        """Returns (argument, rand)."""
        num_layers = circuits.num_layers
        claims_to_verify = circuits.evaluate()
        proof_layers: list[LayerProofBatched] = []
        rand: list[int] = []

        for layer_id in range(num_layers - 1, -1, -1):
            a = circuits.left_layers[layer_id]
            b = circuits.right_layers[layer_id]
            layer_len = a.shape[1]
            eq_poly = eq_evals_device([JFr.encode_scalar(x) for x in rand])
            assert eq_poly.shape[0] == layer_len
            num_rounds = (layer_len - 1).bit_length()

            coeffs = transcript.challenge_vector(
                b"rand_coeffs_next_layer", len(claims_to_verify))
            claim = sum(c * v for c, v in zip(coeffs, claims_to_verify)) % Fr.p

            proof, rand_prod, (claims_left, claims_right, _claim_eq) = \
                prove_cubic_batched(claim, num_rounds, a, b, eq_poly, coeffs, transcript)

            for cl, cr in zip(claims_left, claims_right):
                transcript.append_scalar(b"claim_prod_left", cl)
                transcript.append_scalar(b"claim_prod_right", cr)

            r_layer = transcript.challenge_scalar(b"challenge_r_layer")
            claims_to_verify = [
                (cl + r_layer * (cr - cl)) % Fr.p
                for cl, cr in zip(claims_left, claims_right)
            ]
            rand = [r_layer] + rand_prod
            proof_layers.append(LayerProofBatched(proof, claims_left, claims_right))

        return BatchedGrandProductArgument(proof_layers), rand

    def verify(self, claims_prod_vec: list[int], n: int, transcript):
        """Returns (claims_to_verify, rand). Host-side."""
        num_layers = (n - 1).bit_length()
        if len(self.proof) != num_layers:
            raise LassoError("grand product argument has wrong number of layers")
        rand: list[int] = []
        claims_to_verify = list(claims_prod_vec)

        for num_rounds, layer in enumerate(self.proof):
            coeffs = transcript.challenge_vector(
                b"rand_coeffs_next_layer", len(claims_to_verify))
            claim = sum(c * v for c, v in zip(coeffs, claims_to_verify)) % Fr.p

            claim_last, rand_prod = layer.proof.verify(claim, num_rounds, 3, transcript)

            claims_left = layer.claims_prod_left
            claims_right = layer.claims_prod_right
            if len(claims_left) != len(claims_prod_vec) or \
               len(claims_right) != len(claims_prod_vec):
                raise LassoError("claim count mismatch in grand product layer")

            for cl, cr in zip(claims_left, claims_right):
                transcript.append_scalar(b"claim_prod_left", cl)
                transcript.append_scalar(b"claim_prod_right", cr)

            if len(rand) != len(rand_prod):
                raise LassoError("rand length mismatch in grand product layer")
            eq_eval = eq_evaluate_host(rand, rand_prod)
            claim_expected = sum(
                c * (cl * cr % Fr.p * eq_eval) for c, cl, cr in
                zip(coeffs, claims_left, claims_right)) % Fr.p
            if claim_expected != claim_last:
                raise LassoError("grand product layer claim mismatch")

            r_layer = transcript.challenge_scalar(b"challenge_r_layer")
            claims_to_verify = [
                (cl + r_layer * (cr - cl)) % Fr.p
                for cl, cr in zip(claims_left, claims_right)
            ]
            rand = [r_layer] + rand_prod

        return claims_to_verify, rand
