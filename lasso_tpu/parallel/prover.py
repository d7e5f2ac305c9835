"""Multi-chip sumcheck prover (the distributed slice of the Lasso prover).

Runs the arbitrary-degree sumcheck over a device mesh with the hypercube
cyclically sharded (see parallel/ops.py): every round is one shard-local
fused evaluation + a psum of 16-limb lazy column partials over ICI; binds
stay fully local.  When the local extent reaches one element per device, the
remaining log(D) variables (the device-id bits) are a tiny replicated
epilogue finished by the single-chip path.

Because the sharded pairing reproduces the ORIGINAL (k, k + n/2) pairing,
round polynomials -- and therefore the Fiat-Shamir transcript and the proof
bytes -- are bit-identical to the single-chip prover's (field addition is
exactly associative, so the psum reduction order cannot change canonical
values).  tests/test_parallel_prover.py pins this.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from lasso_tpu.field.host import Fr
from lasso_tpu.field.jfield import JFr, W
from lasso_tpu.parallel import ops as pops
from lasso_tpu.poly.unipoly import UniPoly
from lasso_tpu.subprotocols.sumcheck import SumcheckInstanceProof


def prove_arbitrary_sharded(mesh, zs, comb, degree: int, num_rounds: int,
                            transcript):
    """Sharded sumcheck prover.

    zs: [alpha, n, W] in CYCLIC layout (pops.cyclic_permute along axis 1),
    block-sharded over the mesh.  Returns (proof, r, final_evals) matching
    prove_arbitrary on the unpermuted stack bit-for-bit.
    """
    d = mesh.devices.size
    n = zs.shape[1]
    compressed = []
    r_out: list[int] = []

    rounds_sharded = 0
    while n // (2 ** rounds_sharded) > d and rounds_sharded < num_rounds:
        rounds_sharded += 1

    for _ in range(rounds_sharded):
        eval_limbs = pops.sharded_round_evals(mesh, zs, comb, degree)
        evals = JFr.decode(eval_limbs)
        round_poly = UniPoly.from_evals(evals)
        round_poly.append_to_transcript(b"poly", transcript)
        r_j = transcript.challenge_scalar(b"challenge_nextround")
        r_out.append(r_j)
        zs = pops.sharded_bind_top(mesh, zs, JFr.encode_scalar(r_j))
        compressed.append(round_poly.compress())
        n //= 2

    # replicated epilogue: local extent is <= 1 element/device -- gather the
    # tiny remainder, undo the cyclic layout, finish on one device
    if num_rounds > rounds_sharded:
        # undo the cyclic layout of the remaining tiny cube (identity when
        # exactly one element per device remains)
        rest = jnp.swapaxes(
            pops.cyclic_unpermute(jnp.swapaxes(zs, 0, 1), d), 0, 1)
        rest = jnp.asarray(np.asarray(rest))  # replicate onto default device
        from lasso_tpu.subprotocols.sumcheck import prove_arbitrary

        tail_proof, tail_r, final_evals, _ = prove_arbitrary(
            rest, comb, degree, num_rounds - rounds_sharded, transcript)
        compressed.extend(tail_proof.compressed_polys)
        r_out.extend(tail_r)
    else:
        final_evals = JFr.decode(zs[:, 0])

    return SumcheckInstanceProof(compressed), r_out, final_evals
