"""Bisect the s=2^24 halo2-comparison compile failure phase by phase.

The full prove at (AND, C=1, M=2^16, s=2^24) SIGKILLed the remote
tpu_compile_helper (grid_r3_halo2.jsonl).  This driver runs each prover
phase separately, in order, printing PASS/FAIL + wall per phase, so the
offending program can be identified and shrunk.

Usage: python scripts/bisect_2p24.py [log_s] [phase ...]
  phases: densify commit subtables claim sumcheck opening memcheck
  (default: all, in order)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    log_s = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    phases = sys.argv[2:] or [
        "densify", "commit", "subtables", "claim", "sumcheck", "opening",
        "memcheck"]
    s, m, c = 1 << log_s, 1 << 16, 1

    import jax.numpy as jnp

    import lasso_tpu.subtables.bitwise  # noqa: F401
    from lasso_tpu.field.jfield import JFr
    from lasso_tpu.lasso.densified import DensifiedRepresentation
    from lasso_tpu.lasso.memory_checking import MemoryCheckingProof
    from lasso_tpu.lasso.surge import SparsePolyCommitmentGens
    from lasso_tpu.poly.dense import eq_evals_device
    from lasso_tpu.subprotocols.sumcheck import prove_arbitrary
    from lasso_tpu.subtables.base import get_strategy
    from lasso_tpu.subtables.container import CombinedTableEvalProof, Subtables
    from lasso_tpu.transcript.proof_transcript import ProofTranscript
    from lasso_tpu.transcript.random_tape import RandomTape
    from lasso_tpu.utils.fixtures import gen_indices, gen_random_point

    strategy = get_strategy("and", c, m)
    nz = gen_indices(s, m, c)
    r = gen_random_point(log_s)
    transcript = ProofTranscript(b"bisect")
    tape = RandomTape(b"bisect")

    state = {}

    def run(name, fn):
        if name not in phases:
            print(f"[skip] {name}", flush=True)
            return
        t0 = time.perf_counter()
        try:
            fn()
            print(f"[PASS] {name}: {time.perf_counter() - t0:.1f}s",
                  flush=True)
        except Exception as e:
            print(f"[FAIL] {name}: {time.perf_counter() - t0:.1f}s "
                  f"{repr(e)[:400]}", flush=True)
            raise SystemExit(1)

    def densify():
        state["dense"] = DensifiedRepresentation(nz, 16, c)

    def commit():
        state["gens"] = SparsePolyCommitmentGens.new(
            b"gens_sparse_poly", c, s, strategy.num_memories, 16)
        state["commitment"] = state["dense"].commit(state["gens"])

    def subtables():
        st = Subtables(strategy, state["dense"].dim_usize, s)
        st.commit(state["gens"].gens_derefs).append_to_transcript(
            b"comm_poly_row_col_ops_val", transcript)
        state["subtables"] = st

    def claim():
        eq_table = eq_evals_device([JFr.encode_scalar(x) for x in r])
        state["eq_table"] = eq_table
        state["claim"] = state["subtables"].compute_sumcheck_claim(eq_table)
        transcript.append_scalar(b"claim_eval_scalar_product", state["claim"])

    def sumcheck():
        stack = jnp.concatenate(
            [state["subtables"].lookup_stack, state["eq_table"][None]], axis=0)
        proof, r_z, _, _ = prove_arbitrary(
            stack, strategy.comb_eq_device(), strategy.sumcheck_poly_degree(),
            log_s, transcript)
        state["r_z"] = r_z

    def opening():
        st = state["subtables"]
        chis_z = eq_evals_device(
            [JFr.encode_scalar(x) for x in state["r_z"]])
        evals = st.evaluate_lookups_at(chis_z)
        CombinedTableEvalProof.prove(
            st.combined_poly, evals, state["r_z"],
            state["gens"].gens_derefs, transcript, tape)

    def memcheck():
        r_hash = transcript.challenge_vector(b"challenge_r_hash", 2)
        MemoryCheckingProof.prove(
            state["dense"], (r_hash[0], r_hash[1]), state["subtables"],
            state["gens"], transcript, tape)

    run("densify", densify)
    run("commit", commit)
    run("subtables", subtables)
    run("claim", claim)
    run("sumcheck", sumcheck)
    run("opening", opening)
    run("memcheck", memcheck)
    print("all phases complete", flush=True)


if __name__ == "__main__":
    main()
