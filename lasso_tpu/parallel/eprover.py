"""End-to-end sharded Lasso prover: the FULL SparsePolynomialEvaluationProof
pipeline under a device mesh, producing proof bytes BIT-IDENTICAL to the
single-chip prover.

This is the multi-chip analog of the reference's rayon parallelism across the
whole prove path (reference: src/subtables/mod.rs:134-175,
src/lasso/memory_checking.rs:236-310, src/poly/dense_mlpoly.rs:109-181), but
mapped to a TPU mesh rather than a thread pool:

  * every s- or M-sized multilinear lives CYCLIC-sharded over the mesh (see
    parallel/ops.py): all sumcheck binds and product-tree layers stay local,
    round evaluations are one psum of lazy limb partials;
  * merged (Hyrax-matrix) polynomials keep the cyclic layout column-aligned
    (device d owns matrix columns congruent d mod D), so L-folds are fully
    local along rows and the row-MSM commit is one per-device Pippenger +
    one all_gather of partial points;
  * grand products build shard-local subtrees, then a replicated log(D) top
    tree (multiplication is associative -- the roots are identical);
  * O(sqrt(n))-sized tails (bullet reductions, top trees, last log(D)
    sumcheck rounds) run replicated: they are latency-bound and their inputs
    are tiny.

Bit-exactness argument: field addition/multiplication are exact, so any
reduction order yields identical canonical values; curve addition is
associative, so gathered partial points sum to the identical commitment
points; the transcript therefore absorbs identical bytes in identical order.
tests/test_parallel_prover.py pins full-proof byte equality on the virtual
8-device CPU mesh.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from lasso_tpu.field.host import Fr
from lasso_tpu.field.jfield import JFr, W
from lasso_tpu.parallel import ops as pops
from lasso_tpu.parallel.mesh import AXIS
from lasso_tpu.parallel.prover import prove_arbitrary_sharded
from lasso_tpu.poly.dense import factored_lens
from lasso_tpu.poly.unipoly import UniPoly
from lasso_tpu.subprotocols.sumcheck import (SumcheckInstanceProof,
                                             prove_cubic_batched)
from lasso_tpu.utils.tracing import instrument, span


def _log2(n: int) -> int:
    return (n - 1).bit_length()


def _next_pow2(n: int) -> int:
    return 1 << max((n - 1).bit_length(), 0)


def _np_cyclic(x: np.ndarray, d: int, axis: int = 0) -> np.ndarray:
    """Host-side cyclic permute along `axis` (out[d*m+j] = x[j*D+d])."""
    x = np.moveaxis(x, axis, 0)
    n = x.shape[0]
    m = n // d
    out = np.swapaxes(x.reshape(m, d, *x.shape[1:]), 0, 1).reshape(x.shape)
    return np.moveaxis(out, 0, axis)


def _put_sharded(mesh, x_np: np.ndarray, spec):
    import jax
    from jax.sharding import NamedSharding

    return jax.device_put(jnp.asarray(x_np), NamedSharding(mesh, spec))


def sharded_eq(mesh, r_ints: list[int]):
    """eq(r, .) table over 2^len(r) in cyclic layout, sharded.

    Device-id bits are the LOW index bits (k = j*D + d), which correspond to
    the LAST log(D) challenges (index MSB <-> r[0])."""
    d = mesh.devices.size
    log_d = _log2(d)
    assert len(r_ints) >= log_d
    hi, lo = r_ints[: len(r_ints) - log_d], r_ints[len(r_ints) - log_d:]

    def enc(vals):
        if not vals:
            return jnp.zeros((0, W), jnp.uint32)
        return jnp.stack([JFr.encode_scalar(v) for v in vals])

    return pops.sharded_eq_table(mesh, enc(hi), enc(lo))


# ---------------------------------------------------------------------------
# Sharded Hyrax: merged-cyclic polynomial + row-MSM commit
# ---------------------------------------------------------------------------


class ShardedPoly:
    """Cyclic-sharded merged multilinear, duck-typed for PolyEvalProof.prove
    (exposes num_vars + bound); the L-fold runs sharded, the folded
    sqrt(n)-sized LZ is gathered for the replicated bullet reduction."""

    def __init__(self, mesh, z_cyc, n: int):
        self.mesh = mesh
        self.z_cyc = z_cyc
        self.n = n

    def __len__(self) -> int:
        return self.n

    @property
    def num_vars(self) -> int:
        return _log2(self.n)

    def bound(self, l_mont):
        l_size = l_mont.shape[0]
        r_size = self.n // l_size
        lz_cyc = pops.sharded_bound_fold(
            self.mesh, self.z_cyc, l_mont, l_size, r_size)
        return pops.gather_natural(lz_cyc, self.mesh.devices.size, axis=0)


@instrument("sharded.commit_poly")
def sharded_commit(mesh, z_cyc, n: int, gens):
    """Hyrax matrix commitment of a merged-cyclic polynomial (no blinds --
    the Lasso prove path never blinds commits).  Byte-identical to
    poly/hyrax.commit_poly: per-device partial row MSMs over the device's
    column subset, tree-combined (curve addition is associative)."""
    from lasso_tpu.curve.jcurve import to_host_points, tree_sum
    from lasso_tpu.ops.msm import window_plan
    from lasso_tpu.poly.hyrax import PolyCommitment
    from lasso_tpu.subprotocols.dot_product import _gens_device

    d = mesh.devices.size
    ell = _log2(n)
    left, right = factored_lens(ell)
    l_size, r_size = 1 << left, 1 << right
    assert r_size % d == 0 and r_size >= d

    gens_n = gens.gens.gens_n
    bases = _gens_device(gens_n)[..., :r_size]
    bases_cyc = pops.cyclic_permute_axis(bases, d, axis=-1)

    max_bits = pops.sharded_scalar_maxbits(mesh, z_cyc)
    if max_bits > 60:
        max_bits = 253
    c, num_windows = window_plan(max(r_size // d, 2), max_bits)
    partials = pops.sharded_commit_rows(
        mesh, z_cyc, bases_cyc, l_size, r_size, c, num_windows)
    summed = tree_sum(jnp.moveaxis(partials, 0, -1))  # [l_size, 4, W, 1]
    points = to_host_points(jnp.moveaxis(summed[..., 0], 0, -1))
    return PolyCommitment(points)


# ---------------------------------------------------------------------------
# Sharded densified representation + subtables
# ---------------------------------------------------------------------------


class ShardedDensified:
    """Cyclic-sharded views of a DensifiedRepresentation.

    Densify itself (the timestamp sort) is input preparation and stays
    global; everything the prover touches afterwards -- dim/read/final
    stacks, the two merged polynomials and their commitments -- is sharded."""

    def __init__(self, mesh, dense):
        d = mesh.devices.size
        assert dense.s % d == 0, "s must be divisible by the mesh size"
        assert dense.m % d == 0, "M must be divisible by the mesh size"
        self.mesh = mesh
        self.dense = dense
        self.c = dense.c
        self.s = dense.s
        self.m = dense.m

        nz = _np_cyclic(np.asarray(dense.dim_usize), d, axis=1)
        self.nz_cyc = _put_sharded(mesh, nz, P(None, AXIS))

        dim_read = np.stack([np.asarray(p.z) for p in dense.dim] +
                            [np.asarray(p.z) for p in dense.read])
        self.dim_read_stack = _put_sharded(
            mesh, _np_cyclic(dim_read, d, axis=1), P(None, AXIS))  # [2C, s, W]
        final = np.stack([np.asarray(p.z) for p in dense.final])
        self.final_stack = _put_sharded(
            mesh, _np_cyclic(final, d, axis=1), P(None, AXIS))  # [C, M, W]

        n_l = _next_pow2(2 * self.c * self.s)
        self.combined_l_poly = ShardedPoly(
            mesh, pops.merged_cyclic(mesh, self.dim_read_stack, n_l), n_l)
        n_m = _next_pow2(self.c * self.m)
        self.combined_log_m_poly = ShardedPoly(
            mesh, pops.merged_cyclic(mesh, self.final_stack, n_m), n_m)

    @instrument("sharded.DensifiedRepresentation.commit")
    def commit(self, gens):
        from lasso_tpu.lasso.densified import SparsePolynomialCommitment

        l_comm = sharded_commit(
            self.mesh, self.combined_l_poly.z_cyc, self.combined_l_poly.n,
            gens.gens_combined_l_variate)
        m_comm = sharded_commit(
            self.mesh, self.combined_log_m_poly.z_cyc, self.combined_log_m_poly.n,
            gens.gens_combined_log_m_variate)
        return SparsePolynomialCommitment(
            l_variate_polys_commitment=l_comm,
            log_m_variate_polys_commitment=m_comm,
            s=self.s, log_m=self.dense.log_m, m=self.m)


class ShardedSubtables:
    """Sharded analog of subtables/container.Subtables: the lookup stack
    E_i = T[nz] lives cyclic-sharded over s; the merged combined polynomial
    keeps the column-aligned cyclic layout for commit/openings."""

    @instrument("sharded.Subtables.construct")
    def __init__(self, mesh, strategy, nz_cyc, s: int):
        self.mesh = mesh
        self.strategy = strategy
        self.s = s

        tables_u64 = strategy.materialize_subtables()
        self.table_vals = JFr.encode_u64_array(tables_u64)  # [NS, M, W]
        alpha = strategy.num_memories
        sub_of = [strategy.memory_to_subtable_index(i) for i in range(alpha)]
        dim_of = [strategy.memory_to_dimension_index(i) for i in range(alpha)]
        self.lookup_stack = pops.sharded_gather_lookups(
            mesh, self.table_vals, nz_cyc, sub_of, dim_of)  # [alpha, s, W]

        n_combined = _next_pow2(alpha * s)
        self.combined_poly = ShardedPoly(
            mesh, pops.merged_cyclic(mesh, self.lookup_stack, n_combined),
            n_combined)

    @instrument("sharded.Subtables.claim")
    def compute_sumcheck_claim(self, eq_cyc) -> int:
        stack = pops.sharded_append_row(self.mesh, self.lookup_stack, eq_cyc)
        total = pops.sharded_comb_sum(
            self.mesh, stack, self.strategy.comb_eq_device())
        return JFr.decode(total[None])[0]

    def evaluate_lookups_at(self, chis_cyc) -> list[int]:
        sums = pops.sharded_weighted_evals(self.mesh, self.lookup_stack, chis_cyc)
        return JFr.decode(sums)

    @instrument("sharded.Subtables.commit")
    def commit(self, gens):
        from lasso_tpu.subtables.container import CombinedTableCommitment

        comm = sharded_commit(
            self.mesh, self.combined_poly.z_cyc, self.combined_poly.n, gens)
        return CombinedTableCommitment(comm)


# ---------------------------------------------------------------------------
# Sharded grand products
# ---------------------------------------------------------------------------


class ShardedBatchedGPCircuit:
    """Batched product trees over cyclic-sharded leaves: shard-local layers
    while the layer is wider than the mesh, then a replicated top tree over
    the gathered [I, D] shard roots (grand_product.py's associativity
    argument made concrete)."""

    def __init__(self, mesh, inputs_cyc):
        d = mesh.devices.size
        self.mesh = mesh
        self.num_instances = inputs_cyc.shape[0]
        self.n = inputs_cyc.shape[1]
        assert self.n >= d and self.n % d == 0

        self.sharded_left = []   # lengths n/2, n/4, ..., d
        self.sharded_right = []
        cur = inputs_cyc
        while cur.shape[1] > d:
            left, right = pops.sharded_split_halves(mesh, cur)
            self.sharded_left.append(left)
            self.sharded_right.append(right)
            cur = pops.sharded_grand_product_layer(mesh, cur)

        from lasso_tpu.subprotocols.grand_product import \
            BatchedGrandProductCircuit

        top_leaves = pops.gather_natural(cur, d, axis=1)  # [I, <=D, W]
        self.top = BatchedGrandProductCircuit(top_leaves)
        self.log_top = _log2(cur.shape[1])

    @property
    def num_layers(self) -> int:
        return _log2(self.n)

    def evaluate(self) -> list[int]:
        return self.top.evaluate()

    def layer(self, i: int):
        """(left, right, is_sharded) for argument layer i (width 2^i)."""
        if i < self.log_top:
            j = self.log_top - 1 - i
            return self.top.left_layers[j], self.top.right_layers[j], False
        k = self.num_layers - 1 - i
        return self.sharded_left[k], self.sharded_right[k], True


def prove_cubic_batched_sharded(mesh, claim: int, num_rounds: int, a, b, c_eq,
                                coeffs: list[int], transcript):
    """Sharded prove_cubic_batched: rounds run shard-local + psum while the
    local extent exceeds one element; the last log(D) rounds (and the final
    claims) are a gathered replicated tail.  Byte-identical to the
    single-chip prover."""
    d = mesh.devices.size
    e = claim % Fr.p
    num_instances = a.shape[0]
    compressed = []
    r_out: list[int] = []

    n = a.shape[1]
    rounds_sharded = 0
    while n // (2 ** rounds_sharded) > d and rounds_sharded < num_rounds:
        rounds_sharded += 1

    for _ in range(rounds_sharded):
        ev = pops.sharded_cubic_round_evals(mesh, a, b, c_eq)  # [3, I, W]
        flat = JFr.decode(ev.reshape(3 * num_instances, W))
        e0 = flat[0:num_instances]
        e2 = flat[num_instances:2 * num_instances]
        e3 = flat[2 * num_instances:]
        comb0 = sum(x * y for x, y in zip(e0, coeffs)) % Fr.p
        comb2 = sum(x * y for x, y in zip(e2, coeffs)) % Fr.p
        comb3 = sum(x * y for x, y in zip(e3, coeffs)) % Fr.p
        round_poly = UniPoly.from_evals(
            [comb0, (e - comb0) % Fr.p, comb2, comb3])
        round_poly.append_to_transcript(b"poly", transcript)
        r_j = transcript.challenge_scalar(b"challenge_nextround")
        r_out.append(r_j)
        r_dev = JFr.encode_scalar(r_j)
        a = pops.sharded_bind_top(mesh, a, r_dev)
        b = pops.sharded_bind_top(mesh, b, r_dev)
        c_eq = pops.sharded_bind_top(mesh, c_eq[None], r_dev)[0]
        e = round_poly.evaluate(r_j)
        compressed.append(round_poly.compress())
        n //= 2

    a_g = pops.gather_natural(a, d, axis=1)
    b_g = pops.gather_natural(b, d, axis=1)
    c_g = pops.gather_natural(c_eq[None], d, axis=1)[0]
    if num_rounds > rounds_sharded:
        tail_proof, tail_r, (cl, cr, ceq) = prove_cubic_batched(
            e, num_rounds - rounds_sharded, a_g, b_g, c_g, coeffs, transcript)
        compressed.extend(tail_proof.compressed_polys)
        r_out.extend(tail_r)
    else:
        cl = JFr.decode(a_g[:, 0])
        cr = JFr.decode(b_g[:, 0])
        ceq = JFr.decode(c_g[0][None])[0]
    return SumcheckInstanceProof(compressed), r_out, (cl, cr, ceq)


@instrument("sharded.BatchedGrandProductArgument.prove")
def prove_gp_argument_sharded(mesh, circuits: ShardedBatchedGPCircuit,
                              transcript):
    """Sharded BatchedGrandProductArgument.prove: wide layers run the
    sharded cubic sumcheck, narrow (top-tree) layers run replicated.
    Returns (argument, rand)."""
    from lasso_tpu.poly.dense import eq_evals_device
    from lasso_tpu.subprotocols.grand_product import (
        BatchedGrandProductArgument, LayerProofBatched)

    num_layers = circuits.num_layers
    claims_to_verify = circuits.evaluate()
    proof_layers: list[LayerProofBatched] = []
    rand: list[int] = []

    for i in range(num_layers):
        coeffs = transcript.challenge_vector(
            b"rand_coeffs_next_layer", len(claims_to_verify))
        claim = sum(c * v for c, v in zip(coeffs, claims_to_verify)) % Fr.p

        a, b, is_sharded = circuits.layer(i)
        if is_sharded:
            eq_poly = sharded_eq(mesh, rand)
            proof, rand_prod, (claims_left, claims_right, _ceq) = \
                prove_cubic_batched_sharded(
                    mesh, claim, i, a, b, eq_poly, coeffs, transcript)
        else:
            eq_poly = eq_evals_device([JFr.encode_scalar(x) for x in rand])
            proof, rand_prod, (claims_left, claims_right, _ceq) = \
                prove_cubic_batched(claim, i, a, b, eq_poly, coeffs, transcript)

        for cl, cr in zip(claims_left, claims_right):
            transcript.append_scalar(b"claim_prod_left", cl)
            transcript.append_scalar(b"claim_prod_right", cr)
        r_layer = transcript.challenge_scalar(b"challenge_r_layer")
        claims_to_verify = [
            (cl + r_layer * (cr - cl)) % Fr.p
            for cl, cr in zip(claims_left, claims_right)]
        rand = [r_layer] + rand_prod
        proof_layers.append(
            LayerProofBatched(proof, claims_left, claims_right))

    return BatchedGrandProductArgument(proof_layers), rand


# ---------------------------------------------------------------------------
# Sharded memory checking
# ---------------------------------------------------------------------------


@instrument("sharded.MemoryChecking.prove")
def prove_memory_checking_sharded(mesh, sd: ShardedDensified,
                                  subtables: ShardedSubtables, r_mem_check,
                                  gens, transcript, random_tape):
    from lasso_tpu.lasso.memory_checking import (HashLayerProof,
                                                 MemoryCheckingProof,
                                                 ProductLayerProof)

    transcript.append_protocol_name(MemoryCheckingProof.PROTOCOL_NAME)

    strategy = subtables.strategy
    gamma, tau = r_mem_check
    g = JFr.encode_scalar(gamma)
    g2 = JFr.encode_scalar(gamma * gamma % Fr.p)
    t = JFr.encode_scalar(tau)
    alpha = strategy.num_memories
    c = sd.c
    d = mesh.devices.size

    # per-memory sharded stacks (dim/read by dimension, tables by subtable)
    dim_stack = jnp.stack(
        [sd.dim_read_stack[strategy.memory_to_dimension_index(i)]
         for i in range(alpha)])
    read_stack = jnp.stack(
        [sd.dim_read_stack[c + strategy.memory_to_dimension_index(i)]
         for i in range(alpha)])
    final_mem = jnp.stack(
        [sd.final_stack[strategy.memory_to_dimension_index(i)]
         for i in range(alpha)])
    v_mem_nat = jnp.stack(
        [subtables.table_vals[strategy.memory_to_subtable_index(i)]
         for i in range(alpha)])  # [alpha, M, W] natural (replicated)
    v_mem = _put_sharded(
        mesh, _np_cyclic(np.asarray(v_mem_nat), d, axis=1), P(None, AXIS))
    addr = _put_sharded(
        mesh,
        _np_cyclic(np.asarray(
            JFr.encode_u64_array(np.arange(sd.m, dtype=np.uint64))), d, axis=0),
        P(AXIS))

    with span("sharded.fingerprints"):
        rw_inputs = pops.sharded_rw_fingerprints(
            mesh, dim_stack, subtables.lookup_stack, read_stack, g, g2, t)
        if_inputs = pops.sharded_if_fingerprints(
            mesh, addr, v_mem, final_mem, g, g2, t)

    with span("sharded.gp_build"):
        rw = ShardedBatchedGPCircuit(mesh, rw_inputs)
        inf = ShardedBatchedGPCircuit(mesh, if_inputs)

    # -- product layer (mirrors ProductLayerProof.prove byte-for-byte) -------
    with span("sharded.ProductLayer.prove"):
        transcript.append_protocol_name(ProductLayerProof.PROTOCOL_NAME)
        rw_roots = rw.evaluate()
        if_roots = inf.evaluate()

        grand_product_evals = []
        for i in range(alpha):
            h_init, h_final = if_roots[2 * i], if_roots[2 * i + 1]
            h_read, h_write = rw_roots[2 * i], rw_roots[2 * i + 1]
            assert h_init * h_write % Fr.p == h_read * h_final % Fr.p, \
                "multiset hash identity failed (prover bug)"
            transcript.append_scalar(b"claim_hash_init", h_init)
            transcript.append_scalar(b"claim_hash_read", h_read)
            transcript.append_scalar(b"claim_hash_write", h_write)
            transcript.append_scalar(b"claim_hash_final", h_final)
            grand_product_evals.append((h_init, h_read, h_write, h_final))

        proof_ops, rand_ops = prove_gp_argument_sharded(mesh, rw, transcript)
        proof_mem, rand_mem = prove_gp_argument_sharded(mesh, inf, transcript)
        proof_prod_layer = ProductLayerProof(
            grand_product_evals, proof_mem, proof_ops)

    # -- hash layer (mirrors HashLayerProof.prove byte-for-byte) -------------
    with span("sharded.HashLayer.prove"):
        from lasso_tpu.poly.dense import bound_var_bot_host
        from lasso_tpu.poly.hyrax import PolyEvalProof
        from lasso_tpu.subtables.container import CombinedTableEvalProof

        transcript.append_protocol_name(HashLayerProof.PROTOCOL_NAME)
        chis_ops = sharded_eq(mesh, rand_ops)
        chis_mem = sharded_eq(mesh, rand_mem)

        eval_derefs = subtables.evaluate_lookups_at(chis_ops)
        proof_derefs = CombinedTableEvalProof.prove(
            subtables.combined_poly, eval_derefs, rand_ops,
            gens.gens_derefs, transcript, random_tape)

        dim_read_evals = JFr.decode(pops.sharded_weighted_evals(
            mesh, sd.dim_read_stack, chis_ops))
        eval_dim, eval_read = dim_read_evals[:c], dim_read_evals[c:]
        eval_final = JFr.decode(pops.sharded_weighted_evals(
            mesh, sd.final_stack, chis_mem))

        evals_ops = eval_dim + eval_read
        evals_ops += [0] * (_next_pow2(len(evals_ops)) - len(evals_ops))
        transcript.append_scalars(b"claim_evals_ops", evals_ops)
        challenges_ops = transcript.challenge_vector(
            b"challenge_combine_n_to_one", (len(evals_ops) - 1).bit_length())
        vals = evals_ops
        for ch in reversed(challenges_ops):
            vals = bound_var_bot_host(vals, ch)
        joint_claim_eval_ops = vals[0]
        r_joint_ops = challenges_ops + list(rand_ops)
        transcript.append_scalar(b"joint_claim_eval_ops", joint_claim_eval_ops)
        proof_ops_pe, _ = PolyEvalProof.prove(
            sd.combined_l_poly, None, r_joint_ops, joint_claim_eval_ops,
            None, gens.gens_combined_l_variate, transcript, random_tape)

        transcript.append_scalars(b"claim_evals_mem", eval_final)
        challenges_mem = transcript.challenge_vector(
            b"challenge_combine_two_to_one", (len(eval_final) - 1).bit_length())
        vals = eval_final + [0] * (_next_pow2(len(eval_final)) - len(eval_final))
        for ch in reversed(challenges_mem):
            vals = bound_var_bot_host(vals, ch)
        joint_claim_eval_mem = vals[0]
        r_joint_mem = challenges_mem + list(rand_mem)
        transcript.append_scalar(b"joint_claim_eval_mem", joint_claim_eval_mem)
        proof_mem_pe, _ = PolyEvalProof.prove(
            sd.combined_log_m_poly, None, r_joint_mem, joint_claim_eval_mem,
            None, gens.gens_combined_log_m_variate, transcript, random_tape)

        proof_hash_layer = HashLayerProof(
            eval_dim=eval_dim, eval_read=eval_read, eval_final=eval_final,
            eval_derefs=eval_derefs, proof_ops=proof_ops_pe,
            proof_mem=proof_mem_pe, proof_derefs=proof_derefs)

    return MemoryCheckingProof(proof_prod_layer, proof_hash_layer)


# ---------------------------------------------------------------------------
# Top-level sharded prove
# ---------------------------------------------------------------------------


@instrument("sharded.SparsePoly.prove")
def prove_sharded(dense, r: list[int], gens, strategy, mesh, transcript,
                  random_tape):
    """Full SparsePolynomialEvaluationProof.prove under the mesh.  Proof
    bytes are bit-identical to the single-chip prover's (the entry point for
    multi-chip scaling; reference rayon sites listed in the module docstring)."""
    from lasso_tpu.lasso.surge import (PrimarySumcheck,
                                       SparsePolynomialEvaluationProof)
    from lasso_tpu.subtables.container import CombinedTableEvalProof

    transcript.append_protocol_name(
        SparsePolynomialEvaluationProof.PROTOCOL_NAME)
    assert len(r) == _log2(dense.s)

    sd = dense if isinstance(dense, ShardedDensified) else \
        ShardedDensified(mesh, dense)
    subtables = ShardedSubtables(mesh, strategy, sd.nz_cyc, sd.s)

    comm_derefs = subtables.commit(gens.gens_derefs)
    comm_derefs.append_to_transcript(b"comm_poly_row_col_ops_val", transcript)

    eq_cyc = sharded_eq(mesh, r)
    claimed_eval = subtables.compute_sumcheck_claim(eq_cyc)
    transcript.append_scalar(b"claim_eval_scalar_product", claimed_eval)

    stack = pops.sharded_append_row(mesh, subtables.lookup_stack, eq_cyc)
    sc_proof, r_z, _final_evals = prove_arbitrary_sharded(
        mesh, stack, strategy.comb_eq_device(),
        strategy.sumcheck_poly_degree(), _log2(sd.s), transcript)

    chis_z = sharded_eq(mesh, r_z)
    eval_derefs = subtables.evaluate_lookups_at(chis_z)
    proof_derefs = CombinedTableEvalProof.prove(
        subtables.combined_poly, eval_derefs, r_z, gens.gens_derefs,
        transcript, random_tape)

    r_hash_params = transcript.challenge_vector(b"challenge_r_hash", 2)
    memory_check = prove_memory_checking_sharded(
        mesh, sd, subtables, (r_hash_params[0], r_hash_params[1]), gens,
        transcript, random_tape)

    return SparsePolynomialEvaluationProof(
        comm_derefs=comm_derefs,
        primary_sumcheck=PrimarySumcheck(
            proof=sc_proof, claimed_evaluation=claimed_eval,
            eval_derefs=eval_derefs, proof_derefs=proof_derefs),
        memory_check=memory_check,
        strategy=strategy)
