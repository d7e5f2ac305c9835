"""DensePolynomial ops + densified timestamp construction
(reference: dense_mlpoly.rs tests, densified.rs counter loop)."""

import random

import numpy as np

from lasso_tpu.field.host import Fr
from lasso_tpu.field.jfield import JFr
from lasso_tpu.lasso.densified import DensifiedRepresentation, _timestamps
from lasso_tpu.poly.dense import DensePolynomial, eq_evals_host


def _rand_scalars(n, seed=0):
    rng = random.Random(seed)
    return [rng.randrange(Fr.p) for _ in range(n)]


def test_bound_var_top_bot():
    z = _rand_scalars(8, 1)
    r = _rand_scalars(1, 2)[0]
    poly = DensePolynomial.from_ints(z)
    r_dev = JFr.encode_scalar(r)

    top = poly.bound_var_top(r_dev).to_ints()
    assert top == [(z[i] + r * (z[i + 4] - z[i])) % Fr.p for i in range(4)]

    bot = poly.bound_var_bot(r_dev).to_ints()
    assert bot == [(z[2 * i] + r * (z[2 * i + 1] - z[2 * i])) % Fr.p
                   for i in range(4)]


def test_evaluate_matches_eq_dot():
    z = _rand_scalars(16, 3)
    r = _rand_scalars(4, 4)
    poly = DensePolynomial.from_ints(z)
    chis = eq_evals_host(r)
    expect = sum(c * v for c, v in zip(chis, z)) % Fr.p
    assert poly.evaluate(r) == expect


def test_evaluate_via_binds():
    # evaluating == binding vars top-down one at a time (reference: 435-458)
    z = _rand_scalars(16, 5)
    r = _rand_scalars(4, 6)
    poly = DensePolynomial.from_ints(z)
    cur = poly
    for ri in r:
        cur = cur.bound_var_top(JFr.encode_scalar(ri))
    assert cur.to_ints()[0] == poly.evaluate(r)


def test_bound_l_fold():
    z = _rand_scalars(16, 7)
    poly = DensePolynomial.from_ints(z)
    l_ints = _rand_scalars(4, 8)
    lz = JFr.decode(poly.bound(JFr.encode_ints(l_ints)))
    for j in range(4):
        expect = sum(l_ints[i] * z[i * 4 + j] for i in range(4)) % Fr.p
        assert lz[j] == expect


def test_merge_pads_pow2():
    p1 = DensePolynomial.from_ints(_rand_scalars(4, 9))
    p2 = DensePolynomial.from_ints(_rand_scalars(4, 10))
    p3 = DensePolynomial.from_ints(_rand_scalars(4, 11))
    merged = DensePolynomial.merge([p1, p2, p3])
    assert len(merged) == 16
    vals = merged.to_ints()
    assert vals[:4] == p1.to_ints()
    assert vals[8:12] == p3.to_ints()
    assert vals[12:] == [0, 0, 0, 0]


def test_timestamps_match_sequential_reference():
    """The sort/segmented-rank formulation must equal the reference's
    sequential counter loop (reference: densified.rs:44-51)."""
    rng = random.Random(12)
    m, s = 16, 64
    addrs = [rng.randrange(m) for _ in range(s)]

    # sequential oracle
    counters = [0] * m
    read_ref = []
    for a in addrs:
        read_ref.append(counters[a])
        counters[a] += 1

    import jax.numpy as jnp
    read_ts, final_ts = _timestamps(jnp.asarray(addrs, dtype=jnp.int32), m)
    assert list(np.asarray(read_ts)) == read_ref
    assert list(np.asarray(final_ts)) == counters


def test_densified_shapes_and_values():
    nz = [[1, 2], [3, 0], [1, 2], [1, 1]]
    dense = DensifiedRepresentation(nz, log_m=2, c=2)
    assert dense.s == 4 and dense.m == 4 and dense.c == 2

    dim0 = dense.dim[0].to_ints()
    assert dim0 == [1, 3, 1, 1]
    read0 = dense.read[0].to_ints()
    assert read0 == [0, 0, 1, 2]
    final0 = dense.final[0].to_ints()
    assert final0 == [0, 3, 0, 1]

    # merged polys: [dim..., read...] and [final...]
    assert len(dense.combined_l_variate_polys) == 16
    assert len(dense.combined_log_m_variate_polys) == 8
