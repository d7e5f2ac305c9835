"""Utility-layer parity tests (reference: math.rs, gaussian_elimination.rs,
mod.rs inline tests) plus the single grand-product circuit wrapper."""

import random

from lasso_tpu.field.host import Fr
from lasso_tpu.utils.gaussian_elimination import gaussian_elimination
from lasso_tpu.utils.math import (compute_dotproduct, get_bits,
                                  index_to_field_bitvector, is_power_of_two,
                                  log_2, pow_2, split_bits, square_root)


def test_math_utils():
    assert log_2(1024) == 10 and pow_2(10) == 1024
    assert square_root(256) == 16
    assert get_bits(0b1011, 4) == [True, False, True, True]
    assert index_to_field_bitvector(0b1011, 5) == [0, 1, 0, 1, 1]
    assert split_bits(0b110101, 3) == (0b110, 0b101)
    assert is_power_of_two(64) and not is_power_of_two(65)
    rng = random.Random(0)
    a = [rng.randrange(Fr.p) for _ in range(8)]
    b = [rng.randrange(Fr.p) for _ in range(8)]
    assert compute_dotproduct(a, b) == sum(x * y for x, y in zip(a, b)) % Fr.p


def test_gaussian_elimination_solves_vandermonde():
    # interpolation system used by UniPoly (reference: unipoly.rs:36-54)
    rng = random.Random(1)
    coeffs = [rng.randrange(Fr.p) for _ in range(4)]

    def evaluate(x):
        acc = 0
        for c in reversed(coeffs):
            acc = (acc * x + c) % Fr.p
        return acc

    rows = [[pow(i, j, Fr.p) for j in range(4)] + [evaluate(i)]
            for i in range(4)]
    assert gaussian_elimination(rows) == coeffs


def test_single_grand_product_circuit():
    import jax.numpy as jnp

    from lasso_tpu.field.jfield import JFr
    from lasso_tpu.subprotocols.grand_product import GrandProductCircuit

    rng = random.Random(2)
    vals = [rng.randrange(Fr.p) for _ in range(8)]
    circ = GrandProductCircuit(JFr.encode_ints(vals))
    expect = 1
    for v in vals:
        expect = expect * v % Fr.p
    assert circ.evaluate() == expect
    assert circ.num_layers == 3
    assert circ.left_vec(0).shape == (4, 16)


def test_msm_chunks_matches_plain():
    from lasso_tpu.curve.host import GENERATOR, msm_host
    from lasso_tpu.curve.jcurve import from_host_points, to_host_point
    from lasso_tpu.field.jfield import JFr
    from lasso_tpu.ops import msm as M

    rng = random.Random(3)
    n = 24
    pts_host = [GENERATOR.mul(i + 1) for i in range(n)]
    scalars = [rng.randrange(1 << 16) for _ in range(n)]
    pts = from_host_points(pts_host)
    sc = JFr.encode_ints(scalars)

    saved = M.MSM_CHUNK
    M.MSM_CHUNK = 8  # force 3 chunks
    try:
        got = to_host_point(M.msm_chunks_device(pts, sc))
    finally:
        M.MSM_CHUNK = saved
    assert got == msm_host(pts_host, scalars)
