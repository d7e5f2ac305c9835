"""Device limb-field arithmetic vs the exact host oracle."""

import random

import numpy as np

from lasso_tpu.field.host import Fp, Fr
from lasso_tpu.field.jfield import JFp, JFr, unpack_ints


def _rand_elems(field, n, seed):
    rng = random.Random(seed)
    return [rng.randrange(field.p) for _ in range(n)]


def _check_field(jf, hf, seed):
    n = 64
    a_int = _rand_elems(hf, n, seed)
    b_int = _rand_elems(hf, n, seed + 1)
    # include edge cases
    a_int[0] = 0
    b_int[0] = 0
    a_int[1] = hf.p - 1
    b_int[1] = hf.p - 1
    a_int[2] = 1
    b_int[2] = hf.p - 1

    a = jf.encode_ints(a_int)
    b = jf.encode_ints(b_int)

    got_add = jf.decode(jf.add(a, b))
    got_sub = jf.decode(jf.sub(a, b))
    got_mul = jf.decode(jf.mul(a, b))
    got_neg = jf.decode(jf.neg(a))
    for i in range(n):
        assert got_add[i] == hf.add(a_int[i], b_int[i]), f"add {i}"
        assert got_sub[i] == hf.sub(a_int[i], b_int[i]), f"sub {i}"
        assert got_mul[i] == hf.mul(a_int[i], b_int[i]), f"mul {i}"
        assert got_neg[i] == hf.neg(a_int[i]), f"neg {i}"

    # reduction
    s = jf.decode([jf.sum(a)])[0] if False else jf.decode(jf.sum(a)[None])[0]
    assert s == sum(a_int) % hf.p

    # encode/decode roundtrip
    assert jf.decode(a) == [x % hf.p for x in a_int]


def test_jfr_matches_host():
    _check_field(JFr, Fr, seed=1)


def test_jfp_matches_host():
    _check_field(JFp, Fp, seed=2)


def test_encode_u64():
    vals = np.array([0, 1, 2, 12345, 2**63 + 17, 2**64 - 1], dtype=np.uint64)
    enc = JFr.encode_u64_array(vals)
    assert JFr.decode(enc) == [int(v) % Fr.p for v in vals]


def test_scalar_broadcast_mul():
    a_int = _rand_elems(Fr, 8, seed=3)
    r_int = 987654321987654321
    a = JFr.encode_ints(a_int)
    r = JFr.encode_scalar(r_int)
    got = JFr.decode(JFr.mul(a, r))
    assert got == [Fr.mul(x, r_int) for x in a_int]
    got2 = JFr.decode(JFr.add(a, r))
    assert got2 == [Fr.add(x, r_int) for x in a_int]


def test_to_int_limbs():
    a_int = _rand_elems(Fr, 4, seed=4)
    a = JFr.encode_ints(a_int)
    ints = unpack_ints(JFr.to_int_limbs(a))
    assert ints == a_int


def test_sum_non_pow2():
    a_int = _rand_elems(Fr, 13, seed=5)
    a = JFr.encode_ints(a_int)
    s = JFr.decode(JFr.sum(a)[None])[0]
    assert s == sum(a_int) % Fr.p


def test_mul_stress_random_shapes():
    rng = random.Random(42)
    for n in (1, 2, 3, 127):
        a_int = [rng.randrange(Fr.p) for _ in range(n)]
        b_int = [rng.randrange(Fr.p) for _ in range(n)]
        got = JFr.decode(JFr.mul(JFr.encode_ints(a_int), JFr.encode_ints(b_int)))
        assert got == [Fr.mul(x, y) for x, y in zip(a_int, b_int)]
