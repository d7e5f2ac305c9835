"""Native (C++) host crypto core vs the pure-Python oracles.

The native library (native/host_crypto.cpp via ctypes) must be bit-exact
with the Python implementations it replaces on the hot host paths:
keccak-f[1600], ChaCha blocks, curve scalar mul, bullet folds, and the host
Pippenger MSM.
"""

import random

import pytest

from lasso_tpu import native
from lasso_tpu.curve.host import GENERATOR, Point, msm_host_naive
from lasso_tpu.field.host import Fr
from lasso_tpu.utils import keccak as pykeccak
from lasso_tpu.utils.chacha import chacha_block

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built")


def _py_keccak(state: bytearray) -> None:
    # call the pure-python implementation directly (bypass native routing)
    saved = pykeccak._NATIVE
    pykeccak._NATIVE = False
    try:
        pykeccak.keccak_f1600(state)
    finally:
        pykeccak._NATIVE = saved


def test_keccak_parity():
    st_native = bytearray(range(200))
    st_py = bytearray(range(200))
    assert native.keccak_f1600(st_native)
    _py_keccak(st_py)
    assert st_native == st_py


def test_chacha_parity():
    import lasso_tpu.utils.chacha as pc

    key = [i * 0x01010101 for i in range(8)]
    saved = pc._NATIVE
    pc._NATIVE = False
    try:
        for ctr in (0, 1, 2**33, 2**63):
            for rounds in (8, 12, 20):
                py = pc.chacha_block(key, ctr, [7, 9], rounds)
                nat = native.chacha_block(key, ctr, [7, 9], rounds)
                assert py == nat
    finally:
        pc._NATIVE = saved


def test_point_mul_parity():
    rng = random.Random(3)
    base = GENERATOR.mul(12345)
    # python double-and-add oracle
    for k in [0, 1, 2, Fr.p - 1, rng.randrange(Fr.p)]:
        acc, b, kk = Point.identity(), base, k
        while kk:
            if kk & 1:
                acc = acc.add(b)
            b = b.double()
            kk >>= 1
        assert native.point_mul(base, k) == acc


def test_msm_parity_vs_naive():
    rng = random.Random(4)
    n = 50
    pts = [GENERATOR.mul(i + 1) for i in range(n)]
    scalars = [rng.randrange(Fr.p) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = 1
    assert native.msm(pts, scalars) == msm_host_naive(pts, scalars)


def test_fold_parity():
    rng = random.Random(5)
    g = [GENERATOR.mul(i + 3) for i in range(8)]
    u = rng.randrange(Fr.p)
    u_inv = Fr.inv(u)
    want = [g[i].mul(u_inv).add(g[4 + i].mul(u)) for i in range(4)]
    assert native.fold_points(g, u, u_inv) == want
