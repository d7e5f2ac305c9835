"""Sharded primitives vs single-chip kernels on the 8-device CPU mesh."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lasso_tpu.field.host import Fr
from lasso_tpu.field.jfield import JFr, W
from lasso_tpu.parallel import ops as pops
from lasso_tpu.parallel.mesh import make_mesh


def _rand_scalars(n, seed=0):
    rng = random.Random(seed)
    return [rng.randrange(Fr.p) for _ in range(n)]


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices("cpu")) < 8:
        pytest.skip("needs 8 virtual CPU devices (see conftest)")
    return make_mesh(8, platform="cpu")


def test_sharded_sum(mesh):
    vals = _rand_scalars(64, 1)
    x = JFr.encode_ints(vals)
    got = JFr.decode(pops.sharded_sum(mesh, x)[None])[0]
    assert got == sum(vals) % Fr.p


def test_sharded_dot(mesh):
    a = _rand_scalars(64, 2)
    b = _rand_scalars(64, 3)
    got = JFr.decode(pops.sharded_dot(
        mesh, JFr.encode_ints(a), JFr.encode_ints(b))[None])[0]
    assert got == sum(x * y for x, y in zip(a, b)) % Fr.p


def test_cyclic_permute_roundtrip():
    x = jnp.arange(32).reshape(32, 1)
    y = pops.cyclic_permute(x, 8)
    assert list(np.asarray(y[:4, 0])) == [0, 8, 16, 24]
    z = pops.cyclic_unpermute(y, 8)
    assert (np.asarray(z) == np.asarray(x)).all()


def test_sharded_round_evals_and_bind(mesh):
    from lasso_tpu.subprotocols.sumcheck import _bind_top, _round_evals

    n, alpha = 64, 2
    rows = [_rand_scalars(n, 10 + i) for i in range(alpha)]
    zs_host = jnp.stack([JFr.encode_ints(r) for r in rows])

    def comb(z):
        return JFr.mul(z[0], z[1])

    # cyclic layout: permute axis 1
    zs_cyc = jnp.stack([pops.cyclic_permute(zs_host[i], 8)
                        for i in range(alpha)])

    want = JFr.decode(_round_evals(zs_host, comb, 2))
    got = JFr.decode(pops.sharded_round_evals(mesh, zs_cyc, comb, 2))
    assert got == want

    r = JFr.encode_scalar(_rand_scalars(1, 99)[0])
    bound_ref = _bind_top(zs_host, r)  # [alpha, n/2, W]
    bound_shard = pops.sharded_bind_top(mesh, zs_cyc, r)
    # sharded result is in cyclic layout of the halved cube
    back = jnp.stack([pops.cyclic_unpermute(bound_shard[i], 8)
                      for i in range(alpha)])
    assert JFr.decode(back.reshape(-1, W)) == JFr.decode(
        bound_ref.reshape(-1, W))


def test_sharded_eq_table(mesh):
    from lasso_tpu.poly.dense import eq_evals_host

    r = _rand_scalars(6, 20)  # 64-entry table over 8 devices
    want = eq_evals_host(r)
    r_hi = JFr.encode_ints(r[:3])
    r_lo = JFr.encode_ints(r[3:])
    got_cyc = pops.sharded_eq_table(mesh, r_hi, r_lo)
    got = JFr.decode(pops.cyclic_unpermute(got_cyc, 8))
    assert got == want


def test_sharded_msm(mesh):
    from lasso_tpu.curve.host import GENERATOR, msm_host
    from lasso_tpu.curve.jcurve import from_host_points, to_host_point

    n = 32
    pts_host = [GENERATOR.mul(i + 1) for i in range(n)]
    rng = random.Random(30)
    scalars = [rng.randrange(1 << 16) for _ in range(n)]
    pts = from_host_points(pts_host)
    got = to_host_point(
        pops.sharded_msm(mesh, pts, JFr.encode_ints(scalars)))
    assert got == msm_host(pts_host, scalars)


def test_sharded_grand_product_layer(mesh):
    vals = [_rand_scalars(16, 40 + i) for i in range(3)]
    x_host = jnp.stack([JFr.encode_ints(v) for v in vals])
    x_cyc = jnp.stack([pops.cyclic_permute(x_host[i], 8) for i in range(3)])
    out = pops.sharded_grand_product_layer(mesh, x_cyc)
    back = jnp.stack([pops.cyclic_unpermute(out[i], 8) for i in range(3)])
    for i, v in enumerate(vals):
        expect = [(v[j] * v[j + 8]) % Fr.p for j in range(8)]
        assert JFr.decode(back[i]) == expect
