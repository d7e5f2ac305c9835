"""Device curve ops and Pippenger MSM vs the host oracle."""

import random

import jax.numpy as jnp

from lasso_tpu.curve.host import GENERATOR, Point, msm_host, rand_point
from lasso_tpu.curve import jcurve
from lasso_tpu.field.host import Fr
from lasso_tpu.field.jfield import JFr
from lasso_tpu.ops import msm as jmsm
from lasso_tpu.utils.chacha import test_rng as ark_test_rng


def _rand_points(n, rng=None):
    rng = rng or ark_test_rng()
    return [rand_point(rng) for _ in range(n)]


def test_device_add_double_matches_host():
    pts = _rand_points(6)
    dev = jcurve.from_host_points(pts)
    # pairwise adds
    got = jcurve.to_host_points(jcurve.padd(dev[..., 0::2], dev[..., 1::2]))
    expected = [pts[i].add(pts[i + 1]) for i in range(0, 6, 2)]
    assert got == expected
    # doubling
    got2 = jcurve.to_host_points(jcurve.pdbl(dev))
    assert got2 == [p.double() for p in pts]
    # unified add handles doubling and identity
    got3 = jcurve.to_host_points(jcurve.padd(dev, dev))
    assert got3 == [p.double() for p in pts]
    ident = jcurve.identity(6)
    got4 = jcurve.to_host_points(jcurve.padd(dev, ident))
    assert got4 == pts
    # negation
    got5 = jcurve.to_host_points(jcurve.padd(dev, jcurve.pneg(dev)))
    assert all(p.is_identity() for p in got5)


def test_tree_sum():
    pts = _rand_points(7)
    dev = jcurve.from_host_points(pts)
    total = jcurve.to_host_point(jcurve.tree_sum(dev))
    expected = Point.identity()
    for p in pts:
        expected = expected.add(p)
    assert total == expected


def _check_msm(n, scalars, seed=0, monkeypatch=None):
    pts = _rand_points(n)
    dev_pts = jcurve.from_host_points(pts)
    dev_scalars = JFr.encode_ints(scalars)
    # force the DEVICE kernel (otherwise small sizes route to the host
    # Pippenger and the test compares host against host)
    saved = jmsm.MSM_HOST_MAX
    jmsm.MSM_HOST_MAX = 0
    try:
        got = jmsm.msm(dev_pts, dev_scalars)
    finally:
        jmsm.MSM_HOST_MAX = saved
    expected = msm_host(pts, scalars)
    assert got == expected, f"MSM mismatch n={n}"


def test_msm_host_pippenger_vs_naive():
    from lasso_tpu.curve.host import msm_host_naive
    rng = random.Random(11)
    pts = _rand_points(9)
    scalars = [rng.randrange(Fr.p) for _ in range(9)]
    scalars[0] = 0
    assert msm_host(pts, scalars) == msm_host_naive(pts, scalars)


def test_msm_small_scalars():
    rng = random.Random(7)
    n = 64
    scalars = [rng.randrange(0, 1 << 16) for _ in range(n)]
    scalars[0] = 0
    scalars[1] = 1
    _check_msm(n, scalars)


def test_msm_tiny():
    _check_msm(1, [5])
    _check_msm(2, [0, 0])
    _check_msm(4, [1, 1, 1, 1])


def test_msm_full_width_scalars():
    rng = random.Random(8)
    n = 33  # force c = ln path
    scalars = [rng.randrange(Fr.p) for _ in range(n)]
    _check_msm(n, scalars)


def test_msm_duplicate_buckets():
    # all scalars equal: one giant bucket run exercises the segmented scan
    n = 32
    scalars = [7] * n
    _check_msm(n, scalars)


def test_msm_medium_mixed():
    rng = random.Random(9)
    n = 128
    scalars = [rng.randrange(0, 1 << 20) for _ in range(n)]
    for i in range(0, n, 5):
        scalars[i] = 0
    _check_msm(n, scalars)


def test_msm_batch_column_chunked_matches_unchunked(monkeypatch):
    """Column-chunked batched row MSM (partial-point tree add) must equal the
    single-kernel result exactly (Pippenger is additive over partitions)."""
    import numpy as np

    import lasso_tpu.ops.msm as msm_mod
    from lasso_tpu.curve.host import GENERATOR
    from lasso_tpu.curve.jcurve import from_host_points, to_host_points
    from lasso_tpu.field.jfield import JFr

    n, rows = 32, 3
    pts = from_host_points([GENERATOR.mul(i + 1) for i in range(n)])
    rng = np.random.default_rng(9)
    sc = JFr.encode_u64_array(
        rng.integers(0, 1 << 20, size=(rows, n)).astype(np.uint64))

    # keep everything on the device kernel path (no host fallback)
    monkeypatch.setattr(msm_mod, "MSM_HOST_MAX", 0)
    base = msm_mod.msm_batch_device(pts, sc)
    monkeypatch.setattr(msm_mod, "MSM_BATCH_COL_MAX", 8)
    chunked = msm_mod.msm_batch_device(pts, sc)

    import jax.numpy as jnp
    a = to_host_points(jnp.moveaxis(base[..., 0], 0, -1))
    b = to_host_points(jnp.moveaxis(chunked[..., 0], 0, -1))
    assert a == b


def test_segmented_merge_matches_scan():
    """The work-efficient pair-merge bucket reduction must produce the same
    bucket group elements as the Hillis-Steele scan oracle (regrouped
    addition: same group elements, different projective representatives)."""
    rng = random.Random(21)
    for n, nb in [(16, 4), (32, 8), (33, 8), (64, 5)]:
        ids_list = sorted(rng.randrange(nb + 1) for _ in range(n))
        pts = _rand_points(n)
        dev = jcurve.from_host_points(pts)
        ids = jnp.asarray(ids_list, dtype=jnp.int32)
        a = jmsm._segmented_sum_sorted(dev, ids, nb)[..., :nb]
        b = jmsm._segmented_sum_merge(dev, ids, nb)[..., :nb]
        assert jcurve.to_host_points(a) == jcurve.to_host_points(b), (n, nb)


def test_weighted_sum_merge_matches_suffix():
    rng = random.Random(22)
    for nb in (1, 4, 7, 8, 13):
        pts = _rand_points(nb)
        dev = jcurve.from_host_points(pts)
        a = jcurve.to_host_point(jmsm._bucket_weighted_sum(dev))
        b = jcurve.to_host_point(jmsm._bucket_weighted_sum_merge(dev))
        assert a == b, nb


def test_segmented_merge_matches_scan_large():
    """Merge-vs-scan parity at n=4096 with many buckets (VERDICT r4 item 1):
    long runs, empty buckets, and runs spanning many merge-tree blocks all
    occur at this shape.  Points are a tiled distinct-64 set (bucket
    reduction is insensitive to point distinctness)."""
    rng = random.Random(31)
    n, nb = 4096, 512
    base = jcurve.from_host_points(_rand_points(64))
    dev = jnp.tile(base, (1, 1, n // 64))
    # skewed id distribution: a few giant runs + many short/empty buckets
    ids_list = sorted(
        rng.randrange(8) if rng.random() < 0.3 else rng.randrange(nb + 1)
        for _ in range(n))
    ids = jnp.asarray(ids_list, dtype=jnp.int32)
    a = jmsm._segmented_sum_sorted(dev, ids, nb)[..., :nb]
    b = jmsm._segmented_sum_merge(dev, ids, nb)[..., :nb]
    assert jcurve.to_host_points(a) == jcurve.to_host_points(b)


def test_weighted_sum_merge_matches_suffix_large():
    rng = random.Random(32)
    nb = 128
    base = jcurve.from_host_points(_rand_points(32))
    dev = jnp.tile(base, (1, 1, nb // 32))
    a = jcurve.to_host_point(jmsm._bucket_weighted_sum(dev))
    b = jcurve.to_host_point(jmsm._bucket_weighted_sum_merge(dev))
    assert a == b


def test_segmented_blocked_matches_scan():
    """Compile-once blocked segmented reduction vs the scan oracle: interior
    emissions, chunk-spanning runs, single-run chunks, ragged n."""
    rng = random.Random(41)
    base = jcurve.from_host_points(_rand_points(64))
    for n, nb, blk in [(512, 64, 16), (520, 64, 16), (512, 500, 16),
                       (96, 8, 16), (4096, 512, 64)]:
        reps = -(-n // 64)
        dev = jnp.tile(base, (1, 1, reps))[..., :n]
        ids_list = sorted(
            rng.randrange(8) if rng.random() < 0.3 else rng.randrange(nb + 1)
            for _ in range(n))
        ids = jnp.asarray(ids_list, dtype=jnp.int32)
        a = jmsm._segmented_sum_sorted(dev, ids, nb)[..., :nb]
        b = jmsm._segmented_sum_blocked(dev, ids, nb, block=blk)[..., :nb]
        assert jcurve.to_host_points(a) == jcurve.to_host_points(b), (n, nb)


def test_weighted_sum_blocked_matches_suffix():
    base = jcurve.from_host_points(_rand_points(64))
    for nb, blk in [(256, 16), (300, 16), (64, 8)]:
        reps = -(-nb // 64)
        dev = jnp.tile(base, (1, 1, reps))[..., :nb]
        x = jcurve.to_host_point(jmsm._bucket_weighted_sum(dev))
        y = jcurve.to_host_point(
            jmsm._bucket_weighted_sum_blocked(dev, block=blk))
        assert x == y, nb
