"""Multi-scalar multiplication on TPU (Pippenger, small-scalar optimized).

Replaces the reference's hand-rolled MSM (reference: src/msm/mod.rs) with a
formulation built for a vector machine rather than scalar cores:

  * unsigned digit decomposition with FAT, EQUALIZED windows (window_plan):
    like the reference's small-scalar optimization, windows cover only the
    actual max scalar bit width (reference: src/msm/mod.rs:96-116), but c is
    pushed as high as the bucket budget allows -- on a vector machine the
    segmented scan's cost is rounds*n where rounds ~ log(n) - c, so fewer,
    fatter windows beat wNAF's halved bucket count (whose nearly-empty
    carry window would drag the vmapped scan to ~log(n) rounds).
  * bucket accumulation WITHOUT scatter-add contention: sort points by
    bucket id (gathered point-major so rows are contiguous 256B reads),
    then a segmented Hillis-Steele scan of curve additions reduces every
    equal-bucket run in parallel; the `while_loop` exits after
    ceil(log2(longest run)) rounds.
  * bucket weighted sum  sum_b b*B_b  as a suffix-scan + tree reduction in
    fixed-shape fori_loops (compile-once).
  * window combine by Horner with c doublings per step.

All windows are processed batched (leading axis), so one jitted kernel per
(n, c, #windows) configuration covers the whole MSM; small MSMs route to
the native host Pippenger (MSM_HOST_MAX).
"""

from __future__ import annotations

import functools
import os
import math

import jax
import jax.numpy as jnp
import numpy as np

from lasso_tpu.curve import host as hostcurve
from lasso_tpu.curve.jcurve import (identity, padd, pdbl, pneg, pselect,
                                    to_host_point, tree_sum)
from lasso_tpu.field.jfield import JFr, W


def _ln_without_floats(n: int) -> int:
    # matches ark's window heuristic: log2(n) * ln(2)
    return int(math.log2(n) * 69 / 100) if n > 1 else 1


def window_size(n: int) -> int:
    if n < 32:
        return 3
    # cap at 16 so a digit never spans more than two 16-bit limbs
    return min(_ln_without_floats(n) + 2, 16)


def window_plan(n: int, max_bits: int) -> tuple[int, int]:
    """(c, num_windows) for the unsigned-digit kernel.

    Maximize c (fewer, fatter windows -> shorter equal-digit runs in the
    segmented scan) subject to the bucket array staying comfortably below n,
    then equalize digit widths across windows so no window's runs dominate
    the vmapped scan."""
    if n < 2:
        return 3, (max_bits + 2) // 3
    c_cap = min(16, max(3, n.bit_length() - 3))
    num_windows = -(-max_bits // c_cap)
    c = -(-max_bits // num_windows)
    return max(c, 3), num_windows


def _extract_digits(scalars, c: int, num_windows: int):
    """Unsigned base-2^c digits of canonical integer limbs [n, W].

    Returns bucket_ids [k, n] int32: digit-1, with sentinel 2^c - 1 for
    digit 0 (bucket array size 2^c: 2^c - 1 real buckets + sentinel).

    Unsigned (no wNAF recentering): signed digits halve the bucket count,
    but the extra carry window they create is nearly empty, and its giant
    equal-digit runs drag the vmapped segmented scan to ~log(n) rounds for
    EVERY window.  With the work-efficient bucket reduction, doubling the
    bucket count costs far less than those extra scan rounds.
    """
    mask = (1 << c) - 1
    raw = []
    for w in range(num_windows):
        off = w * c
        k, sh = off // 16, off % 16
        lo = scalars[:, k].astype(jnp.int32) >> sh
        if k + 1 < W and sh > 0:
            lo = lo | (scalars[:, k + 1].astype(jnp.int32) << (16 - sh))
        raw.append(lo & mask)
    digits = jnp.stack(raw)  # [k, n] in [0, 2^c)
    bucket_ids = jnp.where(digits == 0, mask, digits - 1)
    return bucket_ids.astype(jnp.int32)


def _segmented_sum_sorted(points, ids, num_buckets: int):
    """points [4,W,n] sorted by ids [n]; returns per-bucket sums
    [4,W,num_buckets+1] (last slot is the sentinel bucket, to be dropped)."""
    n = points.shape[-1]
    idx = jnp.arange(n)

    def same_at(x_ids, stride):
        rolled = jnp.roll(x_ids, stride)
        return (idx >= stride) & (rolled == x_ids)

    def cond(state):
        pts, stride = state
        return (stride < n) & jnp.any(same_at(ids, stride))

    def body(state):
        pts, stride = state
        same = same_at(ids, stride)
        rolled = jnp.roll(pts, stride, axis=-1)
        pts = pselect(same, padd(pts, rolled), pts)
        return pts, stride * 2

    pts, _ = jax.lax.while_loop(cond, body, (points, jnp.int32(1)))

    # last element of each run holds the run total
    next_ids = jnp.concatenate([ids[1:], jnp.full((1,), -1, ids.dtype)])
    is_last = ids != next_ids
    scatter_ids = jnp.where(is_last, ids, num_buckets)
    vals = pselect(is_last, pts, identity(n))
    buckets = identity(num_buckets + 1).at[..., scatter_ids].set(vals)
    return buckets


def _halving_tree_sum(points):
    """Sum along the last axis by contiguous halving: [..., m] -> [..., 1].

    Unlike curve.jcurve.tree_sum (fixed-shape fori_loop body, log(m) FULL-m
    rounds -- compile-once but O(m log m) curve-add work), this unrolls
    log(m) shrinking pallas adds: O(m) total work.  The shrinking shapes are
    shared across call sites, so the compile-count cost is one padd program
    per power of two."""
    m = points.shape[-1]
    if m == 0:
        return identity(1, points.shape[:-3])
    pow2 = 1 << (m - 1).bit_length()
    if pow2 != m:
        points = jnp.concatenate(
            [points, identity(pow2 - m, points.shape[:-3])], axis=-1)
        m = pow2
    while m > 1:
        points = padd(points[..., : m // 2], points[..., m // 2:])
        m //= 2
    return points


def _segmented_sum_merge(points, ids, num_buckets: int):
    """Work-efficient segmented reduction of sorted runs (replaces the
    Hillis-Steele scan): pair-merge tree with conflict-free run emission.

    points [4,W,n] sorted by ids [n]; returns per-bucket sums
    [4,W,num_buckets+1] (last slot = sentinel, to be dropped).

    Each tree level merges adjacent blocks, spending ONE curve add per
    merge (the join of L's trailing run with R's leading run) -- n adds
    total versus the scan's rounds*n, and the curve adds are the measured
    bottleneck (~29M adds/s on v5e; the scan's rolls/selects are noise
    next to them).  A run is scatter-emitted into its bucket at the unique
    level where it stops touching a block edge, so the scatter is
    conflict-free by construction (each bucket id is one contiguous run).
    Regrouped addition order changes intermediate projective
    representatives but not the bucket group elements: canonical affine
    outputs (and proof bytes) are identical.
    """
    n = points.shape[-1]
    lead = points.shape[:-3]
    if n == 1:
        return identity(num_buckets + 1, lead).at[..., ids].set(points)
    pow2 = 1 << (n - 1).bit_length()
    if pow2 != n:
        # pad with identity points in the sentinel bucket (stays sorted:
        # the sentinel id is the largest id)
        points = jnp.concatenate(
            [points, identity(pow2 - n, lead)], axis=-1)
        ids = jnp.concatenate(
            [ids, jnp.full(ids.shape[:-1] + (pow2 - n,), num_buckets,
                           ids.dtype)], axis=-1)
        n = pow2
    assert n >= 2
    buckets = identity(num_buckets + 1, lead)

    def halve_pts(x):
        m = x.shape[-1]
        xr = x.reshape(x.shape[:-1] + (m // 2, 2))
        return xr[..., 0], xr[..., 1]

    def halve_flat(x):
        xr = x.reshape(x.shape[:-1] + (x.shape[-1] // 2, 2))
        return xr[..., 0], xr[..., 1]

    pre, suf = points, points
    pre_id, suf_id = ids, ids
    single = jnp.ones(ids.shape, bool)

    m = n
    while m > 1:
        pre_l, pre_r = halve_pts(pre)
        suf_l, suf_r = halve_pts(suf)
        pid_l, pid_r = halve_flat(pre_id)
        sid_l, sid_r = halve_flat(suf_id)
        sg_l, sg_r = halve_flat(single)

        join = sid_l == pid_r
        mid = padd(suf_l, pre_r)  # the ONE curve add of this level

        # L's trailing run completes here unless it reaches L's left edge
        # (then it is the block's pre and survives upward); joined middles
        # complete when interior on both sides
        emit_l = (~sg_l) & (~join | ~sg_r)
        idx_l = jnp.where(emit_l, sid_l, num_buckets)
        buckets = buckets.at[..., idx_l].set(pselect(join, mid, suf_l))
        # R's leading run completes when interior and not joined
        emit_r = (~join) & (~sg_r)
        idx_r = jnp.where(emit_r, pid_r, num_buckets)
        buckets = buckets.at[..., idx_r].set(pre_r)

        pre = pselect(sg_l & join, mid, pre_l)
        suf = pselect(sg_r & join, mid, suf_r)
        pre_id, suf_id = pid_l, sid_r
        single = sg_l & sg_r & join
        m //= 2

    # the last block: leading run always emits; trailing too unless single
    buckets = buckets.at[..., pre_id].set(pre)
    idx = jnp.where(single, num_buckets, suf_id)
    buckets = buckets.at[..., idx].set(suf)
    return buckets


def _bucket_weighted_sum_merge(buckets):
    """sum_b (b+1) * buckets[b] by pair-merge recurrence ([4, W, B]).

    T(X over m buckets) = 2*T(even+odd over m/2) - sum(evens): unrolled,
    ~2B curve adds + log B doublings, versus the suffix scan's B log B.
    """
    b = buckets.shape[-1]
    if b == 1:
        return buckets
    pow2 = 1 << (b - 1).bit_length()
    if pow2 != b:
        # identity-pad at the top: padded slots contribute nothing at any
        # weight
        buckets = jnp.concatenate(
            [buckets, identity(pow2 - b, buckets.shape[:-3])], axis=-1)
    x = buckets
    even_sums = []
    while x.shape[-1] > 1:
        evens, odds = x.reshape(x.shape[:-1] + (x.shape[-1] // 2, 2))[
            ..., 0], x.reshape(x.shape[:-1] + (x.shape[-1] // 2, 2))[..., 1]
        even_sums.append(_halving_tree_sum(evens))
        x = padd(evens, odds)
    acc = x  # width 1: its weight is 1
    for s_even in reversed(even_sums):
        acc = padd(pdbl(acc), pneg(s_even))
    return acc


def _segmented_sum_blocked(points, ids, num_buckets: int, block: int = 64):
    """Work-efficient segmented reduction with a COMPILE-ONCE body.

    points [4,W,n] sorted by ids [n]; returns per-bucket sums
    [4,W,num_buckets+1] (last slot = sentinel, to be dropped).

    The array is viewed as G = n/block chunks of `block` consecutive
    elements.  A fori_loop walks the block axis once with ALL chunks in
    parallel (ONE padd per step at vector width G -> n curve adds total,
    like the pair-merge tree, but in a single fixed-shape loop body
    instead of ~log(n) unrolled shrinking subgraphs -- the merge tree's
    XLA/Mosaic compile blowup is what timed out the round-4 bench):

      * runs strictly INTERIOR to a chunk finish inside the loop and are
        scatter-emitted at the step where their id changes -- conflict-free
        (a bucket is one contiguous run, so it is interior to at most one
        chunk and emitted exactly once);
      * each chunk's LEADING and TRAILING partial runs (the only ones that
        can span chunks) go to a 2G-entry boundary array, still sorted by
        id, which the Hillis-Steele scan oracle reduces in
        ~log(max chunks spanned) cheap rounds.

    A bucket lands in exactly one of the two arrays (interior emissions
    vs boundary runs), so combining them is one exact B-wide padd of
    identity-padded slots.
    """
    n = points.shape[-1]
    if n <= 2 * block:
        return _segmented_sum_sorted(points, ids, num_buckets)
    g = -(-n // block)
    if g * block != n:
        pad = g * block - n
        points = jnp.concatenate([points, identity(pad)], axis=-1)
        ids = jnp.concatenate(
            [ids, jnp.full((pad,), num_buckets, ids.dtype)])
    pts4 = points.reshape(4, W, g, block)
    ids2 = ids.reshape(g, block)

    buckets0 = identity(num_buckets + 1)
    ident_g = identity(g)

    def body(j, carry):
        buckets, acc, acc_id, pre, pre_id, have_pre = carry
        cur = jax.lax.dynamic_index_in_dim(pts4, j, axis=3, keepdims=False)
        cid = jax.lax.dynamic_index_in_dim(ids2, j, axis=1, keepdims=False)
        same = cid == acc_id
        # interior-run emission: id changed and the leading run was already
        # captured -> acc is a completed interior run
        emit = (~same) & have_pre
        eidx = jnp.where(emit, acc_id, num_buckets)
        buckets = buckets.at[..., eidx].set(
            pselect(emit, acc, identity(g)))
        # capture the leading run at its first id change
        newly = (~same) & (~have_pre)
        pre = pselect(newly, acc, pre)
        pre_id = jnp.where(newly, acc_id, pre_id)
        have_pre = have_pre | newly
        acc = pselect(same, padd(acc, cur), cur)
        return buckets, acc, cid, pre, pre_id, have_pre

    acc0 = pts4[..., 0]
    carry = (buckets0, acc0, ids2[:, 0], ident_g,
             jnp.zeros((g,), ids.dtype), jnp.zeros((g,), bool))
    buckets, acc, acc_id, pre, pre_id, have_pre = jax.lax.fori_loop(
        1, block, body, carry)

    # boundary array: per chunk, (leading partial, trailing partial); a
    # single-run chunk contributes (whole sum, identity-with-same-id)
    pre_f = pselect(have_pre, pre, acc)
    pre_id_f = jnp.where(have_pre, pre_id, acc_id)
    suf_f = pselect(have_pre, acc, ident_g)
    suf_id_f = jnp.where(have_pre, acc_id, pre_id_f)
    boundary = jnp.stack([pre_f, suf_f], axis=-1).reshape(4, W, 2 * g)
    bids = jnp.stack([pre_id_f, suf_id_f], axis=-1).reshape(2 * g)
    bbuckets = _segmented_sum_sorted(boundary, bids, num_buckets)
    # disjoint coverage: identity-padded slots make this exact
    return padd(buckets, bbuckets)


def _bucket_weighted_sum_blocked(buckets, block: int = 64):
    """sum_b (b+1) * buckets[b] ([4, W, B]) with a compile-once body.

    View B as G2 chunks of `block`: one reverse fori_loop computes, for
    every chunk in parallel, S_q = sum_r B_{q,r} and
    T_q = sum_r (r+1) B_{q,r} (suffix-accumulate: 2 padds per step).  Then
      total = block * sum_q q*S_q + sum_q T_q
    where sum_q q*S_q = [suffix-scan weighted sum over the G2 chunk sums]
    - sum_q S_q -- both tiny.  ~2B curve adds total versus the suffix
    scan's B*log(B), one fixed-shape loop body.
    """
    b = buckets.shape[-1]
    if b <= 2 * block or (block & (block - 1)):
        return _bucket_weighted_sum(buckets)
    g2 = -(-b // block)
    if g2 * block != b:
        buckets = jnp.concatenate(
            [buckets, identity(g2 * block - b)], axis=-1)
    bk = buckets.reshape(4, W, g2, block)

    def body(i, carry):
        suf, tsum = carry
        j = block - 1 - i
        cur = jax.lax.dynamic_index_in_dim(bk, j, axis=3, keepdims=False)
        suf = padd(suf, cur)
        tsum = padd(tsum, suf)
        return suf, tsum

    suf, tsum = jax.lax.fori_loop(
        0, block, body, (identity(g2), identity(g2)))
    # suf = S (chunk sums), tsum = T (intra-chunk weighted sums)
    w1 = _bucket_weighted_sum(suf)          # sum_q (q+1) S_q, tiny
    s_tot = tree_sum(suf)
    t_tot = tree_sum(tsum)
    qs = padd(w1, pneg(s_tot))              # sum_q q * S_q
    for _ in range(block.bit_length() - 1):  # * block (power of two)
        qs = pdbl(qs)
    return padd(qs, t_tot)


def _bucket_weighted_sum(buckets):
    """sum_b (b+1) * buckets[b] via suffix scan + tree sum ([4, W, B]).

    Hillis-Steele in fixed-shape fori_loops: compile-once.  B*log(B) curve
    adds, but B << n under the fat-window plan so this is a minor cost; a
    work-efficient pair recursion was tried and its ~140 unrolled
    static-shape curve-add subgraphs blew up XLA compile time.
    """
    b = buckets.shape[-1]
    if b == 1:
        return buckets
    idx = jnp.arange(b)
    rounds = (b - 1).bit_length()

    def body(i, x):
        stride = jnp.int32(1) << i
        rolled = jnp.roll(x, -stride, axis=-1)
        valid = idx < (b - stride)
        return pselect(valid, padd(x, rolled), x)

    x = jax.lax.fori_loop(0, rounds, body, buckets)
    # x[i] = sum_{j >= i} buckets[j]; total = sum_i x[i]
    return tree_sum(x)


# Bucket reduction strategy (default picked from round-5 TPU measurement,
# BASELINE.md):
#   "block" -- blocked segmented reduction: ~n curve adds in a compile-once
#       fori_loop body.  31.1M pts/s at 2^20/16-bit on v5e (7.2x "scan").
#   "scan"  -- segmented Hillis-Steele scan (rounds*n adds): 4.33M pts/s;
#       compile-cheap; kept as the parity oracle.
#   "merge" -- work-efficient pair-merge tree: same O(n) adds as "block"
#       but ~log(n) unrolled shrinking-shape curve-add subgraphs; its XLA
#       compile DID NOT FINISH in 60 min at n=2^20 on this backend (the
#       round-4 driver bench timeout).  Kept for the parity tests only.
# Read at import time; tests exercise all implementations directly.
MSM_REDUCE = os.environ.get("LASSO_TPU_MSM_REDUCE", "block")


def _reduce_fns():
    if MSM_REDUCE == "scan":
        return _segmented_sum_sorted, _bucket_weighted_sum
    if MSM_REDUCE == "merge":
        return _segmented_sum_merge, _bucket_weighted_sum_merge
    return _segmented_sum_blocked, _bucket_weighted_sum_blocked


@functools.partial(jax.jit, static_argnames=("c", "num_windows"))
def _msm_kernel(points, scalars, c: int, num_windows: int):
    """points [4,W,n] (extended, Montgomery limbs); scalars [n,W] canonical
    integer limbs. Returns [4,W,1] point."""
    n = points.shape[-1]
    num_buckets = (1 << c) - 1

    bucket_ids = _extract_digits(scalars, c, num_windows)  # [k, n]

    order = jnp.argsort(bucket_ids, axis=1)  # [k, n]
    sorted_ids = jnp.take_along_axis(bucket_ids, order, axis=1)
    # gather in point-major layout ([n, 64] rows are contiguous 256B reads;
    # a gather along the last axis of [4, W, n] would be stride-n columns)
    pts_pm = points.reshape(4 * W, n).T  # [n, 64]
    sorted_pm = jnp.take(pts_pm, order.reshape(-1), axis=0)  # [k*n, 64]
    sorted_pts = jnp.transpose(
        sorted_pm.reshape(num_windows, n, 4 * W), (0, 2, 1)
    ).reshape(num_windows, 4, W, n)

    seg_sum, weighted = _reduce_fns()
    window_sums = jax.vmap(
        lambda p, i: weighted(
            seg_sum(p, i, num_buckets)[..., :num_buckets]
        )
    )(sorted_pts, sorted_ids)  # [k, 4, W, 1]

    # Horner from the top window down: total = ((W_{k-1} * 2^c) + W_{k-2}) ...
    # fori_loops keep the HLO graph small (one pdbl/padd body instead of
    # num_windows * c unrolled doublings)
    def outer(i, total):
        total = jax.lax.fori_loop(0, c, lambda _, t: pdbl(t), total)
        return padd(total, window_sums[num_windows - 2 - i])

    total = window_sums[num_windows - 1]
    if num_windows > 1:
        total = jax.lax.fori_loop(0, num_windows - 1, outer, total)
    return total


# Per-device MSMs at or below this size use the double-and-add kernel: its
# HLO graph is ~3 curve-op bodies (one pdbl + one padd in a fori_loop, plus
# the tree_sum combine) versus the Pippenger kernel's sort/scan pipeline,
# which costs minutes of XLA:CPU compile time on the 1-core virtual-mesh
# host.  At these sizes the serial bit loop is also genuinely competitive:
# the MSM is latency-bound, not throughput-bound.
TINY_MSM_MAX = int(os.environ.get("LASSO_TPU_TINY_MSM_MAX", "8"))


@functools.partial(jax.jit, static_argnames=("num_bits",))
def _msm_tiny_kernel(points, scalars, num_bits: int):
    """MSM by vectorized double-and-add: points [4, W, n], scalars [n, W]
    canonical integer limbs, scanning num_bits bits MSB-first.  Returns
    [4, W, 1].  One pdbl + one masked padd per bit over ALL points in
    parallel, then a tree_sum -- a tiny compile-once graph for the small
    per-device MSMs of the virtual-mesh dry run."""
    n = points.shape[-1]
    # bits_all[b, j] = bit b of scalar j (b < 16*W)
    shifts = jnp.arange(16, dtype=jnp.int32)
    bits = ((scalars[:, :, None].astype(jnp.int32) >> shifts[None, None, :])
            & 1)  # [n, W, 16]
    bits_all = bits.reshape(n, 16 * W).T  # [16*W, n]

    def body(i, acc):
        b = jax.lax.dynamic_index_in_dim(
            bits_all, num_bits - 1 - i, axis=0, keepdims=False)  # [n]
        acc = pdbl(acc)
        return pselect(b.astype(bool), padd(acc, points), acc)

    acc = jax.lax.fori_loop(0, num_bits, body, identity(n))
    return tree_sum(acc)


@functools.partial(jax.jit, static_argnames=("c", "num_windows"))
def predoubled_windows(points, c: int, num_windows: int):
    """[4, W, n] -> [4, W, num_windows*n]: slice w holds 2^(c*w) * P_j.

    One-time per fixed basis (cache the result): folds every window's
    2^(c*w) weight INTO the basis so `_msm_kernel_flat` needs no Horner
    combine at all -- the point is that Horner's ~max_bits sequential
    doublings dominate small-n full-width MSMs on a latency-bound device,
    and for a FIXED basis those doublings can be hoisted out entirely.
    """
    n = points.shape[-1]
    acc0 = jnp.zeros(points.shape[:-1] + (num_windows * n,), points.dtype)

    def body(wd, carry):
        acc, cur = carry
        acc = jax.lax.dynamic_update_slice(acc, cur, (0, 0, wd * n))
        cur = jax.lax.fori_loop(0, c, lambda _, p: pdbl(p), cur)
        return acc, cur

    acc, _ = jax.lax.fori_loop(0, num_windows, body, (acc0, points))
    return acc


@functools.partial(jax.jit, static_argnames=("c", "num_windows"))
def _msm_kernel_flat(pd_points, scalars, c: int, num_windows: int):
    """MSM over PRE-DOUBLED window bases (see predoubled_windows).

    pd_points [4, W, num_windows*n]; scalars [n, W] canonical integer limbs.
    Returns [4, W, 1].

    All windows' (digit, pre-scaled point) pairs form ONE flat bucket
    problem: sort the num_windows*n pairs by digit, segmented-scan the
    equal-digit runs, weighted-sum 2^c buckets -- ~log2(kn) + 2*c serial
    curve ops total versus the ~max_bits Horner doublings of _msm_kernel.
    Built for the latency-bound small-n full-width MSMs inside the fused
    opening-proof program (subprotocols/bullet._device_dppl)."""
    kn = pd_points.shape[-1]
    n = scalars.shape[0]
    assert kn == num_windows * n
    num_buckets = (1 << c) - 1

    bucket_ids = _extract_digits(scalars, c, num_windows).reshape(-1)  # [k*n]
    order = jnp.argsort(bucket_ids)
    sorted_ids = jnp.take(bucket_ids, order)
    pts_pm = pd_points.reshape(4 * W, kn).T  # [k*n, 64] point-major rows
    sorted_pts = jnp.transpose(jnp.take(pts_pm, order, axis=0)).reshape(
        4, W, kn)
    seg_sum, weighted = _reduce_fns()
    buckets = seg_sum(sorted_pts, sorted_ids, num_buckets)[..., :num_buckets]
    return weighted(buckets)


_msm_kernel_flat_batch = jax.jit(
    jax.vmap(_msm_kernel_flat, in_axes=(None, 0, None, None)),
    static_argnames=("c", "num_windows"))


def _bits_of_col_max(col_max: np.ndarray) -> int:
    val = 0
    for i, limb in enumerate(col_max):
        if limb:
            val = max(val, 16 * i + int(limb).bit_length())
    return max(val, 1)


def max_scalar_bits(scalar_int_limbs) -> int:
    """Exact max bit-width across scalars (one tiny device->host pull).

    Uses per-limb column maxima: the max scalar bit width equals
    max_j (16*j + bitlen(max of column j)) since bitlen is monotone.
    """
    return _bits_of_col_max(np.asarray(jnp.max(scalar_int_limbs, axis=0)))


# MSMs below this size run on host (Python Pippenger): they are latency
# bound -- a kernel launch (let alone a fresh XLA compile for a new shape)
# costs more than the arithmetic.  The Bullet reduction's tail rounds and
# verifier-side recombinations all land here; throughput MSMs stay on device.
MSM_HOST_MAX = int(os.environ.get("LASSO_TPU_MSM_HOST_MAX", "256"))

# Verifier C_LZ row combinations (poly/hyrax.py) are transcript-blocking, so
# each one routed to the device costs a full tunnel round trip mid-verify.
# The native host Pippenger does 8k points in ~150-300 ms single-core, which
# beats the measured per-dispatch latency at every benchmarked shape
# (s <= 2^24 => row extent <= 2^13).
VERIFY_CLZ_HOST_MAX = int(
    os.environ.get("LASSO_TPU_VERIFY_CLZ_HOST_MAX", "8192"))


def msm_device(points, scalars_mont, modulus_bits: int = 253,
               full_width: bool = False):
    """MSM with reference window policy. `scalars_mont`: [n,W] Montgomery Fr.

    `full_width=True` skips the small-scalar width scan (one device->host
    sync) for callers whose scalars are known to be ~field-sized (bullet
    folds, blinded vectors) -- the scan only pays off for genuinely small
    scalars (indices/counters/table values).

    Returns a device point [4, W].
    """
    n = points.shape[-1]
    assert scalars_mont.shape[0] == n
    if n == 0:
        return identity(1)
    if n <= MSM_HOST_MAX:
        from lasso_tpu.curve.jcurve import from_host_points, to_host_points
        host_pts = to_host_points(points)
        host_scalars = JFr.decode(scalars_mont)
        res = hostcurve.msm_host(host_pts, host_scalars)
        return from_host_points([res])
    scalars_int = JFr.to_int_limbs(scalars_mont)
    max_bits = modulus_bits if full_width else max_scalar_bits(scalars_int)
    if max_bits > 60:
        max_bits = modulus_bits
    c, num_windows = window_plan(n, max_bits)
    return _msm_kernel(points, scalars_int, c=c, num_windows=num_windows)


MSM_CHUNK = 1 << 20


def msm_chunks_device(points, scalars_mont, modulus_bits: int = 253):
    """Streaming MSM for huge inputs (reference: msm_chunks,
    src/msm/mod.rs:56-87): process 2^20-point chunks through the kernel and
    tree-combine the partial results, bounding the working set."""
    n = points.shape[-1]
    if n <= MSM_CHUNK:
        return msm_device(points, scalars_mont, modulus_bits)
    partials = []
    for start in range(0, n, MSM_CHUNK):
        stop = min(start + MSM_CHUNK, n)
        partials.append(msm_device(
            points[..., start:stop], scalars_mont[start:stop], modulus_bits))
    from lasso_tpu.curve.jcurve import tree_sum

    return tree_sum(jnp.concatenate(partials, axis=-1))


def msm(points, scalars_mont) -> hostcurve.Point:
    """Device MSM returning a host Point."""
    return to_host_point(msm_chunks_device(points, scalars_mont))


_msm_kernel_rows = jax.jit(
    jax.vmap(_msm_kernel, in_axes=(None, 0, None, None)),
    static_argnames=("c", "num_windows"))


@jax.jit
def _row_chunk_int_limbs(rows_mont):
    """[r, n, W] Montgomery -> canonical integer limbs, one fused program."""
    r, n, _ = rows_mont.shape
    return JFr.to_int_limbs(rows_mont.reshape(r * n, W)).reshape(r, n, W)


# Column cap for the batched row-MSM kernel: wider matrices split into
# column chunks whose per-row partial points are tree-added.  Pippenger is
# additive over input partitions (exact curve adds), so results are
# identical -- but every Hyrax commit at every s now reuses the SAME
# compiled <=2^12-column kernels.  The unbounded-width kernel at the
# s=2^24 halo2 shape (8192 columns) OOM-killed the remote XLA compile
# helper; capping the program size fixes the compile and keeps the cache
# warm across the whole bench grid.
MSM_BATCH_COL_MAX = int(os.environ.get("LASSO_TPU_MSM_BATCH_COLS",
                                       str(1 << 12)))


def msm_batch_device(points, scalars_mont_rows, modulus_bits: int = 253,
                     row_chunk: int = 128):
    """Many MSMs sharing one basis (the Hyrax row-commit shape).

    points: [4, W, n]; scalars_mont_rows: [rows, n, W] Montgomery Fr.
    Returns [rows, 4, W, 1].  Rows are vmapped into one kernel; large row
    counts are chunked to bound the gather working set.
    """
    rows, n, _ = scalars_mont_rows.shape
    if n == 0 or rows == 0:
        return identity(1, (rows,))
    if n > MSM_BATCH_COL_MAX:
        # chunk unconditionally (Pippenger is additive over any column
        # partition); the ragged tail chunk just compiles one extra width
        partials = [
            msm_batch_device(
                points[..., start:start + MSM_BATCH_COL_MAX],
                scalars_mont_rows[:, start:start + MSM_BATCH_COL_MAX],
                modulus_bits, row_chunk)
            for start in range(0, n, MSM_BATCH_COL_MAX)
        ]
        # [rows, 4, W, k] -> tree of padds -> [rows, 4, W, 1]
        stacked = jnp.concatenate(
            [p.reshape(rows, 4, W, -1) for p in partials], axis=-1)
        return tree_sum(stacked)
    if rows * n <= 4 * MSM_HOST_MAX:
        from lasso_tpu.curve.jcurve import from_host_points, to_host_points
        host_pts = to_host_points(points)
        flat = JFr.decode(scalars_mont_rows.reshape(rows * n, W))
        res = [hostcurve.msm_host(host_pts, flat[i * n:(i + 1) * n])
               for i in range(rows)]
        # [rows, 4, W, 1] to match the device branch
        return jnp.moveaxis(from_host_points(res), -1, 0)[..., None]

    # canonical-limb conversion runs PER ROW CHUNK: a whole-matrix
    # to_int_limbs copy costs as much HBM as the polynomial itself at
    # 2^24-element scale.  The width scan accumulates per-limb column maxima
    # on device across chunks and syncs once.
    col_max = None
    for start in range(0, rows, row_chunk):
        ints = _row_chunk_int_limbs(scalars_mont_rows[start: start + row_chunk])
        cm = jnp.max(ints.reshape(-1, W), axis=0)
        col_max = cm if col_max is None else jnp.maximum(col_max, cm)
    max_bits = _bits_of_col_max(np.asarray(col_max))
    if max_bits > 60:
        max_bits = modulus_bits
    c, num_windows = window_plan(n, max_bits)

    outs = []
    for start in range(0, rows, row_chunk):
        chunk = _row_chunk_int_limbs(scalars_mont_rows[start: start + row_chunk])
        outs.append(_msm_kernel_rows(points, chunk, c, num_windows))
    return jnp.concatenate(outs, axis=0)
