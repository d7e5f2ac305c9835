"""On-device merlin/STROBE Fiat-Shamir transcript.

The prover's per-round transcript interactions (absorb round-polynomial
coefficients, squeeze a challenge) normally force a device->host round trip
per sumcheck round -- ~300 tunnel RTTs per proof on this setup.  This module
runs the transcript ON the TPU, byte-exactly:

  * keccak-f[1600] as 25 (lo, hi) uint32 lane pairs, a fori_loop over the
    24 rounds of pure vector ops;
  * STROBE-128 with the state as a [200] uint32 byte tensor.  All sponge
    CONTROL FLOW (positions, flag bytes, when the permutation runs) depends
    only on statically-known byte counts, so it is Python bookkeeping at
    trace time; only the VALUES of appended scalars are traced.  Consecutive
    static bytes (labels, framing) fold into one constant-mask XOR.

A sumcheck round's transcript program is identical across rounds (each round
ends in a PRF, which deterministically resets the sponge position), which is
what lets the whole sumcheck run inside a single jitted fori_loop
(subprotocols/sumcheck.py device path).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from lasso_tpu.transcript.strobe import (FLAG_A, FLAG_C, FLAG_I, FLAG_K,
                                         FLAG_M, STROBE_R)

_RC = np.array([
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
    0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
    0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
    0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
    0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
], dtype=np.uint64)
_RC_LO = jnp.asarray((_RC & 0xFFFFFFFF).astype(np.uint32))
_RC_HI = jnp.asarray((_RC >> 32).astype(np.uint32))

# rho rotation offsets, indexed by flat lane l = x + 5*y
_ROT_XY = np.array([
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
])
_ROT_FLAT = np.array([_ROT_XY[l % 5][l // 5] for l in range(25)]) % 64

# pi: dest_flat[(2x+3y)%5 * 5 ... ] -- B[y][(2x+3y)%5] = rot(A[x][y])
# flat index l = x + 5*y ; dest lane l' = y + 5*((2x + 3y) % 5)
_PI_SRC = np.zeros(25, dtype=np.int32)  # src[l'] = l
for _x in range(5):
    for _y in range(5):
        _l = _x + 5 * _y
        _lp = _y + 5 * ((2 * _x + 3 * _y) % 5)
        _PI_SRC[_lp] = _l
_PI_SRC_J = jnp.asarray(_PI_SRC)


def _rot64(lo, hi, n: np.ndarray):
    """Rotate 25 (lo, hi) lanes left by constant per-lane amounts n."""
    n = n % 64
    swap = (n >= 32)
    a = np.where(swap, n - 32, n).astype(np.uint32)  # 0..31
    l1 = jnp.where(jnp.asarray(swap), hi, lo)
    h1 = jnp.where(jnp.asarray(swap), lo, hi)
    a_j = jnp.asarray(a)
    # a == 0 lanes: pure (possibly swapped) copy; avoid >>32 UB with where
    nz = jnp.asarray(a != 0)
    lo_r = jnp.where(nz, (l1 << a_j) | (h1 >> (32 - a_j)), l1)
    hi_r = jnp.where(nz, (h1 << a_j) | (l1 >> (32 - a_j)), h1)
    return lo_r, hi_r


def keccak_f1600_device(lo, hi):
    """lo, hi: [25] uint32 lane halves (lane l = x + 5y). One permutation."""

    def round_body(rnd, state):
        lo, hi = state
        a_lo = lo.reshape(5, 5)  # [y][x]
        a_hi = hi.reshape(5, 5)
        # theta: c[x] = xor over y
        c_lo = a_lo[0] ^ a_lo[1] ^ a_lo[2] ^ a_lo[3] ^ a_lo[4]  # [x]
        c_hi = a_hi[0] ^ a_hi[1] ^ a_hi[2] ^ a_hi[3] ^ a_hi[4]
        c1_lo = jnp.roll(c_lo, -1)  # c[x+1]
        c1_hi = jnp.roll(c_hi, -1)
        rot1_lo = (c1_lo << 1) | (c1_hi >> 31)
        rot1_hi = (c1_hi << 1) | (c1_lo >> 31)
        d_lo = jnp.roll(c_lo, 1) ^ rot1_lo  # c[x-1] ^ rol(c[x+1], 1)
        d_hi = jnp.roll(c_hi, 1) ^ rot1_hi
        lo = (a_lo ^ d_lo[None, :]).reshape(25)
        hi = (a_hi ^ d_hi[None, :]).reshape(25)
        # rho
        lo, hi = _rot64(lo, hi, _ROT_FLAT)
        # pi
        lo = jnp.take(lo, _PI_SRC_J)
        hi = jnp.take(hi, _PI_SRC_J)
        # chi: A[x][y] = B[x][y] ^ (~B[x+1][y] & B[x+2][y]); flat l = x + 5y
        b_lo = lo.reshape(5, 5)  # [y][x]
        b_hi = hi.reshape(5, 5)
        lo = (b_lo ^ (~jnp.roll(b_lo, -1, axis=1) & jnp.roll(b_lo, -2, axis=1))
              ).reshape(25)
        hi = (b_hi ^ (~jnp.roll(b_hi, -1, axis=1) & jnp.roll(b_hi, -2, axis=1))
              ).reshape(25)
        # iota
        lo = lo.at[0].set(lo[0] ^ jnp.take(_RC_LO, rnd))
        hi = hi.at[0].set(hi[0] ^ jnp.take(_RC_HI, rnd))
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, 24, round_body, (lo, hi))
    return lo, hi


def _bytes_to_lanes(state_bytes):
    """[200] uint32 byte tensor -> ([25] lo, [25] hi) uint32 lanes."""
    b = state_bytes.reshape(25, 8)
    lo = (b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24))
    hi = (b[:, 4] | (b[:, 5] << 8) | (b[:, 6] << 16) | (b[:, 7] << 24))
    return lo, hi


def _lanes_to_bytes(lo, hi):
    parts = [(lo >> (8 * i)) & 0xFF for i in range(4)] + \
            [(hi >> (8 * i)) & 0xFF for i in range(4)]
    return jnp.stack(parts, axis=1).reshape(200)


def keccak_f1600_state(state_bytes):
    lo, hi = _bytes_to_lanes(state_bytes)
    lo, hi = keccak_f1600_device(lo, hi)
    return _lanes_to_bytes(lo, hi)


class DeviceStrobe:
    """STROBE-128 with a traced [200]-byte device state.

    Positions/flags are static Python ints (they depend only on byte
    COUNTS); consecutive static bytes batch into one constant XOR.  Mirrors
    transcript/strobe.py operation for operation.
    """

    def __init__(self, state, pos: int, pos_begin: int, cur_flags: int):
        self.state = state  # [200] uint32 (bytes)
        self.pos = pos
        self.pos_begin = pos_begin
        self.cur_flags = cur_flags
        self._static_acc = np.zeros(200, dtype=np.uint32)
        self._static_dirty = False

    # -- static-byte batching ------------------------------------------------
    def _flush_static(self):
        if self._static_dirty:
            self.state = self.state ^ jnp.asarray(self._static_acc)
            self._static_acc = np.zeros(200, dtype=np.uint32)
            self._static_dirty = False

    def _run_f(self):
        self._static_acc[self.pos] ^= self.pos_begin
        self._static_acc[self.pos + 1] ^= 0x04
        self._static_acc[STROBE_R + 1] ^= 0x80
        self._static_dirty = True
        self._flush_static()
        self.state = keccak_f1600_state(self.state)
        self.pos = 0
        self.pos_begin = 0

    def _absorb_static(self, data: bytes):
        for byte in data:
            self._static_acc[self.pos] ^= byte
            self._static_dirty = True
            self.pos += 1
            if self.pos == STROBE_R:
                self._run_f()

    def _absorb_dynamic(self, byte_vec):
        """byte_vec: [k] uint32 traced bytes."""
        k = int(byte_vec.shape[0])
        off = 0
        while k > 0:
            take = min(k, STROBE_R - self.pos)
            self._flush_static()
            chunk = byte_vec[off: off + take]
            self.state = self.state.at[self.pos: self.pos + take].set(
                self.state[self.pos: self.pos + take] ^ chunk)
            self.pos += take
            off += take
            k -= take
            if self.pos == STROBE_R:
                self._run_f()

    def _squeeze(self, n: int):
        out = []
        while n > 0:
            take = min(n, STROBE_R - self.pos)
            self._flush_static()
            out.append(self.state[self.pos: self.pos + take])
            self.state = self.state.at[self.pos: self.pos + take].set(
                jnp.zeros((take,), jnp.uint32))
            self.pos += take
            n -= take
            if self.pos == STROBE_R:
                self._run_f()
        return jnp.concatenate(out) if len(out) > 1 else out[0]

    def _begin_op(self, flags: int, more: bool):
        if more:
            assert flags == self.cur_flags
            return
        old_begin = self.pos_begin
        self.pos_begin = self.pos + 1
        self.cur_flags = flags
        self._absorb_static(bytes([old_begin, flags]))
        if flags & (FLAG_C | FLAG_K) and self.pos != 0:
            self._run_f()

    # -- merlin subset --------------------------------------------------------
    def meta_ad_static(self, data: bytes, more: bool):
        self._begin_op(FLAG_M | FLAG_A, more)
        self._absorb_static(data)

    def ad_static(self, data: bytes, more: bool):
        self._begin_op(FLAG_A, more)
        self._absorb_static(data)

    def ad_dynamic(self, byte_vec, more: bool):
        self._begin_op(FLAG_A, more)
        self._absorb_dynamic(byte_vec)

    def prf(self, n: int, more: bool = False):
        self._begin_op(FLAG_I | FLAG_A | FLAG_C, more)
        return self._squeeze(n)


def _u32_le(n: int) -> bytes:
    return int(n).to_bytes(4, "little")


class DeviceTranscript:
    """merlin framing + the Lasso byte conventions, on device.

    Mirrors transcript/proof_transcript.ProofTranscript for the subset the
    sumcheck provers need: scalar appends and scalar challenges.  Scalars in
    and out are [W] Montgomery limb tensors.
    """

    def __init__(self, strobe: DeviceStrobe):
        self.s = strobe

    @staticmethod
    def from_host(transcript) -> "DeviceTranscript":
        """Snapshot a host ProofTranscript's strobe state onto the device."""
        st = transcript.t.strobe
        state = jnp.asarray(np.frombuffer(bytes(st.state), dtype=np.uint8)
                            .astype(np.uint32))
        return DeviceTranscript(
            DeviceStrobe(state, st.pos, st.pos_begin, st.cur_flags))

    def state_tuple(self):
        """(state bytes [200] u32,) + static bookkeeping for loop carries."""
        self.s._flush_static()
        return self.s.state

    def restore_to_host(self, transcript, state_value: np.ndarray) -> None:
        """Write a (materialized) device transcript state back into a host
        ProofTranscript; static bookkeeping comes from the traced object."""
        st = transcript.t.strobe
        st.state = bytearray(int(x) & 0xFF for x in state_value)
        st.pos = self.s.pos
        st.pos_begin = self.s.pos_begin
        st.cur_flags = self.s.cur_flags

    # -- merlin framing -------------------------------------------------------
    def append_message_static(self, label: bytes, message: bytes) -> None:
        self.s.meta_ad_static(label, False)
        self.s.meta_ad_static(_u32_le(len(message)), True)
        self.s.ad_static(message, False)

    def append_message_dynamic(self, label: bytes, byte_vec) -> None:
        """Traced message bytes ([k] uint32) under a static label/length."""
        self.s.meta_ad_static(label, False)
        self.s.meta_ad_static(_u32_le(int(byte_vec.shape[0])), True)
        self.s.ad_dynamic(byte_vec, False)

    def append_point_bytes(self, label: bytes, compressed32) -> None:
        """Mirror of host append_point for a device-compressed point
        ([32] uint32 bytes from curve.jcurve.compress_points_device)."""
        self.append_message_dynamic(label, compressed32)

    def append_scalar(self, label: bytes, scalar_mont) -> None:
        """scalar_mont: [W] Montgomery limbs -> canonical 32-byte LE append."""
        from lasso_tpu.field.jfield import JFr

        canonical = JFr.mul(scalar_mont[None], jnp.asarray(JFr.one_limbs)[None])[0]
        lo = canonical & 0xFF
        hi = canonical >> 8
        byte_vec = jnp.stack([lo, hi], axis=1).reshape(32)
        self.s.meta_ad_static(label, False)
        self.s.meta_ad_static(_u32_le(32), True)
        self.s.ad_dynamic(byte_vec, False)

    def append_scalars(self, label: bytes, scalars_mont) -> None:
        """Vector append with the host append_scalars framing
        (begin/end markers + one message per scalar); scalars_mont: [k, W]
        Montgomery limbs, canonicalized in one batched multiply."""
        from lasso_tpu.field.jfield import JFr

        k = int(scalars_mont.shape[0])
        canonical = JFr.mul(scalars_mont,
                            jnp.asarray(JFr.one_limbs)[None])  # [k, W]
        lo = canonical & 0xFF
        hi = canonical >> 8
        byte_rows = jnp.stack([lo, hi], axis=2).reshape(k, 32)
        self.append_message_static(label, b"begin_append_vector")
        for i in range(k):
            self.s.meta_ad_static(label, False)
            self.s.meta_ad_static(_u32_le(32), True)
            self.s.ad_dynamic(byte_rows[i], False)
        self.append_message_static(label, b"end_append_vector")

    def challenge_scalar(self, label: bytes):
        """64-byte PRF reduced mod Fr -> [W] Montgomery limbs."""
        from lasso_tpu.field.jfield import JFr, W

        self.s.meta_ad_static(label, False)
        self.s.meta_ad_static(_u32_le(64), True)
        raw = self.s.prf(64)  # [64] uint32 bytes, little-endian value
        limbs = (raw[0::2] | (raw[1::2] << 8))  # [32] 16-bit limbs
        lo = limbs[:W]
        hi = limbs[W:]
        r2 = jnp.asarray(JFr.r2_limbs)
        r3 = jnp.asarray(JFr.r3_limbs)
        # v = lo + hi * 2^256; Montgomery encode:
        # mont_mul(lo, R2) = lo * R;  mont_mul(hi, R3) = hi * 2^256 * R
        enc = JFr.add(JFr.mul(lo[None], r2[None]), JFr.mul(hi[None], r3[None]))
        return enc[0]
