"""Tests for the host crypto core: keccak, STROBE/merlin, ChaCha RNGs,
field/curve reference, and ark-serialize encodings."""

import hashlib

from lasso_tpu.curve.host import GENERATOR, Point, msm_host, rand_point
from lasso_tpu.field import constants as K
from lasso_tpu.field.host import Fp, Fr
from lasso_tpu.poly.commitments import MultiCommitGens
from lasso_tpu.transcript.merlin import Transcript
from lasso_tpu.transcript.proof_transcript import ProofTranscript
from lasso_tpu.utils import keccak
from lasso_tpu.utils.chacha import ChaChaRng, chacha_block
from lasso_tpu.utils.chacha import test_rng as ark_test_rng
from lasso_tpu.utils.fixtures import gen_indices, gen_random_point


# ---------------------------------------------------------------------------
# keccak
# ---------------------------------------------------------------------------

def test_sha3_matches_hashlib():
    for msg in [b"", b"abc", b"x" * 135, b"y" * 136, b"z" * 500]:
        assert keccak.sha3_256(msg) == hashlib.sha3_256(msg).digest()


def test_shake256_matches_hashlib():
    for msg in [b"", b"abc", b"q" * 300]:
        h = hashlib.shake_256()
        h.update(msg)
        assert keccak.shake256(msg, 64) == h.digest(64)


# ---------------------------------------------------------------------------
# ChaCha
# ---------------------------------------------------------------------------

def test_chacha20_zero_key_keystream():
    # RFC-known zero-key/zero-nonce ChaCha20 keystream block 0
    words = chacha_block([0] * 8, 0, [0, 0], 20)
    stream = b"".join(w.to_bytes(4, "little") for w in words)
    expected = bytes.fromhex(
        "76b8e0ada0f13d90405d6ae55386bd28"
        "bdd219b8a08ded1aa836efcc8b770dc7"
        "da41597c5157488d7724e03fb8d84a37"
        "6a43b8f41518a11cc387b669b2ee6586"
    )
    assert stream == expected


def test_chacha_rng_u64_straddles_block():
    rng = ChaChaRng.chacha20(bytes(32))
    # consume 63 u32s, leaving one word in the 64-word buffer
    first_words = [rng.next_u32() for _ in range(63)]
    v = rng.next_u64()
    # low half must be the last word of the first buffer
    rng2 = ChaChaRng.chacha20(bytes(32))
    all_words = [rng2.next_u32() for _ in range(65)]
    assert first_words == all_words[:63]
    assert v & 0xFFFFFFFF == all_words[63]
    assert v >> 32 == all_words[64]


# ---------------------------------------------------------------------------
# merlin transcript
# ---------------------------------------------------------------------------

def test_merlin_known_vector():
    # Known vector from the merlin crate docs: protocol "test protocol",
    # one message, one 32-byte challenge.
    t = Transcript(b"test protocol")
    t.append_message(b"some label", b"some data")
    challenge = t.challenge_bytes(b"challenge", 32)
    assert challenge.hex() == (
        "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"
    )


def test_transcript_determinism_and_sensitivity():
    t1 = ProofTranscript(b"example")
    t2 = ProofTranscript(b"example")
    t1.append_scalar(b"x", 12345)
    t2.append_scalar(b"x", 12345)
    assert t1.challenge_scalar(b"c") == t2.challenge_scalar(b"c")

    t3 = ProofTranscript(b"example")
    t3.append_scalar(b"x", 12346)
    assert t3.challenge_scalar(b"c") != t1.challenge_scalar(b"c")


# ---------------------------------------------------------------------------
# field + curve
# ---------------------------------------------------------------------------

def test_curve_constants():
    assert Fp.legendre(K.CURVE_A) == 1  # a is a QR => complete addition law
    assert Fp.legendre(K.CURVE_D) == Fp.p - 1  # d is a non-QR
    assert GENERATOR.is_on_curve()
    # generator has prime order ell
    assert GENERATOR.mul(Fr.p).is_identity()
    assert not GENERATOR.mul(Fr.p // 2).is_identity()


def test_group_law():
    g2 = GENERATOR.add(GENERATOR)
    assert g2 == GENERATOR.double()
    assert g2.is_on_curve()
    # complete law: adding identity works through the same formula
    assert GENERATOR.add(Point.identity()) == GENERATOR
    assert GENERATOR.add(GENERATOR.neg()).is_identity()
    # associativity spot check
    g3a = g2.add(GENERATOR)
    g3b = GENERATOR.add(g2)
    assert g3a == g3b
    assert GENERATOR.mul(3) == g3a


def test_point_serialization_roundtrip():
    rng = ark_test_rng()
    for _ in range(8):
        p = rand_point(rng)
        assert p.is_on_curve()
        data = p.to_compressed_bytes()
        assert len(data) == 32
        q = Point.from_compressed_bytes(data)
        assert p == q
    # identity round-trips
    assert Point.from_compressed_bytes(Point.identity().to_compressed_bytes()).is_identity()


def test_field_rand_in_range():
    rng = ark_test_rng()
    vals = [Fr.rand(rng) for _ in range(16)]
    assert all(0 <= v < Fr.p for v in vals)
    assert len(set(vals)) == 16


def test_fixtures_deterministic():
    a = gen_indices(8, 16, 4)
    b = gen_indices(8, 16, 4)
    assert a == b
    assert all(len(row) == 4 and all(v < 16 for v in row) for row in a)
    ra = gen_random_point(5)
    rb = gen_random_point(5)
    assert ra == rb


def test_msm_host():
    pts = [GENERATOR.mul(i + 1) for i in range(5)]
    scalars = [3, 0, 7, 1, 2]
    expected = GENERATOR.mul(sum((i + 1) * s for i, s in enumerate(scalars)))
    assert msm_host(pts, scalars) == expected


def test_pedersen_gens():
    gens = MultiCommitGens.new(3, b"test-gens")
    assert len(gens.G) == 3 and gens.n == 3
    for g in gens.G + [gens.h]:
        assert g.is_on_curve()
        assert g.mul(Fr.p).is_identity()  # in the prime-order subgroup
    # determinism
    gens2 = MultiCommitGens.new(3, b"test-gens")
    assert gens.G == gens2.G and gens.h == gens2.h
    # label sensitivity
    gens3 = MultiCommitGens.new(3, b"other")
    assert gens.G != gens3.G
