"""Fiat-Shamir transcript byte-format tests.

Golden vectors freeze the gnark-crypto fiat-shamir semantics
(challenge_i's digest = SHA-256(name_i ∥ digest_{i-1} ∥ bindings_i), field
value = digest mod r — reference driver backend/plonk/bn254/verify.go:93,
in-circuit mirror std/fiat-shamir/transcript.go:106-160) so gnark proof
fixtures drop in the moment a Go toolchain exists."""

import hashlib

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.backend.transcript import (
    GnarkTranscript, MiMCTranscript, make_transcript, kzg_fold_challenge,
)
from gnark_icicle_tpu.io.serialize import g1_to_bytes

Q = bn254.R
CURVE = bn254.BN254


def test_gnark_transcript_golden_vectors():
    """Frozen digests: gamma binds 32 zero bytes + fr(123); beta binds
    nothing (pure chain); alpha binds fr(7)."""
    ts = GnarkTranscript(Q, [b"gamma", b"beta", b"alpha"])
    ts.bind(b"gamma", bytes(32))
    ts.bind_fr(b"gamma", 123)
    gamma = ts.challenge(b"gamma")
    beta = ts.challenge(b"beta")
    ts.bind_fr(b"alpha", 7)
    alpha = ts.challenge(b"alpha")

    d_gamma = bytes.fromhex(
        "c92a06cd0d88c2652092a0f53cc030a97a17ada2c13797a44c2820fbd5fdd008")
    d_beta = bytes.fromhex(
        "c2ac150d18131a87ea734d828042a5181699727bdda47cbfadee22ffad972f5a")
    d_alpha = bytes.fromhex(
        "bd43c7909a17dad4cc4106e231061d78cb9b5a803fca56d6901fc896f2fef462")
    assert gamma == int.from_bytes(d_gamma, "big") % Q
    assert beta == int.from_bytes(d_beta, "big") % Q
    assert alpha == int.from_bytes(d_alpha, "big") % Q


def test_gnark_transcript_matches_independent_reimplementation():
    """Cross-check against a from-scratch hashlib mirror over random-ish
    bindings (catches drift in either direction)."""
    names = [b"c0", b"c1", b"c2"]
    bindings = {b"c0": [b"abc", (42).to_bytes(32, "big")],
                b"c1": [],
                b"c2": [b"\xff" * 64]}
    ts = GnarkTranscript(Q, names)
    for n in names:
        for b in bindings[n]:
            ts.bind(n, b)
    got = [ts.challenge(n) for n in names]

    prev = b""
    want = []
    for n in names:
        d = hashlib.sha256(n + prev + b"".join(bindings[n])).digest()
        want.append(int.from_bytes(d, "big") % Q)
        prev = d
    assert got == want


def test_gnark_transcript_point_binding_is_uncompressed_marshal():
    """deriveRandomness binds p.RawBytes() — 64-byte uncompressed X‖Y."""
    g = CURVE.g1.generator
    ts = GnarkTranscript(Q, [b"x"])
    ts.bind_point(b"x", CURVE, g)
    raw = g1_to_bytes(CURVE, g, compressed=False)
    assert len(raw) == 64
    assert raw == g[0].to_bytes(32, "big") + g[1].to_bytes(32, "big")
    want = int.from_bytes(hashlib.sha256(b"x" + raw).digest(), "big") % Q
    assert ts.challenge(b"x") == want


def test_gnark_transcript_order_enforced():
    ts = GnarkTranscript(Q, [b"a", b"b"])
    with pytest.raises(ValueError, match="out of order"):
        ts.challenge(b"b")
    ts.challenge(b"a")
    with pytest.raises(ValueError, match="already computed"):
        ts.bind(b"a", b"late")
    # computed challenges are cached
    assert ts.challenge(b"a") == ts.challenge(b"a")


def test_mimc_transcript_same_schedule():
    """The Fr-friendly flavor follows the same schedule: second challenge
    depends on the first even with no own bindings."""
    t1 = MiMCTranscript(Q, [b"g", b"b"])
    t1.bind_fr(b"g", 5)
    g1c = t1.challenge(b"g")
    b1 = t1.challenge(b"b")
    t2 = MiMCTranscript(Q, [b"g", b"b"])
    t2.bind_fr(b"g", 6)
    assert t2.challenge(b"g") != g1c
    assert t2.challenge(b"b") != b1  # chained through the previous digest


def test_kzg_fold_challenge_binds_everything():
    g = CURVE.g1.generator
    base = kzg_fold_challenge("sha256", CURVE, Q, 11, [g], [22], 33)
    assert base != kzg_fold_challenge("sha256", CURVE, Q, 12, [g], [22], 33)
    assert base != kzg_fold_challenge("sha256", CURVE, Q, 11, [g], [23], 33)
    assert base != kzg_fold_challenge("sha256", CURVE, Q, 11, [g], [22], 34)
    g2pt = CURVE.g1.scalar_mul(g, 2)
    assert base != kzg_fold_challenge("sha256", CURVE, Q, 11, [g2pt], [22], 33)


def test_make_transcript_factory():
    assert isinstance(make_transcript(Q, [b"x"]), GnarkTranscript)
    assert isinstance(make_transcript(Q, [b"x"], "mimc"), MiMCTranscript)
    with pytest.raises(ValueError):
        make_transcript(Q, [b"x"], "blake3")


def test_mimc_point_binding_covers_full_coordinates():
    """point_limbs must not truncate >256-bit coordinates: BLS12-381's
    381-bit fp takes 6 limbs; losing the top bits would weaken the
    Fiat-Shamir binding of proof commitments."""
    from gnark_icicle_tpu.backend.transcript import point_limbs
    from gnark_icicle_tpu.curves import bls12_381 as b381
    from gnark_icicle_tpu.curves import bn254

    pt381 = b381.G1.generator
    limbs = point_limbs(b381.BLS12_381, pt381)
    assert len(limbs) == 12  # 6 per coordinate
    x = sum(v << (64 * i) for i, v in enumerate(limbs[:6]))
    assert x == pt381[0]  # reconstructs exactly — nothing dropped

    # BN254 (and the curve=None recursion path) stays at 4 limbs
    assert len(point_limbs(bn254.BN254, bn254.G1.generator)) == 8
    assert len(point_limbs(None, bn254.G1.generator)) == 8
