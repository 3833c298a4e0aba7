"""Serialization round-trips + first-principles known-answer checks.

Parity model: reference io/roundtrip.go:14 RoundTripCheck applied to
proof/vk/witness (marshal_test.go), plus flag-scheme vectors derived from the
gnark-crypto encoding rules (2-bit MSB flags, big-endian coordinates)."""

import random

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.io import (
    g1_to_bytes, g1_from_bytes, g2_to_bytes, g2_from_bytes,
    proof_to_bytes, proof_from_bytes, vk_to_bytes, vk_from_bytes,
    witness_to_bytes, witness_from_bytes,
)

CURVE = bn254.BN254


def test_g1_generator_known_bytes():
    """G1 generator (1,2): y=2 is lexicographically smallest → flag 0b10,
    so compressed bytes are 0x80 || 31 zero bytes || 0x01."""
    b = g1_to_bytes(CURVE, (1, 2), compressed=True)
    assert len(b) == 32
    assert b[0] == 0x80
    assert b[1:31] == bytes(30)
    assert b[31] == 1


def test_g1_infinity_bytes():
    b = g1_to_bytes(CURVE, None, compressed=True)
    assert b[0] == 0b01 << 6 and b[1:] == bytes(31)
    pt, n = g1_from_bytes(CURVE, b)
    assert pt is None and n == 32
    raw = g1_to_bytes(CURVE, None, compressed=False)
    assert raw == bytes(64)


@pytest.mark.parametrize("compressed", [True, False])
def test_g1_roundtrip(compressed):
    rng = random.Random(3)
    for _ in range(6):
        pt = bn254.G1.random_point(rng)
        data = g1_to_bytes(CURVE, pt, compressed)
        got, n = g1_from_bytes(CURVE, data)
        assert n == len(data)
        assert got == pt


@pytest.mark.parametrize("compressed", [True, False])
def test_g2_roundtrip(compressed):
    rng = random.Random(4)
    for _ in range(4):
        pt = bn254.G2.random_point(rng)
        data = g2_to_bytes(CURVE, pt, compressed)
        got, n = g2_from_bytes(CURVE, data)
        assert n == len(data)
        assert got[0] == pt[0] and got[1] == pt[1]


def test_g2_sizes():
    assert len(g2_to_bytes(CURVE, bn254.G2.generator, True)) == 64
    assert len(g2_to_bytes(CURVE, bn254.G2.generator, False)) == 128


def test_witness_roundtrip():
    pub = [35, 7]
    sec = [3, 12345678901234567890]
    data = witness_to_bytes(CURVE, pub, sec)
    # header: nbPublic=2, nbSecret=2, len=4
    assert data[:12] == (2).to_bytes(4, "big") + (2).to_bytes(4, "big") + (4).to_bytes(4, "big")
    assert len(data) == 12 + 4 * 32
    p2, s2 = witness_from_bytes(CURVE, data)
    assert p2 == pub and s2 == sec


def test_public_only_witness():
    data = witness_to_bytes(CURVE, [35])
    p2, s2 = witness_from_bytes(CURVE, data)
    assert p2 == [35] and s2 == []


def test_proof_vk_roundtrip():
    """Full proof+vk byte round-trip on a real proof."""
    from gnark_icicle_tpu.frontend import compile_circuit
    from gnark_icicle_tpu.backend import groth16
    from circuits import Cubic

    cs = compile_circuit(bn254.R, Cubic)
    rng = random.Random(42)
    pk, vk = groth16.setup(cs, CURVE, rng=rng)
    pub, sec = Cubic(x=3, y=35).witness_values(bn254.R)
    proof = groth16.prove(cs, pk, pub, sec, CURVE, rng=rng)

    for compressed in (True, False):
        pdata = proof_to_bytes(CURVE, proof, compressed)
        p2, consumed = proof_from_bytes(CURVE, pdata)
        assert consumed == len(pdata)
        assert p2.ar == proof.ar and p2.krs == proof.krs and p2.bs == proof.bs

        vdata = vk_to_bytes(CURVE, vk, compressed)
        vk2, consumed = vk_from_bytes(CURVE, vdata)
        assert consumed == len(vdata)
        groth16.verify(p2, vk2, pub, CURVE)
