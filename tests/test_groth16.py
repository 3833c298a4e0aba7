"""Groth16 end-to-end: compile → setup → prove (device kernels) → verify
(host pairing oracle).

Parity model: the reference's prover_checks tier
(test/assert_checkcircuit.go:103-167 full Setup/Prove/Verify) on the cubic
example (examples/cubic/cubic.go:22-36) — the minimum E2E slice of
SURVEY.md §7 step 5.
"""

import random

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import compile_circuit
from gnark_icicle_tpu.backend import groth16

from circuits import Cubic, IsZeroCircuit, ToFromBinary

Q = bn254.R
CURVE = bn254.BN254


@pytest.fixture(scope="module")
def cubic_setup():
    cs = compile_circuit(Q, Cubic)
    rng = random.Random(2024)
    pk, vk = groth16.setup(cs, CURVE, rng=rng)
    return cs, pk, vk


def test_prove_verify_cubic(cubic_setup):
    cs, pk, vk = cubic_setup
    w = Cubic(x=3, y=35)
    pub, sec = w.witness_values(Q)
    proof = groth16.prove(cs, pk, pub, sec, CURVE, rng=random.Random(7))
    groth16.verify(proof, vk, pub, CURVE)  # raises on failure


def test_wrong_public_input_rejected(cubic_setup):
    cs, pk, vk = cubic_setup
    pub, sec = Cubic(x=3, y=35).witness_values(Q)
    proof = groth16.prove(cs, pk, pub, sec, CURVE, rng=random.Random(8))
    assert not groth16.is_valid(proof, vk, [36], CURVE)


def test_tampered_proof_rejected(cubic_setup):
    cs, pk, vk = cubic_setup
    pub, sec = Cubic(x=3, y=35).witness_values(Q)
    proof = groth16.prove(cs, pk, pub, sec, CURVE, rng=random.Random(9))
    bad = groth16.Proof(
        ar=CURVE.g1.add(proof.ar, CURVE.g1.generator),
        krs=proof.krs,
        bs=proof.bs,
    )
    assert not groth16.is_valid(bad, vk, pub, CURVE)


def test_proof_is_randomized(cubic_setup):
    """Two proofs of the same witness differ (r,s blinding) yet both verify."""
    cs, pk, vk = cubic_setup
    pub, sec = Cubic(x=3, y=35).witness_values(Q)
    p1 = groth16.prove(cs, pk, pub, sec, CURVE, rng=random.Random(10))
    p2 = groth16.prove(cs, pk, pub, sec, CURVE, rng=random.Random(11))
    assert p1.ar != p2.ar
    groth16.verify(p1, vk, pub, CURVE)
    groth16.verify(p2, vk, pub, CURVE)


def test_prove_verify_hint_circuit():
    """A circuit whose solve path runs a hint (IsZero → inv_or_zero)."""
    cs = compile_circuit(Q, IsZeroCircuit)
    rng = random.Random(12)
    pk, vk = groth16.setup(cs, CURVE, rng=rng)
    for a, z in [(0, 1), (5, 0)]:
        pub, sec = IsZeroCircuit(a=a, z=z).witness_values(Q)
        proof = groth16.prove(cs, pk, pub, sec, CURVE, rng=rng)
        groth16.verify(proof, vk, pub, CURVE)


def test_prove_verify_binary_circuit():
    """Larger system (~130 constraints): domain > constraint count padding."""
    cs = compile_circuit(Q, ToFromBinary)
    rng = random.Random(13)
    pk, vk = groth16.setup(cs, CURVE, rng=rng)
    pub, sec = ToFromBinary(a=0xDEADBEEF, a2=0xDEADBEEF).witness_values(Q)
    proof = groth16.prove(cs, pk, pub, sec, CURVE, rng=rng)
    groth16.verify(proof, vk, pub, CURVE)
