"""Groth16 recursion verifier (≙ std/recursion/groth16 verifier tests):
a real inner proof passes the in-circuit verifier; tampered proofs and
wrong public inputs are rejected."""

import random

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import compile_circuit
from gnark_icicle_tpu.frontend.engine import Engine, EngineUnsatisfiedError
from gnark_icicle_tpu.backend import groth16
from gnark_icicle_tpu.std.recursion import Groth16Verifier

from circuits import Cubic

Q = bn254.R
CURVE = bn254.BN254


@pytest.fixture(scope="module")
def inner_proof():
    cs = compile_circuit(Q, Cubic)
    pk, vk = groth16.setup(cs, CURVE, rng=random.Random(2024))
    pub, sec = [35], [3]
    proof = groth16.prove(cs, pk, pub, sec, CURVE, rng=random.Random(7))
    groth16.verify(proof, vk, pub, CURVE)
    return vk, proof, pub


@pytest.mark.slow
def test_recursion_verifies_real_proof(inner_proof):
    vk, proof, pub = inner_proof
    gv = Groth16Verifier(Engine(Q), Q, vk)
    gv.assert_proof(gv.proof_witness(proof), pub)


@pytest.mark.slow
def test_recursion_rejects_wrong_public_input(inner_proof):
    vk, proof, _ = inner_proof
    gv = Groth16Verifier(Engine(Q), Q, vk)
    with pytest.raises(EngineUnsatisfiedError):
        gv.assert_proof(gv.proof_witness(proof), [36])


def test_recursion_rejects_off_curve_point(inner_proof):
    """Fails fast at the G1 on-curve check, before the pairing (a tampered
    but on-curve Ar is rejected by the pairing equality — same slow path as
    the wrong-public-input test above)."""
    vk, proof, pub = inner_proof
    gv = Groth16Verifier(Engine(Q), Q, vk)
    off_curve = gv.proof_witness(proof)
    x = bn254.G1.random_point(random.Random(98))[0]
    off_curve.krs = gv.curve.constant_point((x, x))
    with pytest.raises(EngineUnsatisfiedError):
        gv.assert_proof(off_curve, pub)
