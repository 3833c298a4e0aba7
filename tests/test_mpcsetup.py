"""MPC trusted-setup ceremony tests (≙ mpcsetup/*_test.go: full phase1 →
phase2 → prove/verify round with multiple contributors)."""

import random

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import compile_circuit
from gnark_icicle_tpu.backend import groth16
from gnark_icicle_tpu.backend.groth16.mpcsetup import Phase1, Phase2

from circuits import Cubic

Q = bn254.R
CURVE = bn254.BN254


@pytest.mark.slow
def test_full_ceremony_produces_working_key():
    cs = compile_circuit(Q, Cubic)
    n = 4  # next pow2 ≥ 3 constraints
    rng = random.Random(90)

    p1 = Phase1.init(CURVE, n)
    for _ in range(3):  # three contributors
        p1.contribute(rng=rng)
    p1.verify()

    p2 = Phase2.init(p1, cs)
    for _ in range(2):
        p2.contribute(rng=rng)
    p2.verify()
    pk, vk = p2.finalize()

    pub, sec = Cubic(x=3, y=35).witness_values(Q)
    proof = groth16.prove(cs, pk, pub, sec, CURVE, rng=rng)
    groth16.verify(proof, vk, pub, CURVE)
    assert not groth16.is_valid(proof, vk, [36], CURVE)


def test_phase1_verify_catches_tamper():
    rng = random.Random(91)
    p1 = Phase1.init(CURVE, 4)
    p1.contribute(rng=rng)
    p1.verify()
    # corrupt one ladder point
    p1.tau_g1[2] = CURVE.g1.add(p1.tau_g1[2], CURVE.g1.generator)
    with pytest.raises(ValueError):
        p1.verify()


def test_phase1_initial_state_is_generators():
    p1 = Phase1.init(CURVE, 4)
    assert p1.tau_g1[0] == CURVE.g1.generator
    assert p1.tau_g1[5] == CURVE.g1.generator
    assert len(p1.tau_g1) == 7
    p1.verify()  # trivially consistent
