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
    # host engine: tiny proofs with no device warmup (engine=host is
    # itself e2e-validated; device proving is covered by the main suites)
    pk, vk = groth16.setup(cs, CURVE, rng=random.Random(2024),
                           engine="host")
    pub, sec = [35], [3]
    proof = groth16.prove(cs, pk, pub, sec, CURVE, rng=random.Random(7),
                          engine="host")
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


# -- cross-curve: BLS12-381 proof inside a BN254 circuit ---------------------

@pytest.fixture(scope="module")
def inner_proof_381():
    from gnark_icicle_tpu.curves import bls12_381 as b381

    cs = compile_circuit(b381.R, Cubic)
    pk, vk = groth16.setup(cs, b381.BLS12_381, rng=random.Random(2025),
                           engine="host")
    pub, sec = [35], [3]
    proof = groth16.prove(cs, pk, pub, sec, b381.BLS12_381,
                          rng=random.Random(8), engine="host")
    groth16.verify(proof, vk, pub, b381.BLS12_381)
    return vk, proof, pub


@pytest.mark.slow
def test_cross_curve_recursion_bls381_in_bn254(inner_proof_381):
    """≙ reference std/recursion/groth16 with sw_bls12381: the inner
    curve's Fr is emulated, G1 membership needs the cofactor ladder."""
    from gnark_icicle_tpu.curves import bls12_381 as b381

    vk, proof, pub = inner_proof_381
    gv = Groth16Verifier(Engine(Q), Q, vk, curve_id="bls12-381")
    gv.assert_proof(gv.proof_witness(proof), pub)

    # wrong public input must fail
    gv2 = Groth16Verifier(Engine(Q), Q, vk, curve_id="bls12-381")
    with pytest.raises(EngineUnsatisfiedError):
        gv2.assert_proof(gv2.proof_witness(proof), [36])


@pytest.mark.slow
def test_cross_curve_recursion_rejects_non_subgroup_g1(inner_proof_381):
    """BLS12-381 G1 cofactor > 1: an on-curve point outside the order-r
    subgroup must fail the [r−1]P == −P ladder."""
    from gnark_icicle_tpu.curves import bls12_381 as b381

    vk, proof, pub = inner_proof_381
    rng = random.Random(99)
    # random x-lift WITHOUT cofactor clearing: w.h.p. full-order point
    while True:
        x = rng.randrange(b381.P)
        rhs = (pow(x, 3, b381.P) + 4) % b381.P
        y = pow(rhs, (b381.P + 1) // 4, b381.P)
        if (y * y) % b381.P != rhs:
            continue
        if not b381.G1.in_subgroup((x, y)):
            break
    gv = Groth16Verifier(Engine(Q), Q, vk, curve_id="bls12-381")
    bad = gv.proof_witness(proof)
    bad.ar = gv.curve.constant_point((x, y))
    with pytest.raises(EngineUnsatisfiedError):
        gv.assert_proof(bad, pub)


# -- wrap: BW6-761 proof inside a BN254 circuit (2-chain final stage) --------

@pytest.fixture(scope="module")
def inner_proof_bw6():
    from gnark_icicle_tpu.curves import bw6_761 as bw6

    cs = compile_circuit(bw6.R, Cubic)
    pk, vk = groth16.setup(cs, bw6.BW6_761, rng=random.Random(2027),
                           engine="host")
    pub, sec = [35], [3]
    proof = groth16.prove(cs, pk, pub, sec, bw6.BW6_761,
                          rng=random.Random(9), engine="host")
    groth16.verify(proof, vk, pub, bw6.BW6_761)
    return vk, proof, pub


@pytest.mark.slow
def test_wrap_recursion_bw6_in_bn254(inner_proof_bw6):
    """≙ reference std/recursion/groth16 over sw_bw6761: the final wrap
    of the 2-chain — a BW6-761 proof (itself capable of attesting a
    BLS12-377 verification) checked inside a BN254 circuit. G2 is an Fp
    point (sextic twist, k=6) and both G1 and G2 need cofactor ladders."""
    vk, proof, pub = inner_proof_bw6
    gv = Groth16Verifier(Engine(Q), Q, vk, curve_id="bw6-761")
    gv.assert_proof(gv.proof_witness(proof), pub)

    gv2 = Groth16Verifier(Engine(Q), Q, vk, curve_id="bw6-761")
    with pytest.raises(EngineUnsatisfiedError):
        gv2.assert_proof(gv2.proof_witness(proof), [36])
