"""PLONK recursion verifier (≙ std/recursion/plonk verifier tests) +
the Fr-friendly MiMC transcript option it depends on."""

import random

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import compile_circuit
from gnark_icicle_tpu.frontend.engine import Engine, EngineUnsatisfiedError
from gnark_icicle_tpu.backend import plonk
from gnark_icicle_tpu.std.recursion.plonk import PlonkVerifier

from circuits import Cubic

Q = bn254.R
CURVE = bn254.BN254


@pytest.fixture(scope="module")
def inner_proof():
    cs = compile_circuit(Q, Cubic, builder="scs")
    pk, vk = plonk.setup(cs, CURVE, rng=random.Random(1))
    pub, sec = [35], [3]
    proof = plonk.prove(cs, pk, pub, sec, CURVE, rng=random.Random(2),
                        fs_hash="mimc")
    plonk.verify(proof, vk, pub, CURVE, fs_hash="mimc")
    return vk, proof, pub


def test_mimc_transcript_domain_separation(inner_proof):
    """A mimc-hash proof must NOT verify under the sha256 transcript."""
    vk, proof, pub = inner_proof
    assert not plonk.is_valid(proof, vk, pub, CURVE)
    assert plonk.is_valid(proof, vk, pub, CURVE, fs_hash="mimc")


@pytest.mark.slow
def test_plonk_recursion_verifies_real_proof(inner_proof):
    vk, proof, pub = inner_proof
    pv = PlonkVerifier(Engine(Q), Q, vk)
    pv.assert_proof(pv.proof_witness(proof), pub)


def test_plonk_recursion_rejects_wrong_public_input(inner_proof):
    """Fails fast at the native quotient identity — cheap to test."""
    vk, proof, _ = inner_proof
    pv = PlonkVerifier(Engine(Q), Q, vk)
    with pytest.raises(EngineUnsatisfiedError):
        pv.assert_proof(pv.proof_witness(proof), [36])


def test_plonk_recursion_rejects_tampered_eval(inner_proof):
    vk, proof, pub = inner_proof
    pv = PlonkVerifier(Engine(Q), Q, vk)
    bad = pv.proof_witness(proof)
    bad.batch_claimed = list(bad.batch_claimed)
    bad.batch_claimed[1] = (bad.batch_claimed[1] + 1) % Q
    with pytest.raises(EngineUnsatisfiedError):
        pv.assert_proof(bad, pub)


# -- cross-curve: BLS12-381 PLONK proof inside a BN254 circuit ---------------

@pytest.fixture(scope="module")
def inner_proof_381():
    from gnark_icicle_tpu.curves import bls12_381 as b381

    cs = compile_circuit(b381.R, Cubic, builder="scs")
    pk, vk = plonk.setup(cs, b381.BLS12_381, rng=random.Random(3),
                         engine="host")
    pub, sec = [35], [3]
    proof = plonk.prove(cs, pk, pub, sec, b381.BLS12_381,
                        rng=random.Random(4), fs_hash="mimc",
                        engine="host")
    plonk.verify(proof, vk, pub, b381.BLS12_381, fs_hash="mimc")
    return vk, proof, pub


@pytest.mark.slow
def test_cross_curve_plonk_recursion(inner_proof_381):
    """≙ reference std/recursion/plonk over sw_bls12381: the whole
    verifier — MiMC transcript, Lagrange/linearization algebra, KZG
    folds — replays through the EMULATED inner Fr."""
    vk, proof, pub = inner_proof_381
    pv = PlonkVerifier(Engine(Q), Q, vk, curve_id="bls12-381")
    pv.assert_proof(pv.proof_witness(proof), pub)

    pv2 = PlonkVerifier(Engine(Q), Q, vk, curve_id="bls12-381")
    with pytest.raises(EngineUnsatisfiedError):
        pv2.assert_proof(pv2.proof_witness(proof), [36])
