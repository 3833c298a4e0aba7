"""BLS12-381 second-curve instantiation: pairing + Groth16 + PLONK e2e.

Parity model: the reference's per-curve generated backends (SURVEY.md §2.2,
×7 curves); here the backends are curve-generic and BLS12-381 exercises the
24-limb field path, the M-twist pairing, and the 32-two-adicity NTT domain
(BASELINE.md "Second instantiation": PLONK + KZG on BLS12-381)."""

import random

import pytest

from gnark_icicle_tpu.curves import bls12_381 as bls
from gnark_icicle_tpu.curves.pairing import _engine_bls
from gnark_icicle_tpu.curves.tower import Fp12
from gnark_icicle_tpu.frontend import Circuit, Public, Secret, compile_circuit

Q = bls.R
CURVE = bls.BLS12_381


class Cubic381(Circuit):
    x = Secret()
    y = Public()

    def define(self, api):
        x3 = api.mul(self.x, self.x, self.x)
        api.assert_is_equal(self.y, api.add(x3, self.x, 5))


def test_pairing_bilinear():
    eng = _engine_bls()
    rng = random.Random(50)
    a = rng.randrange(1, Q)
    lhs = eng.pair(bls.G1.scalar_mul(bls.G1.generator, a), bls.G2.generator)
    rhs = eng.pair(bls.G1.generator, bls.G2.generator).pow(a)
    assert lhs == rhs
    assert lhs != Fp12.one(bls.TOWER)


@pytest.mark.slow
def test_groth16_bls12_381():
    from gnark_icicle_tpu.backend import groth16

    cs = compile_circuit(Q, Cubic381)
    rng = random.Random(51)
    pk, vk = groth16.setup(cs, CURVE, rng=rng)
    pub, sec = Cubic381(x=3, y=35).witness_values(Q)
    proof = groth16.prove(cs, pk, pub, sec, CURVE, rng=rng)
    groth16.verify(proof, vk, pub, CURVE)
    assert not groth16.is_valid(proof, vk, [36], CURVE)


@pytest.mark.slow
def test_plonk_bls12_381():
    from gnark_icicle_tpu.backend import plonk

    cs = compile_circuit(Q, Cubic381, builder="scs")
    rng = random.Random(52)
    pk, vk = plonk.setup(cs, CURVE, rng=rng)
    pub, sec = Cubic381(x=3, y=35).witness_values(Q)
    proof = plonk.prove(cs, pk, pub, sec, CURVE, rng=rng)
    plonk.verify(proof, vk, pub, CURVE)
    assert not plonk.is_valid(proof, vk, [36], CURVE)
