"""PLONK proof/vk serialization + JSON witness round-trips."""

import random

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import compile_circuit
from gnark_icicle_tpu.backend import plonk
from gnark_icicle_tpu.io.plonk_serialize import (
    plonk_proof_to_bytes, plonk_proof_from_bytes,
    plonk_vk_to_bytes, plonk_vk_from_bytes,
)
from gnark_icicle_tpu.io.serialize import witness_to_json, witness_from_json

from circuits import Cubic

Q = bn254.R
CURVE = bn254.BN254


@pytest.mark.slow
def test_plonk_proof_vk_roundtrip():
    cs = compile_circuit(Q, Cubic, builder="scs")
    rng = random.Random(95)
    pk, vk = plonk.setup(cs, CURVE, rng=rng)
    pub, sec = Cubic(x=3, y=35).witness_values(Q)
    proof = plonk.prove(cs, pk, pub, sec, CURVE, rng=rng)

    for compressed in (True, False):
        pdata = plonk_proof_to_bytes(CURVE, proof, compressed)
        p2, n = plonk_proof_from_bytes(CURVE, pdata)
        assert n == len(pdata)
        assert p2.batch_claimed == proof.batch_claimed
        assert p2.h_coms == proof.h_coms

        vdata = plonk_vk_to_bytes(CURVE, vk, compressed)
        vk2, n = plonk_vk_from_bytes(CURVE, vdata)
        assert n == len(vdata)
        plonk.verify(p2, vk2, pub, CURVE)


def test_witness_json_roundtrip():
    cs = compile_circuit(Q, Cubic)
    pub, sec = Cubic(x=3, y=35).witness_values(Q)
    text = witness_to_json(cs, pub, sec)
    assert '"y"' in text and '"x"' in text
    p2, s2 = witness_from_json(text)
    assert p2 == pub and s2 == sec
