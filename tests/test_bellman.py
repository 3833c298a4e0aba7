"""Cross-implementation compatibility: verify bellman-generated BLS12-381
Groth16 artifacts (≙ reference backend/groth16/bellman_test.go:1-132).

The fixtures are REAL ciphertext — base64 vk/proof/input blobs produced by
bellman (via esuwu/groth16-verifier-bls12381) and embedded in the
reference's test table. They are read out of the reference tree at test
time (same policy as the issue1045 fixtures) and driven through this
repo's own deserializers (io/serialize.py) and verifier: a point-encoding,
marshal-order or pairing bug that gnark's ReadFrom would catch surfaces
here identically.
"""

import base64
import os
import re

import pytest

from gnark_icicle_tpu.curves import bls12_381
from gnark_icicle_tpu.backend import groth16
from gnark_icicle_tpu.backend.groth16.verify import VerificationError
from gnark_icicle_tpu.io.serialize import proof_from_bytes, vk_from_bytes

GO_TEST = "/root/reference/backend/groth16/bellman_test.go"

pytestmark = pytest.mark.skipif(
    not os.path.exists(GO_TEST), reason="reference fixtures unavailable"
)


def _fixtures():
    """Extract the (vk, proof, inputs, ok) table from the Go test source."""
    src = open(GO_TEST).read()
    pat = re.compile(
        r'"([A-Za-z0-9+/=]+)",\s*\n\s*"([A-Za-z0-9+/=]+)",\s*'
        r'"([A-Za-z0-9+/=]*)",\s*\n\s*(true|false),',
        re.S,
    )
    rows = [
        (m.group(1), m.group(2), m.group(3), m.group(4) == "true")
        for m in pat.finditer(src)
    ]
    assert len(rows) >= 10, f"fixture table parse found only {len(rows)} rows"
    return rows


def _load(vk_b64, proof_b64, inputs_b64):
    curve = bls12_381.BLS12_381
    vk, _ = vk_from_bytes(curve, base64.b64decode(vk_b64))
    # bellman proofs carry no commitment section: gnark pads with
    # SizeOfG1AffineUncompressed + 4 zero bytes (nbCommitments=0, PoK=inf)
    proof_bytes = base64.b64decode(proof_b64) + bytes(96 + 4)
    proof, _ = proof_from_bytes(curve, proof_bytes)
    inputs_bytes = base64.b64decode(inputs_b64)
    assert len(inputs_bytes) % 32 == 0
    publics = [
        int.from_bytes(inputs_bytes[i : i + 32], "big")
        for i in range(0, len(inputs_bytes), 32)
    ]
    return vk, proof, publics


def test_bellman_artifacts_parse():
    """Every fixture row deserializes (gnark's require.NoError tier)."""
    for vk_b64, proof_b64, inputs_b64, _ in _fixtures():
        vk, proof, publics = _load(vk_b64, proof_b64, inputs_b64)
        assert proof.ar is not None and proof.bs is not None
        assert len(vk.g1_k) == len(publics) + 1


def test_bellman_proofs_verify():
    """ok=true rows verify; ok=false rows are REJECTED (stronger than the
    reference, which only asserts the positive direction)."""
    curve = bls12_381.BLS12_381
    n_ok = n_bad = 0
    for i, (vk_b64, proof_b64, inputs_b64, ok) in enumerate(_fixtures()):
        vk, proof, publics = _load(vk_b64, proof_b64, inputs_b64)
        if ok:
            groth16.verify(proof, vk, publics, curve)
            n_ok += 1
        else:
            with pytest.raises((VerificationError, ValueError)):
                groth16.verify(proof, vk, publics, curve)
            n_bad += 1
    assert n_ok >= 4 and n_bad >= 4  # the reference table has both kinds
