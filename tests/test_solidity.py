"""Solidity export smoke tests (≙ backend/groth16/bn254 ExportSolidity; the
reference's full EVM execution check shells out to external tooling we don't
have — structural checks here, like its unit tier)."""

import random

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import compile_circuit
from gnark_icicle_tpu.backend import groth16
from gnark_icicle_tpu.backend.solidity import export_solidity

from circuits import Cubic


@pytest.fixture(scope="module")
def vk():
    cs = compile_circuit(bn254.R, Cubic)
    _, vk = groth16.setup(cs, bn254.BN254, rng=random.Random(60))
    return vk


def test_export_contains_vk_constants(vk):
    src = export_solidity(vk, bn254.BN254)
    assert "pragma solidity" in src
    assert str(vk.g1_alpha[0]) in src
    assert str(vk.g2_beta[0].c1) in src  # Fp2 imaginary-first ABI order
    assert f"uint256[{vk.nb_public - 1}] calldata input" in src
    assert src.count("K_X") >= 2


def test_export_rejects_non_evm_curve(vk):
    from gnark_icicle_tpu.curves import bls12_381

    with pytest.raises(ValueError):
        export_solidity(vk, bls12_381.BLS12_381)


def test_dummy_setup_shapes():
    from gnark_icicle_tpu.backend.groth16.setup import dummy_setup

    cs = compile_circuit(bn254.R, Cubic)
    pk = dummy_setup(cs, bn254.BN254)
    assert len(pk.g1_a) == cs.nb_wires
    assert len(pk.g1_z) == (1 << pk.domain_log_n)
