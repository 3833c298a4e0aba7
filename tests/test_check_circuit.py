"""The CheckCircuit pyramid + fuzz harness over corpus circuits
(≙ test/assert_checkcircuit.go + assert_fuzz.go as user-facing API)."""

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.testing import check_circuit, fuzz_circuit, CheckFailure

from circuits import Cubic, IsZeroCircuit, SelectCircuit, XorCircuit

Q = bn254.R


def test_check_circuit_passes():
    check_circuit(
        Cubic,
        valid=[dict(x=3, y=35)],
        invalid=[dict(x=3, y=36)],
    )


def test_check_circuit_catches_bad_valid():
    with pytest.raises(CheckFailure):
        check_circuit(Cubic, valid=[dict(x=3, y=36)])


def test_check_circuit_catches_bad_invalid():
    with pytest.raises(CheckFailure):
        check_circuit(Cubic, invalid=[dict(x=3, y=35)])


@pytest.mark.slow
def test_check_circuit_prover_tier():
    check_circuit(
        Cubic,
        valid=[dict(x=3, y=35)],
        invalid=[dict(x=0, y=1)],
        prover_checks=True,
        serialization_checks=True,
    )


def test_fuzz_corpus():
    fuzz_circuit(Cubic, ["x", "y"])
    fuzz_circuit(IsZeroCircuit, ["a", "z"])
    fuzz_circuit(SelectCircuit, ["cond", "t", "f", "out"])
    fuzz_circuit(XorCircuit, ["a", "b", "c"])
