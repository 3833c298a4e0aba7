"""SCS builder + solver sweep over the same circuit corpus as R1CS.

Parity model: reference integration_test.go sweeps every circuit over both
backends (r1cs and scs builders); engine/solver agreement per
test/assert_checkcircuit.go."""

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import compile_circuit, is_solved
from gnark_icicle_tpu.constraint.scs import solve_scs, SparseUnsatisfiedError

from circuits import corpus

Q = bn254.R
CORPUS = corpus(Q)


@pytest.fixture(scope="module")
def compiled():
    return {
        name: compile_circuit(Q, cls, builder="scs")
        for name, cls, _, _ in CORPUS
    }


@pytest.mark.parametrize("name,cls,valid,invalid", CORPUS,
                         ids=[c[0] for c in CORPUS])
def test_scs_solver_valid(name, cls, valid, invalid, compiled):
    cs = compiled[name]
    for assignment in valid:
        pub, sec = cls(**assignment).witness_values(Q)
        wires, a, b, c = solve_scs(cs, pub, sec)
        assert len(a) == cs.nb_gates


@pytest.mark.parametrize("name,cls,valid,invalid", CORPUS,
                         ids=[c[0] for c in CORPUS])
def test_scs_solver_invalid(name, cls, valid, invalid, compiled):
    cs = compiled[name]
    for assignment in invalid:
        pub, sec = cls(**assignment).witness_values(Q)
        with pytest.raises((SparseUnsatisfiedError, ValueError, ZeroDivisionError)):
            solve_scs(cs, pub, sec)


@pytest.mark.parametrize("name,cls,valid,invalid", CORPUS,
                         ids=[c[0] for c in CORPUS])
def test_scs_engine_agreement(name, cls, valid, invalid, compiled):
    """Engine (arithmetization-independent) and SCS solver agree."""
    cs = compiled[name]
    for assignment in valid:
        circ = cls(**assignment)
        assert is_solved(circ, Q)


def test_scs_gate_counts():
    from circuits import Cubic

    cs = compile_circuit(Q, Cubic, builder="scs")
    # 1 public gate + x², x³, x³+x, (+5 == y): ~5 gates (gnark scs cubic: 5)
    assert 4 <= cs.nb_gates <= 7
    assert cs.nb_public == 1
