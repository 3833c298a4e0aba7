"""Frontend + solver integration sweep over the circuit corpus.

Parity model: reference integration_test.go:28-69 (corpus sweep) plus the
CheckCircuit pyramid's engine/solver tiers (test/assert_checkcircuit.go:32):
for every circuit × assignment we check the big.Int engine and the compiled
R1CS solver agree on valid AND invalid witnesses.
"""

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import compile_circuit, is_solved
from gnark_icicle_tpu.constraint import solve, is_satisfied, UnsatisfiedConstraintError

from circuits import corpus

Q = bn254.R
CORPUS = corpus(Q)


@pytest.fixture(scope="module")
def compiled():
    return {name: compile_circuit(Q, cls) for name, cls, _, _ in CORPUS}


@pytest.mark.parametrize("name,cls,valid,invalid", CORPUS,
                         ids=[c[0] for c in CORPUS])
def test_engine_valid(name, cls, valid, invalid):
    for assignment in valid:
        assert is_solved(cls(**assignment), Q), f"{name}: engine rejects {assignment}"


@pytest.mark.parametrize("name,cls,valid,invalid", CORPUS,
                         ids=[c[0] for c in CORPUS])
def test_engine_invalid(name, cls, valid, invalid):
    for assignment in invalid:
        assert not is_solved(cls(**assignment), Q), (
            f"{name}: engine accepts bad witness {assignment}"
        )


@pytest.mark.parametrize("name,cls,valid,invalid", CORPUS,
                         ids=[c[0] for c in CORPUS])
def test_solver_valid(name, cls, valid, invalid, compiled):
    cs = compiled[name]
    for assignment in valid:
        pub, sec = cls(**assignment).witness_values(Q)
        res = solve(cs, pub, sec)
        assert len(res.a) == cs.nb_constraints


@pytest.mark.parametrize("name,cls,valid,invalid", CORPUS,
                         ids=[c[0] for c in CORPUS])
def test_solver_invalid(name, cls, valid, invalid, compiled):
    cs = compiled[name]
    for assignment in invalid:
        pub, sec = cls(**assignment).witness_values(Q)
        assert not is_satisfied(cs, pub, sec), (
            f"{name}: solver accepts bad witness {assignment}"
        )


def test_compile_deterministic():
    """Compiling twice yields identical systems (≙ test/assert.go:128-158)."""
    from circuits import Cubic

    cs1 = compile_circuit(Q, Cubic)
    cs2 = compile_circuit(Q, Cubic)
    assert cs1.term_coeff == cs2.term_coeff
    assert cs1.term_wire == cs2.term_wire
    assert cs1.l_off == cs2.l_off
    assert cs1.coeffs == cs2.coeffs


def test_cubic_shape():
    from circuits import Cubic

    cs = compile_circuit(Q, Cubic)
    # x*x, x²*x, (y) == (x³+x+5): 3 constraints like gnark's R1CS
    assert cs.nb_constraints == 3
    assert cs.nb_public == 2  # ONE + y
    assert cs.nb_secret == 1


def test_solver_error_reports_constraint():
    from circuits import Cubic

    cs = compile_circuit(Q, Cubic)
    with pytest.raises(UnsatisfiedConstraintError):
        solve(cs, [36], [3])


def test_fuzz_engine_vs_solver():
    """Random/edge witnesses: engine and solver must agree
    (≙ test/assert_fuzz.go)."""
    import random

    rng = random.Random(99)
    from circuits import Cubic, IsZeroCircuit, SelectCircuit

    for cls, keys in [
        (Cubic, ["x", "y"]),
        (IsZeroCircuit, ["a", "z"]),
        (SelectCircuit, ["cond", "t", "f", "out"]),
    ]:
        cs = compile_circuit(Q, cls)
        specials = [0, 1, Q - 1, 2]
        for _ in range(12):
            assignment = {
                k: rng.choice(specials + [rng.randrange(Q)]) for k in keys
            }
            circ = cls(**assignment)
            pub, sec = circ.witness_values(Q)
            assert is_solved(circ, Q) == is_satisfied(cs, pub, sec), (
                f"{cls.__name__} disagreement on {assignment}"
            )


def test_defer_runs_after_define():
    """api.defer_ (≙ api.Compiler().Defer): callbacks run post-define on
    engine and both builders, in registration order, and may defer more."""
    from gnark_icicle_tpu.frontend import Circuit, Secret, compile_circuit
    from gnark_icicle_tpu.frontend.engine import is_solved as eng_solved

    order = []

    class D(Circuit):
        x = Secret()

        def define(self, api):
            api.defer_(lambda a: order.append("first"))

            def second(a):
                a.assert_is_equal(a.mul(self.x, self.x), 9)
                a.defer_(lambda a2: order.append("nested"))

            api.defer_(second)

    assert eng_solved(D(x=3), Q)
    assert not eng_solved(D(x=2), Q)
    order.clear()
    cs = compile_circuit(Q, D)
    assert order == ["first", "nested"]
    assert cs.nb_constraints >= 1
    cs2 = compile_circuit(Q, D, builder="scs")
    assert cs2.nb_gates >= 1
