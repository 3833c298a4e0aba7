"""Exhaustive-input solver fuzzing over a tiny field.

Parity model: reference internal/tinyfield (6-bit modulus 0x2f,
internal/generator/backend/main.go:74) + test/solver_test.go — small enough
fields let every witness combination be enumerated, catching solver edge
cases random fuzzing misses. The whole stack is field-generic, so the same
frontend/solver runs over q = 47 unchanged.
"""

import itertools

import pytest

from gnark_icicle_tpu.frontend import Circuit, Public, Secret, compile_circuit, is_solved
from gnark_icicle_tpu.constraint import solve, UnsatisfiedConstraintError
from gnark_icicle_tpu.constraint.scs import solve_scs, SparseUnsatisfiedError

TINY_Q = 47  # 6-bit prime (the reference uses 0x2f = 47 too)


class TinyMulAdd(Circuit):
    x = Secret()
    y = Secret()
    z = Public()

    def define(self, api):
        api.assert_is_equal(api.add(api.mul(self.x, self.y), self.x), self.z)


class TinyIsZero(Circuit):
    a = Secret()
    z = Public()

    def define(self, api):
        api.assert_is_equal(api.is_zero(self.a), self.z)


class TinyDiv(Circuit):
    a = Secret()
    b = Secret()
    q_ = Public()

    def define(self, api):
        api.assert_is_equal(api.div(self.a, self.b), self.q_)


def _solver_ok(cs, pub, sec, scs=False):
    try:
        if scs:
            solve_scs(cs, pub, sec)
        else:
            solve(cs, pub, sec)
        return True
    except (UnsatisfiedConstraintError, SparseUnsatisfiedError, ValueError,
            ZeroDivisionError):
        return False


def test_exhaustive_muladd():
    cs = compile_circuit(TINY_Q, TinyMulAdd)
    scs = compile_circuit(TINY_Q, TinyMulAdd, builder="scs")
    for x, y, z in itertools.product(range(TINY_Q), range(TINY_Q),
                                     range(0, TINY_Q, 7)):
        want = (x * y + x) % TINY_Q == z
        circ = TinyMulAdd(x=x, y=y, z=z)
        assert is_solved(circ, TINY_Q) == want, (x, y, z)
        pub, sec = circ.witness_values(TINY_Q)
        assert _solver_ok(cs, pub, sec) == want, (x, y, z)
        assert _solver_ok(scs, pub, sec, scs=True) == want, (x, y, z)


def test_exhaustive_is_zero():
    cs = compile_circuit(TINY_Q, TinyIsZero)
    for a, z in itertools.product(range(TINY_Q), range(TINY_Q)):
        want = (1 if a == 0 else 0) == z
        circ = TinyIsZero(a=a, z=z)
        pub, sec = circ.witness_values(TINY_Q)
        assert is_solved(circ, TINY_Q) == want, (a, z)
        assert _solver_ok(cs, pub, sec) == want, (a, z)


def test_exhaustive_div():
    """Every (a, b) pair including b = 0 — the division-by-zero edge the
    reference's tinyfield sweep exists to catch."""
    cs = compile_circuit(TINY_Q, TinyDiv)
    for a, b in itertools.product(range(TINY_Q), range(TINY_Q)):
        if b == 0:
            circ = TinyDiv(a=a, b=b, q_=0)
            pub, sec = circ.witness_values(TINY_Q)
            assert not _solver_ok(cs, pub, sec), (a, b)
            continue
        good = a * pow(b, -1, TINY_Q) % TINY_Q
        pub, sec = TinyDiv(a=a, b=b, q_=good).witness_values(TINY_Q)
        assert _solver_ok(cs, pub, sec), (a, b)
        pub, sec = TinyDiv(a=a, b=b, q_=(good + 1) % TINY_Q).witness_values(TINY_Q)
        assert not _solver_ok(cs, pub, sec), (a, b)
