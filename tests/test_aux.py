"""Aux subsystem tests: profiler, logger, Println, examples compile.

Parity model: profile/profile_test.go (constraint attribution), the solver
LogEntry tests, and the reference CI running examples."""

import logging

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu import profile
from gnark_icicle_tpu.frontend import Circuit, Public, Secret, compile_circuit
from gnark_icicle_tpu.constraint import solve

Q = bn254.R


def test_profiler_counts_constraints():
    from circuits import Cubic

    p = profile.start()
    compile_circuit(Q, Cubic)
    p.stop()
    assert p.total == 3  # cubic = 3 R1CS constraints
    report = p.top()
    assert "total constraints: 3" in report
    assert "define" in report  # attributed to the circuit's define()


def test_profiler_scs():
    from circuits import Cubic

    p = profile.start()
    compile_circuit(Q, Cubic, builder="scs")
    p.stop()
    assert p.total >= 4


def test_println_resolves_at_solve(caplog):
    class P(Circuit):
        x = Secret()

        def define(self, api):
            api.println("x is", api.add(self.x, 1))
            api.assert_is_equal(api.mul(self.x, 1), self.x)

    cs = compile_circuit(Q, P)
    from gnark_icicle_tpu.logger import logger as _get_logger

    lg = _get_logger()  # force lazy init before overriding the level
    old = lg.level
    lg.setLevel(logging.INFO)
    try:
        with caplog.at_level(logging.INFO, logger="gnark_icicle_tpu"):
            solve(cs, [], [41])
    finally:
        lg.setLevel(old)
    assert any("42" in r.getMessage() for r in caplog.records)


def test_examples_importable():
    import examples.cubic
    import examples.mimc
    import examples.exponentiate

    cs = compile_circuit(Q, examples.cubic.CubicCircuit)
    assert cs.nb_constraints == 3
    cs2 = compile_circuit(Q, examples.exponentiate.ExponentiateCircuit)
    assert cs2.nb_constraints > 8
