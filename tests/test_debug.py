"""Debug-mode constraint stack traces (≙ reference -tags=debug,
debug/debug.go + solver unsatisfied-constraint trace printing)."""

import pytest

from gnark_icicle_tpu import debug
from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import Circuit, Public, Secret, compile_circuit
from gnark_icicle_tpu.constraint.solver import solve, UnsatisfiedConstraintError
from gnark_icicle_tpu.constraint.scs import solve_scs, SparseUnsatisfiedError

Q = bn254.R


class Bad(Circuit):
    x = Secret()
    y = Public()

    def define(self, api):
        api.assert_is_equal(api.mul(self.x, self.x), self.y)


@pytest.fixture
def debug_mode():
    debug.set_debug(True)
    yield
    debug.set_debug(False)


def test_r1cs_error_carries_circuit_stack(debug_mode):
    cs = compile_circuit(Q, Bad)
    assert any(o for o in cs.constraint_origins)
    with pytest.raises(UnsatisfiedConstraintError) as ei:
        solve(cs, [10], [3])  # 9 != 10
    # the failing assert's site (this test file's define) is in the message
    assert "test_debug.py" in str(ei.value)
    assert "define" in str(ei.value)


def test_scs_error_carries_circuit_stack(debug_mode):
    cs = compile_circuit(Q, Bad, builder="scs")
    assert any(o for o in cs.gate_origins)
    with pytest.raises(SparseUnsatisfiedError) as ei:
        solve_scs(cs, [10], [3])
    assert "test_debug.py" in str(ei.value)


def test_no_capture_by_default():
    cs = compile_circuit(Q, Bad)
    assert not any(o for o in cs.constraint_origins)
