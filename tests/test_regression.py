"""Regression corpus (≙ reference internal/regression_tests + the solver's
double-assignment guard, constraint/bn254/solver.go:134-141)."""

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import Circuit, Public, Secret, compile_circuit, is_solved
from gnark_icicle_tpu.constraint import solve

Q = bn254.R


def test_boolean_dedup_single_constraint():
    """assert_is_boolean twice on the same wire must emit one constraint
    (builder MarkBoolean dedup — a silent-regression risk)."""

    class B(Circuit):
        b = Secret()

        def define(self, api):
            api.assert_is_boolean(self.b)
            api.assert_is_boolean(self.b)

    cs = compile_circuit(Q, B)
    assert cs.nb_constraints == 1


def test_select_on_expression_cond():
    """Select with a computed (non-wire) boolean condition — the boolean
    mark only applies to single-wire terms; expressions must still get a
    constraint without crashing."""

    class S(Circuit):
        a = Secret()
        out = Public()

        def define(self, api):
            c = api.is_zero(self.a)
            flipped = api.sub(1, c)
            api.assert_is_equal(api.select(flipped, 7, 9), self.out)

    assert is_solved(S(a=0, out=9), Q)
    assert is_solved(S(a=5, out=7), Q)


def test_constant_only_circuit():
    """Circuits whose define() folds to constants must compile + solve."""

    class C(Circuit):
        x = Secret()

        def define(self, api):
            api.assert_is_equal(api.mul(2, 3), 6)
            api.assert_is_equal(api.mul(self.x, 0), 0)

    cs = compile_circuit(Q, C)
    solve(cs, [], [1234])


def test_hint_output_reduced_mod_q():
    """Hint outputs ≥ q must be reduced before assignment (solver contract)."""
    from gnark_icicle_tpu.constraint import register_hint

    def big_out(q, inputs):
        return [q + 5]  # deliberately non-canonical

    class H(Circuit):
        x = Secret()

        def define(self, api):
            (h,) = api.new_hint(big_out, 1, self.x)
            api.assert_is_equal(h, 5)

    assert is_solved(H(x=1), Q)
    cs = compile_circuit(Q, H)
    solve(cs, [], [1])


def test_public_ordering_matches_declaration():
    """Witness serialization depends on declaration order, not kwarg order."""

    class P(Circuit):
        a = Public()
        b = Public()
        c = Secret()

        def define(self, api):
            api.assert_is_equal(api.add(self.a, self.c), self.b)

    pub, sec = P(b=30, c=20, a=10).witness_values(Q)
    assert pub == [10, 30] and sec == [20]


def test_negative_witness_values_wrap():
    class N(Circuit):
        a = Secret()
        out = Public()

        def define(self, api):
            api.assert_is_equal(api.neg(self.a), self.out)

    pub, sec = N(a=-5, out=5).witness_values(Q)
    assert sec == [Q - 5]
    assert is_solved(N(a=-5, out=5), Q)


def test_issue1227_constant_leq_variable():
    """≙ internal/regression_tests/issue1227: AssertIsLessOrEqual with a
    CONSTANT left operand must constrain (const <= var), including the
    const=0 edge."""

    class C1(Circuit):
        x = Secret()

        def define(self, api):
            api.assert_is_less_or_equal(1, self.x)

    assert is_solved(C1(x=1), Q)
    assert not is_solved(C1(x=0), Q)

    class C0(Circuit):
        x = Secret()

        def define(self, api):
            api.assert_is_less_or_equal(0, self.x)

    assert is_solved(C0(x=1), Q)
    assert is_solved(C0(x=0), Q)


def test_issue1246_select_non_boolean_condition():
    """≙ internal/regression_tests/issue1246: Select must constrain the
    condition to be boolean — condition=2 with d = cond(y1−y2)+y2 = 0
    would otherwise 'prove' d ∉ {y1, y2}."""

    class S(Circuit):
        cond = Secret()
        y1 = Secret()
        y2 = Secret()

        def define(self, api):
            d = api.select(self.cond, self.y1, self.y2)
            api.assert_is_equal(d, 0)

    # 2·(2−4)+4 = 0 — satisfies the select equation but cond is not a bit
    assert not is_solved(S(cond=2, y1=2, y2=4), Q)
    assert is_solved(S(cond=1, y1=0, y2=4), Q)


def test_issue897_rangecheck_rejects_power_of_two():
    """≙ internal/regression_tests/issue_897_test.go: rangecheck.Check(x, 7)
    must reject x = 2^7."""
    from gnark_icicle_tpu.std.rangecheck import RangeChecker

    class R(Circuit):
        x = Secret()

        def define(self, api):
            RangeChecker(api).check(self.x, 7)

    assert is_solved(R(x=(1 << 7) - 1), Q)
    assert not is_solved(R(x=1 << 7), Q)


def test_issue836_cmp_resists_malicious_bits_hint():
    """≙ internal/regression_tests/issue_836_test.go: overriding the bit
    decomposition hint with a malicious one must make solving FAIL, not
    flip the comparison result."""
    from gnark_icicle_tpu.constraint import hints as hintlib

    class C(Circuit):
        left = Secret()
        right = Secret()
        exp = Public()

        def define(self, api):
            api.assert_is_equal(api.cmp(self.left, self.right), self.exp)

    cs = compile_circuit(Q, C)
    # honest solve: 10 > 5 -> 1
    solve(cs, [1], [10, 5])
    # malicious decomposition: claim every queried value is zero bits
    with pytest.raises(Exception):
        solve(cs, [1], [10, 5], hint_overrides={
            hintlib.TO_BITS: lambda q, ins: [0] * ins[1],
        })
    # and an honest-but-wrong expectation must also fail
    with pytest.raises(Exception):
        solve(cs, [0], [10, 5])
