"""Small std gadget batch: math/cmp, bitslice, polynomial, multicommit.

Parity model: reference std/math/cmp/{bounded,generic}_test.go,
std/math/bitslice/partition_test.go, std/math/polynomial/polynomial_test.go,
std/multicommit/nativecommit_test.go.
"""

import random

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import (
    Circuit, Public, Secret, compile_circuit, is_solved,
)
from gnark_icicle_tpu.constraint import is_satisfied
from gnark_icicle_tpu.std.math_cmp import BoundedComparator
from gnark_icicle_tpu.std import bitslice, multicommit
from gnark_icicle_tpu.std.polynomial import Polynomial, EmulatedPolynomial

Q = bn254.R


class CmpCircuit(Circuit):
    a = Secret()
    b = Secret()
    lt = Public()   # expected a < b
    mn = Public()   # expected min(a,b)

    def define(self, api):
        cmp = BoundedComparator(api, 1 << 16)
        api.assert_is_equal(cmp.is_less(self.a, self.b), self.lt)
        api.assert_is_equal(cmp.min_(self.a, self.b), self.mn)


@pytest.mark.parametrize("a,b", [(3, 7), (7, 3), (5, 5), (0, 65535)])
def test_bounded_cmp(a, b):
    w = CmpCircuit(a=a, b=b, lt=int(a < b), mn=min(a, b))
    assert is_solved(w, Q)
    bad = CmpCircuit(a=a, b=b, lt=1 - int(a < b), mn=min(a, b))
    assert not is_solved(bad, Q)


def test_bounded_cmp_solver():
    cs = compile_circuit(Q, CmpCircuit)
    assert is_satisfied(cs, [1, 3], [3, 7])
    assert not is_satisfied(cs, [0, 3], [3, 7])


class AssertLess(Circuit):
    a = Secret()
    b = Secret()

    def define(self, api):
        BoundedComparator(api, 1 << 16).assert_is_less(self.a, self.b)


def test_assert_is_less():
    assert is_solved(AssertLess(a=3, b=4), Q)
    assert not is_solved(AssertLess(a=4, b=4), Q)
    assert not is_solved(AssertLess(a=5, b=4), Q)


class PartitionCircuit(Circuit):
    v = Secret()
    lo = Public()
    hi = Public()

    def define(self, api):
        lo, hi = bitslice.partition(api, self.v, 16, nb_digits=64)
        api.assert_is_equal(lo, self.lo)
        api.assert_is_equal(hi, self.hi)


def test_bitslice_partition():
    v = 0xDEADBEEF12345678
    w = PartitionCircuit(v=v, lo=v & 0xFFFF, hi=v >> 16)
    assert is_solved(w, Q)
    assert not is_solved(PartitionCircuit(v=v, lo=0, hi=v >> 16), Q)
    cs = compile_circuit(Q, PartitionCircuit)
    assert is_satisfied(cs, [v & 0xFFFF, v >> 16], [v])


class PolyCircuit(Circuit):
    at = Secret()
    expect_uni = Public()
    expect_ml = Public()
    expect_lde = Public()

    COEFFS = [3, 1, 4, 1, 5]
    ML = [2, 7, 1, 8]  # values on {0,1}^2
    LDE = [9, 2, 6, 5]  # values on 0..3

    def define(self, api):
        p = Polynomial(api)
        api.assert_is_equal(
            p.eval_univariate(self.COEFFS, self.at), self.expect_uni
        )
        # multilinear at (at, at+1)
        x0, x1 = self.at, api.add(self.at, 1)
        api.assert_is_equal(
            p.eval_multilinear([x0, x1], self.ML), self.expect_ml
        )
        api.assert_is_equal(
            p.interpolate_lde(self.at, self.LDE), self.expect_lde
        )


def _ml_eval(at, vals, q):
    vals = list(vals)
    for x in at:
        half = len(vals) // 2
        vals = [
            (vals[i] + x * (vals[half + i] - vals[i])) % q
            for i in range(half)
        ]
    return vals[0]


def _lde_eval(at, vals, q):
    n = len(vals)
    acc = 0
    for i in range(n):
        term = vals[i]
        for j in range(n):
            if j != i:
                term = term * ((at - j) % q) % q * pow((i - j) % q, -1, q) % q
        acc = (acc + term) % q
    return acc


def test_polynomial_gadgets():
    at = 11
    uni = sum(c * at**i for i, c in enumerate(PolyCircuit.COEFFS)) % Q
    ml = _ml_eval([at, at + 1], PolyCircuit.ML, Q)
    lde = _lde_eval(at, PolyCircuit.LDE, Q)
    w = PolyCircuit(at=at, expect_uni=uni, expect_ml=ml, expect_lde=lde)
    assert is_solved(w, Q)
    cs = compile_circuit(Q, PolyCircuit)
    assert is_satisfied(cs, [uni, ml, lde], [at])
    assert not is_satisfied(cs, [uni + 1, ml, lde], [at])


def test_polynomial_lde_in_domain():
    """δ collapses to the indicator at in-domain points — the division-free
    form must stay complete there (the reference's computeDeltaAtNaive is)."""
    for at, want in enumerate(PolyCircuit.LDE):
        lde = _lde_eval(at, PolyCircuit.LDE, Q)
        assert lde == want

        class OnlyLde(Circuit):
            at_ = Secret()
            out = Public()

            def define(self, api):
                p = Polynomial(api)
                api.assert_is_equal(
                    p.interpolate_lde(self.at_, PolyCircuit.LDE), self.out
                )

        assert is_solved(OnlyLde(at_=at, out=want), Q)
        assert not is_solved(OnlyLde(at_=at, out=want + 1), Q)


def test_polynomial_eval_equal():
    class EqCircuit(Circuit):
        x = Secret(shape=2)
        want = Public()

        def define(self, api):
            p = Polynomial(api)
            api.assert_is_equal(
                p.eval_equal(self.x, [1, 0]), self.want
            )

    assert is_solved(EqCircuit(x=[1, 0], want=1), Q)
    assert is_solved(EqCircuit(x=[1, 1], want=0), Q)


def test_emulated_polynomial():
    from gnark_icicle_tpu.frontend.engine import Engine
    from gnark_icicle_tpu.std.emulated import EmulatedField, SECP256K1_FR

    eng = Engine(Q)
    f = EmulatedField(eng, SECP256K1_FR, Q)
    p = EmulatedPolynomial(f)
    n_mod = SECP256K1_FR.modulus
    coeffs_int = [5, 3, 2]
    at_int = 10**30
    want = sum(c * pow(at_int, i, n_mod) for i, c in enumerate(coeffs_int)) % n_mod
    got = p.eval_univariate(
        [f.constant(c) for c in coeffs_int], f.constant(at_int)
    )
    assert f.value_hint(f.reduce(got)) == want


class MulticommitCircuit(Circuit):
    """Two callbacks get distinct nonzero randomness bound to x."""

    x = Secret()

    def define(self, api):
        seen = []

        def cb1(api_, r):
            api_.assert_is_different(r, 0)
            seen.append(r)

        def cb2(api_, r):
            api_.assert_is_different(r, 0)
            # distinct from the first callback's randomness
            api_.assert_is_different(r, seen[0])

        multicommit.with_commitment(api, cb1, self.x)
        multicommit.with_commitment(api, cb2, self.x)


def test_multicommit_engine_and_groth16_compile():
    assert is_solved(MulticommitCircuit(x=5), Q)
    cs = compile_circuit(Q, MulticommitCircuit)
    assert len(cs.commitments) == 1  # one master commitment
    assert is_satisfied(cs, [], [5])
    # and under the SCS builder
    cs2 = compile_circuit(Q, MulticommitCircuit, builder="scs")
    assert len(cs2.commitments) == 1
