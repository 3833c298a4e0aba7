"""Integration circuit corpus (≙ reference internal/backend/circuits/:
26 tiny circuits — add, mul, div, xor, select, lookup2, hint, range, … —
swept across backends by integration_test.go:28-69).

Each entry: (circuit_cls, valid assignments, invalid assignments).
"""

from gnark_icicle_tpu.frontend import Circuit, Public, Secret


class Cubic(Circuit):
    """≙ examples/cubic/cubic.go:22-36: x³ + x + 5 == y."""

    x = Secret()
    y = Public()

    def define(self, api):
        x3 = api.mul(self.x, self.x, self.x)
        api.assert_is_equal(self.y, api.add(x3, self.x, 5))


class AddOnly(Circuit):
    a = Secret()
    b = Secret()
    c = Public()

    def define(self, api):
        api.assert_is_equal(api.add(self.a, self.b), self.c)


class MulDiv(Circuit):
    a = Secret()
    b = Secret()
    q_ = Public()

    def define(self, api):
        api.assert_is_equal(api.div(self.a, self.b), self.q_)


class Inv(Circuit):
    a = Secret()
    ia = Public()

    def define(self, api):
        api.assert_is_equal(api.inverse(self.a), self.ia)


class XorCircuit(Circuit):
    a = Secret()
    b = Secret()
    c = Public()

    def define(self, api):
        api.assert_is_equal(api.xor(self.a, self.b), self.c)


class SelectCircuit(Circuit):
    cond = Secret()
    t = Secret()
    f = Secret()
    out = Public()

    def define(self, api):
        api.assert_is_equal(api.select(self.cond, self.t, self.f), self.out)


class Lookup2Circuit(Circuit):
    b0 = Secret()
    b1 = Secret()
    vals = Public(shape=4)
    out = Public()

    def define(self, api):
        api.assert_is_equal(
            api.lookup2(self.b0, self.b1, *self.vals), self.out
        )


class IsZeroCircuit(Circuit):
    a = Secret()
    z = Public()

    def define(self, api):
        api.assert_is_equal(api.is_zero(self.a), self.z)


class ToFromBinary(Circuit):
    a = Secret()
    a2 = Public()

    def define(self, api):
        bits = api.to_binary(self.a, 64)
        api.assert_is_equal(api.from_binary(bits), self.a2)


class RangeCheck(Circuit):
    a = Secret()

    def define(self, api):
        api.assert_is_less_or_equal(self.a, 255)


class HintCircuit(Circuit):
    """Uses a custom hint (≙ circuits/hint.go): h = a*7, checked by a
    constraint."""

    a = Secret()
    b = Public()

    def define(self, api):
        (h,) = api.new_hint(_times7, 1, self.a)
        api.assert_is_equal(h, api.mul(self.a, 7))
        api.assert_is_equal(h, self.b)


def _times7(q, inputs):
    return [inputs[0] * 7 % q]


class Neg(Circuit):
    a = Secret()
    b = Public()

    def define(self, api):
        api.assert_is_equal(api.neg(self.a), self.b)


class AssertDifferent(Circuit):
    a = Secret()
    b = Public()

    def define(self, api):
        api.assert_is_different(self.a, self.b)


class CmpCircuit(Circuit):
    a = Secret()
    b = Secret()
    want = Public()

    def define(self, api):
        api.assert_is_equal(api.cmp(self.a, self.b, 16), self.want)


class DivUnchecked(Circuit):
    a = Secret()
    b = Secret()
    out = Public()

    def define(self, api):
        api.assert_is_equal(api.div_unchecked(self.a, self.b), self.out)


class AndOr(Circuit):
    a = Secret()
    b = Secret()
    and_out = Public()
    or_out = Public()

    def define(self, api):
        api.assert_is_equal(api.and_(self.a, self.b), self.and_out)
        api.assert_is_equal(api.or_(self.a, self.b), self.or_out)


class FromBinary(Circuit):
    bits = Secret(shape=5)
    val = Public()

    def define(self, api):
        for b in self.bits:
            api.assert_is_boolean(b)
        api.assert_is_equal(api.from_binary(self.bits), self.val)


class MulAcc(Circuit):
    """Chained multiply-accumulate (≙ circuits/expo-style chains)."""

    x = Secret()
    y = Secret()
    res = Public()

    def define(self, api):
        acc = 0
        for i in range(5):
            acc = api.add(api.mul(acc, self.x), self.y, i)
        api.assert_is_equal(acc, self.res)


class AssertBool(Circuit):
    b = Secret()

    def define(self, api):
        api.assert_is_boolean(self.b)


class NegChain(Circuit):
    a = Secret()
    out = Public()

    def define(self, api):
        api.assert_is_equal(api.neg(api.neg(api.neg(self.a))), self.out)


class Sub(Circuit):
    """≙ circuits/sub.go."""

    a = Secret()
    b = Secret()
    c = Public()

    def define(self, api):
        api.assert_is_equal(api.sub(self.a, self.b), self.c)


class Exp(Circuit):
    """x^e by square-and-multiply over e's bits (≙ circuits/exp.go and
    examples/exponentiate)."""

    x = Secret()
    e = Secret()
    y = Public()

    N_BITS = 8

    def define(self, api):
        bits = api.to_binary(self.e, self.N_BITS)
        acc = 1
        for i in range(self.N_BITS - 1, -1, -1):
            acc = api.mul(acc, acc)
            mul = api.mul(acc, self.x)
            acc = api.select(bits[i], mul, acc)
        api.assert_is_equal(acc, self.y)


class BooleanChain(Circuit):
    """Boolean identities: ¬¬b = b, b∧¬b = 0, b∨¬b = 1 (≙ circuits/
    boolean.go)."""

    b = Secret()
    b_out = Public()

    def define(self, api):
        api.assert_is_boolean(self.b)
        not_b = api.sub(1, self.b)
        api.assert_is_equal(api.and_(self.b, not_b), 0)
        api.assert_is_equal(api.or_(self.b, not_b), 1)
        api.assert_is_equal(api.sub(1, not_b), self.b_out)


class NoComputation(Circuit):
    """Inputs equated with no derived wires (≙ circuits/nocomputation.go)."""

    a = Secret()
    b = Public()

    def define(self, api):
        api.assert_is_equal(self.a, self.b)


class OrXorAndMul(Circuit):
    """Combined gate soup (≙ circuits/orxorandmul.go)."""

    a = Secret()
    b = Secret()
    res = Public()

    def define(self, api):
        o = api.or_(self.a, self.b)
        x = api.xor(self.a, self.b)
        n = api.and_(self.a, self.b)
        api.assert_is_equal(api.add(api.mul(o, x), n), self.res)


class AssertEqualLinear(Circuit):
    """Equality over linear combinations, no product gate needed
    (≙ circuits/assertequal.go)."""

    a = Secret()
    b = Secret()
    c = Public()

    def define(self, api):
        api.assert_is_equal(
            api.add(self.a, self.b, self.a), api.sub(self.c, self.b)
        )


def _mulacc_expected(q, x, y):
    acc = 0
    for i in range(5):
        acc = (acc * x + y + i) % q
    return acc


def corpus(q: int):
    """[(name, circuit_cls, [valid assignments], [invalid assignments])]."""
    return [
        ("cubic", Cubic, [dict(x=3, y=35)], [dict(x=3, y=36), dict(x=0, y=35)]),
        ("add", AddOnly, [dict(a=2, b=3, c=5), dict(a=q - 1, b=1, c=0)],
         [dict(a=2, b=3, c=6)]),
        ("muldiv", MulDiv, [dict(a=6, b=3, q_=2)], [dict(a=6, b=3, q_=3)]),
        ("inv", Inv, [dict(a=2, ia=pow(2, -1, q))], [dict(a=2, ia=2)]),
        ("xor", XorCircuit, [dict(a=1, b=0, c=1), dict(a=1, b=1, c=0)],
         [dict(a=1, b=0, c=0), dict(a=2, b=0, c=2)]),
        ("select", SelectCircuit,
         [dict(cond=1, t=10, f=20, out=10), dict(cond=0, t=10, f=20, out=20)],
         [dict(cond=1, t=10, f=20, out=20), dict(cond=5, t=1, f=0, out=1)]),
        ("lookup2", Lookup2Circuit,
         [dict(b0=1, b1=1, vals=[9, 8, 7, 6], out=6),
          dict(b0=0, b1=0, vals=[9, 8, 7, 6], out=9)],
         [dict(b0=1, b1=0, vals=[9, 8, 7, 6], out=9)]),
        ("is_zero", IsZeroCircuit,
         [dict(a=0, z=1), dict(a=123, z=0)],
         [dict(a=0, z=0), dict(a=5, z=1)]),
        ("binary", ToFromBinary,
         [dict(a=0xDEADBEEF, a2=0xDEADBEEF)],
         [dict(a=q - 1, a2=q - 1)]),  # q-1 needs > 64 bits
        ("range", RangeCheck, [dict(a=255), dict(a=0)],
         [dict(a=256), dict(a=q - 1)]),
        ("hint", HintCircuit, [dict(a=6, b=42)], [dict(a=6, b=43)]),
        ("neg", Neg, [dict(a=5, b=q - 5)], [dict(a=5, b=5)]),
        ("different", AssertDifferent, [dict(a=1, b=2)], [dict(a=2, b=2)]),
        ("div_unchecked", DivUnchecked,
         [dict(a=6, b=3, out=2), dict(a=0, b=0, out=0)],
         [dict(a=6, b=3, out=3), dict(a=5, b=0, out=0)]),
        ("andor", AndOr,
         [dict(a=1, b=0, and_out=0, or_out=1),
          dict(a=1, b=1, and_out=1, or_out=1)],
         [dict(a=1, b=0, and_out=1, or_out=1),
          dict(a=2, b=0, and_out=0, or_out=1)]),
        ("from_binary", FromBinary,
         [dict(bits=[1, 0, 1, 0, 1], val=21)],
         [dict(bits=[1, 0, 1, 0, 1], val=20),
          dict(bits=[2, 0, 0, 0, 0], val=2)]),
        ("mulacc", MulAcc,
         [dict(x=3, y=7, res=_mulacc_expected(q, 3, 7))],
         [dict(x=3, y=7, res=0)]),
        ("bool", AssertBool, [dict(b=0), dict(b=1)], [dict(b=2)]),
        ("negchain", NegChain, [dict(a=5, out=q - 5)], [dict(a=5, out=5)]),
        ("cmp", CmpCircuit,
         [dict(a=5, b=3, want=1), dict(a=3, b=5, want=q - 1),
          dict(a=4, b=4, want=0)],
         [dict(a=5, b=3, want=0)]),
        ("sub", Sub, [dict(a=7, b=3, c=4), dict(a=0, b=1, c=q - 1)],
         [dict(a=7, b=3, c=5)]),
        ("exp", Exp, [dict(x=3, e=5, y=pow(3, 5, q)), dict(x=2, e=0, y=1)],
         [dict(x=3, e=5, y=pow(3, 6, q)), dict(x=3, e=256, y=pow(3, 256, q))]),
        ("boolean", BooleanChain, [dict(b=1, b_out=1), dict(b=0, b_out=0)],
         [dict(b=1, b_out=0), dict(b=2, b_out=2)]),
        ("nocomputation", NoComputation, [dict(a=9, b=9)], [dict(a=9, b=8)]),
        ("orxorandmul", OrXorAndMul,
         [dict(a=1, b=0, res=1), dict(a=1, b=1, res=1),
          dict(a=0, b=0, res=0)],
         [dict(a=1, b=0, res=0)]),
        ("assertequal", AssertEqualLinear,
         [dict(a=2, b=3, c=10)], [dict(a=2, b=3, c=11)]),
    ]
