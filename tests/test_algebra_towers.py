"""Emulated tower-field gadgets vs the host tower oracle
(≙ std/algebra/emulated/fields_bn254 tests)."""

import random

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.curves.tower import Fp2, Fp6, Fp12
from gnark_icicle_tpu.frontend.engine import Engine
from gnark_icicle_tpu.std.algebra_towers import bn254_towers

Q = bn254.R
P = bn254.P
TP = bn254.TOWER


def _setup():
    eng = Engine(Q)
    return (eng,) + bn254_towers(eng, Q)


def _e2_in(fp, v: Fp2):
    return (fp.constant(v.c0), fp.constant(v.c1))


def _e2_out(fp, g):
    return Fp2(TP, fp.value_hint(fp.reduce(g[0])),
               fp.value_hint(fp.reduce(g[1])))


def _rand_fp2(rng):
    return Fp2(TP, rng.randrange(P), rng.randrange(P))


def test_e2_ops_match_host():
    rng = random.Random(1)
    eng, fp, e2, e6, e12 = _setup()
    a, b = _rand_fp2(rng), _rand_fp2(rng)
    ga, gb = _e2_in(fp, a), _e2_in(fp, b)
    assert _e2_out(fp, e2.mul(ga, gb)) == a * b
    assert _e2_out(fp, e2.add(ga, gb)) == a + b
    assert _e2_out(fp, e2.sub(ga, gb)) == a - b
    assert _e2_out(fp, e2.square(ga)) == a * a
    assert _e2_out(fp, e2.inverse(ga)) == a.inv()
    xi = Fp2(TP, 9, 1)
    assert _e2_out(fp, e2.mul_by_nonresidue(ga)) == a * xi


def _e6_in(fp, v: Fp6):
    return tuple(_e2_in(fp, c) for c in (v.b0, v.b1, v.b2))


def _e6_out(fp, g):
    return Fp6(TP, *(_e2_out(fp, c) for c in g))


def _rand_fp6(rng):
    return Fp6(TP, _rand_fp2(rng), _rand_fp2(rng), _rand_fp2(rng))


def test_e6_mul_inverse_match_host():
    rng = random.Random(2)
    eng, fp, e2, e6, e12 = _setup()
    a, b = _rand_fp6(rng), _rand_fp6(rng)
    ga, gb = _e6_in(fp, a), _e6_in(fp, b)
    assert _e6_out(fp, e6.mul(ga, gb)) == a * b
    prod = e6.mul(ga, e6.inverse(ga))
    assert _e6_out(fp, prod) == Fp6.one(TP)


def test_e12_mul_square_inverse_match_host():
    rng = random.Random(3)
    eng, fp, e2, e6, e12 = _setup()
    a = Fp12(TP, _rand_fp6(rng), _rand_fp6(rng))
    b = Fp12(TP, _rand_fp6(rng), _rand_fp6(rng))
    ga = (_e6_in(fp, a.a0), _e6_in(fp, a.a1))
    gb = (_e6_in(fp, b.a0), _e6_in(fp, b.a1))

    def out(g):
        return Fp12(TP, _e6_out(fp, g[0]), _e6_out(fp, g[1]))

    assert out(e12.mul(ga, gb)) == a * b
    assert out(e12.square(ga)) == a * a
    assert out(e12.mul(ga, e12.inverse(ga))) == Fp12.one(TP)


def test_e2_compiled_circuit():
    """One compiled E2 multiplication (the building block all higher levels
    reduce to) — solver accepts correct product, rejects wrong."""
    from gnark_icicle_tpu.frontend import (
        Circuit, Public, Secret, compile_circuit,
    )
    from gnark_icicle_tpu.constraint import is_satisfied
    from gnark_icicle_tpu.std.emulated import BN254_FP

    def limbs(v):
        return [(v >> (64 * i)) & ((1 << 64) - 1) for i in range(4)]

    class E2Mul(Circuit):
        a0 = Secret(shape=4); a1 = Secret(shape=4)
        b0 = Secret(shape=4); b1 = Secret(shape=4)
        c0 = Public(shape=4); c1 = Public(shape=4)

        def define(self, api):
            from gnark_icicle_tpu.std.algebra_towers import bn254_towers

            fp, e2, _, _ = bn254_towers(api, Q)
            ga = (fp.from_limbs(self.a0), fp.from_limbs(self.a1))
            gb = (fp.from_limbs(self.b0), fp.from_limbs(self.b1))
            gc = (fp.from_limbs(self.c0), fp.from_limbs(self.c1))
            got = e2.mul(ga, gb)
            fp.assert_equal(got[0], gc[0])
            fp.assert_equal(got[1], gc[1])

    rng = random.Random(4)
    a, b = _rand_fp2(rng), _rand_fp2(rng)
    c = a * b
    w = E2Mul(a0=limbs(a.c0), a1=limbs(a.c1), b0=limbs(b.c0),
              b1=limbs(b.c1), c0=limbs(c.c0), c1=limbs(c.c1))
    cs = compile_circuit(Q, E2Mul)
    pub, sec = w.witness_values(Q)
    assert is_satisfied(cs, pub, sec)
    bad = E2Mul(a0=limbs(a.c0), a1=limbs(a.c1), b0=limbs(b.c0),
                b1=limbs(b.c1), c0=limbs((c.c0 + 1) % P), c1=limbs(c.c1))
    bpub, bsec = bad.witness_values(Q)
    assert not is_satisfied(cs, bpub, bsec)
