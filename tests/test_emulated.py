"""Emulated non-native field tests (≙ std/math/emulated tests): secp256k1
and BN254-Fp arithmetic inside the BN254-Fr native field, engine + solver."""

import random

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import Circuit, Public, Secret, compile_circuit, is_solved
from gnark_icicle_tpu.constraint import is_satisfied
from gnark_icicle_tpu.std.emulated import (
    EmulatedField, SECP256K1_FP, BN254_FP,
)

Q = bn254.R


def _limbs(value, params):
    return [
        (value >> (params.limb_bits * i)) & ((1 << params.limb_bits) - 1)
        for i in range(params.n_limbs)
    ]


class EmulMul(Circuit):
    """z == x·y (mod p_secp256k1), all emulated."""

    x = Secret(shape=4)
    y = Secret(shape=4)
    z = Public(shape=4)

    def define(self, api):
        f = EmulatedField(api, SECP256K1_FP, Q)
        ex = f.from_limbs(self.x)
        ey = f.from_limbs(self.y)
        ez = f.from_limbs(self.z)
        f.assert_equal(f.mul(ex, ey), ez)


@pytest.mark.parametrize("seed", [1, 2])
def test_emulated_mul_secp256k1(seed):
    rng = random.Random(seed)
    p = SECP256K1_FP.modulus
    x = rng.randrange(p)
    y = rng.randrange(p)
    z = x * y % p
    w = EmulMul(
        x=_limbs(x, SECP256K1_FP), y=_limbs(y, SECP256K1_FP),
        z=_limbs(z, SECP256K1_FP),
    )
    assert is_solved(w, Q)
    bad = EmulMul(
        x=_limbs(x, SECP256K1_FP), y=_limbs(y, SECP256K1_FP),
        z=_limbs((z + 1) % p, SECP256K1_FP),
    )
    assert not is_solved(bad, Q)


def test_emulated_solver_agrees():
    cs = compile_circuit(Q, EmulMul)
    rng = random.Random(3)
    p = SECP256K1_FP.modulus
    x, y = rng.randrange(p), rng.randrange(p)
    good = EmulMul(x=_limbs(x, SECP256K1_FP), y=_limbs(y, SECP256K1_FP),
                   z=_limbs(x * y % p, SECP256K1_FP))
    pub, sec = good.witness_values(Q)
    assert is_satisfied(cs, pub, sec)
    bad = EmulMul(x=_limbs(x, SECP256K1_FP), y=_limbs(y, SECP256K1_FP),
                  z=_limbs((x * y + 5) % p, SECP256K1_FP))
    pub, sec = bad.witness_values(Q)
    assert not is_satisfied(cs, pub, sec)


class EmulAffine(Circuit):
    """w == a·b + c − d over emulated BN254 Fp (exercises lazy add/sub)."""

    a = Secret(shape=4)
    b = Secret(shape=4)
    c = Secret(shape=4)
    d = Secret(shape=4)
    out = Public(shape=4)

    def define(self, api):
        f = EmulatedField(api, BN254_FP, Q)
        ea, eb = f.from_limbs(self.a), f.from_limbs(self.b)
        ec, ed = f.from_limbs(self.c), f.from_limbs(self.d)
        res = f.sub(f.add(f.mul(ea, eb), ec), ed)
        f.assert_equal(res, f.from_limbs(self.out))


def test_emulated_affine_bn254fp():
    rng = random.Random(4)
    p = BN254_FP.modulus
    a, b, c, d = (rng.randrange(p) for _ in range(4))
    out = (a * b + c - d) % p
    w = EmulAffine(
        a=_limbs(a, BN254_FP), b=_limbs(b, BN254_FP),
        c=_limbs(c, BN254_FP), d=_limbs(d, BN254_FP),
        out=_limbs(out, BN254_FP),
    )
    assert is_solved(w, Q)


def test_emulated_constraint_count_sane():
    cs = compile_circuit(Q, EmulMul)
    # one emulated mul ≈ a few thousand constraints in the bit-decomposed
    # variant (the reference's table-based variant is tighter — PARITY.md)
    assert cs.nb_constraints < 6000


def test_canonical_form_enforced():
    """assert_canonical pins value < p (reference AssertIsInRange role);
    boundary p−1 accepted, p and p+5 rejected."""
    from gnark_icicle_tpu.frontend.engine import Engine
    from gnark_icicle_tpu.std.emulated import SECP256K1_FR

    n = SECP256K1_FR.modulus
    eng = Engine(Q)
    f = EmulatedField(eng, SECP256K1_FR, Q)
    f.from_limbs(_limbs(n - 1, SECP256K1_FR), canonical=True)
    for bad in (n, n + 5, (1 << 256) - 1):
        with pytest.raises(Exception):
            f.from_limbs(_limbs(bad, SECP256K1_FR), canonical=True)
