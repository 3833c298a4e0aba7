"""EVM precompile circuits (std/evmprecompiles.py)
(≙ reference std/evmprecompiles tests: ecrecover, bn add/mul/pairing)."""

import random

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend.engine import Engine, EngineUnsatisfiedError
from gnark_icicle_tpu.std import evmprecompiles as evm
from gnark_icicle_tpu.std.evmprecompiles import (
    _SECP_G, _SECP_N, _SECP_P, _h_add, _h_mul,
)
from gnark_icicle_tpu.std.sw_emulated import AffinePoint

Q = bn254.R


def _sign(msg: int, priv: int, rng) -> tuple:
    """Host ECDSA sign returning (v, r, s) with the recovery parity."""
    while True:
        k = rng.randrange(1, _SECP_N)
        R = _h_mul(_SECP_G, k)
        r = R[0] % _SECP_N
        if r == 0:
            continue
        s = (msg + r * priv) * pow(k, -1, _SECP_N) % _SECP_N
        if s == 0:
            continue
        # parity of R.y, adjusted when r wraps (r == R.x here since
        # R.x < n for the overwhelming majority; retry otherwise)
        if R[0] >= _SECP_N:
            continue
        return R[1] & 1, r, s


@pytest.mark.slow
def test_ecrecover_recovers_and_rejects():
    rng = random.Random(41)
    priv = rng.randrange(1, _SECP_N)
    pub = _h_mul(_SECP_G, priv)
    msg = rng.randrange(1, _SECP_N)
    v, r, s = _sign(msg, priv, rng)

    eng = Engine(Q)
    # build the emulated inputs through a curve context
    from gnark_icicle_tpu.std.sw_emulated import EmulatedCurve, SECP256K1

    c = EmulatedCurve(eng, SECP256K1, Q)
    P = evm.ec_recover(eng, Q, c.fr.constant(msg), v,
                       c.fr.constant(r), c.fr.constant(s))
    assert c.fp.value_hint(c.fp.reduce(P.x)) == pub[0]
    assert c.fp.value_hint(c.fp.reduce(P.y)) == pub[1]

    # a flipped parity bit recovers a DIFFERENT key (or fails) — it must
    # not silently return the same pubkey
    eng2 = Engine(Q)
    c2 = EmulatedCurve(eng2, SECP256K1, Q)
    try:
        P2 = evm.ec_recover(eng2, Q, c2.fr.constant(msg), 1 - v,
                            c2.fr.constant(r), c2.fr.constant(s))
        assert c2.fp.value_hint(c2.fp.reduce(P2.x)) != pub[0]
    except (EngineUnsatisfiedError, ValueError):
        pass

    # strict range: a high-s signature must be rejected
    hi_s = _SECP_N - s
    eng3 = Engine(Q)
    c3 = EmulatedCurve(eng3, SECP256K1, Q)
    if hi_s > (_SECP_N - 1) // 2:
        with pytest.raises((EngineUnsatisfiedError, ValueError)):
            evm.ec_recover(eng3, Q, c3.fr.constant(msg), v,
                           c3.fr.constant(r), c3.fr.constant(hi_s),
                           strict_range=True)


def _bn_pt(c, pt):
    return AffinePoint(c.fp.constant(pt[0]), c.fp.constant(pt[1]))


def test_ecadd_ecmul_match_host():
    from gnark_icicle_tpu.std.sw_emulated import EmulatedCurve, BN254G1

    rng = random.Random(42)
    g1 = bn254.G1
    p = g1.random_point(rng)
    q = g1.random_point(rng)
    eng = Engine(Q)
    c = EmulatedCurve(eng, BN254G1, Q)
    got = evm.ec_add(eng, Q, _bn_pt(c, p), _bn_pt(c, q))
    want = g1.add(p, q)
    assert c.fp.value_hint(c.fp.reduce(got.x)) == want[0]
    assert c.fp.value_hint(c.fp.reduce(got.y)) == want[1]
    # doubling via the unified path
    got2 = evm.ec_add(eng, Q, _bn_pt(c, p), _bn_pt(c, p))
    want2 = g1.add(p, p)
    assert c.fp.value_hint(c.fp.reduce(got2.x)) == want2[0]

    k = rng.randrange(1, bn254.R)
    got3 = evm.ec_mul(eng, Q, _bn_pt(c, p), c.fr.constant(k))
    want3 = g1.scalar_mul(p, k)
    assert c.fp.value_hint(c.fp.reduce(got3.x)) == want3[0]
    # identity input stays identity
    inf = AffinePoint(c.fp.constant(0), c.fp.constant(0))
    got4 = evm.ec_mul(eng, Q, inf, c.fr.constant(k))
    assert c.fp.value_hint(c.fp.reduce(got4.x)) == 0
    assert c.fp.value_hint(c.fp.reduce(got4.y)) == 0


@pytest.mark.slow
def test_ecpair_accepts_and_rejects():
    from gnark_icicle_tpu.std.sw_emulated import EmulatedCurve, BN254G1

    rng = random.Random(43)
    g1 = bn254.G1
    pt = g1.random_point(rng)
    qt = bn254.G2.random_point(rng)
    eng = Engine(Q)
    c = EmulatedCurve(eng, BN254G1, Q)

    def g2c(pr, q):
        return (pr.e2.constant(q[0].c0, q[0].c1),
                pr.e2.constant(q[1].c0, q[1].c1))

    from gnark_icicle_tpu.std.pairing_bn254 import BN254Pairing

    pr = BN254Pairing(eng, Q)
    evm.ec_pair(eng, Q, [
        (_bn_pt(c, pt), g2c(pr, qt)),
        (_bn_pt(c, g1.neg(pt)), g2c(pr, qt)),
    ])
    with pytest.raises(EngineUnsatisfiedError):
        eng2 = Engine(Q)
        c2 = EmulatedCurve(eng2, BN254G1, Q)
        pr2 = BN254Pairing(eng2, Q)
        other = g1.random_point(rng)
        evm.ec_pair(eng2, Q, [
            (_bn_pt(c2, pt), g2c(pr2, qt)),
            (_bn_pt(c2, g1.neg(other)), g2c(pr2, qt)),
        ])


def test_expmod_variable_modulus():
    """0x05 MODEXP: witness modulus, EVM 0/1-modulus edges
    (≙ evmprecompiles.Expmod tests)."""
    from gnark_icicle_tpu.std.emulated import BN254_FP, EmulatedField

    rng = random.Random(44)
    eng = Engine(Q)
    fp = EmulatedField(eng, BN254_FP, Q)
    for _ in range(5):
        b = rng.randrange(1 << 200)
        e = rng.randrange(1 << 64)
        m = rng.randrange(2, 1 << 200)
        got = evm.expmod(eng, fp,
                         fp.constant_raw(b),
                         fp.constant_raw(e),
                         fp.constant_raw(m))
        want = pow(b, e, m)
        have = sum(int(v) << (64 * i) for i, v in enumerate(got.limbs))
        assert have == want, (b, e, m)
    # degenerate moduli
    for m in (0, 1):
        got = evm.expmod(eng, fp, fp.constant_raw(5),
                         fp.constant_raw(3), fp.constant_raw(m))
        assert sum(int(v) << (64 * i) for i, v in enumerate(got.limbs)) == 0


def test_mod_mul_lt_soundness():
    """The borrow-chain r < m proof rejects a non-canonical remainder."""
    from gnark_icicle_tpu.std.emulated import BN254_FP, EmulatedField

    eng = Engine(Q)
    fp = EmulatedField(eng, BN254_FP, Q)
    a = fp.constant_raw(100)
    b = fp.constant_raw(77)
    fp.assert_elem_lt(b, a)  # 77 < 100 OK
    with pytest.raises(EngineUnsatisfiedError):
        fp.assert_elem_lt(a, b)
    with pytest.raises(EngineUnsatisfiedError):
        fp.assert_elem_lt(a, a)  # strict
