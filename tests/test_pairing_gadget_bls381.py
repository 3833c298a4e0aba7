"""BLS12-381 emulated pairing gadget (std/pairing_bls12_381.py) vs the
host oracle — the M-twist/negative-seed member of the sw_* family
(≙ reference std/algebra/emulated/sw_bls12381/pairing_test.go)."""

import random

import pytest

from gnark_icicle_tpu.curves import bls12_381 as b381
from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.curves.tower import Fp2, Fp6, Fp12
from gnark_icicle_tpu.frontend.engine import Engine, EngineUnsatisfiedError
from gnark_icicle_tpu.std.pairing_bls12_381 import BLS12381Pairing

Q = bn254.R  # the native circuit field hosting the emulation
TP = b381.TOWER


def _gin1(pr, p):
    return (pr.fp.constant(p[0]), pr.fp.constant(p[1]))


def _gin2(pr, q):
    return (pr.e2.constant(q[0].c0, q[0].c1),
            pr.e2.constant(q[1].c0, q[1].c1))


def _out12(pr, g):
    def out2(c):
        return Fp2(TP, pr.fp.value_hint(pr.fp.reduce(c[0])),
                   pr.fp.value_hint(pr.fp.reduce(c[1])))

    return Fp12(TP, Fp6(TP, *(out2(c) for c in g[0])),
                Fp6(TP, *(out2(c) for c in g[1])))


@pytest.mark.slow
def test_bls381_pairing_matches_host_oracle():
    from gnark_icicle_tpu.curves.pairing import BLSPairing

    rng = random.Random(19)
    pt = b381.G1.random_point(rng)
    qt = b381.G2.random_point(rng)
    eng = Engine(Q)
    pr = BLS12381Pairing(eng, Q)
    host = BLSPairing(TP, b381.P, b381.R, b381.X_SEED, m_twist=True)
    ml = pr.miller_loop(_gin1(pr, pt), _gin2(pr, qt))
    # the gadget's Miller value is w³/Fp2-scaled per line (M-twist shape) —
    # only the final exponentiation is oracle-comparable
    gt = pr.final_exponentiation(ml)
    assert _out12(pr, gt) == host.pair(pt, qt)


@pytest.mark.slow
def test_bls381_pairing_check_bilinearity():
    rng = random.Random(20)
    g1 = b381.G1
    pt = g1.random_point(rng)
    qt = b381.G2.random_point(rng)
    pr = BLS12381Pairing(Engine(Q), Q)
    pr.assert_pairing_check([
        (_gin1(pr, pt), _gin2(pr, qt)),
        (_gin1(pr, g1.neg(pt)), _gin2(pr, qt)),
    ])
    with pytest.raises(EngineUnsatisfiedError):
        other = g1.random_point(rng)
        pr2 = BLS12381Pairing(Engine(Q), Q)
        pr2.assert_pairing_check([
            (_gin1(pr2, pt), _gin2(pr2, qt)),
            (_gin1(pr2, g1.neg(other)), _gin2(pr2, qt)),
        ])


@pytest.mark.slow
def test_bls381_kzg_gadget_opening():
    """KZG opening verified in-circuit over emulated BLS12-381
    (≙ std/commitments/kzg instantiated with sw_bls12381). SRS built
    host-side — no device needed at this size."""
    from gnark_icicle_tpu.std.kzg_gadget import KzgVerifier
    from gnark_icicle_tpu.std.sw_emulated import AffinePoint

    rng = random.Random(13)
    r = b381.R
    tau = rng.randrange(2, r)
    g1 = b381.G1
    # host SRS + commit/open for a degree-7 polynomial
    coeffs = [rng.randrange(r) for _ in range(8)]

    def commit(cs):
        acc = None
        for i, c in enumerate(cs):
            if c == 0:
                continue
            term = g1.scalar_mul(g1.generator, c * pow(tau, i, r) % r)
            acc = term if acc is None else g1.add(acc, term)
        return acc

    com = commit(coeffs)
    z = rng.randrange(r)
    v = 0
    for c in reversed(coeffs):
        v = (v * z + c) % r
    # witness polynomial w(X) = (p(X) − v)/(X − z), synthetic division
    w = [0] * (len(coeffs) - 1)
    carry = 0
    for i in range(len(coeffs) - 1, 0, -1):
        carry = (coeffs[i] + carry * z) % r
        w[i - 1] = carry
    wcom = commit(w)
    g2 = b381.G2
    g2_gen = g2.generator
    g2_tau = g2.scalar_mul(g2.generator, tau)

    kv = KzgVerifier(Engine(Q), Q, g2_gen, g2_tau, curve_id="bls12-381")

    def gpt(pt):
        return AffinePoint(kv.curve.fp.constant(pt[0]),
                           kv.curve.fp.constant(pt[1]))

    fr = kv.curve.fr
    kv.assert_opening(gpt(com), fr.constant(z), fr.constant(v), gpt(wcom))

    kv2 = KzgVerifier(Engine(Q), Q, g2_gen, g2_tau, curve_id="bls12-381")
    with pytest.raises(EngineUnsatisfiedError):
        kv2.assert_opening(gpt(com), fr.constant(z),
                           fr.constant((v + 1) % r), gpt(wcom))
