"""In-circuit pairing + KZG verification (≙ std/algebra/emulated/sw_bn254
pairing tests + std/commitments/kzg verifier tests). Engine-level: one
pairing is ~10⁴ emulated E2 muls — semantically complete, compilation
awaits the range-table mul optimization (ROADMAP)."""

import random

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.curves.tower import Fp2, Fp6, Fp12
from gnark_icicle_tpu.frontend.engine import Engine, EngineUnsatisfiedError
from gnark_icicle_tpu.std.pairing_bn254 import BN254Pairing

Q = bn254.R
TP = bn254.TOWER


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
def test_pairing_matches_host_oracle():
    from gnark_icicle_tpu.curves.pairing import BNPairing

    rng = random.Random(9)
    pt = bn254.G1.random_point(rng)
    qt = bn254.G2.random_point(rng)
    eng = Engine(Q)
    pr = BN254Pairing(eng, Q)
    host = BNPairing(TP, bn254.P, Q, bn254.X_SEED)
    ml = pr.miller_loop(_gin1(pr, pt), _gin2(pr, qt))
    assert _out12(pr, ml) == host.miller_loop(pt, qt)
    gt = pr.final_exponentiation(ml)
    assert _out12(pr, gt) == host.pair(pt, qt)


@pytest.mark.slow
def test_pairing_check_bilinearity():
    rng = random.Random(10)
    g1 = bn254.G1
    pt = g1.random_point(rng)
    qt = bn254.G2.random_point(rng)
    eng = Engine(Q)
    pr = BN254Pairing(eng, Q)
    pr.assert_pairing_check([
        (_gin1(pr, pt), _gin2(pr, qt)),
        (_gin1(pr, g1.neg(pt)), _gin2(pr, qt)),
    ])
    with pytest.raises(EngineUnsatisfiedError):
        other = g1.random_point(rng)
        pr2 = BN254Pairing(Engine(Q), Q)
        pr2.assert_pairing_check([
            (_gin1(pr2, pt), _gin2(pr2, qt)),
            (_gin1(pr2, g1.neg(other)), _gin2(pr2, qt)),
        ])


@pytest.mark.slow
def test_kzg_gadget_opening():
    from gnark_icicle_tpu.backend.kzg import KZG, unsafe_srs
    from gnark_icicle_tpu.std.kzg_gadget import KzgVerifier
    from gnark_icicle_tpu.std.sw_emulated import AffinePoint

    rng = random.Random(12)
    srs = unsafe_srs(bn254.BN254, 16, rng=rng)
    kzg = KZG(bn254.BN254, srs)
    coeffs = [rng.randrange(Q) for _ in range(8)]
    com = kzg.commit(coeffs)
    z = rng.randrange(Q)
    v, w = kzg.open(coeffs, z)
    assert kzg.verify(com, z, v, w)

    kv = KzgVerifier(Engine(Q), Q, srs.g2_gen, srs.g2_tau)

    def gpt(pt):
        return AffinePoint(kv.curve.fp.constant(pt[0]),
                           kv.curve.fp.constant(pt[1]))

    fr = kv.curve.fr
    kv.assert_opening(gpt(com), fr.constant(z), fr.constant(v), gpt(w))

    kv2 = KzgVerifier(Engine(Q), Q, srs.g2_gen, srs.g2_tau)
    with pytest.raises(EngineUnsatisfiedError):
        kv2.assert_opening(gpt(com), fr.constant(z),
                           fr.constant((v + 1) % Q), gpt(w))
