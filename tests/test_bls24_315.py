"""BLS24-315 — the 5th reference curve, derived from in-tree invariants.

Every derived parameter is cross-checked against what the reference tree
DOES pin (PARITY.md round-5 memo): the emparams moduli, the ate loop
counter, the GLV λ/ω bytes (sw_bls24315/inner.go:33-41) and all 13
Frobenius coefficients (fields_bls24315/e24.go:70-85). Generators are
framework-chosen deterministic points (documented divergence — nothing
in-tree pins gnark-crypto's choice).
"""

import random

import pytest

from gnark_icicle_tpu.curves import bls24_315 as b24
from gnark_icicle_tpu.frontend import Circuit, Public, Secret, compile_circuit
from gnark_icicle_tpu.backend import groth16, plonk

P, R, X = b24.P, b24.R, b24.X_SEED


def test_seed_and_moduli_match_reference_tree():
    # emparams.go:264 (base field, decimal) and :280 (scalar field, hex)
    assert P == int(
        "39705142709513438335025689890408969744933502416914749335064285"
        "505637884093126342347073617133569")
    assert R == 0x196deac24a9da12b25fc7ec9cf927a98c8c480ece644e36419d0c5fd00c00001
    assert R == X**8 - X**4 + 1
    assert P == (X - 1) ** 2 * R // 3 + X
    # the ate loop counter (sw_bls24315/pairing.go:29) is |x| in signed
    # binary, little-endian bit positions
    lc = [-1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
          1, 0, -1, 0, 0, 0, 0, 0, 0, 0, -1, 0, 1]
    assert sum(b << i for i, b in enumerate(lc)) == abs(X)


def test_glv_constants_match_reference_tree():
    # sw_bls24315/inner.go:33-41
    assert (b24.GLV_LAMBDA ** 2 + b24.GLV_LAMBDA + 1) % R == 0
    assert b24.GLV_LAMBDA % R == (X**4 - 1) % R
    assert pow(b24.GLV_OMEGA, 3, P) == 1 and b24.GLV_OMEGA != 1
    # the endomorphism φ(x,y) = (ω·x, y) acts as [λ] on G1
    g = b24.G1_GEN
    phi = (b24.GLV_OMEGA * g[0] % P, g[1])
    assert b24.G1.is_on_curve(phi)
    assert phi == b24.G1.scalar_mul(g, b24.GLV_LAMBDA)


def test_frobenius_coefficients_match_reference_tree():
    """All 13 in-tree E24 Frobenius coefficients are the expected powers
    of the tower non-residue 13 (fields_bls24315/e24.go:70-85) — pinning
    the Fp→Fp2→Fp4→…→Fp24 tower this module reconstructs."""
    coeffs = {
        0: (1, 4), 1: (1, 12), 2: (1, 3), 4: (5, 12), 5: (1, 24),
        6: (7, 24), 7: (1, 8), 8: (3, 8), 9: (5, 24), 10: (11, 24),
        11: (2, 3),
    }
    intree = {
        0: 14265754707630841383590096931465005402246260064523506653409458152869013672931584279153351926943,
        1: 17432737665785421589107433512831558061649422754130449334965277047994983947893909429238815314776,
        2: 39705142672498995661671850106945620852186608752525090699191017895721506694646055668218723303426,
        4: 36538159751358858129508353309042417085530339727307806653508466610511913818164017196988153745736,
        5: 37719635718874797449167165011304104204868932892052995456614707782168504515295626008356825673023,
        6: 33342866563749162527758572927163102293238492708847648721152723115703639794013692274261201232097,
        7: 13266452002786802757645810648664867986567631927642464177452792960815113608167203350720036682455,
        8: 29019463919452620058839222695754364428302059305947724697987901631588253225470374568267230540725,
        9: 27033956928813979172980697816649498888237489781085970819538323908118873647639658229550439080179,
        10: 20076414560962359770112762278498234306670860781205184543699930154888526185846488923541164549642,
        11: 37014442673353839783463348892746893664389658635873267609916377398480286678854893830142,
    }
    for k, (mult, denom) in coeffs.items():
        assert (P - 1) % denom == 0
        assert pow(13, mult * ((P - 1) // denom), P) == intree[k], k


def test_curve_orders():
    assert b24.N1 == P + 1 - (X + 1)
    assert b24.H1 * R == b24.N1
    g1, g2 = b24.G1_GEN, b24.G2_GEN
    assert b24.G1.is_on_curve(g1) and b24.G2.is_on_curve(g2)
    assert b24.G1.scalar_mul(g1, R) is None
    assert b24.G2.scalar_mul(g2, R) is None
    rng = random.Random(3)
    p = b24.G1.random_point(rng)
    assert b24.G1.scalar_mul(p, R) is None  # cofactor-cleared sampling


@pytest.mark.slow
def test_pairing_bilinear_nondegenerate():
    e = b24.multi_pairing([b24.G1_GEN], [b24.G2_GEN])
    assert e != b24.E24_ONE
    a, b = 987654321, 123456789
    Pa = b24.G1.scalar_mul(b24.G1_GEN, a)
    Qb = b24.G2.scalar_mul(b24.G2_GEN, b)
    assert b24.multi_pairing([Pa], [Qb]) == b24.e24_pow(e, a * b % R)
    # product/inverse
    assert b24.multi_pairing(
        [Pa, b24.G1.neg(Pa)], [Qb, Qb]) == b24.E24_ONE


class Cubic(Circuit):
    x = Secret()
    y = Public()

    def define(self, api):
        x3 = api.mul(api.mul(self.x, self.x), self.x)
        api.assert_is_equal(api.add(x3, self.x, 5), self.y)


@pytest.mark.slow
def test_groth16_e2e_bls24():
    cs = compile_circuit(R, Cubic)
    pk, vk = groth16.setup(cs, b24.BLS24_315, rng=random.Random(1),
                           engine="host")
    proof = groth16.prove(cs, pk, [35], [3], b24.BLS24_315,
                          rng=random.Random(2), engine="host")
    groth16.verify(proof, vk, [35], b24.BLS24_315)
    assert not groth16.is_valid(proof, vk, [36], b24.BLS24_315)


@pytest.mark.slow
def test_plonk_e2e_bls24():
    cs = compile_circuit(R, Cubic, builder="scs")
    pk, vk = plonk.setup(cs, b24.BLS24_315, rng=random.Random(1),
                         engine="host")
    proof = plonk.prove(cs, pk, [35], [3], b24.BLS24_315,
                        rng=random.Random(2), engine="host")
    plonk.verify(proof, vk, [35], b24.BLS24_315)
    assert not plonk.is_valid(proof, vk, [36], b24.BLS24_315)


@pytest.mark.slow
def test_groth16_commitment_bls24():
    """api.commit over BLS24-315: the Pedersen PoK batch-verify rides the
    curve's gt_one() (E24 identity) instead of the Fp12 tower."""

    class CommitSq(Circuit):
        x = Secret()
        y = Public()

        def define(self, api):
            c = api.commit(self.x, self.y)
            api.assert_is_different(c, 0)
            api.assert_is_equal(api.mul(self.x, self.x), self.y)

    cs = compile_circuit(R, CommitSq)
    pk, vk = groth16.setup(cs, b24.BLS24_315, rng=random.Random(4),
                           engine="host")
    proof = groth16.prove(cs, pk, [49], [7], b24.BLS24_315,
                          rng=random.Random(5), engine="host")
    groth16.verify(proof, vk, [49], b24.BLS24_315)
    assert not groth16.is_valid(proof, vk, [50], b24.BLS24_315)
