"""Native 2-chain gadgets: complete-formula group law, BLS12-377 pairing
over the native field, and the in-circuit Groth16 verifier.

≙ reference std/algebra/native/sw_bls12377 tests (g1_test.go, g2_test.go,
pairing2_test.go) + std/recursion/groth16 2-chain verifier tests. Engine
arithmetic here is native big-int — each gadget mul is one engine mul, so
even full pairings run in seconds (contrast the emulated-path tests)."""

import random

import pytest

from gnark_icicle_tpu.curves import bls12_377 as b377
from gnark_icicle_tpu.curves.pairing import BLSPairing
from gnark_icicle_tpu.curves.tower import Fp2, Fp6, Fp12
from gnark_icicle_tpu.frontend.engine import Engine, EngineUnsatisfiedError
from gnark_icicle_tpu.std.pairing_bls12_377 import BLS12377Pairing

NQ = b377.P  # the native field: BW6-761's Fr == BLS12-377's Fp
TP = b377.TOWER


def _host_bls377() -> BLSPairing:
    return BLSPairing(TP, b377.P, b377.R, b377.X_SEED, m_twist=False)


def _gin1(pr, p):
    return (pr.fp.constant(p[0]), pr.fp.constant(p[1]))


def _gin2(pr, q):
    return (pr.e2.constant(q[0].c0, q[0].c1),
            pr.e2.constant(q[1].c0, q[1].c1))


def _out12(g):
    def out2(c):
        return Fp2(TP, int(c[0]), int(c[1]))

    return Fp12(TP, Fp6(TP, *(out2(c) for c in g[0])),
                Fp6(TP, *(out2(c) for c in g[1])))


def _aff1(P):
    """Projective gadget G1 value (engine ints) -> host affine tuple."""
    X, Y, Z = (int(v) for v in P)
    if Z == 0:
        return None
    zi = pow(Z, -1, b377.P)
    return (X * zi % b377.P, Y * zi % b377.P)


def _aff2(P):
    X, Y, Z = P
    xz = Fp2(TP, int(X[0]), int(X[1]))
    yz = Fp2(TP, int(Y[0]), int(Y[1]))
    zz = Fp2(TP, int(Z[0]), int(Z[1]))
    if zz.c0 == 0 and zz.c1 == 0:
        return None
    zi = zz.inv()
    a = (xz * zi, yz * zi)
    return (a[0], a[1])


def test_g1_complete_formulas_match_host():
    rng = random.Random(41)
    eng = Engine(NQ)
    pr = BLS12377Pairing(eng)
    g1g, host = pr.g1, b377.G1
    p = host.random_point(rng)
    q = host.random_point(rng)
    P = g1g.from_affine(_gin1(pr, p))
    Qp = g1g.from_affine(_gin1(pr, q))
    assert _aff1(g1g.add(P, Qp)) == host.add(p, q)
    assert _aff1(g1g.double(P)) == host.add(p, p)
    # complete-formula edge cases: identity absorbs, P + (−P) = O
    ident = g1g.identity()
    assert _aff1(g1g.add(ident, P)) == p
    assert _aff1(g1g.add(P, ident)) == p
    negP = g1g.neg(P)
    assert _aff1(g1g.add(P, negP)) is None
    # doubling through add (the complete-add P==Q case)
    assert _aff1(g1g.add(P, P)) == host.add(p, p)
    # scalar ladders: constant and variable-bit
    k = rng.randrange(1, b377.R)
    assert _aff1(g1g.scalar_mul_const(P, k)) == host.scalar_mul(p, k)
    assert _aff1(g1g.scalar_mul(eng, P, k, 253)) == host.scalar_mul(p, k)
    assert _aff1(g1g.scalar_mul(eng, P, 0, 253)) is None
    # subgroup sanity: [r]P = O
    assert _aff1(g1g.scalar_mul_const(P, b377.R)) is None


def test_g2_complete_formulas_match_host():
    rng = random.Random(42)
    eng = Engine(NQ)
    pr = BLS12377Pairing(eng)
    g2g, host = pr.g2, b377.G2
    p = host.random_point(rng)
    q = host.random_point(rng)
    P = g2g.from_affine(_gin2(pr, p))
    Qp = g2g.from_affine(_gin2(pr, q))
    assert _aff2(g2g.add(P, Qp)) == host.add(p, q)
    assert _aff2(g2g.double(P)) == host.add(p, p)
    assert _aff2(g2g.add(P, g2g.neg(P))) is None
    k = rng.randrange(1, b377.R)
    assert _aff2(g2g.scalar_mul_const(P, k)) == host.scalar_mul(p, k)
    assert _aff2(g2g.scalar_mul_const(P, b377.R)) is None


# (2, 3) is on y² = x³ + 1 (9 = 8 + 1) but OUTSIDE the order-r subgroup
# (G1 cofactor ≈ 2^125); verified below with a raw [r]-ladder that does
# not reduce the scalar mod the group order.
_G1_NONSUB = (2, 3)
# x = 2 + u lift on the D-twist, outside the order-r subgroup (G2
# cofactor ≈ 2^629); y from the complex-method Fp2 sqrt.
_G2_NONSUB_Y = (
    87422840072826444250887876553565942107355551262075501346398264275644536685914269348883251443966746472990108358918,
    215532314401042231238087290877698852638896402558755014880383192266220331697178391270737005425522628434566521626153,
)


def _raw_mul(grp, pt, k):
    """Double-and-add WITHOUT scalar reduction (host scalar_mul reduces
    mod r, which silently accepts non-subgroup points)."""
    acc = None
    while k:
        if k & 1:
            acc = grp.add(acc, pt)
        pt = grp.add(pt, pt)
        k >>= 1
    return acc


def test_fast_subgroup_check_g1():
    """φ-eigenvalue membership (≙ pairing2.go AssertIsOnG1): accepts
    subgroup points, rejects on-curve non-subgroup points."""
    rng = random.Random(43)
    host = b377.G1
    # sanity: the bad point is on-curve and genuinely not in the subgroup
    x, y = _G1_NONSUB
    assert (y * y) % b377.P == (pow(x, 3, b377.P) + 1) % b377.P
    assert _raw_mul(host, _G1_NONSUB, b377.R) is not None

    for pt in (b377.G1_GEN, host.random_point(rng)):
        pr = BLS12377Pairing(Engine(NQ))
        pr.assert_g1_member(_gin1(pr, pt))  # must not raise

    pr = BLS12377Pairing(Engine(NQ))
    with pytest.raises(EngineUnsatisfiedError):
        pr.assert_g1_member(_gin1(pr, _G1_NONSUB))
    # off-curve point fails the on-curve leg
    pr = BLS12377Pairing(Engine(NQ))
    with pytest.raises(EngineUnsatisfiedError):
        pr.assert_g1_member(_gin1(pr, (x, (y + 1) % b377.P)))


def test_fast_subgroup_check_g2():
    """ψ-Frobenius membership (≙ pairing2.go AssertIsOnG2)."""
    rng = random.Random(44)
    host = b377.G2
    bad = (Fp2(TP, 2, 1), Fp2(TP, *_G2_NONSUB_Y))
    assert bad[1] * bad[1] == bad[0] * bad[0] * bad[0] + b377.G2_B
    assert _raw_mul(host, bad, b377.R) is not None

    for qt in (b377.G2_GEN, host.random_point(rng)):
        pr = BLS12377Pairing(Engine(NQ))
        pr.assert_g2_member(_gin2(pr, qt))  # must not raise

    pr = BLS12377Pairing(Engine(NQ))
    with pytest.raises(EngineUnsatisfiedError):
        pr.assert_g2_member(_gin2(pr, bad))
    pr = BLS12377Pairing(Engine(NQ))
    off = (bad[0], Fp2(TP, bad[1].c0, (bad[1].c1 + 1) % b377.P))
    with pytest.raises(EngineUnsatisfiedError):
        pr.assert_g2_member(_gin2(pr, off))


@pytest.mark.slow
def test_native_pairing_matches_host_oracle():
    rng = random.Random(43)
    pt = b377.G1.random_point(rng)
    qt = b377.G2.random_point(rng)
    eng = Engine(NQ)
    pr = BLS12377Pairing(eng)
    host = _host_bls377()
    ml = pr.miller_loop(_gin1(pr, pt), _gin2(pr, qt))
    assert _out12(ml) == host.miller_loop(pt, qt)
    gt = pr.final_exponentiation(ml)
    assert _out12(gt) == host.pair(pt, qt)


@pytest.mark.slow
def test_native_pairing_check_bilinearity():
    """e(aP, Q) · e(−P, aQ) == 1 — the product-check gadget shape."""
    rng = random.Random(44)
    g1, g2 = b377.G1, b377.G2
    pt = g1.random_point(rng)
    qt = g2.random_point(rng)
    a = rng.randrange(1, b377.R)
    eng = Engine(NQ)
    pr = BLS12377Pairing(eng)
    aP = g1.scalar_mul(pt, a)
    aQ = g2.scalar_mul(qt, a)
    negP = (pt[0], (-pt[1]) % b377.P)
    pr.assert_pairing_check(
        [(_gin1(pr, aP), _gin2(pr, qt)), (_gin1(pr, negP), _gin2(pr, aQ))]
    )
    # and a non-pairing must fail
    with pytest.raises(EngineUnsatisfiedError):
        pr.assert_pairing_check(
            [(_gin1(pr, aP), _gin2(pr, qt)), (_gin1(pr, negP), _gin2(pr, qt))]
        )


# ---------------------------------------------------------------------------
# the 2-chain: a REAL BLS12-377 Groth16 proof checked by the native verifier
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def inner_proof_377():
    from gnark_icicle_tpu.backend import groth16
    from gnark_icicle_tpu.frontend import compile_circuit

    from circuits import Cubic

    cs = compile_circuit(b377.R, Cubic)
    # host engine: tiny proof, no device warmup (engine=host is itself
    # e2e-validated; the device path is covered by the main e2e suites)
    pk, vk = groth16.setup(cs, b377.BLS12_377, rng=random.Random(2024),
                           engine="host")
    pub, sec = [35], [3]
    proof = groth16.prove(cs, pk, pub, sec, b377.BLS12_377,
                          rng=random.Random(7), engine="host")
    groth16.verify(proof, vk, pub, b377.BLS12_377)
    return vk, proof, pub


@pytest.mark.slow
def test_native_recursion_verifies_real_proof(inner_proof_377):
    from gnark_icicle_tpu.std.recursion.native_groth16 import (
        NativeGroth16Verifier,
    )

    vk, proof, pub = inner_proof_377
    gv = NativeGroth16Verifier(Engine(NQ), vk)
    gv.assert_proof(gv.proof_witness(proof), pub)


@pytest.mark.slow
def test_native_recursion_rejects_wrong_public(inner_proof_377):
    from gnark_icicle_tpu.std.recursion.native_groth16 import (
        NativeGroth16Verifier,
    )

    vk, proof, _ = inner_proof_377
    gv = NativeGroth16Verifier(Engine(NQ), vk)
    with pytest.raises(EngineUnsatisfiedError):
        gv.assert_proof(gv.proof_witness(proof), [36])


@pytest.mark.slow
def test_native_recursion_rejects_non_subgroup_point(inner_proof_377):
    """A point on the curve but OUTSIDE the order-r subgroup must fail the
    [r]P == O ladder (BLS12-377 G1 has cofactor ≈ 2^125, so on-curve alone
    is NOT membership — the check the reference does via IsInSubGroup)."""
    from gnark_icicle_tpu.std.recursion.native_groth16 import (
        NativeGroth16Verifier,
    )

    vk, proof, pub = inner_proof_377
    # find a curve point of full composite order: random x lifts land in
    # the whole group E(Fp) (order h·r); (h·r / r)·P ≠ O w.h.p. — just use
    # a random lift WITHOUT cofactor clearing
    rng = random.Random(97)
    while True:
        x = rng.randrange(b377.P)
        rhs = (pow(x, 3, b377.P) + b377.G1.b) % b377.P
        y = pow(rhs, (b377.P + 1) // 4, b377.P) if b377.P % 4 == 3 else None
        if y is None:
            # p ≡ 1 mod 4: Tonelli-Shanks via sympy-free route — use the
            # field's sqrt helper if present, else skip this x
            y = _sqrt_mod(rhs, b377.P)
        if y is None or (y * y) % b377.P != rhs:
            continue
        pt = (x, y)
        if not b377.G1.in_subgroup(pt):
            break
    gv = NativeGroth16Verifier(Engine(NQ), vk)
    bad = gv.proof_witness(proof)
    bad.ar = (gv.pairing.fp.constant(pt[0]), gv.pairing.fp.constant(pt[1]))
    with pytest.raises(EngineUnsatisfiedError):
        gv.assert_proof(bad, pub)


@pytest.mark.slow
def test_outer_bw6_proof_of_inner_verification(inner_proof_377):
    """THE 2-chain milestone: compile the native verifier to constraints,
    then setup/prove/verify a REAL Groth16 proof over BW6-761 whose
    statement is 'I know a valid BLS12-377 proof for these public inputs'
    (≙ reference std/recursion/groth16 outer-circuit tests over
    sw_bls12377, recursion actually proven — not engine-simulated)."""
    from gnark_icicle_tpu.backend import groth16
    from gnark_icicle_tpu.curves import bw6_761 as bw6
    from gnark_icicle_tpu.frontend import (
        Circuit, Public, Secret, compile_circuit,
    )
    from gnark_icicle_tpu.std.recursion.native_groth16 import (
        NativeGroth16Verifier, NativeVerifierProof,
    )

    vk, proof, pub = inner_proof_377

    class OuterG16(Circuit):
        inner_pub = Public()
        pr = Secret(shape=8)  # ax ay | bx0 bx1 by0 by1 | cx cy

        def define(self, api):
            gv = NativeGroth16Verifier(api, vk)
            p = self.pr
            w = NativeVerifierProof(
                ar=(p[0], p[1]),
                bs=((p[2], p[3]), (p[4], p[5])),
                krs=(p[6], p[7]),
            )
            gv.assert_proof(w, [self.inner_pub])

    cs = compile_circuit(b377.P, OuterG16)  # BW6-761's scalar field
    pk, ovk = groth16.setup(cs, bw6.BW6_761, rng=random.Random(5),
                            engine="host")
    w = OuterG16(
        inner_pub=pub[0],
        pr=[proof.ar[0], proof.ar[1],
            proof.bs[0].c0, proof.bs[0].c1, proof.bs[1].c0, proof.bs[1].c1,
            proof.krs[0], proof.krs[1]],
    )
    opub, osec = w.witness_values(b377.P)
    oproof = groth16.prove(cs, pk, opub, osec, bw6.BW6_761,
                           rng=random.Random(6), engine="host")
    groth16.verify(oproof, ovk, opub, bw6.BW6_761)
    # tampered inner public input must make the outer statement false
    from gnark_icicle_tpu.backend.groth16.verify import VerificationError

    with pytest.raises(VerificationError):
        groth16.verify(oproof, ovk, [(pub[0] + 1) % b377.R], bw6.BW6_761)


def _sqrt_mod(a: int, p: int):
    """Tonelli-Shanks (p odd prime); None if a is a non-residue."""
    a %= p
    if a == 0:
        return 0
    if pow(a, (p - 1) // 2, p) != 1:
        return None
    if p % 4 == 3:
        return pow(a, (p + 1) // 4, p)
    # general case
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    m, c, t, r = s, pow(z, q, p), pow(a, q, p), pow(a, (q + 1) // 2, p)
    while t != 1:
        i, t2 = 0, t
        while t2 != 1:
            t2 = t2 * t2 % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c = i, b * b % p
        t, r = t * c % p, r * b % p
    return r


# -- native 2-chain PLONK (≙ std/recursion/plonk over sw_bls12377) -----------

@pytest.fixture(scope="module")
def inner_plonk_377():
    from gnark_icicle_tpu.backend import plonk
    from gnark_icicle_tpu.frontend import compile_circuit

    from circuits import Cubic

    scs = compile_circuit(b377.R, Cubic, builder="scs")
    pk, vk = plonk.setup(scs, b377.BLS12_377, rng=random.Random(3030),
                         engine="host")
    pub, sec = [35], [3]
    proof = plonk.prove(scs, pk, pub, sec, b377.BLS12_377,
                        rng=random.Random(17), fs_hash="mimc",
                        engine="host")
    plonk.verify(proof, vk, pub, b377.BLS12_377, fs_hash="mimc")
    return vk, proof, pub


@pytest.mark.slow
def test_native_plonk_recursion(inner_plonk_377):
    """A BW6-761 circuit (engine) verifies a BLS12-377 PLONK proof: curve
    ops native, inner-Fr scalar layer (transcript included) through the
    cheap 4-limb emulated field."""
    from gnark_icicle_tpu.std.recursion.native_plonk import (
        NativePlonkVerifier,
    )

    vk, proof, pub = inner_plonk_377
    pv = NativePlonkVerifier(Engine(NQ), vk)
    pv.assert_proof(pv.proof_witness(proof), pub)

    pv2 = NativePlonkVerifier(Engine(NQ), vk)
    with pytest.raises(EngineUnsatisfiedError):
        pv2.assert_proof(pv2.proof_witness(proof), [36])
