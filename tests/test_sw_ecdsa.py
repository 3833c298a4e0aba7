"""sw_emulated curve gadget + in-circuit ECDSA tests.

Parity model: reference std/algebra/emulated/sw_emulated/point_test.go
(add/double/triple/scalar-mul against host values) and
std/signature/ecdsa/ecdsa_test.go (sign with the host library, verify
in-circuit; wrong signatures rejected).
"""

import random

import pytest

from gnark_icicle_tpu.curves import bn254, secp256k1
from gnark_icicle_tpu.frontend import (
    Circuit, Public, Secret, compile_circuit, is_solved,
)
from gnark_icicle_tpu.constraint import is_satisfied
from gnark_icicle_tpu.std.emulated import EmulatedField
from gnark_icicle_tpu.std import sw_emulated
from gnark_icicle_tpu.std.sw_emulated import (
    SECP256K1, BN254G1, EmulatedCurve, AffinePoint,
)
from gnark_icicle_tpu.std import ecdsa as ecdsa_gadget

Q = bn254.R  # native field for all circuits here


def _limbs(value, params):
    return [
        (value >> (params.limb_bits * i)) & ((1 << params.limb_bits) - 1)
        for i in range(params.n_limbs)
    ]


# ---------------------------------------------------------------------------
# group-law circuits on emulated BN254 G1 (host bn254.G1 is the oracle)
# ---------------------------------------------------------------------------

class EmuAdd(Circuit):
    px = Secret(shape=4); py = Secret(shape=4)
    qx = Secret(shape=4); qy = Secret(shape=4)
    rx = Public(shape=4); ry = Public(shape=4)

    def define(self, api):
        c = EmulatedCurve(api, BN254G1, Q)
        p = c.witness_point(self.px, self.py)
        q = c.witness_point(self.qx, self.qy)
        r = c.witness_point(self.rx, self.ry)
        c.assert_on_curve(p)
        c.assert_on_curve(q)
        c.assert_is_equal(c.add(p, q), r)


class EmuDoubleTriple(Circuit):
    px = Secret(shape=4); py = Secret(shape=4)
    dx = Public(shape=4); dy = Public(shape=4)
    tx = Public(shape=4); ty = Public(shape=4)

    def define(self, api):
        c = EmulatedCurve(api, BN254G1, Q)
        p = c.witness_point(self.px, self.py)
        c.assert_is_equal(c.double(p), c.witness_point(self.dx, self.dy))
        c.assert_is_equal(c.triple(p), c.witness_point(self.tx, self.ty))


class EmuAddUnified(Circuit):
    """add_unified covers p+q, p+p, p+(-p) and (0,0) operands."""

    px = Secret(shape=4); py = Secret(shape=4)
    rx = Public(shape=4); ry = Public(shape=4)

    def define(self, api):
        c = EmulatedCurve(api, BN254G1, Q)
        p = c.witness_point(self.px, self.py)
        r = c.witness_point(self.rx, self.ry)
        # p + p == double via unified formulas
        c.assert_is_equal(c.add_unified(p, p), r)
        # p + (-p) == (0,0)
        c.assert_is_equal(c.add_unified(p, c.neg(p)), c.infinity())
        # (0,0) + p == p
        c.assert_is_equal(c.add_unified(c.infinity(), p), p)
        c.assert_is_equal(c.add_unified(p, c.infinity()), p)


def _pt_kwargs(prefix, pt):
    from gnark_icicle_tpu.std.emulated import BN254_FP

    return {
        prefix + "x": _limbs(pt[0], BN254_FP),
        prefix + "y": _limbs(pt[1], BN254_FP),
    }


def test_emulated_add_engine_and_solver():
    g1 = bn254.G1
    rng = random.Random(3)
    p = g1.random_point(rng)
    q = g1.random_point(rng)
    r = g1.add(p, q)
    w = EmuAdd(**_pt_kwargs("p", p), **_pt_kwargs("q", q),
               **_pt_kwargs("r", r))
    assert is_solved(w, Q)
    bad = EmuAdd(**_pt_kwargs("p", p), **_pt_kwargs("q", q),
                 **_pt_kwargs("r", g1.add(r, g1.generator)))
    assert not is_solved(bad, Q)
    # solver path on the compiled system
    cs = compile_circuit(Q, EmuAdd)
    pub, sec = w.witness_values(Q)
    assert is_satisfied(cs, pub, sec)
    bpub, bsec = bad.witness_values(Q)
    assert not is_satisfied(cs, bpub, bsec)


def test_emulated_double_triple_engine():
    g1 = bn254.G1
    rng = random.Random(4)
    p = g1.random_point(rng)
    w = EmuDoubleTriple(
        **_pt_kwargs("p", p),
        **_pt_kwargs("d", g1.scalar_mul(p, 2)),
        **_pt_kwargs("t", g1.scalar_mul(p, 3)),
    )
    assert is_solved(w, Q)


def test_add_unified_edges_engine():
    g1 = bn254.G1
    rng = random.Random(5)
    p = g1.random_point(rng)
    w = EmuAddUnified(**_pt_kwargs("p", p),
                      **_pt_kwargs("r", g1.scalar_mul(p, 2)))
    assert is_solved(w, Q)


class EmuScalarMulSmall(Circuit):
    """[s]·p for a small witness scalar (n_bits-capped Joye ladder)."""

    px = Secret(shape=4); py = Secret(shape=4)
    s = Secret(shape=4)
    rx = Public(shape=4); ry = Public(shape=4)

    N_BITS = 6

    def define(self, api):
        c = EmulatedCurve(api, BN254G1, Q)
        p = c.witness_point(self.px, self.py)
        s = c.fr.from_limbs(self.s)
        r = c.scalar_mul(p, s, n_bits=self.N_BITS)
        c.assert_is_equal(r, c.witness_point(self.rx, self.ry))


@pytest.mark.parametrize("scalar", [1, 2, 5, 63])
def test_scalar_mul_small_engine(scalar):
    from gnark_icicle_tpu.std.emulated import BN254_FR

    g1 = bn254.G1
    rng = random.Random(scalar)
    p = g1.random_point(rng)
    w = EmuScalarMulSmall(
        **_pt_kwargs("p", p), s=_limbs(scalar, BN254_FR),
        **_pt_kwargs("r", g1.scalar_mul(p, scalar)),
    )
    assert is_solved(w, Q)


def test_scalar_mul_full_width_engine():
    """Full 254-bit scalar through the ladder (engine only — the compiled
    circuit is ~1M constraints, exercised in the reference by its own slow
    test tier)."""
    from gnark_icicle_tpu.std.emulated import BN254_FR

    g1 = bn254.G1
    rng = random.Random(99)
    p = g1.random_point(rng)
    s = rng.randrange(1, bn254.R)

    # full width: bypass the class cap via a subclass
    class FullWidth(EmuScalarMulSmall):
        N_BITS = None

    w2 = FullWidth(
        **_pt_kwargs("p", p), s=_limbs(s, BN254_FR),
        **_pt_kwargs("r", g1.scalar_mul(p, s)),
    )
    assert is_solved(w2, Q)


# ---------------------------------------------------------------------------
# ECDSA (secp256k1) — sign on host, verify in-circuit via the engine
# ---------------------------------------------------------------------------

class EcdsaCircuit(Circuit):
    pub_x = Secret(shape=4); pub_y = Secret(shape=4)
    sig_r = Secret(shape=4); sig_s = Secret(shape=4)
    msg = Public(shape=4)

    def define(self, api):
        c = EmulatedCurve(api, SECP256K1, Q)
        pub = ecdsa_gadget.PublicKey(
            c.witness_point(self.pub_x, self.pub_y)
        )
        sig = ecdsa_gadget.Signature(
            c.fr.from_limbs(self.sig_r), c.fr.from_limbs(self.sig_s)
        )
        msg = c.fr.from_limbs(self.msg)
        ecdsa_gadget.verify(c, pub, msg, sig)


def _ecdsa_witness(rng, tamper=None):
    from gnark_icicle_tpu.std.emulated import SECP256K1_FP, SECP256K1_FR

    d, pub = secp256k1.keygen(rng)
    h = rng.randrange(1, secp256k1.N)
    r, s = secp256k1.sign(d, h)
    assert secp256k1.verify(pub, h, (r, s))
    if tamper == "r":
        r = (r + 1) % secp256k1.N or 1
    elif tamper == "msg":
        h = (h + 1) % secp256k1.N or 1
    return EcdsaCircuit(
        pub_x=_limbs(pub[0], SECP256K1_FP),
        pub_y=_limbs(pub[1], SECP256K1_FP),
        sig_r=_limbs(r, SECP256K1_FR),
        sig_s=_limbs(s, SECP256K1_FR),
        msg=_limbs(h, SECP256K1_FR),
    )


@pytest.mark.slow
def test_ecdsa_verify_engine():
    rng = random.Random(2024)
    assert is_solved(_ecdsa_witness(rng), Q)


@pytest.mark.slow
def test_ecdsa_rejects_bad_signature_engine():
    rng = random.Random(2025)
    assert not is_solved(_ecdsa_witness(rng, tamper="r"), Q)
    assert not is_solved(_ecdsa_witness(rng, tamper="msg"), Q)


def test_host_ecdsa_roundtrip():
    rng = random.Random(7)
    d, pub = secp256k1.keygen(rng)
    h = rng.randrange(1, secp256k1.N)
    sig = secp256k1.sign(d, h)
    assert secp256k1.verify(pub, h, sig)
    assert not secp256k1.verify(pub, h, (sig[0], (sig[1] + 1) % secp256k1.N))
    assert not secp256k1.verify(pub, (h + 1) % secp256k1.N, sig)


@pytest.mark.slow
def test_ecdsa_compiles_and_solves():
    """The emulated-path milestone VERDICT flagged: the ECDSA gadget (two
    full-width emulated scalar muls + field ops) COMPILED to constraints
    and solved — not just engine-run (≙ ecdsa_test.go's compiled prove
    path; the on-chip prove of this system rides the TPU suite)."""
    import time

    t0 = time.time()
    cs = compile_circuit(Q, EcdsaCircuit)
    print(f"ecdsa circuit: {cs.nb_constraints} constraints "
          f"({time.time()-t0:.1f}s compile)")
    w = _ecdsa_witness(random.Random(2026))
    pub, sec = w.witness_values(Q)
    assert is_satisfied(cs, pub, sec)
    bad = _ecdsa_witness(random.Random(2026), tamper="r")
    bpub, bsec = bad.witness_values(Q)
    assert not is_satisfied(cs, bpub, bsec)
