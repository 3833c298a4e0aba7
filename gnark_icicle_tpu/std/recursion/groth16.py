"""In-circuit Groth16 verifier over emulated curves (BN254, BLS12-381,
BW6-761).

Role parity: reference std/recursion/groth16 (verifier.go — Verifier.
AssertProof: in-circuit subgroup checks, kSum linear combination of the
vk's K points by the public inputs, and the 3-pairing product against the
precomputed e(α, β)), instantiated for the emulated curve family
(sw_bn254, sw_bls12381, sw_bw6761 — the last wraps a 2-chain outer
proof into a third curve). The verifying key is circuit-constant (the
reference's "fixed" vk placement).

Public inputs: for same-curve recursion (BN254-in-BN254) the inner and
outer scalar fields coincide, so publics are NATIVE outer variables and
are bound with fr.from_native. For cross-curve recursion (a BLS12-381
proof inside a BN254 circuit) the inner Fr is emulated — pass emulated
``Element`` scalars (or host ints, bound as constants on the engine path).

Engine-level today, like the pairing gadgets this builds on; compiling to
a constraint system rides the deferred-mulcheck emulated path (ROADMAP).
The NATIVE (cheap) 2-chain verifier lives in native_groth16.py.
"""

from __future__ import annotations

from dataclasses import dataclass

from ...curves import bn254
from ..emulated import Element
from ..sw_emulated import (
    AffinePoint, BLS12381G1, BN254G1, BW6761G1, BW6761G2, EmulatedCurve,
)
from ..pairing_bn254 import BN254Pairing


@dataclass
class VerifierProof:
    """Gadget-side Groth16 proof (≙ recursion/groth16.Proof)."""

    ar: AffinePoint        # G1
    krs: AffinePoint       # G1
    bs: object             # G2: (x, y) E2 pair, or an AffinePoint when
                           # the inner curve's G2 lives over Fp (BW6-761)


class Groth16Verifier:
    """≙ recursion/groth16.Verifier with a circuit-constant vk.

    curve_id selects the emulated instantiation: "bn254" (default,
    same-curve recursion), "bls12-381" (cross-curve), or "bw6-761"
    (wrapping a 2-chain outer proof into a third curve — the final stage
    of BLS12-377 → BW6-761 → wrap)."""

    def __init__(self, api, native_modulus: int, vk, curve=None,
                 curve_id: str = "bn254"):
        """vk: host backend.groth16 VerifyingKey over the inner curve;
        curve: host curve object used once to precompute e(α, β)."""
        if vk.commitment_keys:
            raise NotImplementedError(
                "recursion over BSB22-commitment proofs: later round"
            )
        self.api = api
        self.vk = vk
        self.curve_id = curve_id
        self._g2_fp2 = True  # G2 over Fp2 (12-degree curves)
        if curve_id == "bn254":
            self.curve = EmulatedCurve(api, BN254G1, native_modulus)
            self.pairing = BN254Pairing(api, native_modulus)
            host = curve if curve is not None else bn254.BN254
            self._r = bn254.R
            self._g2_b = bn254.G2_B
            self._g1_cofactor_one = True
        elif curve_id == "bls12-381":
            from ...curves import bls12_381 as b381
            from ..pairing_bls12_381 import BLS12381Pairing

            self.curve = EmulatedCurve(api, BLS12381G1, native_modulus)
            self.pairing = BLS12381Pairing(api, native_modulus)
            host = curve if curve is not None else b381.BLS12_381
            self._r = b381.R
            self._g2_b = b381.G2_B
            # BLS12-381 G1 has cofactor ≈ 2^32: on-curve is NOT membership
            self._g1_cofactor_one = False
        elif curve_id == "bw6-761":
            from ...curves import bw6_761 as bw6
            from ..pairing_bw6_761 import BW6761Pairing

            self.curve = EmulatedCurve(api, BW6761G1, native_modulus)
            self._g2_curve = EmulatedCurve(api, BW6761G2, native_modulus)
            self.pairing = BW6761Pairing(api, native_modulus)
            host = curve if curve is not None else bw6.BW6_761
            self._r = bw6.R
            self._g2_fp2 = False  # sextic twist over Fp (k = 6)
            # BW6-761 G1 cofactor is ~384 bits: ladder required
            self._g1_cofactor_one = False
        else:
            raise ValueError(f"unsupported recursion curve {curve_id!r}")
        self._e_alpha_beta = vk.e_alpha_beta(host)
        if self._g2_fp2:
            e2 = self.pairing.e2
            self._gamma = (e2.constant(vk.g2_gamma[0].c0, vk.g2_gamma[0].c1),
                           e2.constant(vk.g2_gamma[1].c0, vk.g2_gamma[1].c1))
            self._delta = (e2.constant(vk.g2_delta[0].c0, vk.g2_delta[0].c1),
                           e2.constant(vk.g2_delta[1].c0, vk.g2_delta[1].c1))
            self._twist_b = e2.constant(self._g2_b.c0, self._g2_b.c1)
        else:
            self._gamma = self._g2_curve.constant_point(vk.g2_gamma)
            self._delta = self._g2_curve.constant_point(vk.g2_delta)

    # -- witness constructors ------------------------------------------------
    def proof_witness(self, proof) -> VerifierProof:
        """Bind a host Proof's point values as gadget witnesses (engine
        path; a compiled outer circuit allocates the limbs as Secret)."""
        fp = self.curve.fp
        e2 = self.pairing.e2 if self._g2_fp2 else None

        def g1(pt):
            return AffinePoint(fp.constant(pt[0]), fp.constant(pt[1]))

        def g2(pt):
            if not self._g2_fp2:
                return AffinePoint(self._g2_curve.fp.constant(pt[0]),
                                   self._g2_curve.fp.constant(pt[1]))
            return (e2.constant(pt[0].c0, pt[0].c1),
                    e2.constant(pt[1].c0, pt[1].c1))

        return VerifierProof(ar=g1(proof.ar), krs=g1(proof.krs),
                             bs=g2(proof.bs))

    # -- checks --------------------------------------------------------------
    def _assert_g1_member(self, p: AffinePoint):
        """On-curve, plus the full-order ladder [r−1]·P == −P when the
        cofactor exceeds 1 (≙ AssertIsOnG1). Incomplete formulas with a
        fixed scalar: partial sums [m]P, m < r−1, never hit O or a
        ±-collision with P for an order-r point; a non-member can at worst
        make the ladder unsatisfiable — the desired outcome."""
        c = self.curve
        c.assert_on_curve(p)
        if self._g1_cofactor_one:
            return
        acc = p
        for bit in bin(self._r - 1)[3:]:
            acc = c.double(acc)
            if bit == "1":
                acc = c.add(acc, p)
        c.assert_is_equal(acc, c.neg(p))

    def _assert_g2_member_fp(self, q_pt: AffinePoint):
        """BW6-761: G2 lives on the Fp twist — on-curve + the same
        [r−1]·Q == −Q ladder through the emulated G2 curve ops."""
        g2c = self._g2_curve
        g2c.assert_on_curve(q_pt)
        acc = q_pt
        for bit in bin(self._r - 1)[3:]:
            acc = g2c.double(acc)
            if bit == "1":
                acc = g2c.add(acc, q_pt)
        g2c.assert_is_equal(acc, g2c.neg(q_pt))

    def _assert_g2_member(self, q_pt):
        """On-curve (y² = x³ + b₂) and subgroup membership of a G2 witness
        (≙ verifier.go's AssertIsOnG2). Subgroup via the full-order ladder
        [r−1]·Q == −Q: E'(F_{p²}) has order r·h₂ with r ∤ h₂, so the
        r-torsion IS G2. The incomplete twist formulas never degenerate for
        an order-r point under the fixed scalar r−1 (partial sums [m]Q,
        m < r−1, never hit O or a ±-collision with Q); a non-member can at
        worst make the ladder unsatisfiable, which is the desired outcome."""
        e2 = self.pairing.e2
        x, y = q_pt
        lhs = e2.square(y)
        rhs = e2.add(e2.mul(e2.square(x), x), self._twist_b)
        e2.assert_equal(lhs, rhs)

        acc = q_pt
        for bit in bin(self._r - 1)[3:]:
            acc, _ = self.pairing._twist_double(acc)
            if bit == "1":
                acc, _ = self.pairing._twist_add(acc, q_pt)
        e2.assert_equal(acc[0], x)
        e2.assert_equal(acc[1], e2.neg(y))

    def _bind_public(self, pub) -> Element:
        if isinstance(pub, Element):
            return pub  # cross-curve: caller-allocated emulated scalar
        if isinstance(pub, int):
            return self.curve.fr.constant(pub)
        return self.curve.fr.from_native(pub)  # same-curve native variable

    def assert_proof(self, proof: VerifierProof, public_inputs) -> None:
        """Constrain the proof valid for the given public inputs
        (≙ Verifier.AssertProof, verifier.go): on-curve/subgroup checks,
        kSum = K₀ + Σ pubᵢ·Kᵢ₊₁, then
        e(Ar, Bs)·e(−kSum, γ)·e(−Krs, δ) == e(α, β)."""
        vk = self.vk
        if len(public_inputs) != vk.nb_public - 1:
            raise ValueError(
                f"expected {vk.nb_public - 1} public inputs, "
                f"got {len(public_inputs)}"
            )
        c = self.curve
        self._assert_g1_member(proof.ar)
        self._assert_g1_member(proof.krs)
        if self._g2_fp2:
            self._assert_g2_member(proof.bs)
        else:
            self._assert_g2_member_fp(proof.bs)

        k_sum = c.constant_point(vk.g1_k[0])
        n_bits = self._r.bit_length()
        for pub, k_pt in zip(public_inputs, vk.g1_k[1:]):
            s = self._bind_public(pub)
            term = c.scalar_mul(c.constant_point(k_pt), s, n_bits)
            k_sum = c.add_unified(k_sum, term)

        def pt(p):
            return (p.x, p.y)

        def g2v(v):
            return pt(v) if not self._g2_fp2 else v

        self.pairing.assert_pairing_equal(
            [
                (pt(proof.ar), g2v(proof.bs)),
                (pt(c.neg(k_sum)), g2v(self._gamma)),
                (pt(c.neg(proof.krs)), g2v(self._delta)),
            ],
            self._e_alpha_beta,
        )
