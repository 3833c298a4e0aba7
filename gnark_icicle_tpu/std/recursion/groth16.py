"""In-circuit Groth16 verifier over emulated BN254.

Role parity: reference std/recursion/groth16 (verifier.go — Verifier.
AssertProof: in-circuit subgroup checks, kSum linear combination of the
vk's K points by the public inputs, and the 3-pairing product against the
precomputed e(α, β)). The verifying key is circuit-constant (the reference's
"fixed" vk placement); public inputs of the inner proof are NATIVE outer
variables — same-curve recursion (BN254-in-BN254) shares Fr, so only the
points and pairing are emulated.

Engine-level today, like the pairing gadget it builds on (the proof points
enter as emulated witnesses and every check is constraint-shaped); compiling
to a constraint system awaits the range-table emulated mul (ROADMAP).
"""

from __future__ import annotations

from dataclasses import dataclass

from ...curves import bn254
from ..sw_emulated import AffinePoint, BN254G1, EmulatedCurve
from ..pairing_bn254 import BN254Pairing


@dataclass
class VerifierProof:
    """Gadget-side Groth16 proof (≙ recursion/groth16.Proof)."""

    ar: AffinePoint        # G1
    krs: AffinePoint       # G1
    bs: tuple              # G2: (x, y) pair of E2 elements


class Groth16Verifier:
    """≙ recursion/groth16.Verifier with a circuit-constant vk."""

    def __init__(self, api, native_modulus: int, vk, curve=None):
        """vk: host backend.groth16 VerifyingKey; curve: host curve object
        (defaults to BN254) used once to precompute e(α, β)."""
        if vk.commitment_keys:
            raise NotImplementedError(
                "recursion over BSB22-commitment proofs: later round"
            )
        self.api = api
        self.vk = vk
        self.curve = EmulatedCurve(api, BN254G1, native_modulus)
        self.pairing = BN254Pairing(api, native_modulus)
        host_curve = curve if curve is not None else bn254.BN254
        self._e_alpha_beta = vk.e_alpha_beta(host_curve)
        e2 = self.pairing.e2
        self._gamma = (e2.constant(vk.g2_gamma[0].c0, vk.g2_gamma[0].c1),
                       e2.constant(vk.g2_gamma[1].c0, vk.g2_gamma[1].c1))
        self._delta = (e2.constant(vk.g2_delta[0].c0, vk.g2_delta[0].c1),
                       e2.constant(vk.g2_delta[1].c0, vk.g2_delta[1].c1))
        # D-twist curve constant b₂ = 3/(9+i) for the G2 on-curve check
        self._twist_b = e2.constant(bn254.G2_B.c0, bn254.G2_B.c1)

    # -- witness constructors ------------------------------------------------
    def proof_witness(self, proof) -> VerifierProof:
        """Bind a host Proof's point values as gadget witnesses (engine
        path; a compiled outer circuit allocates the limbs as Secret)."""
        fp = self.curve.fp
        e2 = self.pairing.e2

        def g1(pt):
            return AffinePoint(fp.constant(pt[0]), fp.constant(pt[1]))

        def g2(pt):
            return (e2.constant(pt[0].c0, pt[0].c1),
                    e2.constant(pt[1].c0, pt[1].c1))

        return VerifierProof(ar=g1(proof.ar), krs=g1(proof.krs),
                             bs=g2(proof.bs))

    # -- checks --------------------------------------------------------------
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
        for bit in bin(bn254.R - 1)[3:]:
            acc, _ = self.pairing._twist_double(acc)
            if bit == "1":
                acc, _ = self.pairing._twist_add(acc, q_pt)
        e2.assert_equal(acc[0], x)
        e2.assert_equal(acc[1], e2.neg(y))

    def assert_proof(self, proof: VerifierProof, public_inputs) -> None:
        """Constrain the proof valid for the native public inputs
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
        # G1 has cofactor 1 on BN254: on-curve is the subgroup check
        c.assert_on_curve(proof.ar)
        c.assert_on_curve(proof.krs)
        self._assert_g2_member(proof.bs)

        k_sum = c.constant_point(vk.g1_k[0])
        n_bits = bn254.R.bit_length()
        for pub, k_pt in zip(public_inputs, vk.g1_k[1:]):
            s = c.fr.from_native(pub)
            term = c.scalar_mul(c.constant_point(k_pt), s, n_bits)
            k_sum = c.add_unified(k_sum, term)

        def pt(p):
            return (p.x, p.y)

        self.pairing.assert_pairing_equal(
            [
                (pt(proof.ar), proof.bs),
                (pt(c.neg(k_sum)), self._gamma),
                (pt(c.neg(proof.krs)), self._delta),
            ],
            self._e_alpha_beta,
        )
