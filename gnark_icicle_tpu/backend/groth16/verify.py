"""Groth16 Verify: 3-pairing product check (host).

Role parity: reference backend/groth16/bn254/verify.go:49-142 — subgroup
checks, kSum small MSM over public inputs, MillerLoop product vs the
precomputed e(α,β). Pure host work, milliseconds-scale in the reference and
never accelerated; this is the bit-exactness oracle for the device prover
(SURVEY.md §3.4).
"""

from __future__ import annotations

from .keys import VerifyingKey, Proof


class VerificationError(Exception):
    pass


def verify(proof: Proof, vk: VerifyingKey, public_values, curve) -> None:
    """Raises VerificationError if the proof does not verify.

    public_values: the nb_public−1 public wire values (ONE implicit).
    """
    q = curve.fr.modulus
    g1, g2 = curve.g1, curve.g2

    if len(public_values) != vk.nb_public - 1:
        raise VerificationError(
            f"expected {vk.nb_public - 1} public inputs, got {len(public_values)}"
        )
    for name, pt, grp in (
        ("Ar", proof.ar, g1), ("Krs", proof.krs, g1), ("Bs", proof.bs, g2),
    ):
        if not grp.is_on_curve(pt):
            raise VerificationError(f"proof point {name} not on curve")
        if not grp.in_subgroup(pt):  # ≙ verify.go:67 subgroup checks
            raise VerificationError(f"proof point {name} not in subgroup")

    # kSum = Σ_pub x_i · K_i (small host MSM, ≙ verify.go:117-129)
    xs = [1] + [int(v) % q for v in public_values]
    k_sum = g1.msm(xs, vk.g1_k)

    # e(Ar,Bs) · e(−kSum,γ) · e(−Krs,δ) == e(α,β)
    lhs = curve.miller_and_final_exp(
        [proof.ar, g1.neg(k_sum), g1.neg(proof.krs)],
        [proof.bs, vk.g2_gamma, vk.g2_delta],
    )
    if lhs != vk.e_alpha_beta(curve):
        raise VerificationError("pairing product mismatch")


def is_valid(proof: Proof, vk: VerifyingKey, public_values, curve) -> bool:
    try:
        verify(proof, vk, public_values, curve)
        return True
    except VerificationError:
        return False
