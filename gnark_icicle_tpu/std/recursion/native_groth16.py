"""In-circuit Groth16 verifier over NATIVE BLS12-377 — 2-chain recursion.

Role parity: reference std/recursion/groth16/verifier.go instantiated with
sw_bls12377 (the native path: a BW6-761 outer circuit verifies a BLS12-377
inner proof with every base-field operation native, ≙
std/algebra/native/doc.go). This is the CHEAP recursion path — one native
constraint per field mul, vs hundreds on the emulated (BN254-in-BN254)
path in std/recursion/groth16.py.

Inner public inputs are outer-circuit variables. They are bit-decomposed
to ⌈log₂ r⌉ bits for the kSum scalar mul, which constrains them to
[0, 2^253); values in [r, 2^253) alias their mod-r reduction (the pairing
equation only sees the scalar mod r) — outer circuits that need canonical
inner publics should range-check them against r (std/rangecheck), matching
the reference's emulated-scalar semantics.

Subgroup membership of the proof points is enforced UNCONDITIONALLY via
the φ/ψ-eigenvalue fast checks (G1: P == −[x₀²]φ(P); G2: ψ(Q) == [x₀]Q;
≙ sw_bls12377/pairing2.go AssertIsOnG1/AssertIsOnG2) — ~2×/4× cheaper
than the full-order [r]P == O ladders they replaced; both accept/reject
behaviors are host-validated against non-subgroup curve points
(tests/test_native_recursion.py).
"""

from __future__ import annotations

from dataclasses import dataclass

from ...curves import bls12_377 as b377
from ..pairing_bls12_377 import BLS12377Pairing


@dataclass
class NativeVerifierProof:
    """Gadget-side Groth16 proof (≙ recursion/groth16.Proof).

    ar/krs: (x, y) native-variable pairs; bs: (x, y) pair of E2 pairs."""

    ar: tuple
    krs: tuple
    bs: tuple


class NativeGroth16Verifier:
    """≙ recursion/groth16.Verifier[sw_bls12377] with circuit-constant vk."""

    def __init__(self, api, vk, curve=None):
        """vk: host backend.groth16 VerifyingKey over BLS12-377."""
        if vk.commitment_keys:
            raise NotImplementedError(
                "recursion over BSB22-commitment proofs: later round"
            )
        self.api = api
        self.vk = vk
        self.pairing = BLS12377Pairing(api)
        host_curve = curve if curve is not None else b377.BLS12_377
        self._e_alpha_beta = vk.e_alpha_beta(host_curve)
        e2 = self.pairing.e2
        self._gamma = (e2.constant(vk.g2_gamma[0].c0, vk.g2_gamma[0].c1),
                       e2.constant(vk.g2_gamma[1].c0, vk.g2_gamma[1].c1))
        self._delta = (e2.constant(vk.g2_delta[0].c0, vk.g2_delta[0].c1),
                       e2.constant(vk.g2_delta[1].c0, vk.g2_delta[1].c1))

    # -- witness constructors ------------------------------------------------
    def proof_witness(self, proof) -> NativeVerifierProof:
        """Bind a host Proof's points as gadget values (engine path; a
        compiled outer circuit passes Secret variables instead)."""
        fp = self.pairing.fp
        e2 = self.pairing.e2

        def g1(pt):
            return (fp.constant(pt[0]), fp.constant(pt[1]))

        def g2(pt):
            return (e2.constant(pt[0].c0, pt[0].c1),
                    e2.constant(pt[1].c0, pt[1].c1))

        return NativeVerifierProof(ar=g1(proof.ar), krs=g1(proof.krs),
                                   bs=g2(proof.bs))

    # -- membership checks ---------------------------------------------------
    def _assert_g1_member(self, xy):
        """On-curve + subgroup via the φ-eigenvalue fast check."""
        self.pairing.assert_g1_member(xy)

    def _assert_g2_member(self, q_pt):
        """On-twist + subgroup via the ψ-Frobenius fast check."""
        self.pairing.assert_g2_member(q_pt)

    # -- the verification relation ------------------------------------------
    def assert_proof(self, proof: NativeVerifierProof, public_inputs,
                     check_membership: bool = True) -> None:
        """Constrain the proof valid for the given public inputs
        (≙ Verifier.AssertProof): membership checks, kSum = K₀ + Σ pubᵢ·Kᵢ,
        then e(Ar, Bs)·e(−kSum, γ)·e(−Krs, δ) == e(α, β)."""
        vk = self.vk
        if len(public_inputs) != vk.nb_public - 1:
            raise ValueError(
                f"expected {vk.nb_public - 1} public inputs, "
                f"got {len(public_inputs)}"
            )
        api = self.api
        fp = self.pairing.fp
        g1 = self.pairing.g1

        if check_membership:
            self._assert_g1_member(proof.ar)
            self._assert_g1_member(proof.krs)
            self._assert_g2_member(proof.bs)

        n_bits = b377.R.bit_length()
        k_sum = g1.from_affine(
            (fp.constant(vk.g1_k[0][0]), fp.constant(vk.g1_k[0][1]))
        )
        for pub, k_pt in zip(public_inputs, vk.g1_k[1:]):
            base = g1.from_affine(
                (fp.constant(k_pt[0]), fp.constant(k_pt[1]))
            )
            term = g1.scalar_mul_bits(base, api.to_binary(pub, n_bits))
            k_sum = g1.add(k_sum, term)

        # normalize once for the Miller loop (kSum is never the identity
        # for a well-formed vk and in-range publics; identity makes the
        # division unsatisfiable = rejection)
        k_aff = g1.to_affine(fp.div, k_sum)

        self.pairing.assert_pairing_equal(
            [
                (proof.ar, proof.bs),
                ((k_aff[0], fp.neg(k_aff[1])), self._gamma),
                ((proof.krs[0], fp.neg(proof.krs[1])), self._delta),
            ],
            self._e_alpha_beta,
        )
