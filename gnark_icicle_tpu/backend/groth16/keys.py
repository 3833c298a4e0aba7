"""Groth16 key and proof objects.

Role parity: reference backend/groth16/bn254/{setup.go ProvingKey/VerifyingKey
(:25-83), prove.go Proof (:44-49)} and the icicle deviceInfo PK cache
(icicle/provingkey.go:10-28). Points are host affine (None = infinity);
device staging is cached on the ProvingKey after first use — the role of
``setupDevicePointers`` (icicle.go:31-130), persistent across proofs within a
process exactly like the reference's lazy device upload (icicle.go:145-150).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class ProvingKey:
    # group elements (host affine)
    g1_alpha: tuple
    g1_beta: tuple
    g1_delta: tuple
    g2_beta: tuple
    g2_delta: tuple
    # per-wire QAP evaluations in G1/G2 (length = nb_wires; None for wires
    # absent from the corresponding matrix — kernel handles infinity)
    g1_a: list
    g1_b: list
    g2_b: list
    # [(β·A_k + α·B_k + C_k)/δ]₁ for private wires (index = wire - nb_public)
    g1_k: list
    # [τ^i · Z(τ)/δ]₁, i < n-1, stored in BIT-REVERSED index order so the
    # prover's h (bit-reversed out of the coset INTT) pairs positionally
    # (same trick as the reference's bitReverse(Z), setup.go:265)
    g1_z: list
    domain_log_n: int = 0
    # per-commitment Pedersen proving keys (≙ pk.CommitmentKeys,
    # setup.go:297-305); basis = the committed wires' K points
    commitment_keys: list = field(default_factory=list)
    _device: dict = field(default_factory=dict, repr=False)

    def device_arrays(self, ctx):
        """Upload-once device staging of all MSM point arrays."""
        if not self._device:
            self._device = {
                "a": ctx.g1_points(self.g1_a),
                "b1": ctx.g1_points(self.g1_b),
                "b2": ctx.g2_points(self.g2_b),
                "k": ctx.g1_points(self.g1_k),
                "z": ctx.g1_points(self.g1_z),
            }
        return self._device


@dataclass
class VerifyingKey:
    g1_alpha: tuple
    g2_beta: tuple
    g2_gamma: tuple
    g2_delta: tuple
    # [(β·A_k + α·B_k + C_k)/γ]₁ for public wires (index = wire id),
    # followed by one point per commitment wire
    g1_k: list
    nb_public: int = 0
    # ≙ vk.CommitmentKeys + vk.PublicAndCommitmentCommitted (setup.go:302-307)
    commitment_keys: list = field(default_factory=list)
    # per commitment: indices into the extended public witness ([1]+publics+
    # commitment values) of its committed public/commitment wires
    public_and_commitment_committed: list = field(default_factory=list)
    _e_alpha_beta: object = field(default=None, repr=False)

    def e_alpha_beta(self, curve):
        """Precomputed e(α, β) (≙ vk.Precompute, setup.go:341)."""
        if self._e_alpha_beta is None:
            self._e_alpha_beta = curve.miller_and_final_exp(
                [self.g1_alpha], [self.g2_beta]
            )
        return self._e_alpha_beta


@dataclass
class Proof:
    ar: tuple  # G1
    krs: tuple  # G1
    bs: tuple  # G2
    # BSB22: one Pedersen commitment per api.commit + one folded proof of
    # knowledge (≙ Proof.Commitments/CommitmentPok, prove.go:44-49)
    commitments: list = field(default_factory=list)
    commitment_pok: tuple = None
