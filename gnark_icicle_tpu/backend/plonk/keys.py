"""PLONK key/proof objects.

Role parity: reference backend/plonk/bn254/setup.go:60-79 Trace{Ql..Qo,Qk,
S1-3}, ProvingKey/VerifyingKey, prove.go:91-109 Proof. The proof uses
gnark's linearization-trick shape: wire/permutation/quotient commitments,
one batched KZG opening at ζ of [linearized poly, L, R, O, S1, S2, Qcp...]
(claimed values in that order, ≙ BatchedProof.ClaimedValues), and the
shifted opening of Z at ωζ (≙ ZShiftedOpening).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class ProvingKey:
    trace_coeffs: dict  # name -> coefficient list (ql, qr, qm, qo, qk, s1-3)
    log_n: int
    k1: int
    k2: int
    srs: object  # kzg.SRS
    sigma: list  # permutation on 3n positions (for Z construction)
    vk: object = None  # VerifyingKey (≙ pk.Vk — the FS transcript binds it)


@dataclass
class VerifyingKey:
    commitments: dict  # name -> G1 commitment of each trace polynomial
    log_n: int
    k1: int
    k2: int
    nb_public: int
    g2_gen: tuple
    g2_tau: tuple
    omega: int
    # BSB22: rows whose Qk value is the injected commitment hash
    # (≙ vk.CommitmentConstraintIndexes; ours are ABSOLUTE gate rows —
    # gnark stores them relative to NbPublicVariables, verify.go:183)
    commitment_constraint_indexes: list = field(default_factory=list)


@dataclass
class Proof:
    """≙ prove.go:91-109 Proof{LRO, Z, H, BatchedProof, ZShiftedOpening,
    Bsb22Commitments}."""

    lro: tuple           # (A, B, C) wire commitments
    z_com: tuple         # permutation product commitment
    h_coms: tuple        # (H1, H2, H3) quotient shards
    batch_h: tuple       # BatchedProof.H — folded ζ-opening quotient
    batch_claimed: list  # ClaimedValues: [lin, l, r, o, s1, s2, qcp...]
    z_shifted_h: tuple   # ZShiftedOpening.H
    z_shifted_claimed: int  # Z(ωζ)
    # BSB22: KZG commitments to the per-commitment PI2 polynomials
    # (≙ proof.Bsb22Commitments, setup.go:102)
    bsb22_commitments: list = field(default_factory=list)
