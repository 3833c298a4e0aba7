"""PLONK key/proof objects.

Role parity: reference backend/plonk/bn254/setup.go:60-79 Trace{Ql..Qo,Qk,
S1-3}, ProvingKey/VerifyingKey, prove.go:91-109 Proof. Openings here are
"open-everything-at-ζ": the proof carries evaluation values for the selector
and permutation polynomials too, folded into one batched KZG opening — more
values than gnark's linearization-trick proof but the same two pairing
checks; gnark-byte-format proofs are a later milestone (documented in
prove.py).
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
    # (≙ vk.CommitmentConstraintIndexes)
    commitment_constraint_indexes: list = field(default_factory=list)


@dataclass
class Proof:
    # round commitments
    a_com: tuple
    b_com: tuple
    c_com: tuple
    z_com: tuple
    t_coms: tuple  # (T1, T2, T3)
    # openings at ζ: name -> value (a, b, c, s1, s2, s3, ql, qr, qm, qo, qk,
    # t1, t2, t3) and z_omega at ωζ
    evals: dict
    z_omega_eval: int
    batch_proof: tuple  # KZG proof for the folded ζ opening
    z_omega_proof: tuple  # KZG proof for Z at ωζ
    # BSB22: KZG commitments to the per-commitment PI2 polynomials
    # (≙ proof.Bsb22Commitments, setup.go:102)
    bsb22_commitments: list = field(default_factory=list)
