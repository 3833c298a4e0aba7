"""PLONK Verify: transcript replay + quotient identity at ζ + 2 KZG checks.

Role parity: reference backend/plonk/bn254/verify.go:48. With the
open-everything proof shape (keys.py) the verifier evaluates the quotient
identity numerically from the opened values, then checks the folded batch
opening at ζ and the Z opening at ωζ — four pairings total on the host
oracle path.
"""

from __future__ import annotations

from ..kzg import KZG, SRS
from ..transcript import make_transcript
from .keys import VerifyingKey, Proof
from .prove import eval_order_for


class PlonkVerificationError(Exception):
    pass


def verify(proof: Proof, vk: VerifyingKey, public_values, curve,
           fs_hash: str = "sha256") -> None:
    q = curve.fr.modulus
    if len(public_values) != vk.nb_public:
        raise PlonkVerificationError(
            f"expected {vk.nb_public} public inputs, got {len(public_values)}"
        )
    n = 1 << vk.log_n
    omega = vk.omega
    k1, k2 = vk.k1, vk.k2
    nb_commitments = len(vk.commitment_constraint_indexes)
    if len(proof.bsb22_commitments) != nb_commitments:
        raise PlonkVerificationError("wrong number of BSB22 commitments")
    order = eval_order_for(nb_commitments)

    # ---- replay the transcript --------------------------------------------
    ts = make_transcript(q, fs_hash)
    for v in public_values:
        ts.absorb_fr(v)
    for cm in (proof.a_com, proof.b_com, proof.c_com):
        ts.absorb_point(curve, cm)
    beta = ts.challenge(b"beta")
    gamma = ts.challenge(b"gamma")
    for cm in proof.bsb22_commitments:
        ts.absorb_point(curve, cm)
    ts.absorb_point(curve, proof.z_com)
    alpha = ts.challenge(b"alpha")
    for cm in proof.t_coms:
        ts.absorb_point(curve, cm)
    zeta = ts.challenge(b"zeta")
    for name in order:
        ts.absorb_fr(proof.evals[name])
    ts.absorb_fr(proof.z_omega_eval)
    v_ch = ts.challenge(b"v")

    e = proof.evals
    zh_zeta = (pow(zeta, n, q) - 1) % q
    if zh_zeta == 0:
        raise PlonkVerificationError("zeta landed in the domain")

    # PI(ζ) = Σ pub_j · L_j(ζ),  L_j(ζ) = ω^j (ζⁿ−1) / (n (ζ−ω^j))
    def lagrange_at(j: int) -> int:
        wj = pow(omega, j, q)
        return wj * zh_zeta % q * pow(n * (zeta - wj) % q, -1, q) % q

    pi = 0
    for j, pv in enumerate(public_values):
        pi = (pi + pv * lagrange_at(j)) % q
    # BSB22: re-derive each commitment's Qk injection from its commitment
    # point and add it like a public input (≙ verify.go's commitment wire
    # solving with DST "BSB22-Plonk")
    if nb_commitments:
        from ..hash_to_field import hash_to_fr
        from ...io.serialize import g1_to_bytes

        for i, ci in enumerate(vk.commitment_constraint_indexes):
            val = hash_to_fr(
                g1_to_bytes(curve, proof.bsb22_commitments[i],
                            compressed=False),
                b"BSB22-Plonk", q,
            )[0]
            pi = (pi + val * lagrange_at(ci)) % q
    l1_zeta = zh_zeta * pow(n * (zeta - 1) % q, -1, q) % q

    gate = (
        e["ql"] * e["a"] + e["qr"] * e["b"] + e["qm"] * e["a"] * e["b"]
        + e["qo"] * e["c"] + e["qk"] + pi
    ) % q
    for i in range(nb_commitments):  # Σ qcp_i(ζ)·PI2_i(ζ)
        gate = (gate + e[f"qcp{i}"] * e[f"pi2_{i}"]) % q
    lhs = (e["a"] + beta * zeta + gamma) % q
    lhs = lhs * ((e["b"] + beta * k1 % q * zeta + gamma) % q) % q
    lhs = lhs * ((e["c"] + beta * k2 % q * zeta + gamma) % q) % q
    lhs = lhs * e["z"] % q
    rhs = (e["a"] + beta * e["s1"] + gamma) % q
    rhs = rhs * ((e["b"] + beta * e["s2"] + gamma) % q) % q
    rhs = rhs * ((e["c"] + beta * e["s3"] + gamma) % q) % q
    rhs = rhs * proof.z_omega_eval % q
    perm = (lhs - rhs) % q
    start = l1_zeta * (e["z"] - 1) % q

    shard_pow = pow(zeta, n + 2, q)
    t_zeta = (
        e["t1"] + shard_pow * e["t2"] + shard_pow * shard_pow % q * e["t3"]
    ) % q
    identity_lhs = (gate + alpha * perm + alpha * alpha % q * start) % q
    if identity_lhs != t_zeta * zh_zeta % q:
        raise PlonkVerificationError("quotient identity fails at zeta")

    # ---- KZG checks -----------------------------------------------------------
    srs = SRS(g1_powers=[curve.g1.generator], g2_gen=vk.g2_gen,
              g2_tau=vk.g2_tau)
    kzg = KZG(curve, srs)
    commitments = {
        "a": proof.a_com, "b": proof.b_com, "c": proof.c_com,
        "z": proof.z_com,
        "s1": vk.commitments["s1"], "s2": vk.commitments["s2"],
        "s3": vk.commitments["s3"],
        "ql": vk.commitments["ql"], "qr": vk.commitments["qr"],
        "qm": vk.commitments["qm"], "qo": vk.commitments["qo"],
        "qk": vk.commitments["qk"],
        "t1": proof.t_coms[0], "t2": proof.t_coms[1], "t3": proof.t_coms[2],
    }
    for i in range(nb_commitments):
        commitments[f"qcp{i}"] = vk.commitments[f"qcp{i}"]
        commitments[f"pi2_{i}"] = proof.bsb22_commitments[i]
    g1 = curve.g1
    fold_c = None
    fold_v = 0
    vi = 1
    for name in order:
        fold_c = g1.add(fold_c, g1.scalar_mul(commitments[name], vi))
        fold_v = (fold_v + vi * e[name]) % q
        vi = vi * v_ch % q
    if not kzg.verify(fold_c, zeta, fold_v, proof.batch_proof):
        raise PlonkVerificationError("batched KZG opening at zeta fails")
    if not kzg.verify(proof.z_com, zeta * omega % q, proof.z_omega_eval,
                      proof.z_omega_proof):
        raise PlonkVerificationError("KZG opening of Z at omega*zeta fails")


def is_valid(proof: Proof, vk: VerifyingKey, public_values, curve,
             fs_hash: str = "sha256") -> bool:
    try:
        verify(proof, vk, public_values, curve, fs_hash=fs_hash)
        return True
    except PlonkVerificationError:
        return False
