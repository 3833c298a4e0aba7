"""PLONK proof / verifying-key serialization.

Role parity: reference backend/plonk/bn254/marshal.go. Our proof shape
differs from gnark's linearization-trick proof (see backend/plonk/keys.py),
so this is the framework's own deterministic format: points in gnark-crypto
encoding, field elements 32-byte big-endian, fixed field order.
"""

from __future__ import annotations

import struct

from .serialize import g1_to_bytes, g1_from_bytes, g2_to_bytes, g2_from_bytes
from ..backend.plonk.keys import Proof, VerifyingKey
from ..backend.plonk.prove import eval_order_for

_VK_NAMES = ("ql", "qr", "qm", "qo", "qk", "s1", "s2", "s3")


def plonk_proof_to_bytes(curve, proof: Proof, compressed: bool = True) -> bytes:
    fr = curve.fr
    out = bytearray()
    for pt in (proof.a_com, proof.b_com, proof.c_com, proof.z_com,
               *proof.t_coms, proof.batch_proof, proof.z_omega_proof):
        out += g1_to_bytes(curve, pt, compressed)
    nb_c = len(proof.bsb22_commitments)
    out += struct.pack(">I", nb_c)
    for pt in proof.bsb22_commitments:
        out += g1_to_bytes(curve, pt, compressed)
    for name in eval_order_for(nb_c):
        out += fr.to_bytes(proof.evals[name])
    out += fr.to_bytes(proof.z_omega_eval)
    return bytes(out)


def plonk_proof_from_bytes(curve, data: bytes):
    fr = curve.fr
    off = 0
    pts = []
    for _ in range(9):
        pt, n = g1_from_bytes(curve, data, off)
        pts.append(pt)
        off += n
    (nb_c,) = struct.unpack_from(">I", data, off)
    off += 4
    bsb22 = []
    for _ in range(nb_c):
        pt, n = g1_from_bytes(curve, data, off)
        bsb22.append(pt)
        off += n
    evals = {}
    for name in eval_order_for(nb_c):
        evals[name] = fr.from_bytes(data[off : off + fr.nb_bytes])
        off += fr.nb_bytes
    z_omega_eval = fr.from_bytes(data[off : off + fr.nb_bytes])
    off += fr.nb_bytes
    proof = Proof(
        a_com=pts[0], b_com=pts[1], c_com=pts[2], z_com=pts[3],
        t_coms=(pts[4], pts[5], pts[6]),
        evals=evals, z_omega_eval=z_omega_eval,
        batch_proof=pts[7], z_omega_proof=pts[8],
        bsb22_commitments=bsb22,
    )
    return proof, off


def plonk_vk_to_bytes(curve, vk: VerifyingKey, compressed: bool = True) -> bytes:
    fr = curve.fr
    out = bytearray()
    nb_c = len(vk.commitment_constraint_indexes)
    out += struct.pack(">IIII", vk.log_n, vk.nb_public, nb_c, 0)
    out += fr.to_bytes(vk.k1) + fr.to_bytes(vk.k2) + fr.to_bytes(vk.omega)
    for name in _VK_NAMES:
        out += g1_to_bytes(curve, vk.commitments[name], compressed)
    out += g2_to_bytes(curve, vk.g2_gen, compressed)
    out += g2_to_bytes(curve, vk.g2_tau, compressed)
    for i in range(nb_c):
        out += g1_to_bytes(curve, vk.commitments[f"qcp{i}"], compressed)
        out += struct.pack(">I", vk.commitment_constraint_indexes[i])
    return bytes(out)


def plonk_vk_from_bytes(curve, data: bytes):
    fr = curve.fr
    log_n, nb_public, nb_c, _ = struct.unpack_from(">IIII", data, 0)
    off = 16
    k1 = fr.from_bytes(data[off : off + fr.nb_bytes]); off += fr.nb_bytes
    k2 = fr.from_bytes(data[off : off + fr.nb_bytes]); off += fr.nb_bytes
    omega = fr.from_bytes(data[off : off + fr.nb_bytes]); off += fr.nb_bytes
    commitments = {}
    for name in _VK_NAMES:
        pt, n = g1_from_bytes(curve, data, off)
        commitments[name] = pt
        off += n
    g2_gen, n = g2_from_bytes(curve, data, off); off += n
    g2_tau, n = g2_from_bytes(curve, data, off); off += n
    cci = []
    for i in range(nb_c):
        pt, n = g1_from_bytes(curve, data, off); off += n
        commitments[f"qcp{i}"] = pt
        (idx,) = struct.unpack_from(">I", data, off); off += 4
        cci.append(int(idx))
    vk = VerifyingKey(
        commitments=commitments, log_n=log_n, k1=k1, k2=k2,
        nb_public=nb_public, g2_gen=g2_gen, g2_tau=g2_tau, omega=omega,
        commitment_constraint_indexes=cci,
    )
    return vk, off
