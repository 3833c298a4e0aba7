"""PLONK Solidity export: structural checks + a Python simulation of the
contract's verification algorithm against a real proof.

Parity model: reference ExportSolidity (backend/plonk/bn254/verify.go:400);
the reference's EVM execution check (gnark-solidity-checker) is external
tooling and out of scope (SURVEY §2.3), so like the Groth16 exporter we
simulate the contract's exact arithmetic (transcript bytes, precompile
calls) on the host.
"""

import hashlib
import random
import re

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import Circuit, Public, Secret, compile_circuit
from gnark_icicle_tpu.backend import plonk
from gnark_icicle_tpu.backend.plonk_solidity import export_plonk_solidity

CURVE = bn254.BN254
Q = bn254.R
P = bn254.P


class Cubic(Circuit):
    x = Secret()
    y = Public()

    def define(self, api):
        x3 = api.mul(self.x, self.x, self.x)
        api.assert_is_equal(self.y, api.add(x3, self.x, 5))


@pytest.fixture(scope="module")
def plonk_artifacts():
    cs = compile_circuit(Q, Cubic, builder="scs")
    pk, vk = plonk.setup(cs, CURVE, rng=random.Random(31))
    proof = plonk.prove(cs, pk, [35], [3], CURVE, rng=random.Random(32))
    plonk.verify(proof, vk, [35], CURVE)
    return vk, proof


def _proof_words(proof):
    """The contract's calldata layout (25 + 3*nb_commitments words)."""
    def xy(pt):
        return [0, 0] if pt is None else [pt[0], pt[1]]

    words = []
    for pt in (*proof.lro, proof.z_com, *proof.h_coms, proof.batch_h,
               proof.z_shifted_h):
        words += xy(pt)
    words += list(proof.batch_claimed[:6])
    words.append(proof.z_shifted_claimed)
    words += list(proof.batch_claimed[6:])       # qcp(zeta) per commitment
    for cm in proof.bsb22_commitments:
        words += xy(cm)
    assert len(words) == 25 + 3 * len(proof.bsb22_commitments)
    return words


def _marshal(x, y):
    """gnark-crypto uncompressed marshal (what the contract absorbs)."""
    if x == 0 and y == 0:
        return (0x40 << 248).to_bytes(32, "big") + bytes(32)
    return x.to_bytes(32, "big") + y.to_bytes(32, "big")


def _simulate(src: str, vk, proof, public_inputs):
    """Execute the contract's algorithm in Python: identical sha256 bytes,
    ec ops via the host curve (== precompiles 6/7), pairing via the host
    pairing (== precompile 8). Raises on rejection like the contract."""
    g1 = CURVE.g1
    consts = {
        m.group(1): int(m.group(2))
        for m in re.finditer(r"constant (\w+) = (\d+);", src)
    }
    n = consts["N"]
    omega = consts["OMEGA"]
    k1, k2 = consts["K1"], consts["K2"]
    words = _proof_words(proof)

    def pt(i):
        w = (words[i], words[i + 1])
        return None if w == (0, 0) else w

    def mpt(i):
        return _marshal(words[i], words[i + 1])

    def vk_xy(name):
        p = vk.commitments[name]
        return (0, 0) if p is None else p

    sha = lambda b: hashlib.sha256(b).digest()

    # ---- transcript (gnark fiat-shamir bytes) ----------------------------
    vk_blob = b"".join(_marshal(*vk_xy(k))
                       for k in ("s1", "s2", "s3", "ql", "qr", "qm",
                                 "qo", "qk"))
    if len(vk.commitment_constraint_indexes) == 1:
        vk_blob += _marshal(*vk_xy("qcp0"))
    buf = b"gamma" + vk_blob
    for v in public_inputs:
        assert v < Q
        buf += v.to_bytes(32, "big")
    buf += mpt(0) + mpt(2) + mpt(4)
    d = sha(buf)
    gamma = int.from_bytes(d, "big") % Q
    d = sha(b"beta" + d)
    beta = int.from_bytes(d, "big") % Q
    nb_commit = len(vk.commitment_constraint_indexes)
    commit_bytes = mpt(26) if nb_commit else b""
    d = sha(b"alpha" + d + commit_bytes + mpt(6))
    alpha = int.from_bytes(d, "big") % Q
    d = sha(b"zeta" + d + mpt(8) + mpt(10) + mpt(12))
    zeta = int.from_bytes(d, "big") % Q

    zh = (pow(zeta, n, Q) - 1) % Q
    assert zh != 0

    lin_z, l_z, r_z, o_z, s1_z, s2_z = words[18:24]
    zu = words[24]

    pi = 0
    wj = 1
    for pv in public_inputs:
        lj = wj * zh % Q * pow(n * (zeta - wj) % Q, -1, Q) % Q
        pi = (pi + pv * lj) % Q
        wj = wj * omega % Q
    if nb_commit:
        # the contract's hashFr: explicit expand_message_xmd steps
        dstp = b"BSB22-Plonk" + bytes([11])
        b0 = sha(bytes(64) + mpt(26) + (48).to_bytes(2, "big")
                 + b"\x00" + dstp)
        b1 = sha(b0 + b"\x01" + dstp)
        b2 = sha(bytes(x ^ y for x, y in zip(b0, b1)) + b"\x02" + dstp)
        hc = int.from_bytes(b1 + b2[:16], "big") % Q
        wci = consts["WPOW_CI"]
        lci = wci * zh % Q * pow(n * (zeta - wci) % Q, -1, Q) % Q
        pi = (pi + hc * lci) % Q
    l1z = zh * pow(n * (zeta - 1) % Q, -1, Q) % Q
    a2l1 = alpha * alpha % Q * l1z % Q
    cprod = (l_z + beta * s1_z + gamma) % Q * (
        (r_z + beta * s2_z + gamma) % Q) % Q
    cl = cprod * ((o_z + gamma) % Q) % Q * alpha % Q * zu % Q
    cl = (cl - a2l1 + pi) % Q
    assert (lin_z + cl) % Q == 0, "linearization constant fails"

    # ---- linearized digest ----------------------------------------------
    s1c = cprod * beta % Q * alpha % Q * zu % Q
    bz = beta * zeta % Q
    idp = (l_z + bz + gamma) % Q
    idp = idp * ((r_z + bz * k1 + gamma) % Q) % Q
    idp = idp * ((o_z + bz * k2 + gamma) % Q) % Q
    zc = (a2l1 - alpha * idp) % Q
    zn2 = pow(zeta, n + 2, Q)
    nzh = (-zh) % Q

    def smul(p, s):
        return None if p is None else g1.scalar_mul(p, s % Q)

    lin_d = vk.commitments["qk"]
    for name, s in (("ql", l_z), ("qr", r_z), ("qm", l_z * r_z),
                    ("qo", o_z), ("s3", s1c)):
        lin_d = g1.add(lin_d, smul(vk.commitments[name], s))
    lin_d = g1.add(lin_d, smul(pt(6), zc))
    lin_d = g1.add(lin_d, smul(pt(8), nzh))
    lin_d = g1.add(lin_d, smul(pt(10), nzh * zn2))
    lin_d = g1.add(lin_d, smul(pt(12), nzh * zn2 % Q * zn2))
    if nb_commit:
        lin_d = g1.add(lin_d, smul(pt(26), words[25]))

    # ---- KZG fold challenge + fold --------------------------------------
    lx, ly = (0, 0) if lin_d is None else lin_d
    fb = (b"gamma" + zeta.to_bytes(32, "big") + _marshal(lx, ly)
          + mpt(0) + mpt(2) + mpt(4)
          + _marshal(*vk_xy("s1")) + _marshal(*vk_xy("s2")))
    if nb_commit:
        fb += _marshal(*vk_xy("qcp0"))
    for v in words[18:24]:
        fb += v.to_bytes(32, "big")
    if nb_commit:
        fb += words[25].to_bytes(32, "big")
    fb += words[24].to_bytes(32, "big")
    gkzg = int.from_bytes(sha(fb), "big") % Q

    digests = [lin_d, pt(0), pt(2), pt(4),
               vk.commitments["s1"], vk.commitments["s2"]]
    claims = list(words[18:24])
    if nb_commit:
        digests.append(vk.commitments["qcp0"])
        claims.append(words[25])
    fold_c = None
    fold_v = 0
    gi = 1
    for dpt, v in zip(digests, claims):
        fold_c = g1.add(fold_c, smul(dpt, gi))
        fold_v = (fold_v + gi * v) % Q
        gi = gi * gkzg % Q

    G = g1.generator

    def kzg_left(c, v, z, w):
        acc = g1.add(c, g1.scalar_mul(G, (-v) % Q))
        return g1.add(acc, g1.scalar_mul(w, z))

    w1 = pt(14)
    w2 = pt(16)
    pairs_p = [
        kzg_left(fold_c, fold_v, zeta, w1), g1.neg(w1),
        kzg_left(pt(6), zu, zeta * omega % Q, w2), g1.neg(w2),
    ]
    pairs_q = [vk.g2_gen, vk.g2_tau, vk.g2_gen, vk.g2_tau]
    assert CURVE.pairing(list(zip(pairs_p, pairs_q))), "pairing check fails"


def test_export_structure(plonk_artifacts):
    vk, _ = plonk_artifacts
    src = export_plonk_solidity(vk, CURVE)
    assert "pragma solidity" in src
    assert src.count("constant") >= 25
    assert "uint256[25] calldata proof" in src
    assert "staticcall(gas(), 8" in src  # pairing precompile
    assert "vkBlob" in src  # transcript binds the vk


def test_contract_algorithm_accepts_valid_proof(plonk_artifacts):
    vk, proof = plonk_artifacts
    src = export_plonk_solidity(vk, CURVE)
    _simulate(src, vk, proof, [35])


def test_contract_transcript_matches_host_verifier(plonk_artifacts):
    """The contract's sha256 bytes are the SAME gnark transcript the host
    verifier replays — a proof accepted by one is accepted by the other."""
    vk, proof = plonk_artifacts
    plonk.verify(proof, vk, [35], CURVE)
    _simulate(export_plonk_solidity(vk, CURVE), vk, proof, [35])


def test_contract_algorithm_rejects_tampered(plonk_artifacts):
    vk, proof = plonk_artifacts
    src = export_plonk_solidity(vk, CURVE)
    with pytest.raises(AssertionError):
        _simulate(src, vk, proof, [36])  # wrong public input
    from dataclasses import replace

    bad = replace(proof,
                  z_shifted_claimed=(proof.z_shifted_claimed + 1) % Q)
    with pytest.raises(AssertionError):
        _simulate(src, vk, bad, [35])


class CommitCubic(Circuit):
    """Cubic plus a BSB22 commitment (the single-commitment contract)."""

    x = Secret()
    y = Public()

    def define(self, api):
        c = api.commit(self.x, self.y)
        api.assert_is_different(c, 0)
        x3 = api.mul(self.x, self.x, self.x)
        api.assert_is_equal(self.y, api.add(x3, self.x, 5))


@pytest.fixture(scope="module")
def plonk_bsb22_artifacts():
    cs = compile_circuit(Q, CommitCubic, builder="scs")
    pk, vk = plonk.setup(cs, CURVE, rng=random.Random(41))
    proof = plonk.prove(cs, pk, [35], [3], CURVE, rng=random.Random(42))
    plonk.verify(proof, vk, [35], CURVE)
    return vk, proof


def test_bsb22_export_structure(plonk_bsb22_artifacts):
    vk, _ = plonk_bsb22_artifacts
    src = export_plonk_solidity(vk, CURVE)
    assert "uint256[28] calldata proof" in src
    assert "QCP_X" in src and "WPOW_CI" in src
    assert "hashFr" in src and "BSB22-Plonk" in src


def test_bsb22_contract_accepts_valid_proof(plonk_bsb22_artifacts):
    vk, proof = plonk_bsb22_artifacts
    src = export_plonk_solidity(vk, CURVE)
    _simulate(src, vk, proof, [35])


def test_bsb22_contract_rejects_tampered(plonk_bsb22_artifacts):
    vk, proof = plonk_bsb22_artifacts
    src = export_plonk_solidity(vk, CURVE)
    import copy

    bad = copy.deepcopy(proof)
    # tamper with the commitment point: PI re-derivation must diverge
    bad.bsb22_commitments[0] = CURVE.g1.add(
        bad.bsb22_commitments[0], CURVE.g1.generator)
    with pytest.raises(AssertionError):
        _simulate(src, vk, bad, [35])
    with pytest.raises(AssertionError):
        _simulate(src, vk, proof, [36])  # wrong public input
