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
from gnark_icicle_tpu.backend.plonk.prove import EVAL_ORDER
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
    """The contract's calldata layout."""
    def xy(pt):
        return [0, 0] if pt is None else [pt[0], pt[1]]

    words = []
    for pt in (proof.a_com, proof.b_com, proof.c_com, proof.z_com,
               *proof.t_coms, proof.batch_proof, proof.z_omega_proof):
        words += xy(pt)
    for name in EVAL_ORDER:
        words.append(proof.evals[name])
    words.append(proof.z_omega_eval)
    return words


def _simulate(src: str, vk, proof, public_inputs):
    """Execute the contract's algorithm in Python: identical sha256 bytes,
    ec ops via the host curve (== precompiles 6/7), pairing via the host
    pairing (== precompile 8). Raises on rejection like the contract."""
    g1 = CURVE.g1
    consts = {
        m.group(1): int(m.group(2))
        for m in re.finditer(
            r"constant (\w+) = (\d+);", src
        )
    }
    n = consts["N"]
    omega = consts["OMEGA"]
    k1, k2 = consts["K1"], consts["K2"]
    p_half = consts["P_HALF"]
    words = _proof_words(proof)

    def pt(i):
        w = (words[i], words[i + 1])
        return None if w == (0, 0) else w

    def sha(b):
        return hashlib.sha256(b).digest()

    st = sha(b"plonk")
    for v in public_inputs:
        assert v < Q
        st = sha(st + v.to_bytes(32, "big"))

    def absorb_point(st, i):
        x, y = words[i], words[i + 1]
        if x == 0 and y == 0:
            enc = 0x40 << 248
        else:
            enc = x | ((0xC0 if y > p_half else 0x80) << 248)
        return sha(st + enc.to_bytes(32, "big"))

    def chal(st, name):
        s1 = sha(st + name)
        s2 = sha(s1 + b"+")
        return (int.from_bytes(s1, "big") * ((1 << 256) % Q)
                + int.from_bytes(s2, "big")) % Q, s1

    st = absorb_point(st, 0)
    st = absorb_point(st, 2)
    st = absorb_point(st, 4)
    beta, st = chal(st, b"beta")
    gamma, st = chal(st, b"gamma")
    st = absorb_point(st, 6)
    alpha, st = chal(st, b"alpha")
    st = absorb_point(st, 8)
    st = absorb_point(st, 10)
    st = absorb_point(st, 12)
    zeta, st = chal(st, b"zeta")
    zw_idx = 18 + len(EVAL_ORDER)
    for i in range(18, zw_idx + 1):
        st = sha(st + (words[i] % Q).to_bytes(32, "big"))
    vch, st = chal(st, b"v")

    e = {name: words[18 + i] for i, name in enumerate(EVAL_ORDER)}
    zw = words[zw_idx]
    zh = (pow(zeta, n, Q) - 1) % Q
    assert zh != 0
    pi = 0
    wj = 1
    for pv in public_inputs:
        lj = wj * zh % Q * pow(n * (zeta - wj) % Q, -1, Q) % Q
        pi = (pi + pv * lj) % Q
        wj = wj * omega % Q
    gate = (e["ql"] * e["a"] + e["qr"] * e["b"] + e["qm"] * e["a"] * e["b"]
            + e["qo"] * e["c"] + e["qk"] + pi) % Q
    lhs = (e["a"] + beta * zeta + gamma) % Q
    lhs = lhs * ((e["b"] + beta * k1 % Q * zeta + gamma) % Q) % Q
    lhs = lhs * ((e["c"] + beta * k2 % Q * zeta + gamma) % Q) % Q * e["z"] % Q
    rhs = (e["a"] + beta * e["s1"] + gamma) % Q
    rhs = rhs * ((e["b"] + beta * e["s2"] + gamma) % Q) % Q
    rhs = rhs * ((e["c"] + beta * e["s3"] + gamma) % Q) % Q * zw % Q
    perm = (lhs - rhs) % Q
    l1z = zh * pow(n * (zeta - 1) % Q, -1, Q) % Q
    start = l1z * (e["z"] - 1) % Q
    identity = (gate + alpha * perm + alpha * alpha % Q * start) % Q
    sp = pow(zeta, n + 2, Q)
    tz = (e["t1"] + sp * e["t2"] + sp * sp % Q * e["t3"]) % Q
    assert identity == tz * zh % Q, "quotient identity fails"

    # fold and pair
    proof_pt = {"a": 0, "b": 2, "c": 4, "z": 6, "t1": 8, "t2": 10, "t3": 12}
    vk_pts = {k: vk.commitments[k]
              for k in ("ql", "qr", "qm", "qo", "qk", "s1", "s2", "s3")}
    fold_c = None
    fold_v = 0
    vi = 1
    for name in EVAL_ORDER:
        cpt = pt(proof_pt[name]) if name in proof_pt else vk_pts[name]
        fold_c = g1.add(fold_c, g1.scalar_mul(cpt, vi))
        fold_v = (fold_v + vi * e[name]) % Q
        vi = vi * vch % Q

    G = g1.generator

    def kzg_left(c, v, z, w):
        acc = g1.add(c, g1.scalar_mul(G, (-v) % Q))
        return g1.add(acc, g1.scalar_mul(w, z))

    w1 = pt(14)
    w2 = pt(16)
    pairs_p = [
        kzg_left(fold_c, fold_v, zeta, w1), g1.neg(w1),
        kzg_left(pt(6), zw, zeta * omega % Q, w2), g1.neg(w2),
    ]
    pairs_q = [vk.g2_gen, vk.g2_tau, vk.g2_gen, vk.g2_tau]
    assert CURVE.pairing(list(zip(pairs_p, pairs_q))), "pairing check fails"


def test_export_structure(plonk_artifacts):
    vk, _ = plonk_artifacts
    src = export_plonk_solidity(vk, CURVE)
    assert "pragma solidity" in src
    assert src.count("constant") >= 30
    assert f"uint256[{18 + len(EVAL_ORDER) + 1}] calldata proof" in src
    assert "staticcall(gas(), 8" in src  # pairing precompile


def test_contract_algorithm_accepts_valid_proof(plonk_artifacts):
    vk, proof = plonk_artifacts
    src = export_plonk_solidity(vk, CURVE)
    _simulate(src, vk, proof, [35])


def test_contract_algorithm_rejects_tampered(plonk_artifacts):
    vk, proof = plonk_artifacts
    src = export_plonk_solidity(vk, CURVE)
    with pytest.raises(AssertionError):
        _simulate(src, vk, proof, [36])  # wrong public input
    from dataclasses import replace

    bad = replace(proof, z_omega_eval=(proof.z_omega_eval + 1) % Q)
    with pytest.raises(AssertionError):
        _simulate(src, vk, bad, [35])
