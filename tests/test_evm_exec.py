"""EXECUTE the exported Solidity verifiers (not just inspect them).

Parity model: reference test/assert_solidity.go:1-96 — gnark compiles the
exported contract with solc and runs proofs through a real EVM via
gnark-solidity-checker. Here the emitted contract SOURCE runs through the
in-repo Solidity-subset interpreter (gnark_icicle_tpu/evm.py) whose
staticcall precompiles 0x05-0x08 are backed by the host curve/pairing: a
wrong constant, swapped Fp2 word order, bad proof-word index or broken
transcript byte layout in the template fails these tests at run time.
"""

import random

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import compile_circuit
from gnark_icicle_tpu.backend import groth16, plonk
from gnark_icicle_tpu.backend.solidity import export_solidity
from gnark_icicle_tpu.backend.plonk_solidity import export_plonk_solidity
from gnark_icicle_tpu.evm import Revert, load_contract

from circuits import Cubic

Q = bn254.R
CURVE = bn254.BN254


# ---------------------------------------------------------------------------
# interpreter unit checks
# ---------------------------------------------------------------------------

def test_interpreter_precompiles_direct():
    from gnark_icicle_tpu.evm import _precompile

    # 0x05 modexp
    data = (
        (32).to_bytes(32, "big") * 3
        + (7).to_bytes(32, "big")
        + (5).to_bytes(32, "big")
        + (13).to_bytes(32, "big")
    )
    assert int.from_bytes(_precompile(5, data), "big") == pow(7, 5, 13)
    # 0x06 ecadd: G + G == 2G
    g = bn254.G1.generator
    g2 = bn254.G1.add(g, g)
    data = b"".join(c.to_bytes(32, "big") for c in (*g, *g))
    out = _precompile(6, data)
    assert (int.from_bytes(out[:32], "big"),
            int.from_bytes(out[32:], "big")) == g2
    # 0x07 ecmul rejects off-curve points (EVM precompile error)
    bad = b"".join(c.to_bytes(32, "big") for c in (g[0], g[1] + 1, 5))
    assert _precompile(7, bad) is None
    # 0x08 pairing: e(G1, G2) * e(-G1, G2) == 1
    h = bn254.G2.generator
    neg = bn254.G1.neg(g)

    def pair_words(p1, q2):
        return b"".join(c.to_bytes(32, "big") for c in (
            p1[0], p1[1], q2[0].c1, q2[0].c0, q2[1].c1, q2[1].c0))

    out = _precompile(8, pair_words(g, h) + pair_words(neg, h))
    assert int.from_bytes(out, "big") == 1
    out = _precompile(8, pair_words(g, h) + pair_words(g, h))
    assert int.from_bytes(out, "big") == 0


def test_interpreter_language_basics():
    src = """
contract T {
    uint256 private constant C = 41;
    error Boom();
    function f(uint256 x) public view returns (uint256) {
        uint256[2] memory a;
        a[0] = x;
        for (uint256 i = 0; i < 3; i++) { a[0] = a[0] + 1; }
        if (a[0] == 0) revert Boom();
        (uint256 u, uint256 v) = g(a[0]);
        return u + v + C + (x == 1 ? 100 : 200);
    }
    function g(uint256 y) private pure returns (uint256, uint256) {
        return (y, mulmod(y, y, 97));
    }
}
"""
    c = load_contract(src)
    y = 1 + 3
    assert c.call("f", 1) == y + (y * y % 97) + 41 + 100
    # checked arithmetic: underflow reverts
    src2 = """
contract U {
    function f(uint256 x) public pure returns (uint256) { return x - 1; }
}
"""
    with pytest.raises(Revert):
        load_contract(src2).call("f", 0)


# ---------------------------------------------------------------------------
# Groth16 contract execution
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def g16_artifacts():
    cs = compile_circuit(Q, Cubic)
    pk, vk = groth16.setup(cs, CURVE, rng=random.Random(60),
                           engine="host")
    proof = groth16.prove(cs, pk, [35], [3], CURVE,
                          rng=random.Random(61), engine="host")
    groth16.verify(proof, vk, [35], CURVE)
    return vk, proof


def _g16_words(proof):
    """The contract's documented layout: Ar, Bs (Fp2 imag-first), Krs."""
    ax, ay = proof.ar
    bx, by = proof.bs
    kx, ky = proof.krs
    return [ax, ay, bx.c1, bx.c0, by.c1, by.c0, kx, ky]


def test_groth16_contract_accepts_valid_proof(g16_artifacts):
    vk, proof = g16_artifacts
    contract = load_contract(export_solidity(vk, CURVE))
    contract.call("verifyProof", _g16_words(proof), [35])  # no revert


def test_groth16_contract_calldata_layout(g16_artifacts):
    vk, proof = g16_artifacts
    contract = load_contract(export_solidity(vk, CURVE))
    data = b"".join(int(w).to_bytes(32, "big")
                    for w in _g16_words(proof) + [35])
    contract.call_calldata("verifyProof", data)


def test_groth16_contract_rejects_tampered(g16_artifacts):
    vk, proof = g16_artifacts
    contract = load_contract(export_solidity(vk, CURVE))
    words = _g16_words(proof)

    # wrong public input -> pairing product != 1 -> ProofInvalid
    with pytest.raises(Revert) as exc:
        contract.call("verifyProof", words, [36])
    assert exc.value.error == "ProofInvalid"

    # public input out of field
    with pytest.raises(Revert) as exc:
        contract.call("verifyProof", words, [Q])
    assert exc.value.error == "PublicInputNotInField"

    # off-curve proof point -> precompile failure -> raw revert
    bad = list(words)
    bad[0] = (bad[0] + 1) % bn254.P
    with pytest.raises(Revert):
        contract.call("verifyProof", bad, [35])

    # valid curve point but wrong proof -> ProofInvalid
    g = bn254.G1.generator
    bad = list(words)
    bad[0], bad[1] = g
    with pytest.raises(Revert) as exc:
        contract.call("verifyProof", bad, [35])
    assert exc.value.error == "ProofInvalid"


# ---------------------------------------------------------------------------
# PLONK contract execution (plain + BSB22 single-commitment)
# ---------------------------------------------------------------------------

def _plonk_words(proof):
    """Layout per plonk_solidity.py docstring (mirrors that test's mapping)."""
    def xy(pt):
        return [0, 0] if pt is None else [pt[0], pt[1]]

    words = []
    for pt in (*proof.lro, proof.z_com, *proof.h_coms, proof.batch_h,
               proof.z_shifted_h):
        words += xy(pt)
    words += list(proof.batch_claimed[:6])
    words.append(proof.z_shifted_claimed)
    words += list(proof.batch_claimed[6:])
    for cm in proof.bsb22_commitments:
        words += xy(cm)
    return words


@pytest.fixture(scope="module")
def plonk_artifacts():
    from test_plonk_solidity import Cubic as PCubic

    cs = compile_circuit(Q, PCubic, builder="scs")
    pk, vk = plonk.setup(cs, CURVE, rng=random.Random(31))
    proof = plonk.prove(cs, pk, [35], [3], CURVE, rng=random.Random(32))
    plonk.verify(proof, vk, [35], CURVE)
    return vk, proof


def test_plonk_contract_accepts_valid_proof(plonk_artifacts):
    vk, proof = plonk_artifacts
    contract = load_contract(export_plonk_solidity(vk, CURVE))
    contract.call("verifyProof", _plonk_words(proof), [35])


def test_plonk_contract_calldata_layout(plonk_artifacts):
    vk, proof = plonk_artifacts
    contract = load_contract(export_plonk_solidity(vk, CURVE))
    data = b"".join(int(w).to_bytes(32, "big")
                    for w in _plonk_words(proof) + [35])
    contract.call_calldata("verifyProof", data)


def test_plonk_contract_rejects_tampered(plonk_artifacts):
    vk, proof = plonk_artifacts
    contract = load_contract(export_plonk_solidity(vk, CURVE))
    words = _plonk_words(proof)

    with pytest.raises(Revert) as exc:
        contract.call("verifyProof", words, [36])  # wrong public input
    assert exc.value.error == "ProofInvalid"

    bad = list(words)
    bad[24] = (bad[24] + 1) % Q  # tamper z(omega*zeta)
    with pytest.raises(Revert) as exc:
        contract.call("verifyProof", bad, [35])
    assert exc.value.error == "ProofInvalid"

    bad = list(words)
    bad[14] = (bad[14] + 1) % bn254.P  # batch opening point off curve
    with pytest.raises(Revert):
        contract.call("verifyProof", bad, [35])


@pytest.fixture(scope="module")
def plonk_bsb22_artifacts():
    from test_plonk_solidity import CommitCubic

    cs = compile_circuit(Q, CommitCubic, builder="scs")
    pk, vk = plonk.setup(cs, CURVE, rng=random.Random(41))
    proof = plonk.prove(cs, pk, [35], [3], CURVE, rng=random.Random(42))
    plonk.verify(proof, vk, [35], CURVE)
    return vk, proof


def test_plonk_bsb22_contract_executes(plonk_bsb22_artifacts):
    vk, proof = plonk_bsb22_artifacts
    contract = load_contract(export_plonk_solidity(vk, CURVE))
    words = _plonk_words(proof)
    assert len(words) == 28
    contract.call("verifyProof", words, [35])

    # tampered commitment point: in-contract hashFr (RFC 9380 xmd) diverges
    bad = list(words)
    gx, gy = CURVE.g1.add((bad[26], bad[27]), CURVE.g1.generator)
    bad[26], bad[27] = gx, gy
    with pytest.raises(Revert) as exc:
        contract.call("verifyProof", bad, [35])
    assert exc.value.error == "ProofInvalid"


# ---------------------------------------------------------------------------
# Groth16 BSB22-commitment contract execution (≙ the reference template's
# commitment branch, backend/groth16/bn254/solidity.go:680-760)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def g16_commit_artifacts():
    from gnark_icicle_tpu.frontend import Circuit, Public, Secret

    class CommitCubic(Circuit):
        x = Secret()
        y = Public()

        def define(self, api):
            c = api.commit(self.x, self.y)
            api.assert_is_different(c, 0)
            x3 = api.mul(self.x, self.x, self.x)
            api.assert_is_equal(self.y, api.add(x3, self.x, 5))

    cs = compile_circuit(Q, CommitCubic)
    pk, vk = groth16.setup(cs, CURVE, rng=random.Random(70), engine="host")
    proof = groth16.prove(cs, pk, [35], [3], CURVE, rng=random.Random(71),
                          engine="host", commitment_hash=("evm", "sha256"))
    groth16.verify(proof, vk, [35], CURVE,
                   commitment_hash=("evm", "sha256"))
    return vk, proof


def _g16_commit_args(proof):
    cm = [proof.commitments[0][0], proof.commitments[0][1]]
    pok = [proof.commitment_pok[0], proof.commitment_pok[1]]
    return _g16_words(proof), cm, pok


def test_groth16_commitment_contract_accepts(g16_commit_artifacts):
    vk, proof = g16_commit_artifacts
    contract = load_contract(export_solidity(vk, CURVE))
    words, cm, pok = _g16_commit_args(proof)
    contract.call("verifyProof", words, cm, pok, [35])  # no revert


def test_groth16_commitment_contract_rejects(g16_commit_artifacts):
    vk, proof = g16_commit_artifacts
    contract = load_contract(export_solidity(vk, CURVE))
    words, cm, pok = _g16_commit_args(proof)

    # wrong public input -> ProofInvalid
    with pytest.raises(Revert) as exc:
        contract.call("verifyProof", words, cm, pok, [36])
    assert exc.value.error == "ProofInvalid"

    # tampered PoK (valid curve point) -> CommitmentInvalid
    bad_pok = list(bn254.G1.scalar_mul((pok[0], pok[1]), 2))
    with pytest.raises(Revert) as exc:
        contract.call("verifyProof", words, cm, bad_pok, [36])
    assert exc.value.error == "CommitmentInvalid"

    # tampered commitment (valid curve point) -> its PoK no longer matches
    bad_cm = list(bn254.G1.scalar_mul((cm[0], cm[1]), 2))
    with pytest.raises(Revert) as exc:
        contract.call("verifyProof", words, bad_cm, pok, [35])
    assert exc.value.error == "CommitmentInvalid"


def test_groth16_commitment_contract_requires_evm_hash(g16_commit_artifacts):
    """A proof produced with the DEFAULT RFC-9380 hash derives a different
    commitment wire than the contract recomputes -> ProofInvalid (the
    reference has the same prover-hash requirement, verify.go:154-180)."""
    vk, _ = g16_commit_artifacts
    from gnark_icicle_tpu.frontend import Circuit, Public, Secret

    class CommitCubic(Circuit):
        x = Secret()
        y = Public()

        def define(self, api):
            c = api.commit(self.x, self.y)
            api.assert_is_different(c, 0)
            x3 = api.mul(self.x, self.x, self.x)
            api.assert_is_equal(self.y, api.add(x3, self.x, 5))

    cs = compile_circuit(Q, CommitCubic)
    pk2, vk2 = groth16.setup(cs, CURVE, rng=random.Random(70), engine="host")
    proof = groth16.prove(cs, pk2, [35], [3], CURVE, rng=random.Random(72),
                          engine="host")  # default sha256/RFC9380 hash
    groth16.verify(proof, vk2, [35], CURVE)
    contract = load_contract(export_solidity(vk2, CURVE))
    words, cm, pok = _g16_commit_args(proof)
    with pytest.raises(Revert) as exc:
        contract.call("verifyProof", words, cm, pok, [35])
    assert exc.value.error == "ProofInvalid"
