"""BSB22 commitments: api.commit → Pedersen commit/PoK → verifier folding.

Parity model: reference test/commitments_test.go (single/multiple
commitments, committing to public inputs, commitment-to-commitment) and the
prover/verifier commitment paths (backend/groth16/bn254/prove.go:74-141,
verify.go:82-115).
"""

import random

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import Circuit, Public, Secret, compile_circuit
from gnark_icicle_tpu.frontend.engine import check_solved
from gnark_icicle_tpu.constraint.solver import solve, is_satisfied
from gnark_icicle_tpu.backend import groth16

CURVE = bn254.BN254
Q = CURVE.fr.modulus


class CommitCubic(Circuit):
    """Cubic with a commitment binding x and the public y."""

    x = Secret()
    y = Public()

    def define(self, api):
        c = api.commit(self.x, self.y)
        api.assert_is_different(c, 0)
        x3 = api.mul(self.x, self.x, self.x)
        api.assert_is_equal(self.y, api.add(x3, self.x, 5))


class TwoCommits(Circuit):
    """Second commitment commits to an already-committed variable, which
    must transparently become a commitment-to-commitment (reference:
    frontend/cs/r1cs/api.go Commit's privateCommittedSeeker path)."""

    a = Secret()
    b = Secret()
    s = Public()

    def define(self, api):
        c1 = api.commit(self.a, self.b)
        api.assert_is_different(c1, 0)
        c2 = api.commit(self.a, c1)  # a already committed → binds c1 twice
        api.assert_is_different(c2, 0)
        api.assert_is_equal(api.add(self.a, self.b), self.s)


class CommitPrivateOnly(Circuit):
    a = Secret()
    b = Secret()
    p = Public()

    def define(self, api):
        c = api.commit(self.a, self.b, api.mul(self.a, self.b))
        api.assert_is_different(c, 0)
        api.assert_is_equal(api.mul(self.a, self.b), self.p)


def test_engine_commit_deterministic_nonzero():
    check_solved(CommitCubic(x=3, y=35), Q)
    check_solved(TwoCommits(a=2, b=5, s=7), Q)
    check_solved(CommitPrivateOnly(a=4, b=6, p=24), Q)


def test_commitment_info_structure():
    cs = compile_circuit(Q, CommitCubic)
    assert len(cs.commitments) == 1
    c = cs.commitments[0]
    # y (wire 1) is the only committed public; x + mask are private
    assert c.public_and_commitment_committed == [1]
    assert c.nb_public_committed == 1
    assert len(c.private_committed) == 2
    assert all(w >= cs.nb_public for w in c.private_committed)
    assert c.commitment_index > max(c.private_committed)


def test_commitment_to_commitment_structure():
    cs = compile_circuit(Q, TwoCommits)
    assert len(cs.commitments) == 2
    c1, c2 = cs.commitments
    # c2's committed set contains c1's wire (a was already committed),
    # no public wires, and its own fresh mask
    assert c2.nb_public_committed == 0
    assert c2.public_and_commitment_committed == [c1.commitment_index]
    assert c1.commitment_index not in c2.private_committed
    # a (committed by c1) must not be re-committed privately by c2
    assert not (set(c1.private_committed) & set(c2.private_committed))


def test_solver_placeholder_path():
    """Without the prover override the placeholder hint must still solve
    (≙ Bsb22CommitmentComputePlaceholder's test-mode branch)."""
    cs = compile_circuit(Q, CommitCubic)
    assert is_satisfied(cs, [35], [3])
    assert not is_satisfied(cs, [36], [3])


@pytest.fixture(scope="module")
def commit_setup():
    cs = compile_circuit(Q, CommitCubic)
    pk, vk = groth16.setup(cs, CURVE, rng=random.Random(11))
    proof = groth16.prove(cs, pk, [35], [3], CURVE, rng=random.Random(12))
    return cs, pk, vk, proof


def test_prove_verify_with_commitment(commit_setup):
    _, _, vk, proof = commit_setup
    assert len(proof.commitments) == 1
    assert proof.commitment_pok is not None
    groth16.verify(proof, vk, [35], CURVE)


def test_vk_carries_commitment_keys(commit_setup):
    cs, pk, vk, _ = commit_setup
    assert len(vk.commitment_keys) == 1
    assert len(pk.commitment_keys) == 1
    assert len(pk.commitment_keys[0].basis) == 2  # x + mask
    # vk.K covers publics + the commitment wire
    assert len(vk.g1_k) == cs.nb_public + 1
    assert vk.public_and_commitment_committed == [[1]]


def test_tampered_commitment_rejected(commit_setup):
    _, _, vk, proof = commit_setup
    g1 = CURVE.g1
    bad = groth16.Proof(
        ar=proof.ar, krs=proof.krs, bs=proof.bs,
        commitments=[g1.scalar_mul(g1.generator, 99)],
        commitment_pok=proof.commitment_pok,
    )
    assert not groth16.is_valid(bad, vk, [35], CURVE)


def test_tampered_pok_rejected(commit_setup):
    _, _, vk, proof = commit_setup
    g1 = CURVE.g1
    bad = groth16.Proof(
        ar=proof.ar, krs=proof.krs, bs=proof.bs,
        commitments=list(proof.commitments),
        commitment_pok=g1.scalar_mul(g1.generator, 7),
    )
    assert not groth16.is_valid(bad, vk, [35], CURVE)


def test_missing_commitment_rejected(commit_setup):
    _, _, vk, proof = commit_setup
    bad = groth16.Proof(ar=proof.ar, krs=proof.krs, bs=proof.bs)
    assert not groth16.is_valid(bad, vk, [35], CURVE)


def test_proof_serialization_roundtrip_with_commitments(commit_setup):
    from gnark_icicle_tpu.io.serialize import proof_to_bytes, proof_from_bytes

    _, _, vk, proof = commit_setup
    for compressed in (False, True):
        blob = proof_to_bytes(CURVE, proof, compressed)
        back, n = proof_from_bytes(CURVE, blob)
        assert n == len(blob)
        assert back.ar == proof.ar and back.krs == proof.krs
        assert back.commitments == proof.commitments
        assert back.commitment_pok == proof.commitment_pok
        groth16.verify(back, vk, [35], CURVE)


def test_vk_serialization_roundtrip_with_commitments(commit_setup):
    from gnark_icicle_tpu.io.serialize import vk_to_bytes, vk_from_bytes

    _, _, vk, proof = commit_setup
    blob = vk_to_bytes(CURVE, vk)
    back, n = vk_from_bytes(CURVE, blob)
    assert n == len(blob)
    assert back.nb_public == vk.nb_public
    assert back.public_and_commitment_committed == \
        vk.public_and_commitment_committed
    assert len(back.commitment_keys) == 1
    groth16.verify(proof, back, [35], CURVE)


def test_pk_serialization_roundtrip_with_commitments(commit_setup):
    from gnark_icicle_tpu.io.keys import pk_to_bytes, pk_from_bytes

    cs, pk, vk, _ = commit_setup
    blob = pk_to_bytes(CURVE, pk)
    back = pk_from_bytes(CURVE, blob)
    assert len(back.commitment_keys) == 1
    assert back.commitment_keys[0].basis == pk.commitment_keys[0].basis
    proof = groth16.prove(cs, back, [35], [3], CURVE, rng=random.Random(13))
    groth16.verify(proof, vk, [35], CURVE)


# ---------------------------------------------------------------------------
# PLONK BSB22 (≙ the reference's PLONK commitment path: Qcp columns,
# prover PI2 commitment, verifier Qk injection)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def plonk_commit_setup():
    from gnark_icicle_tpu.backend import plonk

    cs = compile_circuit(Q, CommitCubic, builder="scs")
    pk, vk = plonk.setup(cs, CURVE, rng=random.Random(21))
    proof = plonk.prove(cs, pk, [35], [3], CURVE, rng=random.Random(22))
    return cs, pk, vk, proof


def test_plonk_commitment_structure():
    cs = compile_circuit(Q, CommitCubic, builder="scs")
    assert len(cs.commitments) == 1
    c = cs.commitments[0]
    assert len(c.committed) == 2  # x and y enter as committed rows
    assert c.commitment_index > max(c.committed)
    assert cs.commitment_tags[c.commitment_index] == 2
    for gi in c.committed:
        assert cs.commitment_tags[gi] == 1
    # solver-only path accepts valid, rejects invalid
    from gnark_icicle_tpu.constraint.scs import solve_scs, SparseUnsatisfiedError

    solve_scs(cs, [35], [3])
    with pytest.raises(SparseUnsatisfiedError):
        solve_scs(cs, [36], [3])


def test_plonk_prove_verify_with_commitment(plonk_commit_setup):
    from gnark_icicle_tpu.backend import plonk

    _, _, vk, proof = plonk_commit_setup
    assert len(proof.bsb22_commitments) == 1
    plonk.verify(proof, vk, [35], CURVE)


def test_plonk_forged_bsb22_rejected(plonk_commit_setup):
    from gnark_icicle_tpu.backend import plonk
    from dataclasses import replace

    _, _, vk, proof = plonk_commit_setup
    bad = replace(proof, bsb22_commitments=[CURVE.g1.generator])
    assert not plonk.is_valid(bad, vk, [35], CURVE)
    stripped = replace(proof, bsb22_commitments=[])
    assert not plonk.is_valid(stripped, vk, [35], CURVE)


def test_plonk_proof_vk_roundtrip_with_commitments(plonk_commit_setup):
    from gnark_icicle_tpu.backend import plonk
    from gnark_icicle_tpu.io.plonk_serialize import (
        plonk_proof_to_bytes, plonk_proof_from_bytes,
        plonk_vk_to_bytes, plonk_vk_from_bytes,
    )

    _, _, vk, proof = plonk_commit_setup
    p2, n = plonk_proof_from_bytes(
        CURVE, plonk_proof_to_bytes(CURVE, proof)
    )
    assert p2.bsb22_commitments == proof.bsb22_commitments
    v2, _ = plonk_vk_from_bytes(CURVE, plonk_vk_to_bytes(CURVE, vk))
    assert v2.commitment_constraint_indexes == \
        vk.commitment_constraint_indexes
    plonk.verify(p2, v2, [35], CURVE)


def test_scs_serialization_keeps_commitments():
    from gnark_icicle_tpu.io.keys import scs_to_bytes, scs_from_bytes
    from gnark_icicle_tpu.constraint.scs import solve_scs

    cs = compile_circuit(Q, CommitCubic, builder="scs")
    back = scs_from_bytes(scs_to_bytes(cs))
    assert len(back.commitments) == 1
    assert back.commitments[0].committed == cs.commitments[0].committed
    assert back.commitment_tags == cs.commitment_tags
    solve_scs(back, [35], [3])


def test_r1cs_serialization_keeps_commitments():
    from gnark_icicle_tpu.io.keys import r1cs_to_bytes, r1cs_from_bytes

    cs = compile_circuit(Q, TwoCommits)
    back = r1cs_from_bytes(r1cs_to_bytes(cs))
    assert len(back.commitments) == 2
    for a, b in zip(cs.commitments, back.commitments):
        assert a.public_and_commitment_committed == \
            list(b.public_and_commitment_committed)
        assert a.nb_public_committed == b.nb_public_committed
        assert a.private_committed == list(b.private_committed)
        assert a.commitment_index == b.commitment_index
    assert is_satisfied(back, [7], [2, 5])


def test_commitment_on_bls12_381():
    """The commitment machinery is curve-generic: full Groth16 BSB22 flow on
    the second instantiation."""
    from gnark_icicle_tpu.curves import bls12_381

    B = bls12_381.BLS12_381
    cs = compile_circuit(B.fr.modulus, CommitCubic)
    pk, vk = groth16.setup(cs, B, rng=random.Random(61))
    proof = groth16.prove(cs, pk, [35], [3], B, rng=random.Random(62))
    assert len(proof.commitments) == 1
    groth16.verify(proof, vk, [35], B)
    assert not groth16.is_valid(proof, vk, [36], B)


# -- edge-scenario matrix (≙ test/commitments_test.go commitmentTestCircuits)

class CommittedConstant(Circuit):
    """≙ committedConstantCircuit: Commit(1, x) — constants fold out of
    the committed set but the commitment must still bind x."""

    x = Secret()

    def define(self, api):
        c = api.commit(1, self.x)
        api.assert_is_different(c, self.x)


class CommittedPublic(Circuit):
    """≙ committedPublicCircuit: committing to a PUBLIC input routes it
    through public_and_commitment_committed, not the private basis."""

    x = Public()

    def define(self, api):
        c = api.commit(self.x)
        api.assert_is_different(c, self.x)


class IndependentCommits(Circuit):
    """≙ independentCommitsCircuit: two unrelated commitments."""

    a = Secret()
    b = Secret()

    def define(self, api):
        ca = api.commit(self.a)
        cb = api.commit(self.b)
        api.assert_is_different(ca, self.a)
        api.assert_is_different(cb, self.b)


class DoubleCommit(Circuit):
    """≙ doubleCommitCircuit: the same variable in two commitments must
    yield distinct commitment values."""

    x = Secret()
    y = Secret()

    def define(self, api):
        c0 = api.commit(self.x)
        c1 = api.commit(self.x, self.y)
        api.assert_is_different(c0, c1)


class FiveCommitsFivePublic(Circuit):
    """≙ commitmentCircuit{X: 5 vars, Public: 5}: weighted sum over the
    committed set plus publics, compared against the commitment."""

    x = Secret(shape=5)
    p = Public(shape=5)

    def define(self, api):
        c = api.commit(*self.x)
        s = 0
        for i, xi in enumerate(self.x):
            s = api.add(s, api.mul(xi, i + 1))
        for pi in self.p:
            s = api.add(s, pi)
        api.assert_is_different(c, s)


@pytest.mark.parametrize("circ,pub,sec", [
    (CommittedConstant, [], [3]),
    (CommittedPublic, [5], []),
    (IndependentCommits, [], [1, 1]),
    (DoubleCommit, [], [1, 2]),
    (FiveCommitsFivePublic, [[1, 2, 3, 4, 5]], [[9, 8, 7, 6, 5]]),
])
def test_commitment_edge_solves(circ, pub, sec):
    """Placeholder-hint solve path for every edge scenario, both
    arithmetizations."""
    from gnark_icicle_tpu.constraint.scs import solve_scs

    flat = lambda vals: ([x for v in vals for x in (v if isinstance(v, list) else [v])])
    cs = compile_circuit(Q, circ)
    assert is_satisfied(cs, flat(pub), flat(sec))
    scs = compile_circuit(Q, circ, builder="scs")
    solve_scs(scs, flat(pub), flat(sec))


@pytest.mark.slow
@pytest.mark.parametrize("circ,pub,sec", [
    (CommittedPublic, [5], []),
    (DoubleCommit, [], [1, 2]),
])
def test_commitment_edge_groth16_e2e(circ, pub, sec):
    """Real Pedersen commitments + PoK through setup/prove/verify for the
    trickiest scenarios: committed public input; two commitments sharing
    a variable (≙ TestCommitment's groth16 sweep)."""
    cs = compile_circuit(Q, circ)
    pk, vk = groth16.setup(cs, CURVE, rng=random.Random(21))
    proof = groth16.prove(cs, pk, pub, sec, CURVE, rng=random.Random(22))
    assert len(proof.commitments) == len(cs.commitments)
    groth16.verify(proof, vk, pub, CURVE)


@pytest.mark.slow
def test_commitment_edge_plonk_two_qcp():
    """PLONK with two BSB22 commitments → two qcp columns
    (≙ TestCommitment's plonk sweep over doubleCommitCircuit)."""
    from gnark_icicle_tpu.backend import plonk

    scs = compile_circuit(Q, DoubleCommit, builder="scs")
    assert len(scs.commitments) == 2
    pk, vk = plonk.setup(scs, CURVE, rng=random.Random(23))
    pf = plonk.prove(scs, pk, [], [1, 2], CURVE, rng=random.Random(24))
    assert len(pf.bsb22_commitments) == 2
    plonk.verify(pf, vk, [], CURVE)
