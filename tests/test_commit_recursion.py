"""Recursion over BSB22-commitment-carrying Groth16 proofs.

Parity target: reference std/recursion/groth16/verifier.go:632-683 — the
in-circuit commitment-wire re-derivation (solveCommitmentWire replayed with
the recursion hash), the Pedersen AssertCommitment pairing check
(std/commitments/pedersen/verifier.go), and the kSum fold of commitment
points — for both the native 2-chain instantiation (BLS12-377-in-BW6-761)
and the emulated same-curve one (BN254-in-BN254).

The inner proofs use ``commitment_hash=("mimc", outer_modulus)``
(≙ recursion.NewShort installed via WithProverHashToFieldFunction).
"""

import random

import pytest

from gnark_icicle_tpu.curves import bls12_377 as b377
from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import Circuit, Public, Secret, compile_circuit
from gnark_icicle_tpu.frontend.engine import Engine, EngineUnsatisfiedError
from gnark_icicle_tpu.backend import groth16
from gnark_icicle_tpu.backend.groth16.verify import VerificationError


class InnerCommit(Circuit):
    """y = x² with a commitment binding x and the public y."""

    x = Secret()
    y = Public()

    def define(self, api):
        c = api.commit(self.x, self.y)
        api.assert_is_different(c, 0)
        api.assert_is_equal(api.mul(self.x, self.x), self.y)


def _make_inner(curve_mod, curve, outer_mod, seed=11):
    cs = compile_circuit(curve_mod, InnerCommit)
    pk, vk = groth16.setup(cs, curve, rng=random.Random(seed), engine="host")
    pub, sec = [9], [3]
    proof = groth16.prove(cs, pk, pub, sec, curve, rng=random.Random(5),
                          engine="host",
                          commitment_hash=("mimc", outer_mod))
    groth16.verify(proof, vk, pub, curve,
                   commitment_hash=("mimc", outer_mod))
    return vk, proof, pub


@pytest.fixture(scope="module")
def inner_commit_377():
    return _make_inner(b377.R, b377.BLS12_377, b377.P)


def test_mimc_commitment_hash_host_vs_gadget():
    """The host mimc_commitment_hash and the gadget replay must agree on
    the absorbed sequence and truncation (hash-only, no pairings)."""
    from gnark_icicle_tpu.backend.hash_to_field import (
        MIMC_COMMITMENT_TAG, mimc_commitment_hash,
    )
    from gnark_icicle_tpu.std.hash.mimc import MiMC

    outer_q = b377.P
    rng = random.Random(3)
    pt = b377.G1.random_point(rng)
    committed = [rng.randrange(b377.R) for _ in range(3)]
    want = mimc_commitment_hash(outer_q, b377.R, b377.P, pt, committed)

    eng = Engine(outer_q)
    m = MiMC(eng, outer_q)
    m.write(int.from_bytes(MIMC_COMMITMENT_TAG, "big") % outer_q)
    m.write(pt[0])
    m.write(pt[1])
    for v in committed:
        m.write(v)
    d = int(m.sum())
    out_bits = min(b377.R.bit_length(), outer_q.bit_length()) - 1
    assert d & ((1 << out_bits) - 1) == want


def test_mimc_hash_mismatch_rejected(inner_commit_377):
    """A proof produced with the MiMC commitment hash must NOT verify
    under the default SHA path (they derive different commitment wires)."""
    vk, proof, pub = inner_commit_377
    with pytest.raises(VerificationError):
        groth16.verify(proof, vk, pub, b377.BLS12_377)


@pytest.mark.slow
def test_native_recursion_commitment_proof(inner_commit_377):
    from gnark_icicle_tpu.std.recursion.native_groth16 import (
        NativeGroth16Verifier,
    )

    vk, proof, pub = inner_commit_377
    gv = NativeGroth16Verifier(Engine(b377.P), vk)
    gv.assert_proof(gv.proof_witness(proof), pub)


@pytest.mark.slow
def test_native_recursion_rejects_tampered_commitment(inner_commit_377):
    from gnark_icicle_tpu.std.recursion.native_groth16 import (
        NativeGroth16Verifier,
    )

    vk, proof, pub = inner_commit_377
    gv = NativeGroth16Verifier(Engine(b377.P), vk)
    bad = gv.proof_witness(proof)
    fp = gv.pairing.fp
    other = b377.G1.scalar_mul(proof.commitments[0], 2)
    bad.commitments = ((fp.constant(other[0]), fp.constant(other[1])),)
    with pytest.raises(EngineUnsatisfiedError):
        gv.assert_proof(bad, pub)


@pytest.mark.slow
def test_native_recursion_rejects_tampered_pok(inner_commit_377):
    from gnark_icicle_tpu.std.recursion.native_groth16 import (
        NativeGroth16Verifier,
    )

    vk, proof, pub = inner_commit_377
    gv = NativeGroth16Verifier(Engine(b377.P), vk)
    bad = gv.proof_witness(proof)
    fp = gv.pairing.fp
    other = b377.G1.scalar_mul(proof.commitment_pok, 3)
    bad.commitment_pok = (fp.constant(other[0]), fp.constant(other[1]))
    with pytest.raises(EngineUnsatisfiedError):
        gv.assert_proof(bad, pub)


@pytest.mark.slow
def test_outer_compiled_commitment_recursion(inner_commit_377):
    """Compile the commitment-recursion verifier to CONSTRAINTS and solve
    with the real proof — the full 2-chain statement as a constraint
    system, tamper-rejecting (≙ the reference outer-circuit tests)."""
    from gnark_icicle_tpu.constraint.solver import solve, is_satisfied
    from gnark_icicle_tpu.constraint.solver import UnsatisfiedConstraintError
    from gnark_icicle_tpu.std.recursion.native_groth16 import (
        NativeGroth16Verifier, NativeVerifierProof,
    )

    vk, proof, pub = inner_commit_377

    class OuterG16C(Circuit):
        inner_pub = Public()
        pr = Secret(shape=12)

        def define(self, api):
            gv = NativeGroth16Verifier(api, vk)
            p = self.pr
            w = NativeVerifierProof(
                ar=(p[0], p[1]),
                bs=((p[2], p[3]), (p[4], p[5])),
                krs=(p[6], p[7]),
                commitments=((p[8], p[9]),),
                commitment_pok=(p[10], p[11]),
            )
            gv.assert_proof(w, [self.inner_pub])

    cs = compile_circuit(b377.P, OuterG16C)
    w = OuterG16C(
        inner_pub=pub[0],
        pr=[proof.ar[0], proof.ar[1],
            proof.bs[0].c0, proof.bs[0].c1, proof.bs[1].c0, proof.bs[1].c1,
            proof.krs[0], proof.krs[1],
            proof.commitments[0][0], proof.commitments[0][1],
            proof.commitment_pok[0], proof.commitment_pok[1]],
    )
    opub, osec = w.witness_values(b377.P)
    res = solve(cs, opub, osec)
    assert res is not None

    # tampered commitment -> unsatisfiable
    other = b377.G1.scalar_mul(proof.commitments[0], 2)
    bad = OuterG16C(
        inner_pub=pub[0],
        pr=[proof.ar[0], proof.ar[1],
            proof.bs[0].c0, proof.bs[0].c1, proof.bs[1].c0, proof.bs[1].c1,
            proof.krs[0], proof.krs[1],
            other[0], other[1],
            proof.commitment_pok[0], proof.commitment_pok[1]],
    )
    bpub, bsec = bad.witness_values(b377.P)
    with pytest.raises(UnsatisfiedConstraintError):
        solve(cs, bpub, bsec)


@pytest.mark.slow
def test_emulated_same_curve_commitment_recursion():
    """BN254-in-BN254: the emulated verifier re-derives the commitment
    wire (coordinates absorbed as canonical 64-bit limbs) and checks the
    Pedersen PoK through the emulated pairing."""
    from gnark_icicle_tpu.std.recursion.groth16 import Groth16Verifier

    vk, proof, pub = _make_inner(bn254.R, bn254.BN254, bn254.R)
    gv = Groth16Verifier(Engine(bn254.R), bn254.R, vk)
    gv.assert_proof(gv.proof_witness(proof), pub)

    bad = gv.proof_witness(proof)
    fp = gv.curve.fp
    other = bn254.G1.scalar_mul(proof.commitments[0], 2)
    bad.commitments = (
        type(bad.ar)(fp.constant(other[0]), fp.constant(other[1])),
    )
    with pytest.raises(EngineUnsatisfiedError):
        gv.assert_proof(bad, pub)


@pytest.mark.slow
def test_emulated_cross_curve_commitment_recursion():
    """BLS12-381 commitment proof verified inside a BN254 circuit: the
    committed publics are emulated inner-Fr elements, absorbed into the
    outer-native MiMC as canonical 64-bit limbs (the cross-curve branch
    of the absorb convention)."""
    from gnark_icicle_tpu.curves import bls12_381 as b381
    from gnark_icicle_tpu.std.recursion.groth16 import Groth16Verifier

    vk, proof, pub = _make_inner(b381.R, b381.BLS12_381, bn254.R, seed=21)
    gv = Groth16Verifier(Engine(bn254.R), bn254.R, vk,
                         curve_id="bls12-381")
    w = gv.proof_witness(proof)
    pubs = [gv.curve.fr.constant(int(pub[0]))]
    gv.assert_proof(w, pubs)

    bad = gv.proof_witness(proof)
    fp = gv.curve.fp
    other = b381.G1.scalar_mul(proof.commitments[0], 2)
    bad.commitments = (
        type(bad.ar)(fp.constant(other[0]), fp.constant(other[1])),
    )
    with pytest.raises(EngineUnsatisfiedError):
        gv.assert_proof(bad, pubs)


# ---- PLONK: recursion over BSB22-commitment PLONK proofs -----------------
# (≙ reference std/recursion/plonk/verifier.go: Bsb22Commitments in the
# transcript + PI via in-circuit hash + qcp columns in the lin digest and
# the batch fold)

from gnark_icicle_tpu.backend import plonk  # noqa: E402


def _make_inner_plonk(curve_mod, curve, outer_mod, seed=13):
    cs = compile_circuit(curve_mod, InnerCommit, builder="scs")
    pk, vk = plonk.setup(cs, curve, rng=random.Random(seed))
    pub, sec = [9], [3]
    proof = plonk.prove(cs, pk, pub, sec, curve, rng=random.Random(7),
                        fs_hash="mimc",
                        commitment_hash=("mimc", outer_mod))
    plonk.verify(proof, vk, pub, curve, fs_hash="mimc",
                 commitment_hash=("mimc", outer_mod))
    return vk, proof, pub


@pytest.fixture(scope="module")
def inner_plonk_commit_377():
    return _make_inner_plonk(b377.R, b377.BLS12_377, b377.P)


def test_plonk_mimc_commitment_hash_mismatch_rejected(
        inner_plonk_commit_377):
    """A proof produced with the MiMC commitment hash must NOT verify
    under the default SHA commitment hash (different commitment wires)."""
    vk, proof, pub = inner_plonk_commit_377
    assert not plonk.is_valid(proof, vk, pub, b377.BLS12_377,
                              fs_hash="mimc")
    assert plonk.is_valid(proof, vk, pub, b377.BLS12_377, fs_hash="mimc",
                          commitment_hash=("mimc", b377.P))


@pytest.mark.slow
def test_native_plonk_recursion_commitment_proof(inner_plonk_commit_377):
    from gnark_icicle_tpu.std.recursion.native_plonk import (
        NativePlonkVerifier,
    )

    vk, proof, pub = inner_plonk_commit_377
    pv = NativePlonkVerifier(Engine(b377.P), vk)
    pv.assert_proof(pv.proof_witness(proof), pub)


@pytest.mark.slow
def test_native_plonk_recursion_rejects_tampered_commitment(
        inner_plonk_commit_377):
    from gnark_icicle_tpu.std.recursion.native_plonk import (
        NativePlonkVerifier,
    )

    vk, proof, pub = inner_plonk_commit_377
    pv = NativePlonkVerifier(Engine(b377.P), vk)
    bad = pv.proof_witness(proof)
    nf = pv.nf
    other = b377.G1.scalar_mul(proof.bsb22_commitments[0], 2)
    bad.bsb22_commitments = (
        (nf.constant(other[0]), nf.constant(other[1])),
    )
    with pytest.raises(EngineUnsatisfiedError):
        pv.assert_proof(bad, pub)


@pytest.mark.slow
def test_emulated_plonk_recursion_commitment_proof():
    """Same-curve (BN254-in-BN254) PLONK commitment recursion through the
    emulated verifier gadget."""
    from gnark_icicle_tpu.std.recursion.plonk import PlonkVerifier

    vk, proof, pub = _make_inner_plonk(bn254.R, bn254.BN254, bn254.R,
                                       seed=23)
    pv = PlonkVerifier(Engine(bn254.R), bn254.R, vk)
    pv.assert_proof(pv.proof_witness(proof), pub)

    bad = pv.proof_witness(proof)
    fp = pv.curve.fp
    other = bn254.G1.scalar_mul(proof.bsb22_commitments[0], 2)
    bad.bsb22_commitments = (
        type(bad.z_com)(fp.constant(other[0]), fp.constant(other[1])),
    )
    with pytest.raises(EngineUnsatisfiedError):
        pv.assert_proof(bad, pub)


@pytest.mark.slow
def test_emulated_cross_curve_plonk_commitment_recursion():
    """BLS12-381 commitment PLONK proof verified inside a BN254 circuit:
    the commitment-wire hash replays over the OUTER native field while
    the scalar layer (transcript, Lagrange, folds) runs through the
    emulated inner Fr — the _to_inner_scalar emulated branch."""
    from gnark_icicle_tpu.curves import bls12_381 as b381
    from gnark_icicle_tpu.std.recursion.plonk import PlonkVerifier

    vk, proof, pub = _make_inner_plonk(b381.R, b381.BLS12_381, bn254.R,
                                       seed=29)
    pv = PlonkVerifier(Engine(bn254.R), bn254.R, vk,
                       curve_id="bls12-381")
    pubs = [pv.curve.fr.constant(int(pub[0]))]
    pv.assert_proof(pv.proof_witness(proof), pubs)

    bad = pv.proof_witness(proof)
    fp = pv.curve.fp
    other = b381.G1.scalar_mul(proof.bsb22_commitments[0], 2)
    bad.bsb22_commitments = (
        type(bad.z_com)(fp.constant(other[0]), fp.constant(other[1])),
    )
    with pytest.raises(EngineUnsatisfiedError):
        pv.assert_proof(bad, pubs)
