"""PLONK end-to-end: scs compile → setup → prove (device NTT/MSM) → verify.

Parity model: the prover_checks tier for the plonk backend
(test/assert_checkcircuit.go over backend.PLONK) on the corpus circuits."""

import random

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import compile_circuit
from gnark_icicle_tpu.backend import plonk

from circuits import Cubic, SelectCircuit

Q = bn254.R
CURVE = bn254.BN254


@pytest.fixture(scope="module")
def cubic_setup():
    cs = compile_circuit(Q, Cubic, builder="scs")
    rng = random.Random(31)
    pk, vk = plonk.setup(cs, CURVE, rng=rng)
    return cs, pk, vk


def test_plonk_prove_verify_cubic(cubic_setup):
    cs, pk, vk = cubic_setup
    pub, sec = Cubic(x=3, y=35).witness_values(Q)
    proof = plonk.prove(cs, pk, pub, sec, CURVE, rng=random.Random(32))
    plonk.verify(proof, vk, pub, CURVE)


def test_plonk_wrong_public_rejected(cubic_setup):
    cs, pk, vk = cubic_setup
    pub, sec = Cubic(x=3, y=35).witness_values(Q)
    proof = plonk.prove(cs, pk, pub, sec, CURVE, rng=random.Random(33))
    assert not plonk.is_valid(proof, vk, [36], CURVE)


def test_plonk_tampered_proof_rejected(cubic_setup):
    cs, pk, vk = cubic_setup
    pub, sec = Cubic(x=3, y=35).witness_values(Q)
    proof = plonk.prove(cs, pk, pub, sec, CURVE, rng=random.Random(34))
    import dataclasses

    claimed = list(proof.batch_claimed)
    claimed[1] = (claimed[1] + 1) % Q  # l(zeta)
    bad = dataclasses.replace(proof, batch_claimed=claimed)
    assert not plonk.is_valid(bad, vk, pub, CURVE)
    bad2 = dataclasses.replace(
        proof, lro=(CURVE.g1.add(proof.lro[0], CURVE.g1.generator),
                    proof.lro[1], proof.lro[2])
    )
    assert not plonk.is_valid(bad2, vk, pub, CURVE)


def test_plonk_blinding_randomizes(cubic_setup):
    cs, pk, vk = cubic_setup
    pub, sec = Cubic(x=3, y=35).witness_values(Q)
    p1 = plonk.prove(cs, pk, pub, sec, CURVE, rng=random.Random(35))
    p2 = plonk.prove(cs, pk, pub, sec, CURVE, rng=random.Random(36))
    assert p1.lro[0] != p2.lro[0]  # blinding
    plonk.verify(p1, vk, pub, CURVE)
    plonk.verify(p2, vk, pub, CURVE)


def test_plonk_copy_constraints():
    """Select circuit: exercises shared wires across many gates (the
    permutation argument actually has cycles)."""
    cs = compile_circuit(Q, SelectCircuit, builder="scs")
    rng = random.Random(37)
    pk, vk = plonk.setup(cs, CURVE, rng=rng)
    pub, sec = SelectCircuit(cond=1, t=10, f=20, out=10).witness_values(Q)
    proof = plonk.prove(cs, pk, pub, sec, CURVE, rng=rng)
    plonk.verify(proof, vk, pub, CURVE)


def test_plonk_prove_verify_batch_msm(cubic_setup, monkeypatch):
    """GNARK_TPU_BATCH_MSM=1 routes the a/b/c wire commits (and on the
    device engine the t1/t2/t3 shard commits) through kzg.commit_batch —
    one msm_batch over the shared SRS table. Proof must verify and the
    wire commitments must be IDENTICAL to the unbatched prover's under
    the same rng (msm_batch is bit-identical to separate msm calls)."""
    cs, pk, vk = cubic_setup
    pub, sec = Cubic(x=3, y=35).witness_values(Q)
    base = plonk.prove(cs, pk, pub, sec, CURVE, rng=random.Random(97))
    monkeypatch.setenv("GNARK_TPU_BATCH_MSM", "1")
    proof = plonk.prove(cs, pk, pub, sec, CURVE, rng=random.Random(97))
    plonk.verify(proof, vk, pub, CURVE)
    from gnark_icicle_tpu.io.plonk_serialize import plonk_proof_to_bytes

    assert plonk_proof_to_bytes(CURVE, proof) == \
        plonk_proof_to_bytes(CURVE, base)
