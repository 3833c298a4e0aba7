"""Prover stage checkpoint/resume (SURVEY §5 preemptible-slice extension —
no reference equivalent; the reference rebuilds everything per process)."""

import os
import random

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import compile_circuit
from gnark_icicle_tpu.backend import groth16

from circuits import Cubic

CURVE = bn254.BN254
Q = bn254.R


@pytest.mark.slow
def test_checkpoint_resume_and_binding(tmp_path):
    cs = compile_circuit(Q, Cubic)
    pk, vk = groth16.setup(cs, CURVE, rng=random.Random(41))
    d = str(tmp_path / "ck")

    p1 = groth16.prove(cs, pk, [35], [3], CURVE, rng=random.Random(42),
                       checkpoint_dir=d)
    groth16.verify(p1, vk, [35], CURVE)
    assert sorted(os.listdir(d)) == ["binding", "h.pkl", "msms.pkl",
                                     "solve.pkl"]

    # resume: stages load, blinding stays fresh, proof still verifies
    p2 = groth16.prove(cs, pk, [35], [3], CURVE, rng=random.Random(43),
                       checkpoint_dir=d)
    groth16.verify(p2, vk, [35], CURVE)
    assert p2.ar != p1.ar  # re-randomized

    # partial preemption: drop the MSM stage only — solve/H reused
    os.unlink(os.path.join(d, "msms.pkl"))
    p3 = groth16.prove(cs, pk, [35], [3], CURVE, rng=random.Random(44),
                       checkpoint_dir=d)
    groth16.verify(p3, vk, [35], CURVE)

    # a different proving task must not reuse stale stages
    p4 = groth16.prove(cs, pk, [73], [4], CURVE, rng=random.Random(45),
                       checkpoint_dir=d)
    groth16.verify(p4, vk, [73], CURVE)
    assert not groth16.is_valid(p4, vk, [35], CURVE)


@pytest.mark.slow
def test_plonk_checkpoint_resume(tmp_path):
    from gnark_icicle_tpu.backend import plonk

    cs = compile_circuit(Q, Cubic, builder="scs")
    pk, vk = plonk.setup(cs, CURVE, rng=random.Random(51))
    d = str(tmp_path / "pck")

    p1 = plonk.prove(cs, pk, [35], [3], CURVE, rng=random.Random(52),
                     checkpoint_dir=d)
    plonk.verify(p1, vk, [35], CURVE)
    assert sorted(os.listdir(d)) == [
        "binding", "quotient.pkl", "round1.pkl", "round2.pkl", "solve.pkl"
    ]
    p2 = plonk.prove(cs, pk, [35], [3], CURVE, rng=random.Random(53),
                     checkpoint_dir=d)
    plonk.verify(p2, vk, [35], CURVE)
    # drop the quotient stage: earlier rounds reuse, quotient recomputes
    os.unlink(os.path.join(d, "quotient.pkl"))
    p3 = plonk.prove(cs, pk, [35], [3], CURVE, rng=random.Random(54),
                     checkpoint_dir=d)
    plonk.verify(p3, vk, [35], CURVE)
