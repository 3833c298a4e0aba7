"""Rollup example tests (≙ examples/rollup — the reference's flagship
integration circuit: eddsa transfers + merkle state)."""

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import is_solved, compile_circuit

import examples.rollup as rollup

Q = bn254.R


def test_transfer_witness_satisfies_engine():
    op = rollup.Operator()
    w = op.transfer(0, 1, 250)
    assert is_solved(w, Q)
    assert op.balances[0] == 750 and op.balances[1] == 1250


def test_two_sequential_transfers():
    op = rollup.Operator()
    w1 = op.transfer(0, 1, 100)
    w2 = op.transfer(1, 2, 50)
    assert is_solved(w1, Q)
    assert is_solved(w2, Q)
    assert w2.root_before == w1.root_after


def test_overdraft_rejected():
    op = rollup.Operator()
    w = op.transfer(2, 3, 100)
    w.amount = 99999  # tamper: more than the signed/owned amount
    assert not is_solved(w, Q)


def test_forged_signature_rejected():
    op = rollup.Operator()
    w = op.transfer(0, 1, 10)
    w.sig_s = (w.sig_s + 1) % Q
    assert not is_solved(w, Q)


def test_wrong_root_rejected():
    op = rollup.Operator()
    w = op.transfer(0, 1, 10)
    w.root_after = (w.root_after + 1) % Q
    assert not is_solved(w, Q)


@pytest.mark.slow
def test_rollup_groth16_e2e():
    import random

    from gnark_icicle_tpu.backend import groth16
    from gnark_icicle_tpu.constraint import solve

    op = rollup.Operator()
    w = op.transfer(0, 1, 250)
    cs = compile_circuit(Q, rollup.TransferCircuit)
    pub, sec = w.witness_values(Q)
    solve(cs, pub, sec)  # solver agrees before the expensive part
    rng = random.Random(70)
    pk, vk = groth16.setup(cs, bn254.BN254, rng=rng)
    proof = groth16.prove(cs, pk, pub, sec, bn254.BN254, rng=rng)
    groth16.verify(proof, vk, pub, bn254.BN254)
