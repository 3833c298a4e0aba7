"""Merkle gadget tests (≙ std/accumulator/merkle tests + the rollup
example's state-inclusion shape)."""

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import Circuit, Public, Secret, compile_circuit, is_solved
from gnark_icicle_tpu.constraint import is_satisfied
from gnark_icicle_tpu.std.merkle import verify_proof, MerkleTreeHost

Q = bn254.R
DEPTH = 3


class MerkleCircuit(Circuit):
    root = Public()
    leaf = Secret()
    siblings = Secret(shape=DEPTH)
    dirs = Secret(shape=DEPTH)

    def define(self, api):
        verify_proof(api, Q, self.root, self.leaf, self.siblings, self.dirs)


@pytest.fixture(scope="module")
def tree():
    return MerkleTreeHost(Q, [100 + i for i in range(1 << DEPTH)])


@pytest.mark.parametrize("index", [0, 3, 7])
def test_merkle_inclusion(tree, index):
    sibs, dirs = tree.proof(index)
    circ = MerkleCircuit(
        root=tree.root, leaf=100 + index, siblings=sibs, dirs=dirs
    )
    assert is_solved(circ, Q)


def test_merkle_wrong_leaf_rejected(tree):
    sibs, dirs = tree.proof(2)
    circ = MerkleCircuit(root=tree.root, leaf=999, siblings=sibs, dirs=dirs)
    assert not is_solved(circ, Q)


def test_merkle_solver_agrees(tree):
    cs = compile_circuit(Q, MerkleCircuit)
    sibs, dirs = tree.proof(5)
    good = MerkleCircuit(root=tree.root, leaf=105, siblings=sibs, dirs=dirs)
    pub, sec = good.witness_values(Q)
    assert is_satisfied(cs, pub, sec)
    bad = MerkleCircuit(root=tree.root, leaf=106, siblings=sibs, dirs=dirs)
    pub, sec = bad.witness_values(Q)
    assert not is_satisfied(cs, pub, sec)


def test_merkle_update(tree):
    t = MerkleTreeHost(Q, [100 + i for i in range(1 << DEPTH)])
    t.update(4, 777)
    sibs, dirs = t.proof(4)
    circ = MerkleCircuit(root=t.root, leaf=777, siblings=sibs, dirs=dirs)
    assert is_solved(circ, Q)
