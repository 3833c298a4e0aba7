"""PK / constraint-system persistence round-trips (≙ marshal_test.go +
io.RoundTripCheck applied to keys and CS)."""

import random

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import compile_circuit
from gnark_icicle_tpu.backend import groth16
from gnark_icicle_tpu.constraint import solve
from gnark_icicle_tpu.constraint.scs import solve_scs
from gnark_icicle_tpu.io.keys import (
    pk_to_bytes, pk_from_bytes, pk_write_dump, pk_read_dump,
    r1cs_to_bytes, r1cs_from_bytes, scs_to_bytes, scs_from_bytes,
)

from circuits import Cubic, IsZeroCircuit

Q = bn254.R
CURVE = bn254.BN254


@pytest.fixture(scope="module")
def setup_cubic():
    cs = compile_circuit(Q, Cubic)
    pk, vk = groth16.setup(cs, CURVE, rng=random.Random(80))
    return cs, pk, vk


@pytest.mark.parametrize("compressed", [False, True])
def test_pk_roundtrip(setup_cubic, compressed):
    cs, pk, vk = setup_cubic
    data = pk_to_bytes(CURVE, pk, compressed)
    pk2 = pk_from_bytes(CURVE, data)
    assert pk2.g1_a == pk.g1_a
    assert pk2.g2_b == pk.g2_b
    assert pk2.g1_z == pk.g1_z
    assert pk2.domain_log_n == pk.domain_log_n
    # a proof from the deserialized PK verifies
    pub, sec = Cubic(x=3, y=35).witness_values(Q)
    proof = groth16.prove(cs, pk2, pub, sec, CURVE, rng=random.Random(81))
    groth16.verify(proof, vk, pub, CURVE)


def test_pk_dump_roundtrip(setup_cubic, tmp_path):
    cs, pk, vk = setup_cubic
    path = str(tmp_path / "pk.dump")
    pk_write_dump(pk, path)
    pk2 = pk_read_dump(path)
    assert pk2.g1_a == pk.g1_a and pk2.domain_log_n == pk.domain_log_n


def test_r1cs_roundtrip():
    cs = compile_circuit(Q, IsZeroCircuit)  # exercises hints
    data = r1cs_to_bytes(cs)
    cs2 = r1cs_from_bytes(data)
    assert cs2.nb_constraints == cs.nb_constraints
    assert cs2.coeffs == cs.coeffs
    assert cs2.term_wire == cs.term_wire
    # the deserialized system solves identically
    for a, z in [(0, 1), (7, 0)]:
        pub, sec = IsZeroCircuit(a=a, z=z).witness_values(Q)
        r1 = solve(cs, pub, sec)
        r2 = solve(cs2, pub, sec)
        assert r1.wires == r2.wires


def test_scs_roundtrip():
    cs = compile_circuit(Q, IsZeroCircuit, builder="scs")
    data = scs_to_bytes(cs)
    cs2 = scs_from_bytes(data)
    assert cs2.nb_gates == cs.nb_gates
    assert cs2.ql == cs.ql and cs2.qm == cs.qm
    pub, sec = IsZeroCircuit(a=5, z=0).witness_values(Q)
    w1 = solve_scs(cs, pub, sec)
    w2 = solve_scs(cs2, pub, sec)
    assert w1 == w2
