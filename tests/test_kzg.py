"""KZG commitment unit tests (≙ gnark-crypto kzg tests as driven by the
PLONK backend; SRS fixtures are the unsafekzg analog)."""

import random

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.backend.kzg import KZG, unsafe_srs

Q = bn254.R
CURVE = bn254.BN254


@pytest.fixture(scope="module")
def kzg():
    return KZG(CURVE, unsafe_srs(CURVE, 32, tau=123456789))


def test_commit_matches_direct_eval(kzg):
    """[p(τ)]₁ from the MSM equals p(τ)·G computed with the known tau."""
    rng = random.Random(1)
    coeffs = [rng.randrange(Q) for _ in range(10)]
    com = kzg.commit(coeffs)
    tau = 123456789
    p_tau = sum(c * pow(tau, i, Q) for i, c in enumerate(coeffs)) % Q
    assert com == CURVE.g1.scalar_mul(CURVE.g1.generator, p_tau)


def test_open_verify(kzg):
    rng = random.Random(2)
    coeffs = [rng.randrange(Q) for _ in range(16)]
    z = rng.randrange(Q)
    value, proof = kzg.open(coeffs, z)
    assert value == sum(c * pow(z, i, Q) for i, c in enumerate(coeffs)) % Q
    com = kzg.commit(coeffs)
    assert kzg.verify(com, z, value, proof)
    assert not kzg.verify(com, z, (value + 1) % Q, proof)
    assert not kzg.verify(com, (z + 1) % Q, value, proof)


def test_batch_verify_same_point(kzg):
    rng = random.Random(3)
    polys = [[rng.randrange(Q) for _ in range(8)] for _ in range(3)]
    z = rng.randrange(Q)
    coms, vals, proofs = [], [], []
    for p in polys:
        v, pf = kzg.open(p, z)
        coms.append(kzg.commit(p))
        vals.append(v)
        proofs.append(pf)
    gamma = rng.randrange(Q)
    assert kzg.batch_verify_same_point(coms, z, vals, proofs, gamma)
    vals[1] = (vals[1] + 1) % Q
    assert not kzg.batch_verify_same_point(coms, z, vals, proofs, gamma)


def test_constant_poly(kzg):
    value, proof = kzg.open([42], 7)
    assert value == 42 and proof is None
    assert kzg.verify(kzg.commit([42]), 7, 42, None)
