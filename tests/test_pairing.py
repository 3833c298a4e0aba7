"""Pairing tests: bilinearity, non-degeneracy, and the Groth16-shaped
multi-pairing check (parity model: gnark-crypto bn254 pairing tests; the
verifier equation shape is backend/groth16/bn254/verify.go:75-141)."""

import random

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.curves.pairing import _engine
from gnark_icicle_tpu.curves.tower import Fp12


@pytest.fixture(scope="module")
def eng():
    return _engine()


def test_pairing_bilinear_g1(eng):
    rng = random.Random(42)
    a = rng.randrange(1, bn254.R)
    P = bn254.G1.generator
    Q = bn254.G2.generator
    lhs = eng.pair(bn254.G1.scalar_mul(P, a), Q)
    rhs = eng.pair(P, Q).pow(a)
    assert lhs == rhs
    assert lhs != Fp12.one(bn254.TOWER)  # non-degenerate


def test_pairing_bilinear_g2(eng):
    rng = random.Random(43)
    b = rng.randrange(1, bn254.R)
    P = bn254.G1.generator
    Q = bn254.G2.generator
    lhs = eng.pair(P, bn254.G2.scalar_mul(Q, b))
    rhs = eng.pair(P, Q).pow(b)
    assert lhs == rhs


def test_pairing_check_shape(eng):
    """e(aP, bQ) · e(-abP, Q) == 1 — the product-of-pairings form."""
    rng = random.Random(44)
    a = rng.randrange(1, bn254.R)
    b = rng.randrange(1, bn254.R)
    P = bn254.G1.generator
    Q = bn254.G2.generator
    aP = bn254.G1.scalar_mul(P, a)
    bQ = bn254.G2.scalar_mul(Q, b)
    nabP = bn254.G1.scalar_mul(P, (-a * b) % bn254.R)
    assert eng.pairing_check([(aP, bQ), (nabP, Q)])
    assert not eng.pairing_check([(aP, bQ), (P, Q)])


def test_pairing_identity_inputs(eng):
    assert eng.pair(None, bn254.G2.generator) == Fp12.one(bn254.TOWER)
    assert eng.pair(bn254.G1.generator, None) == Fp12.one(bn254.TOWER)
