"""Bit-exact field arithmetic tests: device limb ops vs Python-int golden.

Mirrors the reference's field-arithmetic testing role (gnark-crypto element
tests); SURVEY.md §4 tier (2): kernel unit tests against host-generated
vectors.
"""

import random

import numpy as np
import pytest

from gnark_icicle_tpu.curves import BN254, BLS12_381
from gnark_icicle_tpu.ops.field import (
    LimbField,
    int_to_limbs,
    limbs_to_int,
)

FIELDS = [
    ("bn254.fr", BN254.fr.modulus),
    ("bn254.fp", BN254.fp.modulus),
    ("bls12_381.fr", BLS12_381.fr.modulus),
    ("bls12_381.fp", BLS12_381.fp.modulus),
]


@pytest.fixture(params=FIELDS, ids=[f[0] for f in FIELDS])
def fld(request):
    name, q = request.param
    return LimbField(q), q


def _rand_elems(q, n, seed=0):
    rng = random.Random(seed)
    special = [0, 1, 2, q - 1, q - 2, q // 2, (1 << 128) % q]
    vals = special + [rng.randrange(q) for _ in range(n - len(special))]
    return vals[:n]


def test_limb_roundtrip(fld):
    F, q = fld
    for v in _rand_elems(q, 20, seed=1):
        assert limbs_to_int(int_to_limbs(v, F.K)) == v


def test_encode_decode(fld):
    F, q = fld
    vals = _rand_elems(q, 33, seed=2)
    enc = F.encode(vals)
    assert F.decode(enc) == [v % q for v in vals]


def test_add_sub_neg(fld):
    F, q = fld
    n = 64
    a = _rand_elems(q, n, seed=3)
    b = list(reversed(_rand_elems(q, n, seed=4)))
    A, B = F.encode(a), F.encode(b)
    got_add = F.decode(np.asarray(F.add(A, B)))
    got_sub = F.decode(np.asarray(F.sub(A, B)))
    got_neg = F.decode(np.asarray(F.neg(A)))
    assert got_add == [(x + y) % q for x, y in zip(a, b)]
    assert got_sub == [(x - y) % q for x, y in zip(a, b)]
    assert got_neg == [(-x) % q for x in a]


def test_mont_mul(fld):
    F, q = fld
    n = 64
    a = _rand_elems(q, n, seed=5)
    b = list(reversed(_rand_elems(q, n, seed=6)))
    A, B = F.encode(a), F.encode(b)
    got = F.decode(np.asarray(F.mont_mul(A, B)))
    assert got == [x * y % q for x, y in zip(a, b)]


def test_mont_sqr_chain(fld):
    """Repeated squaring keeps canonical form (stress carries)."""
    F, q = fld
    a = _rand_elems(q, 8, seed=7)
    A = F.encode(a)
    expect = [x % q for x in a]
    for _ in range(20):
        A = F.mont_sqr(A)
        expect = [x * x % q for x in expect]
    assert F.decode(np.asarray(A)) == expect


def test_to_from_mont(fld):
    F, q = fld
    vals = _rand_elems(q, 16, seed=8)
    plain = F.encode_plain(vals)
    m = F.to_mont(plain)
    back = F.from_mont(m)
    assert F.decode_plain(np.asarray(back)) == [v % q for v in vals]
    # and encode() agrees with to_mont(encode_plain())
    assert np.array_equal(np.asarray(m), F.encode(vals))


def test_pow_inv(fld):
    F, q = fld
    vals = [v for v in _rand_elems(q, 10, seed=9) if v % q != 0]
    A = F.encode(vals)
    inv = F.decode(np.asarray(F.mont_inv(A)))
    assert inv == [pow(v, -1, q) for v in vals]
    cube = F.decode(np.asarray(F.mont_pow(A, 3)))
    assert cube == [pow(v, 3, q) for v in vals]


def test_zero_inv_maps_to_zero(fld):
    F, q = fld
    A = F.encode([0, 5])
    out = F.decode(np.asarray(F.mont_inv(A)))
    assert out[0] == 0 and out[1] == pow(5, -1, q)


def test_predicates(fld):
    F, q = fld
    A = F.encode([0, 1, q - 1])
    B = F.encode([0, 2, q - 1])
    assert list(np.asarray(F.is_zero(A))) == [True, False, False]
    assert list(np.asarray(F.eq(A, B))) == [True, False, True]


def test_batched_shapes(fld):
    """Ops broadcast over arbitrary leading axes."""
    F, q = fld
    vals = _rand_elems(q, 12, seed=10)
    A = F.encode(vals).reshape(3, 4, F.K)
    out = F.mont_mul(A, A)
    assert out.shape == (3, 4, F.K)
    assert F.decode(np.asarray(out).reshape(12, F.K)) == [v * v % q for v in vals]
