"""Device EC ops vs host golden group law (G1 and G2, BN254 + BLS12-381)."""

import random

import numpy as np
import pytest

from gnark_icicle_tpu.curves import BN254, BLS12_381
from gnark_icicle_tpu.ops.field import LimbField
from gnark_icicle_tpu.ops.ec import DevField, DevField2, DevCurve


def _setup_g1(curve):
    F = LimbField(curve.fp.modulus)
    f = DevField(F)
    dc = DevCurve(f, 3 * curve.g1.b)
    return f, dc, curve.g1, curve.fp.modulus


def _setup_g2(curve):
    F = LimbField(curve.fp.modulus)
    f = DevField2(F)
    b3 = curve.g2.b * 3
    dc = DevCurve(f, b3)
    return f, dc, curve.g2, curve.fp.modulus


CASES = [
    ("bn254.g1", BN254, _setup_g1),
    ("bn254.g2", BN254, _setup_g2),
    ("bls12_381.g1", BLS12_381, _setup_g1),
    ("bls12_381.g2", BLS12_381, _setup_g2),
]


@pytest.fixture(params=CASES, ids=[c[0] for c in CASES])
def grp(request):
    name, curve, setup = request.param
    return setup(curve)


def _host_points(G, n, rng, with_identity=True):
    pts = [G.random_point(rng) for _ in range(n)]
    if with_identity and n >= 2:
        pts[1] = None
    return pts


def _encode_points(f, dc, pts):
    """Host affine points (None = identity) -> device projective batch."""
    xs, ys, infs = [], [], []
    for p in pts:
        if p is None:
            xs.append(_zero_of(f))
            ys.append(_one_of(f))
            infs.append(True)
        else:
            xs.append(p[0])
            ys.append(p[1])
            infs.append(False)
    import jax.numpy as jnp

    X = _enc(f, xs)
    Y = _enc(f, ys)
    mask = jnp.asarray(np.array(infs))
    return dc.from_affine(X, Y, mask)


def _zero_of(f):
    from gnark_icicle_tpu.curves.tower import Fp2

    if isinstance(f, DevField2):
        return Fp2(_tower_of(f), 0, 0)
    return 0


def _one_of(f):
    from gnark_icicle_tpu.curves.tower import Fp2

    if isinstance(f, DevField2):
        return Fp2(_tower_of(f), 1, 0)
    return 1


def _tower_of(f):
    for c in (BN254, BLS12_381):
        if c.fp.modulus == f.F.modulus:
            return c.tower
    raise KeyError


def _enc(f, vals):
    if isinstance(f, DevField2):
        return f.encode(vals)
    return f.encode(vals)


def _decode_points(dc, P, p_mod):
    pts = dc.to_affine_host(P, p_mod)
    out = []
    for p in pts:
        if p is None:
            out.append(None)
        elif isinstance(p[0], tuple):
            out.append(p)
        else:
            out.append(p)
    return out


def _host_affine(G, p):
    """Host point -> comparable form (ints / int-pairs)."""
    if p is None:
        return None
    x, y = p
    if hasattr(x, "c0"):
        return ((x.c0, x.c1), (y.c0, y.c1))
    return (x, y)


def test_add_matches_host(grp):
    f, dc, G, p_mod = grp
    rng = random.Random(42)
    n = 8
    a = _host_points(G, n, rng)
    b = list(reversed(_host_points(G, n, rng)))
    A = _encode_points(f, dc, a)
    B = _encode_points(f, dc, b)
    got = _decode_points(dc, dc.add(A, B), p_mod)
    want = [_host_affine(G, G.add(x, y)) for x, y in zip(a, b)]
    assert got == want


def test_add_edge_cases(grp):
    """P+P (doubling through add), P+(-P), P+0, 0+0 — complete formulas."""
    f, dc, G, p_mod = grp
    rng = random.Random(7)
    P = G.random_point(rng)
    cases_a = [P, P, P, None]
    cases_b = [P, G.neg(P), None, None]
    A = _encode_points(f, dc, cases_a)
    B = _encode_points(f, dc, cases_b)
    got = _decode_points(dc, dc.add(A, B), p_mod)
    want = [_host_affine(G, G.add(x, y)) for x, y in zip(cases_a, cases_b)]
    assert got == want


def test_double(grp):
    f, dc, G, p_mod = grp
    rng = random.Random(9)
    pts = _host_points(G, 6, rng)
    A = _encode_points(f, dc, pts)
    got = _decode_points(dc, dc.double(A), p_mod)
    want = [_host_affine(G, G.add(p, p)) for p in pts]
    assert got == want


def test_add_mixed(grp):
    f, dc, G, p_mod = grp
    rng = random.Random(11)
    a = _host_points(G, 6, rng)  # includes identity lane
    b = _host_points(G, 6, rng, with_identity=False)
    A = _encode_points(f, dc, a)
    xs = _enc(f, [p[0] for p in b])
    ys = _enc(f, [p[1] for p in b])
    got = _decode_points(dc, dc.add_mixed(A, (xs, ys)), p_mod)
    want = [_host_affine(G, G.add(x, y)) for x, y in zip(a, b)]
    assert got == want


def test_tree_reduce(grp):
    f, dc, G, p_mod = grp
    rng = random.Random(13)
    pts = _host_points(G, 7, rng)  # odd length exercises padding
    A = _encode_points(f, dc, pts)
    got = _decode_points(dc, dc.tree_reduce(A), p_mod)[0]
    acc = None
    for p in pts:
        acc = G.add(acc, p)
    assert got == _host_affine(G, acc)
