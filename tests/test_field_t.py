"""Transposed-layout (K, N) field + EC kernels (PERF_NOTES.md): bit-exact
vs host ints and vs the (N, K) DevCurve path. CPU runs exercise the jnp
reference trace of the same row code the Pallas kernels fuse."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.ops.field import LimbField
from gnark_icicle_tpu.ops.field_t import TFieldOps
from gnark_icicle_tpu.ops.ec import DevCurve, DevField
from gnark_icicle_tpu.ops.ec_t import TCurve

q = bn254.P
F = LimbField(q)
K = F.K
M = 64


def to_t(vals):
    a = np.zeros((K, len(vals)), dtype=np.uint32)
    for j, v in enumerate(vals):
        for i in range(K):
            a[i, j] = (v >> (16 * i)) & 0xFFFF
    return jnp.asarray(a)


def from_t(arr):
    a = np.asarray(arr)
    return [sum(int(a[i, j]) << (16 * i) for i in range(K))
            for j in range(a.shape[1])]


def test_tfield_ops_bit_exact():
    T = TFieldOps(F)
    rng = random.Random(1)
    xs = [rng.randrange(q) for _ in range(M)] + [0, q - 1, 1, q - 1]
    ys = [rng.randrange(q) for _ in range(M)] + [0, q - 1, q - 1, 1]
    xT, yT = to_t(xs), to_t(ys)
    rinv = pow(1 << (16 * K), -1, q)
    mul = from_t(jnp.stack(T.mul_rows(T.to_rows(xT), T.to_rows(yT))))
    assert all(g == x * y * rinv % q for g, x, y in zip(mul, xs, ys))
    add = from_t(jnp.stack(T.add_rows(T.to_rows(xT), T.to_rows(yT))))
    assert all(g == (x + y) % q for g, x, y in zip(add, xs, ys))
    sub = from_t(jnp.stack(T.sub_rows(T.to_rows(xT), T.to_rows(yT))))
    assert all(g == (x - y) % q for g, x, y in zip(sub, xs, ys))
    w = 0xDEADBEEF * (1 << (16 * K)) % q  # Montgomery-form constant
    mc = from_t(jnp.stack(T.mul_const_rows(T.to_rows(xT), w)))
    assert all(g == x * 0xDEADBEEF % q for g, x in zip(mc, xs))


@pytest.fixture(scope="module")
def ec_inputs():
    rng = random.Random(3)
    pts = [bn254.G1.random_point(rng) for _ in range(M)]
    qts = [bn254.G1.random_point(rng) for _ in range(M)]

    def enc_nk(vals):
        return jnp.asarray(
            np.stack([np.asarray(F.encode([v]))[0] for v in vals])
        )

    px, py = enc_nk([p[0] for p in pts]), enc_nk([p[1] for p in pts])
    qx, qy = enc_nk([p[0] for p in qts]), enc_nk([p[1] for p in qts])
    one = enc_nk([1] * M)
    return px, py, qx, qy, one


def _t(nk):
    return jnp.transpose(nk, (1, 0)).astype(jnp.int32)


def test_tcurve_matches_devcurve(ec_inputs):
    px, py, qx, qy, one = ec_inputs
    curve = DevCurve(DevField(F), 9)
    tc = TCurve(F, 9)
    P_ref = (px, py, one)
    P_t = (_t(px), _t(py), _t(one))
    mask = jnp.ones((M,), bool)

    am_ref = curve.add_mixed(P_ref, (qx, qy))
    am_t = tc.add_mixed_masked(P_t, (_t(qx), _t(qy)), mask,
                               use_pallas=False)
    add_ref = curve.add(P_ref, (qx, qy, one))
    add_t = tc.add(P_t, (_t(qx), _t(qy), _t(one)), use_pallas=False)
    dbl_ref = curve.double(P_ref)
    dbl_t = tc.double(P_t, use_pallas=False)
    for ref, got in [(am_ref, am_t), (add_ref, add_t), (dbl_ref, dbl_t)]:
        for cr, cg in zip(ref, got):
            assert np.array_equal(np.asarray(cr), np.asarray(cg).T)


def test_tcurve_mask_and_sign(ec_inputs):
    px, py, qx, qy, one = ec_inputs
    curve = DevCurve(DevField(F), 9)
    tc = TCurve(F, 9)
    P_t = (_t(px), _t(py), _t(one))
    Q_t = (_t(qx), _t(qy))

    mask = jnp.asarray([i % 2 == 0 for i in range(M)])
    out = tc.add_mixed_masked(P_t, Q_t, mask, use_pallas=False)
    assert np.array_equal(np.asarray(out[0])[:, 1], np.asarray(P_t[0])[:, 1])

    # sign: adding −Q must equal the DevCurve add with negated y
    sign = jnp.ones((M,), jnp.int32)
    neg = tc.add_mixed_masked(P_t, Q_t, jnp.ones((M,), bool), sign,
                              use_pallas=False)
    qy_neg = curve.f.neg(qy)
    ref = curve.add_mixed((px, py, one), (qx, qy_neg))
    for cr, cg in zip(ref, neg):
        assert np.array_equal(np.asarray(cr), np.asarray(cg).T)


@pytest.mark.skipif(
    __import__("jax").default_backend() != "tpu",
    reason="Pallas interpret mode pays ~100ms/op on ~10k fused ops — the "
           "bit-exactness check runs on REAL hardware instead "
           "(bench/check_fused_add.py, gating the r5d A/B queue)")
def test_fused_add_mixed_masked_bit_exact(ec_inputs):
    """The ONE-kernel fused RCB16 mixed add must be bit-identical to the
    composed add_mixed_masked across mask/sign combinations."""
    px, py, qx, qy, one = ec_inputs
    tc = TCurve(F, 9)
    P_t = (_t(px), _t(py), _t(one))
    Q_t = (_t(qx), _t(qy))
    rng = np.random.default_rng(9)
    mask = jnp.asarray(rng.integers(0, 2, size=M).astype(bool))
    sign = jnp.asarray(rng.integers(0, 2, size=M).astype(np.int32))

    ref = tc.add_mixed_masked(P_t, Q_t, mask, sign, use_pallas=False)
    got = tc.add_mixed_masked_fused(P_t, Q_t, mask, sign)
    for cr, cg in zip(ref, got):
        assert np.array_equal(np.asarray(cr), np.asarray(cg))

    # no-sign variant
    ref = tc.add_mixed_masked(P_t, Q_t, mask, use_pallas=False)
    got = tc.add_mixed_masked_fused(P_t, Q_t, mask)
    for cr, cg in zip(ref, got):
        assert np.array_equal(np.asarray(cr), np.asarray(cg))
