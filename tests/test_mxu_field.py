"""MXU constant-multiplication prototype: bit-exact vs the VPU path
(ops/mxu_field.py — ROADMAP #1 integration base; measured 1.84x on v5e for
NTT-stage shapes)."""

import random

import numpy as np
import jax.numpy as jnp
import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.ops.field import field_for
from gnark_icicle_tpu.ops.mxu_field import MXUConstMul

F = field_for(bn254.R)


@pytest.fixture(scope="module")
def mx():
    return MXUConstMul(F)


def test_mul_const_bit_exact(mx):
    rng = random.Random(1)
    xs = [rng.randrange(bn254.R) for _ in range(33)]
    w = rng.randrange(bn254.R)
    x16 = jnp.asarray(F.encode(xs))
    wt = mx.toeplitz_for(w * F.R % bn254.R)
    got = mx.mul_const(x16, wt)
    want = F.mont_mul(
        x16, jnp.broadcast_to(jnp.asarray(F.encode([w])[0]), x16.shape)
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_mul_const_edge_values(mx):
    xs = [0, 1, bn254.R - 1, 2]
    for w in (0, 1, bn254.R - 1):
        x16 = jnp.asarray(F.encode(xs))
        wt = mx.toeplitz_for(w * F.R % bn254.R)
        got = mx.mul_const(x16, wt)
        want = F.mont_mul(
            x16, jnp.broadcast_to(jnp.asarray(F.encode([w])[0]), x16.shape)
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_mul_const_batched_bit_exact(mx):
    rng = random.Random(2)
    G, B = 4, 8
    ws = [rng.randrange(bn254.R) for _ in range(G)]
    wts = jnp.stack([mx.toeplitz_for(v * F.R % bn254.R) for v in ws])
    xg = jnp.asarray(
        F.encode([rng.randrange(bn254.R) for _ in range(G * B)])
    ).reshape(G, B, F.K)
    got = mx.mul_const_batched(xg, wts)
    for g in range(G):
        wg = jnp.broadcast_to(jnp.asarray(F.encode([ws[g]])[0]), (B, F.K))
        np.testing.assert_array_equal(
            np.asarray(got[g]), np.asarray(F.mont_mul(xg[g], wg))
        )


def test_split_merge_roundtrip(mx):
    rng = random.Random(3)
    x16 = jnp.asarray(F.encode([rng.randrange(bn254.R) for _ in range(5)]))
    np.testing.assert_array_equal(
        np.asarray(mx.merge16(mx.split8(x16))), np.asarray(x16)
    )
