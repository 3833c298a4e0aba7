"""Cross-curve emulated G1 gadgets: BLS12-381 / BLS12-377 / BW6-761.

Parity model: reference std/algebra/emulated/sw_bls12381 and sw_bw6761
curve-level tests (point_test.go shapes) — group law and scalar mul over
the emulated base field checked against the host curve oracle. Engine
level (no jax): the sw_emulated gadget is field-generic, these pin the new
presets' constants (modulus widths, b, generators) to the host curves.
"""

import random

import pytest

from gnark_icicle_tpu.curves import bls12_377, bls12_381, bw6_761, bn254
from gnark_icicle_tpu.frontend.engine import Engine, EngineUnsatisfiedError
from gnark_icicle_tpu.std.sw_emulated import (
    BLS12377G1, BLS12381G1, BW6761G1, EmulatedCurve,
)

# native field of the imagined outer circuit — BN254 fr, the common case
# for emulated cross-curve verification
Q = bn254.R

PRESETS = [
    (BLS12381G1, bls12_381.G1, bls12_381.R),
    (BLS12377G1, bls12_377.G1, bls12_377.R),
    pytest.param(BW6761G1, bw6_761.G1, bw6_761.R, id="bw6-761.g1"),
]


@pytest.mark.parametrize("params,host,r", PRESETS)
def test_generator_on_curve_and_group_law(params, host, r):
    rng = random.Random(17)
    eng = Engine(Q)
    c = EmulatedCurve(eng, params, Q)

    g = c.generator()
    c.assert_on_curve(g)

    p_host = host.random_point(rng)
    q_host = host.random_point(rng)
    p = c.constant_point(p_host)
    q = c.constant_point(q_host)
    c.assert_on_curve(p)

    # add / double / neg vs the host oracle
    c.assert_is_equal(c.add(p, q), c.constant_point(host.add(p_host, q_host)))
    c.assert_is_equal(c.double(p), c.constant_point(host.add(p_host, p_host)))
    s = host.add(p_host, (q_host[0], (-q_host[1]) % params.fp.modulus))
    c.assert_is_equal(c.add(p, c.neg(q)), c.constant_point(s))

    # off-curve point rejected
    bad = c.constant_point(((p_host[0] + 1) % params.fp.modulus, p_host[1]))
    with pytest.raises(EngineUnsatisfiedError):
        c.assert_on_curve(bad)


@pytest.mark.parametrize("params,host,r", PRESETS)
def test_scalar_mul_matches_host(params, host, r):
    rng = random.Random(23)
    eng = Engine(Q)
    c = EmulatedCurve(eng, params, Q)
    p_host = host.random_point(rng)
    k = rng.randrange(1, min(r, 1 << 64))  # bounded: engine cost
    want = host.scalar_mul(p_host, k)
    got = c.scalar_mul(c.constant_point(p_host), c.fr.constant(k),
                       n_bits=k.bit_length())
    c.assert_is_equal(got, c.constant_point(want))
