"""BW6-761 emulated pairing gadget (std/pairing_bw6_761.py) vs the host
Tate oracle — closes the 2-chain composition surface
(≙ reference std/algebra/emulated/sw_bw6761/pairing_test.go)."""

import random

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.curves import bw6_761 as bw6
from gnark_icicle_tpu.curves.bw6_761 import BW6Pairing, Fp6D
from gnark_icicle_tpu.frontend.engine import Engine, EngineUnsatisfiedError
from gnark_icicle_tpu.std.pairing_bw6_761 import BW6761Pairing

Q = bn254.R  # the native circuit field hosting the emulation


def _gin(pr, p):
    return (pr.fp.constant(p[0]), pr.fp.constant(p[1]))


def _out6(pr, g):
    return Fp6D(tuple(
        pr.fp.value_hint(pr.fp.reduce(c)) for c in g
    ))


@pytest.mark.slow
def test_bw6_pairing_matches_host_oracle():
    rng = random.Random(31)
    pt = bw6.G1.random_point(rng)
    qt = bw6.G2.random_point(rng)
    pr = BW6761Pairing(Engine(Q), Q)
    host = BW6Pairing()
    ml = pr.miller_loop(_gin(pr, pt), _gin(pr, qt))
    assert _out6(pr, ml) == host.miller_loop(pt, qt)
    gt = pr.final_exponentiation(ml)
    assert _out6(pr, gt) == host.pair(pt, qt)


@pytest.mark.slow
def test_bw6_pairing_check_bilinearity():
    rng = random.Random(32)
    g1 = bw6.G1
    pt = g1.random_point(rng)
    qt = bw6.G2.random_point(rng)
    pr = BW6761Pairing(Engine(Q), Q)
    pr.assert_pairing_check([
        (_gin(pr, pt), _gin(pr, qt)),
        (_gin(pr, g1.neg(pt)), _gin(pr, qt)),
    ])
    with pytest.raises(EngineUnsatisfiedError):
        other = g1.random_point(rng)
        pr2 = BW6761Pairing(Engine(Q), Q)
        pr2.assert_pairing_check([
            (_gin(pr2, pt), _gin(pr2, qt)),
            (_gin(pr2, g1.neg(other)), _gin(pr2, qt)),
        ])
