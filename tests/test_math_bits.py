"""Bit-gadget tests (≙ std/math/bits + uints tests) — engine-checked against
plain python semantics."""

import random

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import Circuit, Public, Secret, is_solved
from gnark_icicle_tpu.std.math_bits import UWord

Q = bn254.R
W = 32
MASK = (1 << W) - 1


def _ror(v, k):
    k %= W
    return ((v >> k) | (v << (W - k))) & MASK


class WordOps(Circuit):
    a = Secret()
    b = Secret()
    xor_out = Public()
    and_out = Public()
    ror7 = Public()
    shr3 = Public()
    sum_out = Public()

    def define(self, api):
        ua = UWord.from_var(api, self.a, W)
        ub = UWord.from_var(api, self.b, W)
        api.assert_is_equal(ua.xor(ub).value(), self.xor_out)
        api.assert_is_equal(ua.and_(ub).value(), self.and_out)
        api.assert_is_equal(ua.ror(7).value(), self.ror7)
        api.assert_is_equal(ua.shr(3).value(), self.shr3)
        api.assert_is_equal(ua.add(ub, ub).value(), self.sum_out)


@pytest.mark.parametrize("seed", [0, 1])
def test_word_ops(seed):
    rng = random.Random(seed)
    a, b = rng.randrange(1 << W), rng.randrange(1 << W)
    w = WordOps(
        a=a, b=b,
        xor_out=a ^ b, and_out=a & b,
        ror7=_ror(a, 7), shr3=a >> 3,
        sum_out=(a + 2 * b) & MASK,
    )
    assert is_solved(w, Q)


def test_word_ops_reject_wrong():
    w = WordOps(a=5, b=9, xor_out=0, and_out=5 & 9, ror7=_ror(5, 7),
                shr3=0, sum_out=(5 + 18) & MASK)
    assert not is_solved(w, Q)


def test_rotations_pure():
    from gnark_icicle_tpu.std.math_bits import rotate_left, rotate_right

    bits = [1, 0, 1, 1, 0, 0, 0, 0]  # value 0b00001101 = 13
    # rol 1: value 26 → bits little-endian of 26
    assert rotate_left(bits, 1) == [0, 1, 0, 1, 1, 0, 0, 0]
    assert rotate_right(rotate_left(bits, 3), 3) == bits
    assert rotate_left(bits, 8) == bits
