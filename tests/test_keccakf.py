"""Keccak-f gadget vs the host permutation (≙ std/permutation/keccakf
tests; the host _keccak_f is already validated by the keccak256 vectors)."""

import random

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import Circuit, Public, Secret, is_solved
from gnark_icicle_tpu.std.math_bits import UWord
from gnark_icicle_tpu.std.hash.keccakf import keccakf
from gnark_icicle_tpu.std.hash.mimc import _keccak_f

Q = bn254.R


class KeccakF(Circuit):
    lanes = Secret(shape=25)
    out = Public(shape=25)

    def define(self, api):
        words = [UWord.from_var(api, v, 64) for v in self.lanes]
        res = keccakf(api, words)
        for r, o in zip(res, self.out):
            api.assert_is_equal(r.value(), o)


def _host_keccakf(lanes):
    state = [[lanes[x + 5 * y] for y in range(5)] for x in range(5)]
    _keccak_f(state)
    return [state[x][y] for y in range(5) for x in range(5)]


def test_keccakf_matches_host():
    rng = random.Random(6)
    lanes = [rng.randrange(1 << 64) for _ in range(25)]
    want = _host_keccakf(list(lanes))
    assert is_solved(KeccakF(lanes=lanes, out=want), Q)


def test_keccakf_rejects_wrong():
    rng = random.Random(7)
    lanes = [rng.randrange(1 << 64) for _ in range(25)]
    want = _host_keccakf(list(lanes))
    want[3] ^= 1
    assert not is_solved(KeccakF(lanes=lanes, out=want), Q)
