"""SHA-3 sponge gadgets vs hashlib (≙ std/hash/sha3 tests)."""

import hashlib

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend.engine import Engine
from gnark_icicle_tpu.frontend import Circuit, Public, Secret, compile_circuit
from gnark_icicle_tpu.constraint import is_satisfied
from gnark_icicle_tpu.std.hash.sha3 import sha3_256, sha3_512, keccak256
from gnark_icicle_tpu.std.hash.mimc import keccak256 as host_keccak256

Q = bn254.R


@pytest.mark.parametrize("msg", [b"", b"abc", b"a" * 135, b"b" * 136,
                                 b"c" * 200])
def test_sha3_256_engine_matches_hashlib(msg):
    eng = Engine(Q)
    got = sha3_256(eng, list(msg))
    want = hashlib.sha3_256(msg).digest()
    assert bytes(int(b) for b in got) == want


def test_sha3_512_engine_matches_hashlib():
    msg = b"The quick brown fox jumps over the lazy dog"
    eng = Engine(Q)
    got = sha3_512(eng, list(msg))
    assert bytes(int(b) for b in got) == hashlib.sha3_512(msg).digest()


def test_keccak256_engine_matches_host():
    msg = b"ethereum"
    eng = Engine(Q)
    got = keccak256(eng, list(msg))
    assert bytes(int(b) for b in got) == host_keccak256(msg)


# NOTE: the compiled/solver path of the underlying permutation is covered by
# tests/test_keccakf.py; compiling a full sponge circuit (~180k constraints)
# adds ~10 min of pure Python builder time for marginal extra coverage, so
# the sponge layer (padding/absorb/squeeze) is verified engine-vs-hashlib
# above.
