"""SHA-256 gadget vs hashlib (≙ std/hash/sha2 tests)."""

import hashlib

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import Circuit, Public, Secret, is_solved
from gnark_icicle_tpu.std.hash.sha2 import sha256_words, pad_message_words

Q = bn254.R


def _digest_words(data: bytes):
    d = hashlib.sha256(data).digest()
    return [int.from_bytes(d[i : i + 4], "big") for i in range(0, 32, 4)]


def _make_circuit(n_words: int):
    class Sha(Circuit):
        msg = Secret(shape=n_words)
        digest = Public(shape=8)

        def define(self, api):
            out = sha256_words(api, self.msg)
            for o, want in zip(out, self.digest):
                api.assert_is_equal(o, want)

    return Sha


@pytest.mark.parametrize("data", [b"", b"abc", b"x" * 50])
def test_sha256_single_block(data):
    words = pad_message_words(data)
    assert len(words) == 16
    Sha = _make_circuit(16)
    assert is_solved(Sha(msg=words, digest=_digest_words(data)), Q)


def test_sha256_two_blocks():
    data = b"The quick brown fox jumps over the lazy dog, twice around. " * 2
    words = pad_message_words(data)
    assert len(words) == 32
    Sha = _make_circuit(32)
    assert is_solved(Sha(msg=words, digest=_digest_words(data)), Q)


def test_sha256_wrong_digest_rejected():
    words = pad_message_words(b"abc")
    bad = _digest_words(b"abc")
    bad[0] ^= 1
    Sha = _make_circuit(16)
    assert not is_solved(Sha(msg=words, digest=bad), Q)
