"""LZSS decompression circuits (std/compress_lzss.py)
(≙ reference std/compress/lzss/snark_test.go; corpus from the reference's
own testdata inputs)."""

import os
import random

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import Circuit, Public, Secret, compile_circuit
from gnark_icicle_tpu.frontend.engine import Engine
from gnark_icicle_tpu.constraint.solver import solve, UnsatisfiedConstraintError
from gnark_icicle_tpu.std.compress_lzss import (
    augment_dict, decompress, lzss_compress, lzss_decompress_host,
)

Q = bn254.R
TESTDATA = "/root/reference/std/compress/lzss/testdata"


def _roundtrip_host(data: bytes, dict_raw: bytes, **kw):
    dict_aug = augment_dict(dict_raw)
    c = lzss_compress(data, dict_aug, max_out=len(data), **kw)
    got = lzss_decompress_host(c, dict_aug, len(data))
    assert got == data, "host round-trip failed"
    return c, dict_aug


# ---------------------------------------------------------------------------
# host compressor <-> host decoder
# ---------------------------------------------------------------------------

def test_host_roundtrip_basics():
    for data in (
        b"",
        b"\x01",
        b"\x01\x02",
        bytes(range(11)),
        b"abcabcabcabcabcabc",              # self-referential copies
        b"\x00" * 100,                      # long zero run (overlap copy)
        b"\xfe\xff\xfe\xff",                # raw delimiter escapes
        bytes([random.Random(3).randrange(256) for _ in range(300)]),
    ):
        _roundtrip_host(data, b"")
        _roundtrip_host(data, b"the quick brown fox jumps over the lazy dog")


def test_host_roundtrip_bypass():
    data = bytes(range(64))
    dict_aug = augment_dict(b"")
    c = lzss_compress(data, dict_aug, level=0)
    assert c[:3] == bytes([0, 1, 1])  # bypass flag set
    assert lzss_decompress_host(c, dict_aug, len(data)) == data


@pytest.mark.skipif(not os.path.isdir(TESTDATA), reason="no corpus")
def test_host_roundtrip_reference_corpus():
    """Compress the reference's own test inputs against its dictionary."""
    dict_raw = open(os.path.join(TESTDATA, "dict_naive"), "rb").read()
    for name in ("3c2943", "e4207e"):
        path = os.path.join(TESTDATA, name, "data.bin")
        if not os.path.exists(path):
            continue
        data = open(path, "rb").read()[:600]  # bounded: O(n·hist) matcher
        c, _ = _roundtrip_host(data, dict_raw[:512])
        assert len(c) < len(data)  # it actually compresses zk-rollup data


# ---------------------------------------------------------------------------
# circuit (engine) vs host
# ---------------------------------------------------------------------------

def _engine_decompress(c_bytes: bytes, dict_aug: bytes, max_out: int):
    eng = Engine(Q)
    c_vars = [int(b) for b in c_bytes]
    d, d_len = decompress(eng, c_vars, len(c_bytes),
                          [int(b) for b in dict_aug], max_out)
    return bytes(int(v) % 256 for v in d), int(d_len)


@pytest.mark.parametrize("data", [
    b"\x05",
    b"hello hello hello hello",
    b"\xfe\x00\xff",
    bytes([7] * 40),
])
def test_engine_matches_host(data):
    dict_aug = augment_dict(b"common prefix material")
    c = lzss_compress(data, dict_aug, max_out=len(data))
    d, d_len = _engine_decompress(c, dict_aug, len(data))
    assert d_len == len(data)
    assert d[:d_len] == data


def test_engine_bypass_and_overflow():
    dict_aug = augment_dict(b"")
    data = b"raw bytes"
    c = lzss_compress(data, dict_aug, level=0)
    d, d_len = _engine_decompress(c, dict_aug, len(data))
    assert (d[:d_len], d_len) == (data, len(data))

    # output buffer too small -> dLength == -1 (mod q)
    big = b"0123456789" * 4
    c2 = lzss_compress(big, dict_aug, max_out=8)
    eng = Engine(Q)
    _, d_len2 = decompress(eng, [int(b) for b in c2], len(c2),
                           [int(b) for b in dict_aug], 8)
    assert int(d_len2) % Q == Q - 1  # the snark.go "-1" overflow marker


# ---------------------------------------------------------------------------
# compiled to constraints
# ---------------------------------------------------------------------------

DATA = b"compress me: abcabcabc abcabcabc!"
DICT_RAW = b"abc"


class LzssCircuit(Circuit):
    c = Secret(shape=0)       # patched below
    c_length = Secret()
    d = Public(shape=0)
    d_length = Public()

    def define(self, api):
        dict_vars = [int(b) for b in self._dict_aug]
        d, d_len = decompress(api, list(self.c), self.c_length,
                              dict_vars, len(self.d))
        for have, want in zip(d, self.d):
            api.assert_is_equal(have, want)
        api.assert_is_equal(d_len, self.d_length)


def test_compiled_decompression_solves_and_rejects():
    dict_aug = augment_dict(DICT_RAW)
    c_bytes = lzss_compress(DATA, dict_aug, max_out=len(DATA))

    class C(LzssCircuit):
        c = Secret(shape=len(c_bytes))
        c_length = Secret()
        d = Public(shape=len(DATA))
        d_length = Public()
        _dict_aug = dict_aug

    cs = compile_circuit(Q, C)
    print(f"lzss decompress({len(c_bytes)}B -> {len(DATA)}B): "
          f"{cs.nb_constraints} constraints")
    pub = [int(b) for b in DATA] + [len(DATA)]
    sec = [int(b) for b in c_bytes] + [len(c_bytes)]
    res = solve(cs, pub, sec)
    assert res.wires[0] == 1

    bad = list(pub)
    bad[3] = (bad[3] + 1) % 256  # tamper one decompressed byte
    with pytest.raises(UnsatisfiedConstraintError):
        solve(cs, bad, sec)

    bad = list(pub)
    bad[-1] += 1  # wrong claimed length
    with pytest.raises(UnsatisfiedConstraintError):
        solve(cs, bad, sec)
