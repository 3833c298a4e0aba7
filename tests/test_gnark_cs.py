"""gnark constraint-system wire-format codec (io/gnark_cs.py).

Covers: intcomp stream round-trips (incl. the reference's FuzzIntcomp32
corpus seeds, internal/backend/ioutils/testdata/fuzz/), deterministic CBOR
vectors (RFC 8949), full-container encode→decode→encode byte idempotence,
and semantic translation R1CS↔gnark stream with a solver cross-check.
No jax required — pure host code.
"""

import os
import random

import pytest

from gnark_icicle_tpu.io import cbor, gnark_cs, intcomp
from gnark_icicle_tpu.io.cbor import Tagged

FUZZ_DIR = (
    "/root/reference/internal/backend/ioutils/testdata/fuzz/FuzzIntcomp32"
)


# -- intcomp -----------------------------------------------------------------

@pytest.mark.parametrize("n", [0, 1, 2, 127, 128, 129, 255, 256, 1000])
def test_intcomp_u32_roundtrip_sizes(n):
    rng = random.Random(n)
    vals = [rng.randrange(0, 1 << 32) for _ in range(n)]
    assert intcomp.uncompress_u32(intcomp.compress_u32(vals)) == vals


def test_intcomp_u32_patterns():
    cases = [
        list(range(500)),                      # sequential (the design case)
        list(range(500, 0, -1)),               # decreasing (wraparound deltas)
        [7] * 300,                             # constant (0-bit blocks)
        [0, 0xFFFFFFFF] * 64,                  # alternating extremes
        [0xFFFFFFFF] * 130,
        [1 << i for i in range(32)] * 4,
    ]
    for vals in cases:
        assert intcomp.uncompress_u32(intcomp.compress_u32(vals)) == vals


def test_intcomp_u64_roundtrip():
    rng = random.Random(64)
    for n in (0, 1, 63, 64, 65, 128, 129, 300):
        vals = [rng.randrange(0, 1 << 64) for _ in range(n)]
        assert intcomp.uncompress_u64(intcomp.compress_u64(vals)) == vals
    vals = [0, (1 << 64) - 1] * 70
    assert intcomp.uncompress_u64(intcomp.compress_u64(vals)) == vals


@pytest.mark.parametrize("width", [32, 64])
def test_intcomp_bitpack_roundtrip_fuzz(width):
    """128-value delta bit-pack blocks (bitpack=True): self round-trip over
    fuzzed shapes — sizes straddling the 128 boundary, delta extremes,
    constant runs (0-bit packs), and mixed full+tail streams. The layout is
    extrapolated (no Go ciphertext exercises it — module docstring), so
    encoder/decoder mutual consistency IS the testable contract."""
    comp = intcomp.compress_u32 if width == 32 else intcomp.compress_u64
    uncomp = intcomp.uncompress_u32 if width == 32 else intcomp.uncompress_u64
    top = (1 << width) - 1
    rng = random.Random(width)
    cases = [
        [],
        [5],
        list(range(127)), list(range(128)), list(range(129)),
        list(range(255)), list(range(256)), list(range(257)),
        [7] * 384,                        # 0-bit packed blocks
        [0, top] * 200,                   # max-width deltas
        [top - i for i in range(300)],    # decreasing (wrapped deltas)
        [rng.randrange(0, top + 1) for _ in range(1000)],
        sorted(rng.randrange(0, top + 1) for _ in range(500)),
    ]
    for _ in range(25):
        n = rng.randrange(0, 700)
        cases.append([rng.randrange(0, top + 1) for _ in range(n)])
    for vals in cases:
        packed = comp(vals, bitpack=True)
        assert uncomp(packed) == vals
        # the default varint regime must be untouched by the new path
        assert uncomp(comp(vals)) == vals


def test_intcomp_bitpack_rejects_malformed():
    vals = list(range(200))
    words = intcomp.compress_u32(vals, bitpack=True)
    # corrupt the bit-width word of the first (full) block: shape mismatch
    bad = list(words)
    bad[2] = 33  # width > 32
    with pytest.raises(ValueError):
        intcomp.uncompress_u32(bad)
    bad = list(words)
    bad[2] = (bad[2] + 1) % 33  # wrong width -> packed-word count mismatch
    with pytest.raises(ValueError):
        intcomp.uncompress_u32(bad)


def test_intcomp_stream_framing():
    """Container framing matches ioutils: u64 word count + LE words, and
    streams concatenate back-to-back."""
    buf = bytearray()
    a = [3, 1, 4, 1, 5, 9, 2, 6]
    b = list(range(200))
    intcomp.write_u32_stream(buf, a)
    intcomp.write_u32_stream(buf, b)
    intcomp.write_u64_stream(buf, [1 << 40, 2, 3])
    got_a, off = intcomp.read_u32_stream(bytes(buf), 0)
    got_b, off = intcomp.read_u32_stream(bytes(buf), off)
    got_c, off = intcomp.read_u64_stream(bytes(buf), off)
    assert (got_a, got_b, got_c) == (a, b, [1 << 40, 2, 3])
    assert off == len(buf)


def _go_fuzz_bytes(path):
    """Parse a Go fuzz-corpus seed: line 2 is []byte("<go-quoted>")."""
    with open(path, "rb") as f:
        lines = f.read().split(b"\n")
    if len(lines) < 2 or not lines[1].startswith(b'[]byte("'):
        return None
    body = lines[1][len(b'[]byte("') : lines[1].rfind(b'")')]
    out = bytearray()
    i = 0
    while i < len(body):
        c = body[i]
        if c != ord("\\"):
            out.append(c)
            i += 1
            continue
        e = body[i + 1]
        if e == ord("x"):
            out.append(int(body[i + 2 : i + 4], 16))
            i += 4
        elif e in b"nrt\\\"'":
            out.append(
                {ord("n"): 10, ord("r"): 13, ord("t"): 9, ord("\\"): 92,
                 ord('"'): 34, ord("'"): 39}[e])
            i += 2
        elif chr(e).isdigit():  # octal \ooo
            out.append(int(body[i + 1 : i + 4], 8))
            i += 4
        else:
            raise ValueError(f"unknown escape {chr(e)!r} in {path}")
    return bytes(out)


@pytest.mark.skipif(not os.path.isdir(FUZZ_DIR), reason="no reference corpus")
def test_intcomp_reference_fuzz_corpus():
    """Replay the reference's FuzzIntcomp32 seeds: bytes → []uint32 (LE,
    len/4 trunc — intcomp_test.go:9-17) → compress → uncompress == input."""
    n_seeds = 0
    for name in sorted(os.listdir(FUZZ_DIR)):
        raw = _go_fuzz_bytes(os.path.join(FUZZ_DIR, name))
        if raw is None:
            continue
        vals = [
            int.from_bytes(raw[4 * i : 4 * i + 4], "little")
            for i in range(len(raw) // 4)
        ]
        assert intcomp.uncompress_u32(intcomp.compress_u32(vals)) == vals
        n_seeds += 1
    assert n_seeds > 100  # the corpus has ~196 seeds


# -- CBOR --------------------------------------------------------------------

def test_cbor_rfc8949_vectors():
    """Known encodings from RFC 8949 appendix A."""
    vectors = [
        (0, "00"), (1, "01"), (10, "0a"), (23, "17"), (24, "1818"),
        (100, "1864"), (1000, "1903e8"), (1000000, "1a000f4240"),
        (-1, "20"), (-10, "29"), (-100, "3863"),
        (b"", "40"), (b"\x01\x02\x03\x04", "4401020304"),
        ("", "60"), ("a", "6161"), ("IETF", "6449455446"),
        ([], "80"), ([1, 2, 3], "83010203"),
        ([1, [2, 3], [4, 5]], "8301820203820405"),
        ({}, "a0"),
        ({"a": 1, "b": [2, 3]}, "a26161016162820203"),
        (False, "f4"), (True, "f5"), (None, "f6"),
        (Tagged(5309736, {}), "da00510528a0"),
    ]
    for obj, hexpect in vectors:
        assert cbor.encode(obj).hex() == hexpect, obj
        back, off = cbor.decode(bytes.fromhex(hexpect))
        if isinstance(obj, Tagged):
            assert back.tag == obj.tag and back.value == obj.value
        else:
            assert back == obj
        assert off == len(hexpect) // 2


def test_cbor_canonical_map_order():
    """Core deterministic form: keys sorted by encoded bytes
    (length-first)."""
    # "z" (0x617a) sorts before "aa" (0x626161) bytewise
    assert cbor.encode({"aa": 2, "z": 1}).hex() == "a2617a0162616102"
    # int keys: 10 (0x0a) < 100 (0x1864)
    assert cbor.encode({100: 1, 10: 2}).hex() == "a20a02186401"


def test_cbor_nested_roundtrip():
    obj = {
        "GnarkVersion": "0.11.0",
        "Blueprints": [Tagged(5309735, {}), Tagged(5309736, {})],
        "MDebug": {},
        "Nested": [{"CID": 5, "VID": 7}, None, True],
        "Bytes": b"\x00\xff",
    }
    enc = cbor.encode(obj)
    back, off = cbor.decode(enc)
    assert off == len(enc)
    assert back["GnarkVersion"] == "0.11.0"
    assert back["Blueprints"][1].tag == 5309736
    assert back["Nested"][0] == {"CID": 5, "VID": 7}
    # deterministic: re-encoding the decoded value is byte-identical
    assert cbor.encode(back) == enc


# -- full container ----------------------------------------------------------

def _compile_test_cs():
    from gnark_icicle_tpu.curves import bn254
    from gnark_icicle_tpu.frontend import (
        Circuit, Public, Secret, compile_circuit,
    )

    class C(Circuit):
        x = Secret()
        y = Public()

        def define(self, api):
            x3 = api.mul(self.x, self.x, self.x)
            inv = api.div(1, self.x)           # hint + constraint
            api.assert_is_equal(api.add(x3, self.x, 5, api.mul(inv, 0)),
                                self.y)

    return compile_circuit(bn254.R, C), bn254.R


def test_r1cs_export_import_identity():
    cs, q = _compile_test_cs()
    blob = gnark_cs.write_r1cs(cs)

    # byte idempotence: decode → encode reproduces the exact bytes
    gcs = gnark_cs.decode(blob)
    assert gnark_cs.encode(gcs) == blob

    # header sanity (gnark wire header semantics)
    assert gcs.q == q
    assert gcs.system_type == gnark_cs.SYSTEM_R1CS
    assert gcs.coeffs[:5] == [0, 1, 2, q - 1, q - 2]

    back = gnark_cs.to_r1cs(gcs)
    assert back.nb_constraints == cs.nb_constraints
    assert back.nb_public == cs.nb_public
    assert back.nb_secret == cs.nb_secret
    assert back.nb_internal == cs.nb_internal
    # same resolved coefficient VALUES per term (ids may differ)
    orig = [cs.coeffs[c] for c in cs.term_coeff]
    got = [back.coeffs[c] for c in back.term_coeff]
    assert orig == got
    assert back.term_wire == cs.term_wire
    assert back.solved_wire == cs.solved_wire


def test_r1cs_import_solves():
    """An imported system solves to the same witness as the original."""
    from gnark_icicle_tpu.constraint.solver import solve

    cs, q = _compile_test_cs()
    x = 3
    y = (x ** 3 + x + 5) % q
    w0 = solve(cs, [y], [x], native=False)
    back = gnark_cs.read_r1cs(gnark_cs.write_r1cs(cs))
    # hint ids survive the round-trip, so registered hints still resolve
    w1 = solve(back, [y], [x], native=False)
    assert list(w0.wires) == list(w1.wires)


def test_scs_generic_stream_decodes():
    """Hand-build a gnark SCS stream with the 4 gate blueprints and check
    the replay: x*y=m (Mul), m+x+5=o (Add via qC), bool(b), generic gate
    o + 0·b - out = 0."""
    q = 0x30644E72E131A029B85045B68181585D2833E84879B9709143E1F593F0000001
    gcs = gnark_cs.GnarkCS(q=q, system_type=gnark_cs.SYSTEM_SPARSE_R1CS)
    gcs.blueprints = [
        Tagged(gnark_cs.TAG_GENERIC_HINT, {}),
        Tagged(gnark_cs.TAG_GENERIC_SPARSE_R1C, {}),
        Tagged(gnark_cs.TAG_SPARSE_R1C_MUL, {}),
        Tagged(gnark_cs.TAG_SPARSE_R1C_ADD, {}),
        Tagged(gnark_cs.TAG_SPARSE_R1C_BOOL, {}),
    ]
    gcs.coeffs = [0, 1, 2, q - 1, q - 2, 5]
    gcs.public_names = ["out"]
    gcs.secret_names = ["x", "y", "b"]
    gcs.nb_internal = 2  # m (wire 4), o (wire 5)
    I = gnark_cs.GnarkInstruction
    # wires: out=0 x=1 y=2 b=3 m=4 o=5
    gcs.calldata = [
        1, 2, 4, 1,          # Mul: 1·(x·y) == m
        4, 1, 5, 1, 1, 5,    # Add: 1·m + 1·x + 5 == o
        3, 1, 3,             # Bool: b + (−1)·b² == 0  (qL=1, qM=−1)
        5, 3, 0, 1, 0, 3, 0, 0, 0,  # generic: o − out == 0
    ]
    gcs.instructions = [
        I(2, 0, 4, 0), I(3, 1, 4, 4), I(4, 2, 6, 10), I(1, 3, 6, 13),
    ]
    gcs.nb_constraints = 4
    scs = gnark_cs.to_scs(gcs)
    # 4 translated gates + 1 synthesized public-input (Qk) gate at the head
    assert scs.nb_gates == 5
    assert scs.ql[0] == q - 1 and scs.xa[0] == 0  # PI gate for "out"
    assert scs.qm[1] == 1 and scs.qo[1] == q - 1
    assert scs.qc[2] == 5 and scs.qo[2] == q - 1
    assert scs.ql[3] == 1 and scs.qm[3] == q - 1
    assert scs.solved_wire[1:3] == [4, 5] and scs.solved_wire[3] == -1
    # byte idempotence through the container too
    blob = gnark_cs.encode(gcs)
    assert gnark_cs.encode(gnark_cs.decode(blob)) == blob


def test_scs_export_import_identity():
    """A compiled SCS circuit survives export → import with identical gate
    columns, and the blob is byte-idempotent."""
    from gnark_icicle_tpu.curves import bn254
    from gnark_icicle_tpu.frontend import (
        Circuit, Public, Secret, compile_circuit,
    )

    class C(Circuit):
        x = Secret()
        y = Public()

        def define(self, api):
            x3 = api.mul(self.x, self.x, self.x)
            b = api.is_zero(api.sub(self.x, 3))
            api.assert_is_equal(api.add(x3, self.x, 5, api.mul(b, 0)),
                                self.y)

    scs = compile_circuit(bn254.R, C, builder="scs")
    blob = gnark_cs.write_scs(scs)
    assert gnark_cs.encode(gnark_cs.decode(blob)) == blob
    back = gnark_cs.read_scs(blob)
    assert back.nb_gates == scs.nb_gates
    for col in ("xa", "xb", "xc", "ql", "qr", "qm", "qo", "qc",
                "solved_wire"):
        assert getattr(back, col) == getattr(scs, col), col

    # imported system solves identically
    from gnark_icicle_tpu.constraint.scs import solve_scs

    x = 7
    y = (x ** 3 + x + 5) % bn254.R
    w0 = solve_scs(scs, [y], [x])
    w1 = solve_scs(back, [y], [x])
    assert w0[0] == w1[0]


def test_decode_rejects_corruption():
    cs, _ = _compile_test_cs()
    blob = bytearray(gnark_cs.write_r1cs(cs))
    with pytest.raises(ValueError):
        gnark_cs.decode(bytes(blob[: len(blob) // 2]))  # truncated
    bad = blob.copy()
    bad[8] = 9  # version major = 9
    with pytest.raises(ValueError):
        gnark_cs.decode(bytes(bad))


def test_commitment_info_roundtrip():
    from gnark_icicle_tpu.constraint.system import Groth16Commitment

    cs, q = _compile_test_cs()
    cs.commitments.append(Groth16Commitment(
        public_and_commitment_committed=[1],
        nb_public_committed=1,
        private_committed=[4, 5],
        commitment_index=6,
    ))
    back = gnark_cs.read_r1cs(gnark_cs.write_r1cs(cs))
    assert len(back.commitments) == 1
    c = back.commitments[0]
    assert c.public_and_commitment_committed == [1]
    assert c.private_committed == [4, 5]
    assert c.commitment_index == 6
    assert c.nb_public_committed == 1


# -- real gnark fixtures -----------------------------------------------------
# The only gnark-serialized constraint systems in the reference tree:
# internal/regression_tests/issue1045/testdata/issue1045.{r1cs,scs} — a
# BN254 circuit with 2 public inputs, 2 identity hints, 2 AssertIsEqual
# (issue_1045_test.go:45-61). These pin the intcomp payload byte format.

FIXTURE_DIR = "/root/reference/internal/regression_tests/issue1045/testdata"

_HINT_NAMES = (
    "github.com/consensys/gnark/internal/regression_tests/issue1045."
    "ExplicitHint",
    "github.com/consensys/gnark/internal/regression_tests/issue1045."
    "glob..func1",
)


def _register_fixture_hints():
    from gnark_icicle_tpu.constraint.hints import register_hint

    def identity(q, inputs):
        return [inputs[0] % q]

    for name in _HINT_NAMES:
        try:
            register_hint(identity, name=name)
        except ValueError:
            pass  # already registered by an earlier test


def _fixture_sections(tag):
    import struct

    with open(os.path.join(FIXTURE_DIR, f"issue1045.{tag}"), "rb") as f:
        data = f.read()
    total = struct.unpack_from("<Q", data, 0)[0]
    body = data[32 : 32 + total]
    l_len, i_len, c_len, _ = struct.unpack_from("<4Q", body, 0)
    return (data, body[32 : 32 + l_len],
            body[32 + l_len : 32 + l_len + i_len])


@pytest.mark.skipif(not os.path.isdir(FIXTURE_DIR), reason="no fixtures")
@pytest.mark.parametrize("tag", ["r1cs", "scs"])
def test_fixture_intcomp_streams_byte_exact(tag):
    """Every intcomp stream in the real gnark files re-encodes to the
    identical bytes (decode → write_* == original slice)."""
    import struct

    _, sec_levels, sec_instr = _fixture_sections(tag)
    (n_levels,) = struct.unpack_from("<Q", sec_levels, 0)
    off = 8
    for _ in range(n_levels):
        vals, end = intcomp.read_u32_stream(sec_levels, off)
        out = bytearray()
        intcomp.write_u32_stream(out, vals)
        assert bytes(out) == sec_levels[off:end]
        off = end
    assert off == len(sec_levels)
    off = 0
    for _ in range(3):  # blueprintID, constraintOffset, wireOffset
        vals, end = intcomp.read_u32_stream(sec_instr, off)
        out = bytearray()
        intcomp.write_u32_stream(out, vals)
        assert bytes(out) == sec_instr[off:end]
        off = end
    vals, end = intcomp.read_u64_stream(sec_instr, off)  # startCallData
    out = bytearray()
    intcomp.write_u64_stream(out, vals)
    assert bytes(out) == sec_instr[off:end]
    assert end == len(sec_instr)


@pytest.mark.skipif(not os.path.isdir(FIXTURE_DIR), reason="no fixtures")
def test_fixture_r1cs_decodes_and_solves():
    """Load the real gnark .r1cs, solve a witness through our solver."""
    _register_fixture_hints()
    with open(os.path.join(FIXTURE_DIR, "issue1045.r1cs"), "rb") as f:
        cs = gnark_cs.read_r1cs(f.read())
    assert cs.nb_constraints == 2
    assert cs.nb_public == 3  # ["1", In1, In2]
    from gnark_icicle_tpu.constraint.solver import solve

    res = solve(cs, [5, 7], [], native=False)
    assert res.wires[1] == 5 and res.wires[2] == 7
    # the two hint outputs echo the publics
    assert res.wires[3] == 5 and res.wires[4] == 7
    # a tampered hint (wrong echo) must fail the AssertIsEqual constraints
    with pytest.raises(Exception):
        solve(cs, [5, 7], [], native=False, hint_overrides={
            h.hint_id: (lambda q, inputs: [99]) for h in cs.hints
        })


@pytest.mark.skipif(not os.path.isdir(FIXTURE_DIR), reason="no fixtures")
def test_fixture_scs_decodes_and_solves():
    """Load the real gnark .scs (PLONK arithmetization) and solve."""
    _register_fixture_hints()
    with open(os.path.join(FIXTURE_DIR, "issue1045.scs"), "rb") as f:
        scs = gnark_cs.read_scs(f.read())
    assert scs.nb_public == 2
    from gnark_icicle_tpu.constraint.scs import solve_scs

    w = solve_scs(scs, [5, 7], [])
    assert w is not None


@pytest.mark.slow
@pytest.mark.skipif(not os.path.isdir(FIXTURE_DIR), reason="no fixtures")
def test_fixture_e2e_prove_verify():
    """Full pipeline on real gnark bytes: Groth16 on the .r1cs, PLONK on
    the .scs (≙ issue1045's TestCircuitProveDeserializedGroth16/Plonk)."""
    _register_fixture_hints()
    from gnark_icicle_tpu.backend import groth16, plonk
    from gnark_icicle_tpu.backend.kzg import unsafe_srs
    from gnark_icicle_tpu.curves import bn254

    with open(os.path.join(FIXTURE_DIR, "issue1045.r1cs"), "rb") as f:
        cs = gnark_cs.read_r1cs(f.read())
    pk, vk = groth16.setup(cs, bn254.BN254, rng=random.Random(1))
    proof = groth16.prove(cs, pk, [5, 7], [], bn254.BN254,
                          rng=random.Random(2))
    groth16.verify(proof, vk, [5, 7], bn254.BN254)
    with pytest.raises(Exception):
        groth16.verify(proof, vk, [5, 8], bn254.BN254)

    with open(os.path.join(FIXTURE_DIR, "issue1045.scs"), "rb") as f:
        scs = gnark_cs.read_scs(f.read())
    srs = unsafe_srs(bn254.BN254, 64, rng=random.Random(3))
    pkp, vkp = plonk.setup(scs, bn254.BN254, srs)
    pf = plonk.prove(scs, pkp, [5, 7], [], bn254.BN254,
                     rng=random.Random(4))
    plonk.verify(pf, vkp, [5, 7], bn254.BN254)
    with pytest.raises(Exception):
        plonk.verify(pf, vkp, [5, 8], bn254.BN254)


def test_intcomp_full_block_refusal():
    """A count>=128 block header (the Go library's bit-pack regime for
    full blocks) must be REFUSED loudly, not misdecoded: the bit-pack
    word layout is not byte-verifiable without real ciphertext
    (reference: internal/backend/ioutils/intcomp.go wraps ronanh/intcomp
    v1.1.0, whose source is not vendored in-tree). VERDICT r2 item 10."""
    # u32 framing: [count][len][payload...][len] with count pinned at 128
    words = [128, 3, 0x80808080, 3]
    with pytest.raises(ValueError, match="bit-pack"):
        intcomp.uncompress_u32(words)
    # u64 framing: count in the low half of word0
    words64 = [128 | (2 << 32), 0x8080808080808080, 2]
    with pytest.raises(ValueError, match="bit-pack"):
        intcomp.uncompress_u64(words64)


def test_gnark_cs_roundtrip_beyond_block_size():
    """A CS whose intcomp streams carry thousands of values (far beyond
    the 128-value block boundary) round-trips through our own encoder —
    long streams ride chunked <=127-value varint blocks, the regime
    byte-verified against the issue1045 fixtures."""
    from gnark_icicle_tpu.frontend import (
        Circuit, Public, Secret, compile_circuit,
    )
    from gnark_icicle_tpu.constraint.solver import solve

    class Wide(Circuit):
        x = Secret()
        y = Public()

        def define(self, api):
            v = self.x
            for i in range(700):  # > 5x the 128 block size in every stream
                v = api.add(api.mul(v, v), i)
            api.assert_is_equal(v, self.y)

    q = 21888242871839275222246405745257275088548364400416034343698204186575808495617
    cs = compile_circuit(q, Wide)
    assert cs.nb_constraints > 600
    blob = gnark_cs.write_r1cs(cs)
    # the encoded blob must decode to a byte-identical re-encoding
    assert gnark_cs.encode(gnark_cs.decode(blob)) == blob
    back = gnark_cs.read_r1cs(blob)
    x = 3
    v = x
    for i in range(700):
        v = (v * v + i) % q
    a = solve(cs, [v], [x], native=False)
    b = solve(back, [v], [x], native=False)
    assert a.wires == b.wires
