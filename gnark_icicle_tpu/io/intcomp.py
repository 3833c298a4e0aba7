"""Delta + bit-packed integer streams (gnark's intcomp serialization layer).

Role parity: reference internal/backend/ioutils/intcomp.go — gnark frames
its constraint-system ``levels`` / ``instructions`` sections as
length-prefixed compressed ``[]uint32`` / ``[]uint64`` streams produced by
the ronanh/intcomp Go library (delta coding + binary packing).

Container framing (byte-exact to ioutils.CompressAndWriteUints32/64 and
ReadAndDecompressUints32/64, intcomp.go:12-34,38-77):

    [n_words u64 LE][n_words x u32/u64 LE compressed words]

Word-stream payload: delta + binary packing in blocks of 128 values —
    word 0              : number of encoded values
    per block           : 1 header word (low 6/7 bits = delta bit-width b)
                          followed by ceil(count*b/W) packed words
                          (W = 32 or 64; LSB-first lanes, value i at bit i*b)
    deltas              : d_i = v_i - v_{i-1} mod 2^W with v_{-1} = 0; the
                          final partial block's count is n mod 128 (derived,
                          not stored)
The byte-level identity of this payload with the external Go library is
unverified (the library isn't vendored in the reference and this machine
has no network); the container framing and everything around it IS the
reference's exact layout, and the payload codec is isolated behind
compress_*/uncompress_* so a fixture-driven correction stays local.
Self-round-trip is exhaustively tested, including the reference's
FuzzIntcomp32 corpus seeds (tests/test_gnark_cs.py).
"""

from __future__ import annotations

import struct

_BLOCK = 128


def _pack_block(vals, prev: int, width: int) -> list[int]:
    """One delta+binpack block over `vals` (word size `width` bits).
    Returns [header, packed words...]; header low byte = bit width."""
    mask = (1 << width) - 1
    deltas = []
    for v in vals:
        deltas.append((v - prev) & mask)
        prev = v
    b = max((d.bit_length() for d in deltas), default=0)
    header = b
    words = [header]
    if b == 0:
        return words
    acc = 0
    acc_bits = 0
    for d in deltas:
        acc |= d << acc_bits
        acc_bits += b
        while acc_bits >= width:
            words.append(acc & mask)
            acc >>= width
            acc_bits -= width
    if acc_bits:
        words.append(acc & mask)
    return words


def _unpack_block(words, off: int, count: int, prev: int, width: int):
    """Inverse of _pack_block. Returns (values, new_off, new_prev)."""
    mask = (1 << width) - 1
    b = words[off] & 0x7F
    off += 1
    if b > width:
        raise ValueError(f"intcomp: bad bit width {b} for u{width} block")
    vals = []
    if b == 0:
        for _ in range(count):
            vals.append(prev)
        return vals, off, prev
    n_words = (count * b + width - 1) // width
    acc = 0
    acc_bits = 0
    wi = off
    dmask = (1 << b) - 1
    for _ in range(count):
        while acc_bits < b:
            if wi >= off + n_words:
                raise ValueError("intcomp: truncated block")
            acc |= words[wi] << acc_bits
            wi += 1
            acc_bits += width
        prev = (prev + (acc & dmask)) & mask
        acc >>= b
        acc_bits -= b
        vals.append(prev)
    return vals, off + n_words, prev


def _compress(values, width: int) -> list[int]:
    words = [len(values)]
    prev = 0
    for lo in range(0, len(values), _BLOCK):
        blk = values[lo : lo + _BLOCK]
        words.extend(_pack_block(blk, prev, width))
        if blk:
            prev = blk[-1]
    return words


def _uncompress(words, width: int) -> list[int]:
    if not words:
        return []
    n = words[0]
    off = 1
    prev = 0
    out = []
    while len(out) < n:
        count = min(_BLOCK, n - len(out))
        vals, off, prev = _unpack_block(words, off, count, prev, width)
        out.extend(vals)
    return out


def compress_u32(values) -> list[int]:
    """[]uint32 -> compressed u32 words (≙ intcomp.CompressUint32)."""
    return _compress([v & 0xFFFFFFFF for v in values], 32)


def uncompress_u32(words) -> list[int]:
    return _uncompress(words, 32)


def compress_u64(values) -> list[int]:
    """[]uint64 -> compressed u64 words (≙ intcomp.CompressUint64)."""
    return _compress([v & 0xFFFFFFFFFFFFFFFF for v in values], 64)


def uncompress_u64(words) -> list[int]:
    return _uncompress(words, 64)


# -- container framing (ioutils.go byte layout) ------------------------------

def write_u32_stream(out: bytearray, values) -> None:
    """≙ ioutils.CompressAndWriteUints32: u64 word-count + LE u32 words."""
    words = compress_u32(values)
    out += struct.pack("<Q", len(words))
    out += struct.pack(f"<{len(words)}I", *words)


def read_u32_stream(buf: bytes, off: int):
    """≙ ioutils.ReadAndDecompressUints32. Returns (values, new_off)."""
    if len(buf) - off < 8:
        raise ValueError("intcomp: truncated u32 stream header")
    (n_words,) = struct.unpack_from("<Q", buf, off)
    off += 8
    if len(buf) - off < 4 * n_words:
        raise ValueError("intcomp: truncated u32 stream body")
    words = struct.unpack_from(f"<{n_words}I", buf, off)
    return uncompress_u32(list(words)), off + 4 * n_words


def write_u64_stream(out: bytearray, values) -> None:
    """≙ ioutils.CompressAndWriteUints64."""
    words = compress_u64(values)
    out += struct.pack("<Q", len(words))
    out += struct.pack(f"<{len(words)}Q", *words)


def read_u64_stream(buf: bytes, off: int):
    """≙ ioutils.ReadAndDecompressUints64. Returns (values, new_off)."""
    if len(buf) - off < 8:
        raise ValueError("intcomp: truncated u64 stream header")
    (n_words,) = struct.unpack_from("<Q", buf, off)
    off += 8
    if len(buf) - off < 8 * n_words:
        raise ValueError("intcomp: truncated u64 stream body")
    words = struct.unpack_from(f"<{n_words}Q", buf, off)
    return uncompress_u64(list(words)), off + 8 * n_words
