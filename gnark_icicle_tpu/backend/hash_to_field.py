"""RFC 9380 hash-to-field over the scalar field (SHA-256 based).

Role parity: gnark-crypto's ``fr.Hash`` / ``hash_to_field`` package as used
by the Groth16 BSB22 commitment scheme (reference:
backend/groth16/bn254/prove.go:66-68 ``hash_to_field.New([]byte(
constraint.CommitmentDst))`` and verify.go:54-56) — expand_message_xmd with
SHA-256, L = 16 + field bytes per element, output reduced mod r.

The default DST is gnark's ``constraint.CommitmentDst`` = "bsb22-commitment"
(reference: constraint/commitment.go:7); the PoK-folding challenge uses
"G16-BSB22" (prove.go:133).
"""

from __future__ import annotations

import hashlib

COMMITMENT_DST = b"bsb22-commitment"
G16_FOLD_DST = b"G16-BSB22"


def expand_message_xmd(msg: bytes, dst: bytes, len_in_bytes: int) -> bytes:
    """RFC 9380 §5.3.1 expand_message_xmd with SHA-256."""
    h = hashlib.sha256
    b_in_bytes = 32
    r_in_bytes = 64  # sha256 block size
    ell = -(-len_in_bytes // b_in_bytes)
    if ell > 255 or len_in_bytes > 65535 or len(dst) > 255:
        raise ValueError("expand_message_xmd: parameters out of range")
    dst_prime = dst + bytes([len(dst)])
    z_pad = bytes(r_in_bytes)
    l_i_b_str = len_in_bytes.to_bytes(2, "big")
    b0 = h(z_pad + msg + l_i_b_str + b"\x00" + dst_prime).digest()
    b1 = h(b0 + b"\x01" + dst_prime).digest()
    uniform = b1
    prev = b1
    for i in range(2, ell + 1):
        prev = h(bytes(x ^ y for x, y in zip(b0, prev))
                 + bytes([i]) + dst_prime).digest()
        uniform += prev
    return uniform[:len_in_bytes]


def hash_to_fr(msg: bytes, dst: bytes, modulus: int, count: int = 1) -> list:
    """count field elements from msg (≙ gnark-crypto fr.Hash).

    L = 16 + ceil(bits/8) bytes per element (128-bit security margin),
    big-endian interpreted and reduced mod the field modulus.
    """
    nb = (modulus.bit_length() + 7) // 8
    L = 16 + nb
    uniform = expand_message_xmd(msg, dst, count * L)
    return [
        int.from_bytes(uniform[i * L:(i + 1) * L], "big") % modulus
        for i in range(count)
    ]


def serialize_commitment(point_bytes: bytes, public_committed: list,
                         field_byte_len: int) -> bytes:
    """point marshal ‖ committed public values, fixed-width big-endian
    (≙ constraint.SerializeCommitment, constraint/commitment.go:77-89)."""
    out = bytearray(point_bytes)
    for v in public_committed:
        out += int(v).to_bytes(field_byte_len, "big")
    return bytes(out)
