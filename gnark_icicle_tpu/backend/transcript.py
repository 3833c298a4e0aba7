"""Fiat-Shamir transcript (SHA-256 based).

Role parity: gnark-crypto's fiat-shamir transcript as driven by the PLONK
prover (reference: backend/plonk/bn254/prove.go:229 deriveRandomness with
named challenges gamma/beta/alpha/zeta). Same structure — named challenges,
each binding all prior absorptions and the previous challenge; byte-format
compatibility with gnark transcripts is a later milestone (this transcript is
self-consistent between our prover and verifier).
"""

from __future__ import annotations

import hashlib


class Transcript:
    def __init__(self, modulus: int, label: bytes = b"plonk"):
        self.q = modulus
        self._state = hashlib.sha256(label).digest()

    def absorb(self, data: bytes):
        self._state = hashlib.sha256(self._state + data).digest()

    def absorb_point(self, curve, pt):
        from ..io.serialize import g1_to_bytes

        self.absorb(g1_to_bytes(curve, pt, compressed=True))

    def absorb_fr(self, v: int):
        self.absorb(int(v % self.q).to_bytes(32, "big"))

    def challenge(self, name: bytes) -> int:
        self._state = hashlib.sha256(self._state + name).digest()
        # two squeezes for negligible mod-bias
        wide = self._state + hashlib.sha256(self._state + b"+").digest()
        return int.from_bytes(wide, "big") % self.q


def make_transcript(modulus: int, fs_hash: str = "sha256"):
    """Transcript factory: "sha256" (default, host-cheap) or "mimc"
    (Fr-friendly — what recursion provers use so the outer circuit can
    replay the challenges natively)."""
    if fs_hash == "sha256":
        return Transcript(modulus)
    if fs_hash == "mimc":
        return MiMCTranscript(modulus)
    raise ValueError(f"unknown fs_hash {fs_hash!r}")


FS_LIMB_BITS = 64  # must match std/emulated BN254_FP (w=64, k=4)


def point_limbs(curve, pt) -> list:
    """A G1 point as 8 field elements: 4 little-endian 64-bit limbs of each
    canonical affine coordinate (infinity → all zeros). This is exactly how
    the recursion verifier absorbs an emulated point witness — its reduced
    limb variables — so host and gadget transcripts agree."""
    if pt is None:
        return [0] * 8
    mask = (1 << FS_LIMB_BITS) - 1
    out = []
    for c in (pt[0], pt[1]):
        c = int(c)
        out.extend((c >> (FS_LIMB_BITS * i)) & mask for i in range(4))
    return out


class MiMCTranscript:
    """Fr-friendly Fiat-Shamir transcript (≙ the reference's
    recursion.NewShort(...) hash swap — std/recursion/wrapped_hash.go: the
    inner prover is re-instantiated with a hash the OUTER circuit can
    afford, so the recursion verifier replays challenges natively).

    Semantics mirror std/fiat_shamir.CircuitTranscript exactly: each named
    challenge is MiMC(name-tag, everything absorbed so far), and becomes
    part of the absorptions for later challenges. Points are absorbed as
    their canonical coordinate limbs (point_limbs)."""

    def __init__(self, modulus: int, label: bytes = b"plonk"):
        self.q = modulus
        self._absorbed: list = []

    def absorb(self, data: bytes):
        raise NotImplementedError("MiMC transcript absorbs field elements")

    def absorb_fr(self, v: int):
        self._absorbed.append(int(v) % self.q)

    def absorb_point(self, curve, pt):
        self._absorbed.extend(point_limbs(curve, pt))

    def challenge(self, name: bytes) -> int:
        from ..std.hash.mimc import MiMCHost

        tag = int.from_bytes(name, "big") % self.q
        h = MiMCHost(self.q)
        h.write(tag, *self._absorbed)
        c = h.h
        self._absorbed.append(c)
        return c
