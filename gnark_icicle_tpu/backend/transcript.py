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
