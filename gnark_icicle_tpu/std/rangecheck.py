"""Range checks via lookup tables (the commit-based variant).

Role parity: reference std/rangecheck (rangecheck_commit.go — decompose into
base-2^b limbs, one shared [0, 2^b) lookup table per circuit, shifted lookup
for the partial top limb; picked over bit decomposition when the builder
supports commitments, frontend/builder.go:94-101 Rangechecker). Cost is
amortized O(bits/b) per check vs O(bits) booleans.
"""

from __future__ import annotations

from ..constraint import hints as hintlib
from .logderivlookup import Table


def _decompose_hint(q, inputs):
    """[v, base_bits, k] -> k base-2^b limbs, little-endian."""
    v = inputs[0] % q
    b = int(inputs[1])
    k = int(inputs[2])
    mask = (1 << b) - 1
    return [(v >> (b * i)) & mask for i in range(k)]


DECOMPOSE = hintlib.register_hint(_decompose_hint, "rangecheck.decompose")


class RangeChecker:
    """Shared per-circuit checker (≙ rangecheck.New); construct once in
    define() and call check() for every bounded value."""

    def __init__(self, api, base_bits: int = 8):
        self.api = api
        self.b = base_bits
        self.table = Table(api)
        for i in range(1 << base_bits):
            self.table.insert(i)

    def check(self, v, bits: int) -> None:
        """Constrain 0 ≤ v < 2^bits (≙ Rangechecker.Check)."""
        api = self.api
        b = self.b
        if bits <= 0:
            api.assert_is_equal(v, 0)
            return
        k = (bits + b - 1) // b
        limbs = api.new_hint(DECOMPOSE, k, v, b, k)
        for i, limb in enumerate(limbs):
            self.table.lookup(limb)  # proves limb ∈ [0, 2^b)
            top_bits = bits - b * i
            if i == k - 1 and top_bits < b:
                # partial top limb: limb·2^(b−top) must also be in range ⇒
                # limb < 2^top (≙ the reference's shifted lookup)
                self.table.lookup(api.mul(limb, 1 << (b - top_bits)))
        acc = 0
        for i, limb in enumerate(limbs):
            acc = api.add(acc, api.mul(limb, 1 << (b * i)))
        api.assert_is_equal(acc, v)
