"""Non-native (emulated) modular arithmetic gadget.

Role parity: reference std/math/emulated (doc.go:1-60 — limb decomposition
with limb width w, multiplication checked through a quotient hint and a
carry-chain polynomial identity; emparams for secp256k1/P256/BN254Fp/…).
This is the round-1 core: Element limbs + range checks, add/sub/mul/reduce/
assert-equality through mulmod hints and bit-decomposed carry constraints.
gnark's later range-table/commit optimizations are a follow-up — counts here
are larger but the constraint system is sound and engine/solver-checked.

An emulated element is k limbs of w bits, value = Σ limbs[i]·2^(w·i), kept
reduced (< p) at op boundaries by construction (mul/reduce enforce it).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..constraint import hints as hintlib


@dataclass(frozen=True)
class EmulatedParams:
    name: str
    modulus: int
    limb_bits: int
    n_limbs: int

    def __post_init__(self):
        assert self.modulus < (1 << (self.limb_bits * self.n_limbs))


# ≙ emparams presets (std/math/emulated/emparams/emparams.go)
SECP256K1_FP = EmulatedParams(
    "secp256k1.fp",
    0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F,
    64, 4,
)
SECP256K1_FR = EmulatedParams(
    "secp256k1.fr",
    0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141,
    64, 4,
)
BN254_FP = EmulatedParams(
    "bn254.fp",
    21888242871839275222246405745257275088696311157297823662689037894645226208583,
    64, 4,
)
BN254_FR = EmulatedParams(
    "bn254.fr",
    21888242871839275222246405745257275088548364400416034343698204186575808495617,
    64, 4,
)
P256_FP = EmulatedParams(
    "p256.fp",
    0xFFFFFFFF00000001000000000000000000000000FFFFFFFFFFFFFFFFFFFFFFFF,
    64, 4,
)
P256_FR = EmulatedParams(
    "p256.fr",
    0xFFFFFFFF00000000FFFFFFFFFFFFFFFFBCE6FAADA7179E84F3B9CAC2FC632551,
    64, 4,
)


def _mulmod_hint(q, inputs):
    """inputs: [x0..k-1, y0..k-1] + static (k, w, p_limb0..k-1) appended —
    outputs the k+1 quotient limbs then k remainder limbs of x·y mod p."""
    k = (len(inputs) - 2) // 3
    assert int(inputs[2 * k]) == k, "mulmod hint layout mismatch"
    w = int(inputs[2 * k + 1])
    mask = (1 << w) - 1
    p = 0
    for i in range(k):
        p += int(inputs[2 * k + 2 + i]) << (w * i)
    x = 0
    y = 0
    for i in range(k):
        # += not |= : lazy (unreduced) limbs exceed w bits and overlap
        x += int(inputs[i]) << (w * i)
        y += int(inputs[k + i]) << (w * i)
    quo, rem = divmod(x * y, p)
    outs = []
    for i in range(k + 1):
        outs.append((quo >> (w * i)) & mask)
    for i in range(k):
        outs.append((rem >> (w * i)) & mask)
    return outs


MULMOD = hintlib.register_hint(_mulmod_hint, "emulated.mulmod")


def _invmod_hint(q, inputs):
    """inputs: [x0..k-1] + static (k, w, p_limb0..k-1) — limbs of x⁻¹ mod p
    (0 → 0, caught by the mul check)."""
    k = (len(inputs) - 2) // 2
    w = int(inputs[k + 1])
    mask = (1 << w) - 1
    p = 0
    for i in range(k):
        p += int(inputs[k + 2 + i]) << (w * i)
    x = 0
    for i in range(k):
        x += int(inputs[i]) << (w * i)
    x %= p
    inv = pow(x, -1, p) if x else 0
    return [(inv >> (w * i)) & mask for i in range(k)]


INVMOD = hintlib.register_hint(_invmod_hint, "emulated.invmod")


class Element:
    """k limb variables + a per-limb magnitude bound (python int)."""

    __slots__ = ("limbs", "bound")

    def __init__(self, limbs, bound: int):
        self.limbs = list(limbs)
        self.bound = bound  # every limb value is < bound


class EmulatedField:
    """Field ops over circuit variables (≙ emulated.Field[T])."""

    def __init__(self, api, params: EmulatedParams, native_modulus: int):
        self.api = api
        self.p = params.modulus
        self.w = params.limb_bits
        self.k = params.n_limbs
        self.q = native_modulus
        # native field must hold conv products + carries with slack
        assert 2 * params.limb_bits + 10 < native_modulus.bit_length()
        self.params = params

    # -- constructors -------------------------------------------------------
    def constant(self, value: int) -> Element:
        value %= self.p
        limbs = [
            (value >> (self.w * i)) & ((1 << self.w) - 1)
            for i in range(self.k)
        ]
        return Element(limbs, 1 << self.w)

    def from_limbs(self, limb_vars, canonical: bool = False) -> Element:
        """Witness limbs -> range-checked element.

        canonical=True additionally enforces value < p (≙ the reference's
        AssertIsInRange on witness elements); by default only per-limb
        width is enforced — arithmetic is sound for any bounded value since
        all relations hold mod p, but canonical=True pins the unique
        encoding (needed e.g. for signature components).
        """
        assert len(limb_vars) == self.k
        for v in limb_vars:
            self.api.to_binary(v, self.w)  # range check each limb
        e = Element(limb_vars, 1 << self.w)
        if canonical:
            self.assert_canonical(e)
        return e

    def assert_canonical(self, a: Element):
        """Enforce Σ aᵢ·2^(w·i) < p for width-bounded limbs, by big-endian
        lexicographic comparison against p's limbs (strictly-less borrow
        cascade; each limb comparison is one bounded decomposition)."""
        api = self.api
        from .math_cmp import BoundedComparator

        cmp = BoundedComparator(api, 1 << self.w)
        p_limbs = [
            (self.p >> (self.w * i)) & ((1 << self.w) - 1)
            for i in range(self.k)
        ]
        lt = 0   # strictly less established at a higher limb
        eq = 1   # all higher limbs equal so far
        for i in range(self.k - 1, -1, -1):
            li_less = cmp.is_less(a.limbs[i], p_limbs[i])
            li_eq = api.is_zero(api.sub(a.limbs[i], p_limbs[i]))
            lt = api.or_(lt, api.and_(eq, li_less))
            eq = api.and_(eq, li_eq)
        api.assert_is_equal(lt, 1)

    # -- linear ops (lazy, bound-tracked) -------------------------------------
    def add(self, a: Element, b: Element) -> Element:
        limbs = [self.api.add(x, y) for x, y in zip(a.limbs, b.limbs)]
        out = Element(limbs, a.bound + b.bound)
        if out.bound >= (1 << (self.w + 8)):
            return self.reduce(out)
        return out

    def sub(self, a: Element, b: Element) -> Element:
        """a − b + pad where pad ≡ 0 (mod p) and every pad limb ≥ b.bound —
        so limbs never go negative (≙ the reference's subPadding,
        emulated/field_ops.go)."""
        w, k = self.w, self.k
        T = 1 << b.bound.bit_length()  # per-limb floor ≥ b.bound
        base = sum(T << (w * i) for i in range(k))
        delta = (-base) % self.p
        assert delta < (1 << (w * k))
        pad = [
            T + ((delta >> (w * i)) & ((1 << w) - 1)) for i in range(k)
        ]
        limbs = [
            self.api.add(self.api.sub(x, y), pad[i])
            for i, (x, y) in enumerate(zip(a.limbs, b.limbs))
        ]
        out = Element(limbs, a.bound + T + (1 << w))
        if out.bound >= (1 << (w + 8)):
            return self.reduce(out)
        return out

    # -- multiplication / reduction -------------------------------------------
    def mul(self, a: Element, b: Element) -> Element:
        """x·y mod p via quotient hint + carry-checked limb identity."""
        api = self.api
        k, w = self.k, self.w
        # capacity guard: the k+1 quotient limbs hold quo < 2^(w(k+1)),
        # which needs bound_a*bound_b < 2^(3w-3); the lazy add threshold
        # (w+8 bits) keeps inputs far inside this
        assert a.bound * b.bound < (1 << (3 * w - 3)), "emulated bounds blown"
        assert a.bound * b.bound * k * 8 < self.q, "native overflow"

        p_limbs = [
            (self.p >> (w * i)) & ((1 << w) - 1) for i in range(k)
        ]
        outs = self._call_mulmod(a, b)
        quo = outs[: k + 1]
        rem = outs[k + 1 :]
        for v in quo:
            api.to_binary(v, w)
        for v in rem:
            api.to_binary(v, w)

        # identity: conv(a, b) == conv(quo, p) + rem  position-wise with
        # carries: Σ (lhs_i − rhs_i)·2^(wi) = 0
        n_pos = 2 * k + 1
        lhs = [0] * n_pos
        rhs = [0] * n_pos
        for i in range(k):
            for j in range(k):
                lhs[i + j] = api.add(lhs[i + j], api.mul(a.limbs[i], b.limbs[j]))
        for i in range(k + 1):
            for j in range(k):
                rhs[i + j] = api.add(
                    rhs[i + j], api.mul(quo[i], p_limbs[j])
                )
        for i in range(k):
            rhs[i] = api.add(rhs[i], rem[i])

        # carry chain: (lhs_i − rhs_i + carry) must be divisible by 2^w;
        # shift by a constant to stay non-negative before decomposing
        max_mag = (
            k * a.bound * b.bound + (k + 1) * (1 << (2 * w)) + (1 << w)
        )
        max_bits = max_mag.bit_length() + 2
        shift = ((1 << max_bits) >> w) << w  # ≡ 0 mod 2^w
        carry = 0
        for i in range(n_pos - 1):
            u = api.add(api.sub(lhs[i], rhs[i]), carry, shift)
            bits = api.to_binary(u, max_bits + 2)
            lo = api.from_binary(bits[:w])
            api.assert_is_equal(lo, 0)
            hi = api.from_binary(bits[w:])
            carry = api.sub(hi, shift >> w)
        api.assert_is_equal(api.add(api.sub(lhs[n_pos - 1], rhs[n_pos - 1]),
                                    carry), 0)
        return Element(rem, 1 << w)

    def _call_mulmod(self, a: Element, b: Element):
        api = self.api
        k, w = self.k, self.w
        const_args = [k, w] + [
            (self.p >> (w * i)) & ((1 << w) - 1) for i in range(k)
        ]
        return api.new_hint(
            MULMOD, 2 * k + 1, *a.limbs, *b.limbs,
            static_args=tuple(const_args),
        )

    def reduce(self, a: Element) -> Element:
        """a mod p (re-canonicalize after lazy adds) = mul(a, 1)."""
        return self.mul(a, self.constant(1))

    def neg(self, a: Element) -> Element:
        return self.sub(self.constant(0), a)

    def mul_small(self, a: Element, c: int) -> Element:
        """a·c for a small non-negative int constant — lazy limb scaling
        (≙ Field.MulConst)."""
        assert 0 <= c < (1 << 8)
        if c == 0:
            return self.constant(0)
        limbs = [self.api.mul(x, c) for x in a.limbs]
        out = Element(limbs, a.bound * c)
        if out.bound >= (1 << (self.w + 8)):
            return self.reduce(out)
        return out

    def select(self, cond, t: Element, f: Element) -> Element:
        """cond ? t : f, limb-wise (≙ emulated Field.Select)."""
        limbs = [
            self.api.select(cond, x, y) for x, y in zip(t.limbs, f.limbs)
        ]
        return Element(limbs, max(t.bound, f.bound))

    def inverse(self, a: Element) -> Element:
        """a⁻¹ mod p, proving a ≠ 0 (≙ Field.Inverse: hint + a·inv == 1)."""
        api = self.api
        k, w = self.k, self.w
        const_args = [k, w] + [
            (self.p >> (w * i)) & ((1 << w) - 1) for i in range(k)
        ]
        inv_limbs = api.new_hint(
            INVMOD, k, *a.limbs, static_args=tuple(const_args)
        )
        for v in inv_limbs:
            api.to_binary(v, w)
        inv = Element(inv_limbs, 1 << w)
        prod = self.mul(a, inv)  # canonical remainder
        one = self.constant(1)
        for x, c in zip(prod.limbs, one.limbs):
            api.assert_is_equal(x, c)
        return inv

    def div(self, a: Element, b: Element) -> Element:
        """a/b, proving b ≠ 0 (≙ Field.Div)."""
        return self.mul(a, self.inverse(b))

    def is_zero(self, a: Element):
        """Native boolean: 1 iff a ≡ 0 (mod p).

        The hint remainder from reduce() is only limb-width-bounded, so a
        malicious witness could encode 0 as p; assert_canonical pins the
        unique representative before the limb-wise zero test."""
        r = self.reduce(a)
        self.assert_canonical(r)
        z = self.api.is_zero(r.limbs[0])
        for limb in r.limbs[1:]:
            z = self.api.and_(z, self.api.is_zero(limb))
        return z

    def bits(self, a: Element):
        """k·w little-endian bits of the canonical value (≙ Field.ToBits).

        assert_canonical forces the unique (< p) decomposition — without it
        a prover could exhibit the +p alias of a small value."""
        r = self.reduce(a)
        self.assert_canonical(r)
        out = []
        for limb in r.limbs:
            out.extend(self.api.to_binary(limb, self.w))
        return out

    def from_native(self, v) -> Element:
        """Bind a NATIVE circuit variable to an emulated element of this
        field (≙ emulated.Field.NewElement over a frontend.Variable — the
        recursion verifiers' bridge from native public inputs to emulated
        scalars). Requires p ≥ q so every native value has a canonical
        representation; the full-width bit decomposition plus the canonical
        check pins the unique encoding (the +q alias of small values would
        fail assert_canonical when p == q, and cannot fit when p > q)."""
        assert self.p >= self.q, "native field does not embed in this field"
        api = self.api
        n = self.q.bit_length()
        bits = api.to_binary(v, n)
        bits = bits + [0] * (self.k * self.w - n)
        limbs = [
            api.from_binary(bits[i * self.w:(i + 1) * self.w])
            for i in range(self.k)
        ]
        e = Element(limbs, 1 << self.w)
        self.assert_canonical(e)
        return e

    def from_foreign(self, a: Element, other: "EmulatedField") -> Element:
        """Reinterpret another field's element (same limb layout) as a value
        mod this field's modulus — e.g. an Fp x-coordinate reduced mod the
        curve order for ECDSA (≙ the reference's x-mod-n step,
        std/signature/ecdsa/ecdsa.go Verify).

        The element is canonicalized in ITS OWN field first: lazy limbs are
        only congruent mod other.p, and congruence does not survive the
        change of modulus."""
        assert other.w == self.w and other.k == self.k
        a = other.reduce(a)
        return self.reduce(Element(list(a.limbs), a.bound))

    # -- predicates -------------------------------------------------------------
    def assert_equal(self, a: Element, b: Element):
        d = self.sub(a, b)
        d = self.reduce(d)
        for limb in d.limbs:
            self.api.assert_is_equal(limb, 0)

    def value_hint(self, a: Element) -> int:
        """Engine-side convenience (tests): collapse constant limbs."""
        total = 0
        for i, v in enumerate(a.limbs):
            total += int(v) << (self.w * i)
        return total % self.p
