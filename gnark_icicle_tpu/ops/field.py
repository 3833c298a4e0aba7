"""Batched prime-field arithmetic over 16-bit limbs (device, jnp).

This is the bedrock layer — the TPU equivalent of gnark-crypto's amd64
assembly Montgomery arithmetic (reference: README.md:66-68) and of ICICLE's
CUDA field kernels (SURVEY.md §2.3). Design:

* A field element is a little-endian vector of K 16-bit limbs stored in an
  ``int32`` array of shape ``(..., K)`` (K = 16 for 254/255-bit fields,
  24 for BLS12-381 Fp). 16-bit limbs are chosen because the TPU VPU has
  native 32-bit integer multiply: a 16x16 product is exact in uint32, and
  column sums of up to ~2K such half-products stay below 2^23 « 2^31, so
  no 64-bit emulation is ever needed.
* Elements are kept in Montgomery form (R = 2^(16K)) and canonical (< p)
  at op boundaries.
* All ops are elementwise over the leading batch axes — the batch dimension
  is the vector lane dimension; XLA fuses the unrolled limb loops into VPU
  code. A fused Pallas version for the hottest call sites lives in
  ``field_pallas.py``; it is bit-identical to this module.

No data-dependent control flow: everything is select/mask based, so the whole
module traces under jit/shard_map/vmap.
"""

from __future__ import annotations

import functools
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

I32 = jnp.int32
U32 = jnp.uint32
MASK16 = 0xFFFF


# ---------------------------------------------------------------------------
# host <-> limb conversions (numpy, not traced)
# ---------------------------------------------------------------------------

def int_to_limbs(x: int, n_limbs: int) -> np.ndarray:
    """Python int -> little-endian 16-bit limbs (int32 numpy)."""
    out = np.zeros(n_limbs, dtype=np.int32)
    for i in range(n_limbs):
        out[i] = (x >> (16 * i)) & MASK16
    if x >> (16 * n_limbs):
        raise ValueError(f"{x} does not fit in {n_limbs} 16-bit limbs")
    return out


def ints_to_limbs(xs, n_limbs: int) -> np.ndarray:
    """Iterable of Python ints -> (N, n_limbs) int32 numpy array.

    Hot on the PK-staging path (millions of point coordinates per prove):
    one C-level ``int.to_bytes`` per value + a single ``np.frombuffer``
    instead of K object-array passes (~30x).
    """
    xs = [int(x) for x in xs]
    nbytes = 2 * n_limbs
    try:
        buf = b"".join(x.to_bytes(nbytes, "little") for x in xs)
    except OverflowError as e:  # negative or does not fit in K limbs
        raise ValueError(f"value does not fit in {n_limbs} 16-bit limbs") from e
    arr = np.frombuffer(buf, dtype="<u2").reshape(len(xs), n_limbs)
    return arr.astype(np.int32)


def limbs_to_int(limbs) -> int:
    limbs = np.asarray(limbs)
    x = 0
    for i in range(limbs.shape[-1] - 1, -1, -1):
        x = (x << 16) | int(limbs[..., i])
    return x


def limbs_to_ints(arr) -> list:
    arr = np.asarray(arr)
    flat = arr.reshape(-1, arr.shape[-1])
    if (flat.dtype.kind in "iu" and flat.size
            and flat.min() >= 0 and flat.max() < (1 << 16)):
        # vectorized inverse of ints_to_limbs: one from_bytes per row
        rows = np.ascontiguousarray(flat.astype("<u2")).tobytes()
        nb = 2 * flat.shape[-1]
        return [
            int.from_bytes(rows[i : i + nb], "little")
            for i in range(0, len(rows), nb)
        ]
    return [limbs_to_int(row) for row in flat]


# ---------------------------------------------------------------------------
# the field
# ---------------------------------------------------------------------------

class LimbField:
    """Montgomery arithmetic over K 16-bit limbs for a fixed odd prime p.

    One instance per (field, limb-count); instances are pure parameter
    holders — all methods are stateless functions of jnp arrays and are safe
    to call inside jit/shard_map/pallas traces.
    """

    _cache: dict = {}

    def __new__(cls, modulus: int, n_limbs: int | None = None):
        key = (modulus, n_limbs)
        if key in cls._cache:
            return cls._cache[key]
        self = super().__new__(cls)
        cls._cache[key] = self
        return self

    def __init__(self, modulus: int, n_limbs: int | None = None):
        if getattr(self, "_initialized", False):
            return
        self._initialized = True
        bits = modulus.bit_length()
        if n_limbs is None:
            # need 2p < 2^(16K): one spare bit in the top limb
            n_limbs = -(-(bits + 1) // 16)
        self.modulus = modulus
        self.K = n_limbs
        self.R = 1 << (16 * n_limbs)
        if self.R <= 2 * modulus:
            raise ValueError("R must exceed 2p")
        self.R2 = self.R * self.R % modulus
        # -p^-1 mod 2^16 (digit-serial Montgomery constant)
        self.inv16 = (-pow(modulus, -1, 1 << 16)) % (1 << 16)

        # full-width Montgomery constant: N' = -p^-1 mod R  (separated REDC)
        self.nprime = (-pow(modulus, -1, self.R)) % self.R
        self.nprime_limbs_u = jnp.asarray(
            int_to_limbs(self.nprime, n_limbs), dtype=U32
        )

        self.p_np = int_to_limbs(modulus, n_limbs)
        self.p_limbs = jnp.asarray(self.p_np, dtype=I32)
        self.p_limbs_u = jnp.asarray(self.p_np, dtype=U32)
        self.r2_limbs = jnp.asarray(int_to_limbs(self.R2, n_limbs), dtype=I32)
        self.one_mont_np = int_to_limbs(self.R % modulus, n_limbs)
        self.one_mont = jnp.asarray(self.one_mont_np, dtype=I32)
        self.zero_np = np.zeros(n_limbs, dtype=np.int32)

    # -- constructors ------------------------------------------------------
    def zeros(self, batch_shape=()):
        return jnp.zeros(tuple(batch_shape) + (self.K,), dtype=I32)

    def ones_mont(self, batch_shape=()):
        return jnp.broadcast_to(self.one_mont, tuple(batch_shape) + (self.K,))

    def const(self, value: int, batch_shape=()):
        """Montgomery-form constant broadcast to a batch shape."""
        m = value % self.modulus * self.R % self.modulus
        arr = jnp.asarray(int_to_limbs(m, self.K), dtype=I32)
        return jnp.broadcast_to(arr, tuple(batch_shape) + (self.K,))

    # -- host encode/decode (numpy) ---------------------------------------
    def encode(self, xs) -> np.ndarray:
        """Python ints -> Montgomery-form limb array (N, K)."""
        m = [int(x) % self.modulus * self.R % self.modulus for x in xs]
        return ints_to_limbs(m, self.K)

    def decode(self, arr) -> list:
        """Montgomery-form limb array -> Python ints."""
        rinv = pow(self.R, -1, self.modulus)
        return [v * rinv % self.modulus for v in limbs_to_ints(np.asarray(arr))]

    def encode_plain(self, xs) -> np.ndarray:
        """Python ints -> plain (non-Montgomery) limb array."""
        return ints_to_limbs([int(x) % self.modulus for x in xs], self.K)

    def decode_plain(self, arr) -> list:
        return limbs_to_ints(np.asarray(arr))

    # -- ring ops ----------------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def add(self, a, b):
        # a,b < p  =>  sum < 2p < 2^(16K): top carry is 0
        return self._cond_sub_p_arr(self._carry_scan(a + b))

    @partial(jax.jit, static_argnums=0)
    def sub(self, a, b):
        return self._cond_sub_p_arr(self._carry_scan(a - b + self.p_limbs))

    @partial(jax.jit, static_argnums=0)
    def neg(self, a):
        return self._cond_sub_p_arr(self._carry_scan(self.p_limbs - a))

    def double(self, a):
        return self.add(a, a)

    # -- wide product / carry plumbing (array form) ------------------------
    def _wide_mul_cols(self, au, bu, out_cols: int):
        """Column-form product of two K-limb u32 arrays.

        Returns (..., out_cols) int32 columns (uncarried, each < 2K·2^16):
        column c holds Σ_{i+j=c} lo(a_i b_j) + Σ_{i+j=c-1} hi(a_i b_j).
        The (..., K, K) half-products are built once and combined with K
        static pads + one sum — ~4K HLO ops instead of K² scatter-adds, which
        keeps XLA compile time sane (the hot path repeats this thousands of
        times inside provers).
        """
        K = self.K
        prod = au[..., :, None] * bu[..., None, :]  # (..., K, K) u32 exact
        lo = (prod & MASK16).astype(I32)
        hi = (prod >> 16).astype(I32)
        rows = []
        for i in range(K):
            # row i contributes lo at offset i, hi at offset i+1
            r = jnp.pad(lo[..., i, :], [(0, 0)] * (lo.ndim - 2) + [(i, out_cols - K - i)])
            r = r + jnp.pad(
                hi[..., i, :], [(0, 0)] * (hi.ndim - 2) + [(i + 1, out_cols - K - i - 1)]
            )
            rows.append(r)
        return sum(rows)

    def _carry_scan(self, cols, drop_low: int = 0):
        """Carry-propagate (..., C) int32 columns via lax.scan.

        Returns (..., C - drop_low) canonical 16-bit limbs; the first
        ``drop_low`` columns are consumed into the carry only (used for the
        REDC divide-by-R step). Final carry out is discarded (callers
        guarantee the value fits).
        """
        C = cols.shape[-1]
        xs = jnp.moveaxis(cols, -1, 0)  # (C, ...)

        def body(carry, c):
            v = c + carry
            return v >> 16, v & MASK16

        carry0 = jnp.zeros_like(xs[0])
        if drop_low:
            def body_drop(carry, c):
                return (c + carry) >> 16, None

            carry0, _ = jax.lax.scan(body_drop, carry0, xs[:drop_low])
        _, limbs = jax.lax.scan(body, carry0, xs[drop_low:])
        return jnp.moveaxis(limbs, 0, -1)

    def _cond_sub_p_arr(self, t):
        """Canonical-limb (..., K) array of a value < 2p -> mod p."""
        d_cols = t - self.p_limbs
        xs = jnp.moveaxis(d_cols, -1, 0)

        def body(borrow, c):
            v = c + borrow
            return v >> 16, v & MASK16

        borrow, d = jax.lax.scan(body, jnp.zeros_like(xs[0]), xs)
        d = jnp.moveaxis(d, 0, -1)
        return jnp.where((borrow == 0)[..., None], d, t)

    # -- Montgomery multiply ----------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def mont_mul(self, a, b):
        """Montgomery product a·b·R⁻¹ mod p (separated REDC).

        T = a·b;  m = (T mod R)·N' mod R;  res = (T + m·p) / R;  res < 2p.
        All three wide products are the vectorized column form; the three
        carry chains are lax.scan — the whole op is ~10² HLO ops regardless
        of K, and fuses to pure VPU code on TPU.
        """
        K = self.K
        au = a.astype(U32)
        bu = b.astype(U32)
        t_cols = self._wide_mul_cols(au, bu, 2 * K + 1)
        t = self._carry_scan(t_cols)  # (..., 2K+1) canonical; top col absorbs carry
        m_cols = self._wide_mul_cols(t[..., :K].astype(U32), self.nprime_limbs_u, 2 * K + 1)
        m = self._carry_scan(m_cols)[..., :K]  # mod R
        u_cols = self._wide_mul_cols(m.astype(U32), self.p_limbs_u, 2 * K + 1)
        s = t + u_cols  # (..., 2K+1); columns < 2^17ish
        res = self._carry_scan(s, drop_low=K)[..., :K]
        return self._cond_sub_p_arr(res)

    @partial(jax.jit, static_argnums=0)
    def mont_sqr(self, a):
        return self.mont_mul(a, a)

    @partial(jax.jit, static_argnums=0)
    def to_mont(self, x):
        return self.mont_mul(x, jnp.broadcast_to(self.r2_limbs, x.shape))

    @partial(jax.jit, static_argnums=0)
    def from_mont(self, x):
        one = jnp.zeros_like(x).at[..., 0].set(1)
        return self.mont_mul(x, one)

    # -- exponentiation / inversion ---------------------------------------
    @partial(jax.jit, static_argnums=(0, 2))
    def mont_pow(self, a, e: int):
        """a^e (Montgomery form), fixed public exponent.

        Small exponents unroll; large ones run as a lax.scan over the bit
        string so the traced graph stays O(1) in the exponent size (the
        unrolled graph for a 254-bit exponent would be ~1e5 HLO ops).
        """
        if e < (1 << 8):
            result = self.ones_mont(a.shape[:-1])
            base = a
            while e:
                if e & 1:
                    result = self.mont_mul(result, base)
                e >>= 1
                if e:
                    base = self.mont_sqr(base)
            return result

        nbits = e.bit_length()
        bits = jnp.asarray(
            np.array([(e >> i) & 1 for i in range(nbits)], dtype=np.bool_)
        )

        def body(carry, bit):
            result, base = carry
            result = self.select(
                jnp.broadcast_to(bit, result.shape[:-1]),
                self.mont_mul(result, base),
                result,
            )
            base = self.mont_sqr(base)
            return (result, base), None

        init = (self.ones_mont(a.shape[:-1]).astype(I32), a)
        (result, _), _ = jax.lax.scan(body, init, bits)
        return result

    @partial(jax.jit, static_argnums=0)
    def mont_inv(self, a):
        """Batched inversion via Fermat: a^(p-2). 0 maps to 0."""
        return self.mont_pow(a, self.modulus - 2)

    # -- predicates --------------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def is_zero(self, a):
        return jnp.all(a == 0, axis=-1)

    @partial(jax.jit, static_argnums=0)
    def eq(self, a, b):
        return jnp.all(a == b, axis=-1)

    def select(self, mask, a, b):
        """mask ? a : b   (mask shape = batch shape)."""
        return jnp.where(mask[..., None], a, b)


@functools.lru_cache(maxsize=None)
def field_for(modulus: int, n_limbs: int | None = None) -> LimbField:
    return LimbField(modulus, n_limbs)
