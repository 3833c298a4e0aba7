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
    """Iterable of Python ints -> (N, n_limbs) int32 numpy array."""
    xs = list(xs)
    out = np.zeros((len(xs), n_limbs), dtype=np.int64)
    rem = np.array([int(x) for x in xs], dtype=object)
    for i in range(n_limbs):
        out[:, i] = np.array([int(r & MASK16) for r in rem], dtype=np.int64)
        rem = rem >> 16
    if any(int(r) != 0 for r in rem):
        raise ValueError("value does not fit in limbs")
    return out.astype(np.int32)


def limbs_to_int(limbs) -> int:
    limbs = np.asarray(limbs)
    x = 0
    for i in range(limbs.shape[-1] - 1, -1, -1):
        x = (x << 16) | int(limbs[..., i])
    return x


def limbs_to_ints(arr) -> list:
    arr = np.asarray(arr)
    flat = arr.reshape(-1, arr.shape[-1])
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

    # -- limb plumbing -----------------------------------------------------
    def _carry(self, cols):
        """Propagate carries over a list of (...,) int32 columns.

        Accepts signed columns (borrows propagate via arithmetic shift).
        Returns (limbs list canonicalized to 16 bits, final carry).
        """
        out = []
        carry = None
        for c in cols:
            v = c if carry is None else c + carry
            carry = v >> 16
            out.append(v & MASK16)
        return out, carry

    def _stack(self, cols):
        return jnp.stack(cols, axis=-1)

    def _cond_sub_p(self, limbs_cols):
        """Given canonical-limb columns of a value < 2p, reduce mod p."""
        d_cols = [limbs_cols[i] - int(self.p_np[i]) for i in range(self.K)]
        d, borrow = self._carry(d_cols)
        t = self._stack(limbs_cols)
        d = self._stack(d)
        ge_p = (borrow == 0)[..., None]
        return jnp.where(ge_p, d, t)

    # -- ring ops ----------------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def add(self, a, b):
        cols = [a[..., i] + b[..., i] for i in range(self.K)]
        limbs, carry = self._carry(cols)
        # a,b < p  =>  sum < 2p < 2^(16K): carry is 0
        return self._cond_sub_p(limbs)

    @partial(jax.jit, static_argnums=0)
    def sub(self, a, b):
        cols = [a[..., i] - b[..., i] + int(self.p_np[i]) for i in range(self.K)]
        limbs, carry = self._carry(cols)
        return self._cond_sub_p(limbs)

    @partial(jax.jit, static_argnums=0)
    def neg(self, a):
        cols = [int(self.p_np[i]) - a[..., i] for i in range(self.K)]
        limbs, carry = self._carry(cols)
        return self._cond_sub_p(limbs)

    def double(self, a):
        return self.add(a, a)

    # -- Montgomery multiply ----------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def mont_mul(self, a, b):
        """Montgomery product: a*b*R^-1 mod p. a, b canonical Montgomery form."""
        K = self.K
        au = a.astype(U32)
        bu = b.astype(U32)
        ncols = 2 * K + 1
        cols = [None] * ncols

        def acc(idx, val):
            cols[idx] = val if cols[idx] is None else cols[idx] + val

        # schoolbook product, half-word split so every column stays « 2^31
        for i in range(K):
            prod = au[..., i : i + 1] * bu  # (..., K) u32 exact
            lo = (prod & MASK16).astype(I32)
            hi = (prod >> 16).astype(I32)
            for j in range(K):
                acc(i + j, lo[..., j])
                acc(i + j + 1, hi[..., j])
        zeros = jnp.zeros_like(cols[0])
        cols = [c if c is not None else zeros for c in cols]

        # digit-serial Montgomery reduction, 16-bit digits
        inv16 = np.uint32(self.inv16)
        for i in range(K):
            m = (cols[i].astype(U32) * inv16) & MASK16  # mod 2^16: wrap-safe
            prod = m[..., None] * self.p_limbs_u  # (..., K) u32 exact
            lo = (prod & MASK16).astype(I32)
            hi = (prod >> 16).astype(I32)
            for j in range(K):
                cols[i + j] = cols[i + j] + lo[..., j]
                cols[i + j + 1] = cols[i + j + 1] + hi[..., j]
            # column i is ≡ 0 mod 2^16 now; push its carry up and drop it
            cols[i + 1] = cols[i + 1] + (cols[i] >> 16)

        # fold the 2K-th column in before propagating: the result (ab+mN)/R is
        # < 2p < 2^(16K), so after carry propagation nothing escapes limb K-1
        limbs, _ = self._carry(cols[K : 2 * K - 1] + [cols[2 * K - 1] + (cols[2 * K] << 16)])
        return self._cond_sub_p(limbs)

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
