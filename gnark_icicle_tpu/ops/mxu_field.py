"""Montgomery multiplication by constants on the MXU (prototype).

The step-change lever from ROADMAP.md #1: on TPU the systolic array does
int8×int8→int32 at ~hundreds of Tops while the VPU's 32-bit multiplies are
~100x slower. A Montgomery product has three wide limb products; when one
operand is a CONSTANT (NTT twiddles, and always the N'/p REDC factors), the
product is a matrix multiply by that constant's Toeplitz matrix:

    T[c] = Σ_{i+j=c} x_i·w_j  =  (x @ W_toep)[c],   W_toep[i, c] = w_{c-i}

With 8-bit limbs (K8 = 32 for 256-bit R) the inputs fit int8 exactly and the
int32 accumulator is exact (≤ 64 terms · 255² < 2²²). All three products of
mont_mul-by-constant ride the MXU; the carry chains stay on the VPU.

This module is layout-compatible with ops/field.py: inputs/outputs are the
standard (N, K) 16-bit-limb Montgomery arrays (same R = 2^(16K)); the 8-bit
split/merge is two cheap bitwise ops. Bit-exactness vs LimbField.mont_mul is
test-asserted; the batched-matrix variant (`mont_mul_const_batched`) powers
the NTT twiddle stages where each butterfly row has its own constant.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .field import LimbField, I32, MASK16, int_to_limbs

MASK8 = 0xFF


def _int_to_limbs8(x: int, k8: int) -> np.ndarray:
    out = np.zeros(k8, dtype=np.int32)
    for i in range(k8):
        out[i] = (x >> (8 * i)) & MASK8
    assert x >> (8 * k8) == 0
    return out


def _toeplitz8(w: int, k8: int) -> np.ndarray:
    """(K8, 2·K8) int8-valued matrix: T[i, c] = w_limb[c − i]."""
    limbs = _int_to_limbs8(w, k8)
    m = np.zeros((k8, 2 * k8), dtype=np.int8)
    for i in range(k8):
        m[i, i : i + k8] = limbs.astype(np.int8)  # values ≤ 255 → stored
    # int8 stores -128..127; reinterpret upper values via uint8 bit pattern
    return limbs, m


def _toeplitz_u8(w: int, k8: int) -> np.ndarray:
    """(K8, 2·K8) matrix of limb VALUES (0..255) as int32 for exact dots;
    cast to the MXU-friendly dtype at use site."""
    limbs = _int_to_limbs8(w, k8)
    m = np.zeros((k8, 2 * k8), dtype=np.int32)
    for i in range(k8):
        m[i, i : i + k8] = limbs
    return m


class MXUConstMul:
    """mont_mul(x, w) for fixed w, products on the MXU.

    One instance per (field, constant-set). For a single constant use
    ``mul``; for a table of constants (twiddles) use ``mul_batched`` with
    x grouped per constant.
    """

    _cache: dict = {}

    def __new__(cls, F: LimbField):
        if F.modulus in cls._cache:
            return cls._cache[F.modulus]
        self = super().__new__(cls)
        cls._cache[F.modulus] = self
        return self

    def __init__(self, F: LimbField):
        if getattr(self, "_initialized", False):
            return
        self._initialized = True
        self.F = F
        self.K = F.K
        self.K8 = 2 * F.K
        # REDC constants as Toeplitz matrices (shared by every mul)
        self.np_toep = jnp.asarray(
            _toeplitz_u8(F.nprime, self.K8)[:, : self.K8]  # mod R: low cols
        )
        self.p_toep = jnp.asarray(_toeplitz_u8(F.modulus, self.K8))

    # -- limb width conversion ------------------------------------------------
    def split8(self, x16):
        """(N, K) 16-bit limbs -> (N, 2K) 8-bit limbs."""
        lo = x16 & MASK8
        hi = (x16 >> 8) & MASK8
        return jnp.stack([lo, hi], axis=-1).reshape(*x16.shape[:-1], self.K8)

    def merge16(self, x8):
        """(N, 2K) 8-bit limbs -> (N, K) 16-bit limbs."""
        v = x8.reshape(*x8.shape[:-1], self.K, 2)
        return v[..., 0] + (v[..., 1] << 8)

    # -- lazy carries (VPU, O(1) rounds instead of 2K8-step scans) ------------
    def _relax(self, cols, rounds: int, extra_cols: int = 0):
        """Value-preserving carry relaxation: r rounds of
        limb → (limb & 255) + carry-into-next shrink the per-limb bound
        b → 255 + b/256 without a sequential scan. Unlike an exact carry
        chain this leaves limbs ≤ 257-ish, which is all the fp32 MXU dots
        need (exactness only requires partial sums < 2²⁴)."""
        if extra_cols:
            cols = jnp.pad(
                cols, [(0, 0)] * (cols.ndim - 1) + [(0, extra_cols)]
            )
        v = cols
        for _ in range(rounds):
            lo = v & MASK8
            c = v >> 8
            v = lo + jnp.pad(
                c, [(0, 0)] * (v.ndim - 1) + [(1, 0)]
            )[..., : v.shape[-1]]
        return v

    def _finalize(self, s):
        """(..., 2K8+1) lazy REDC sum (divisible by R) -> canonical (..., K)
        16-bit limbs of sum/R mod p.

        After relaxation to limbs ≤ 257 the low half's value V_lo < 1.01·R;
        since V_lo ≡ 0 (mod R) and limbs are non-negative, V_lo ∈ {0, R} —
        so the carry into the high half is simply "any low limb nonzero".
        The high half then needs only one K-step 16-bit exact scan.
        """
        K8 = self.K8
        s = self._relax(s, 3)  # limbs ≤ 257
        carry = jnp.any(s[..., :K8] != 0, axis=-1).astype(I32)
        hi = s[..., K8:]  # (..., K8+1); top limb provably 0 (value < R)
        pairs = hi[..., : K8].reshape(*hi.shape[:-1], self.K, 2)
        cols16 = pairs[..., 0] + (pairs[..., 1] << 8)  # ≤ 257·257 < 2^17
        cols16 = cols16.at[..., 0].add(carry)
        res16 = self.F._carry_scan(cols16)
        return self.F._cond_sub_p_arr(res16)

    # -- the MXU path -----------------------------------------------------------
    def _dot(self, x8, table):
        """Exact integer product on the MXU: (..., K8) @ (K8, C) -> int32."""
        return jax.lax.dot_general(
            x8.astype(jnp.int8) if False else x8.astype(jnp.float32),
            table.astype(jnp.float32),
            dimension_numbers=(((x8.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)

    @partial(jax.jit, static_argnums=0)
    def mul_const(self, x16, w_toep):
        """mont_mul(x, w) with w's (K8, 2K8) Toeplitz table (int32 values).

        x16: (N, K) canonical 16-bit Montgomery limbs. Returns (N, K).
        All carries are O(1) relaxation rounds; the only sequential chain is
        one final K-step 16-bit scan (vs three 2K8-step 8-bit scans before).
        Bound audit (BN254/BLS12-381 fr, K8 = 32): dot inputs ≤ 256
        (bf16-exact on the MXU), columns ≤ 32·256·255 < 2²⁴ (fp32-exact
        accumulation); m_val < 1.004·R so res < p·(p/R + 1.004) < 2p — one
        conditional subtraction.
        """
        x8 = self.split8(x16)
        t_cols = self._dot(x8, w_toep)  # (N, 2K8) uncarried ≤ 2^21
        # 3 rounds: bound 2^21 → 8447 → 288 → 256. MXU dot INPUTS must stay
        # ≤ 256: the TPU's default-precision matmul feeds bf16 (8-bit
        # mantissa), exact only up to 2^8 — 288-valued limbs silently round
        # (caught by the bench's host verification).
        t = self._relax(t_cols, 3, extra_cols=1)  # (N, 2K8+1), limbs ≤ 256
        m_cols = self._dot(t[..., : self.K8], self.np_toep)  # (N, K8)
        m8 = self._relax(m_cols, 3)  # limbs ≤ 256 → m_val < 1.004·R
        u_cols = self._dot(m8, self.p_toep)  # (N, 2K8)
        s = t + jnp.pad(u_cols, [(0, 0)] * (u_cols.ndim - 1) + [(0, 1)])
        return self._finalize(s)

    def toeplitz_for(self, w_mont: int):
        """Host: Montgomery-form constant -> device Toeplitz table."""
        return jnp.asarray(_toeplitz_u8(w_mont, self.K8))

    @partial(jax.jit, static_argnums=0)
    def mul_const_batched(self, x16, w_toeps):
        """Per-group constants: x16 (G, B, K) × w_toeps (G, K8, 2K8).

        The NTT stage shape: G = butterfly positions (each with its own
        twiddle), B = rows sharing that twiddle. One batched MXU matmul;
        carries as in mul_const (relaxation + one 16-bit scan).
        """
        x8 = self.split8(x16)  # (G, B, K8)
        t_cols = jax.lax.dot_general(
            x8.astype(jnp.float32), w_toeps.astype(jnp.float32),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)  # (G, B, 2K8)
        t = self._relax(t_cols, 3, extra_cols=1)
        m_cols = self._dot(t[..., : self.K8], self.np_toep)
        m8 = self._relax(m_cols, 3)
        u_cols = self._dot(m8, self.p_toep)
        s = t + jnp.pad(u_cols, [(0, 0)] * (u_cols.ndim - 1) + [(0, 1)])
        return self._finalize(s)


class MXURedcMul:
    """Variable×variable mont_mul with the REDC half on the MXU.

    The t = x·y product is data-dependent (stays on the VPU as the 16-bit
    column schoolbook, K² int32 muls), but both REDC products are by the
    CONSTANTS N' and p — Toeplitz matmuls shared across every lane. Replaces
    2/3 of mont_mul's VPU integer multiplies with systolic-array work
    (ROADMAP #1 "REDC-only variant").
    """

    _cache: dict = {}

    def __new__(cls, F: LimbField):
        key = ("redc", F.modulus)
        if key in cls._cache:
            return cls._cache[key]
        self = super().__new__(cls)
        cls._cache[key] = self
        return self

    def __init__(self, F: LimbField):
        if getattr(self, "_initialized", False):
            return
        self._initialized = True
        self.F = F
        self.M = MXUConstMul(F)
        self.K8 = self.M.K8

    def _relax16(self, cols, rounds: int, extra_cols: int = 0):
        """16-bit-granularity carry relaxation (same idea as _relax)."""
        if extra_cols:
            cols = jnp.pad(
                cols, [(0, 0)] * (cols.ndim - 1) + [(0, extra_cols)]
            )
        v = cols
        for _ in range(rounds):
            lo = v & MASK16
            c = v >> 16
            v = lo + jnp.pad(
                c, [(0, 0)] * (v.ndim - 1) + [(1, 0)]
            )[..., : v.shape[-1]]
        return v

    @partial(jax.jit, static_argnums=0)
    def mont_mul(self, x16, y16):
        """a·b·R⁻¹ mod p, bit-identical to LimbField.mont_mul.

        Bound audit: 16-bit product columns ≤ 2K·2^16 < 2^21; two 16-bit
        relax rounds bring them to ≤ 2^16 so the 8-bit split has lo ≤ 255,
        hi ≤ 256 — both bf16-exact MXU inputs. The REDC dots and the final
        carry/cond-sub reuse MXUConstMul's machinery.
        """
        F, M, K8 = self.F, self.M, self.K8
        from .field import U32

        t16 = F._wide_mul_cols(
            x16.astype(U32), y16.astype(U32), 2 * F.K + 1
        ).astype(jnp.int32)
        t16 = self._relax16(t16, 2)  # limbs ≤ 2^16
        lo = t16 & MASK8
        hi = t16 >> 8  # ≤ 256 (bf16-exact)
        # interleave to 8-bit columns: (..., 2*(2K+1))
        t8 = jnp.stack([lo, hi], axis=-1).reshape(
            *t16.shape[:-1], 2 * t16.shape[-1]
        )
        t8 = t8[..., : 2 * K8 + 1]  # value < p² ⇒ top cols are slack only
        m_cols = M._dot(t8[..., :K8], M.np_toep)
        m8 = M._relax(m_cols, 3)  # ≤ 256, m_val < 1.004·R
        u_cols = M._dot(m8, M.p_toep)
        s = t8 + jnp.pad(
            u_cols, [(0, 0)] * (u_cols.ndim - 1) + [(0, 1)]
        )
        return M._finalize(s)
