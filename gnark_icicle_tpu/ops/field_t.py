"""Transposed-layout (K, N) field arithmetic — the MSM hot-path core.

Motivation (PERF_NOTES.md): the canonical (N, K) layout puts the K=16 limb
dim on the TPU's 128-lane axis, so every elementwise pass pays ~8x lane
padding and mont_mul lands at 12-18 M muls/s. Transposed — limbs on
sublanes, batch on lanes — a fused Pallas kernel is bit-exact and measured
127 M muls/s on v5e (VPU int32-multiply-bound).

Role parity: same job as ICICLE's field arithmetic headers
(icicle/include/field/field.cuh in the reference's ICICLE dependency) —
this is the device mul that everything hot sits on.

All helpers here are PURE jnp on (K, B) uint32 arrays of canonical 16-bit
limbs, written scatter-free (per-row expression DAGs) so they trace equally
inside a Pallas kernel body (fused, fast path) and as plain XLA ops (the
reference path used for bit-exactness tests and CPU runs).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .field import LimbField, MASK16

U32 = jnp.uint32


class TFieldOps:
    """Stateless helper bundle for one modulus; safe to call inside Pallas.

    Elements: (K, B) uint32 arrays, canonical 16-bit limbs, Montgomery form
    (same encoding as ops/field.py, transposed).
    """

    _cache: dict = {}

    def __new__(cls, F: LimbField):
        key = ("t", F.modulus)
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
        self.K = F.K
        q = F.modulus
        self.p_l = [(q >> (16 * i)) & 0xFFFF for i in range(F.K)]
        self.np_l = [(F.nprime >> (16 * i)) & 0xFFFF for i in range(F.K)]

    # -- carries -------------------------------------------------------------
    def _carry(self, rows):
        """Exact little-endian carry chain over a list of u32 rows."""
        out = []
        c = jnp.zeros_like(rows[0])
        for r in rows:
            v = r + c
            out.append(v & MASK16)
            c = v >> 16
        return out, c

    def _cond_sub_p(self, res_rows, extra_hi=None):
        """One conditional subtract of p (input value < 2p)."""
        K = self.K
        p_l = self.p_l
        ge = jnp.ones_like(res_rows[0], dtype=jnp.bool_)
        gt = jnp.zeros_like(ge)
        for r in range(K - 1, -1, -1):
            gt = gt | (ge & (res_rows[r] > p_l[r]))
            ge = ge & (res_rows[r] == p_l[r])
        need = gt | ge
        if extra_hi is not None:
            need = need | (extra_hi > 0)
        need = need.astype(U32)
        out = []
        borrow = jnp.zeros_like(res_rows[0])
        for r in range(K):
            d = res_rows[r] - need * jnp.uint32(p_l[r]) - borrow
            out.append(d & MASK16)
            borrow = (d >> 16) & 1
        return out

    # -- schoolbook products --------------------------------------------------
    def _wide(self, xr, yr):
        """Σ x_i·y_j column rows (2K+1 of them); u32-safe via lo/hi split
        (each column sums ≤ 2K 16-bit terms < 2^21)."""
        K = self.K
        lo = {}
        hi = {}
        for i in range(K):
            for j in range(K):
                prod = xr[i] * yr[j]
                lo[(i, j)] = prod & MASK16
                hi[(i, j)] = prod >> 16
        out = []
        for c in range(2 * K + 1):
            terms = []
            for i in range(K):
                j = c - i
                if 0 <= j < K:
                    terms.append(lo[(i, j)])
                j2 = c - 1 - i
                if 0 <= j2 < K:
                    terms.append(hi[(i, j2)])
            out.append(sum(terms[1:], terms[0]) if terms
                       else jnp.zeros_like(xr[0]))
        return out

    def _wide_const(self, xr, c_limbs, out_n):
        """Σ x_i·c_j with a host-int constant's 16-bit limbs."""
        K = self.K
        out = []
        for c in range(out_n):
            terms = []
            for i in range(K):
                j = c - i
                if 0 <= j < K and c_limbs[j]:
                    prod = xr[i] * jnp.uint32(c_limbs[j])
                    terms.append(prod & MASK16)
                j2 = c - 1 - i
                if 0 <= j2 < K and c_limbs[j2]:
                    prod = xr[i] * jnp.uint32(c_limbs[j2])
                    terms.append(prod >> 16)
            out.append(sum(terms[1:], terms[0]) if terms
                       else jnp.zeros_like(xr[0]))
        return out

    def _redc(self, t_rows):
        """REDC of 2K+1 carried OR uncarried column rows (value < p·R):
        m = (t mod R)·N' mod R;  res = (t + m·p)/R, conditionally − p."""
        K = self.K
        tc, _ = self._carry(t_rows)
        mc, _ = self._carry(self._wide_const(tc[:K], self.np_l, K))
        u = self._wide_const(mc, self.p_l, 2 * K + 1)
        s = [t_rows[i] + u[i] for i in range(2 * K + 1)]
        sc, _ = self._carry(s)
        return self._cond_sub_p(sc[K:2 * K], extra_hi=sc[2 * K])

    # -- public ops (lists of rows in, lists of rows out) ---------------------
    def mul_rows(self, xr, yr):
        return self._redc(self._wide(xr, yr))

    # -- MXU-REDC variant -----------------------------------------------------
    def redc_tables(self, pad_to: int | None = None):
        """Host bf16 Toeplitz tables for the two REDC constant products
        (≙ MXUConstMul's np/p tables, transposed orientation): row i,
        col c hold the constant's 8-bit limb (c − i). Lane-padded to
        `pad_to` columns — Mosaic wants full lane tiles as kernel inputs
        (same trick as ops/ec_pallas._TileFieldMXU). bf16 entries ≤ 255
        are exact (8 significand bits), and bf16×bf16→fp32 is the MXU's
        NATIVE full-rate mode — fp32 inputs run the slow emulated path.

        pad_to defaults to the smallest 128-lane multiple that fits the
        full-product column span 2·K8: the former fixed 128 overflowed
        for fields beyond 32 bytes (BW6-761 Fp, K=48 → K8=96 → columns up
        to 190 — the r4c 2-chain device-prove crash)."""
        import ml_dtypes

        K8 = 2 * self.K
        if pad_to is None:
            pad_to = -(-(2 * K8) // 128) * 128
        np8 = [(self.F.nprime >> (8 * i)) & 0xFF for i in range(K8)]
        p8 = [(self.F.modulus >> (8 * i)) & 0xFF for i in range(K8)]
        np_t = np.zeros((K8, pad_to), np.float32)
        p_t = np.zeros((K8, pad_to), np.float32)
        for i in range(K8):
            for c in range(i, K8):          # mod R: cols < K8 only
                np_t[i, c] = np8[c - i]
            for c in range(i, i + K8):      # full product: cols < 2·K8
                p_t[i, c] = p8[c - i]
        return (np_t.astype(ml_dtypes.bfloat16),
                p_t.astype(ml_dtypes.bfloat16))

    def mul_rows_mxu(self, xr, yr, np_t, p_t):
        """mont_mul with the t = x·y schoolbook on the VPU (256 int muls)
        and both REDC constant products as bf16 MXU matmuls (exactness:
        inputs ≤ 256 and table entries ≤ 255 are bf16-exact — 8
        significand bits; products accumulate in fp32, column sums < 2^24
        so the fp32 results are exact — the MXUConstMul bound audit,
        ops/mxu_field.py). Bit-identical to mul_rows (test-asserted)."""
        K = self.K
        K8 = 2 * K
        f32 = jnp.float32
        bf16 = jnp.bfloat16
        t = self._wide(xr, yr)
        tc, _ = self._carry(t)              # 2K+1 exact 16-bit rows
        # 8-bit split of the low half (t mod R)
        x8 = []
        for i in range(K):
            x8.append(tc[i] & 0xFF)
            x8.append(tc[i] >> 8)
        # u32 → i32 → bf16: values ≤ 255 are exact in bf16
        xf = jnp.stack(x8).astype(jnp.int32).astype(bf16)  # (K8, B) ≤ 255
        m = jax.lax.dot_general(
            np_t, xf, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )[:K8]                              # (K8, B) cols < 2^21, exact f32
        # relax to limbs ≤ 256 (value-preserving mod R: the top carry
        # drops = subtracting multiples of 256^K8 = R)
        for _ in range(3):
            c = jnp.floor(m * (1.0 / 256.0))
            lo = m - c * 256.0
            m = lo + jnp.concatenate([jnp.zeros_like(c[:1]), c[:-1]], 0)
        u = jax.lax.dot_general(
            p_t, m.astype(bf16), (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )[: 2 * K8]                         # (2K8, B) cols < 2^24
        u_i = u.astype(jnp.int32).astype(U32)
        u16 = [u_i[2 * c] + (u_i[2 * c + 1] << 8) for c in range(K8)]
        s = [tc[i] + u16[i] for i in range(K8)] + [tc[K8]]
        sc, _ = self._carry(s)
        return self._cond_sub_p(sc[K:2 * K], extra_hi=sc[2 * K])

    def mul_const_rows(self, xr, w_mont: int):
        limbs = [(w_mont >> (16 * i)) & 0xFFFF for i in range(self.K)]
        return self._redc(self._wide_const(xr, limbs, 2 * self.K + 1))

    def add_rows(self, xr, yr):
        s, _ = self._carry([xr[i] + yr[i] for i in range(self.K)])
        return self._cond_sub_p(s)

    def sub_rows(self, xr, yr):
        """x − y as x + p + ~y + 1 (add-with-complement; the wrap 2^(16K)
        cancels the final carry). Value = x + p − y ∈ [0, 2p): one
        conditional subtract."""
        p_l = self.p_l
        out = []
        c = jnp.ones_like(xr[0])
        for r in range(self.K):
            v = xr[r] + jnp.uint32(p_l[r]) + (jnp.uint32(0xFFFF) - yr[r]) + c
            out.append(v & MASK16)
            c = v >> 16
        return self._cond_sub_p(out)

    # -- array<->rows plumbing ------------------------------------------------
    def to_rows(self, arr):
        """(K, B) array -> list of K (B,) u32 rows."""
        a = arr.astype(U32)
        return [a[i] for i in range(self.K)]

    def from_rows(self, rows, dtype=jnp.int32):
        return jnp.stack(rows).astype(dtype)


# ---------------------------------------------------------------------------
# Fp2 on separate (K, B) c0/c1 planes (the G2 hot path). The round-2
# attempt packed both components into one (2K, B) tile and paid ~2x in
# Mosaic sublane slicing (ROADMAP #2); separate plane refs keep every op on
# aligned full tiles. One fused kernel runs the whole Karatsuba product
# (3 base muls + the β recombination) in VMEM.
# ---------------------------------------------------------------------------

class TField2Ops:
    """Fp2 = Fp[u]/(u² − β) helpers on PAIRS of (K, B) plane rows.

    β is a small negative integer (−1 for BN254, −5 for BLS12-377); the
    β·m1 term is computed with shift-adds, never a mul."""

    def __init__(self, base: TFieldOps, beta: int):
        assert beta < 0, "tower β must be a small negative integer"
        self.base = base
        self.beta = beta

    def _beta_mag_mul(self, rows):
        """|β| · rows via double-and-add (|β| is tiny: 1 or 5)."""
        t = self.base
        mag = -self.beta
        out = None
        acc = rows
        while mag:
            if mag & 1:
                out = acc if out is None else t.add_rows(out, acc)
            mag >>= 1
            if mag:
                acc = t.add_rows(acc, acc)
        return out

    def mul_rows2(self, a, b, mul_rows=None):
        """(a0,a1)·(b0,b1): Karatsuba — 3 base muls.
        c0 = m0 + β·m1, c1 = (a0+a1)(b0+b1) − m0 − m1."""
        t = self.base
        mul = mul_rows or t.mul_rows
        a0, a1 = a
        b0, b1 = b
        m0 = mul(a0, b0)
        m1 = mul(a1, b1)
        m2 = mul(t.add_rows(a0, a1), t.add_rows(b0, b1))
        c1 = t.sub_rows(t.sub_rows(m2, m0), m1)
        c0 = t.sub_rows(m0, self._beta_mag_mul(m1))
        return (c0, c1)

    def add_rows2(self, a, b):
        t = self.base
        return (t.add_rows(a[0], b[0]), t.add_rows(a[1], b[1]))

    def sub_rows2(self, a, b):
        t = self.base
        return (t.sub_rows(a[0], b[0]), t.sub_rows(a[1], b[1]))


# ---------------------------------------------------------------------------
# standalone fused kernels (tests / NTT use); the EC kernels inline the ops
# ---------------------------------------------------------------------------

def _mul_kernel(ops: TFieldOps, x_ref, y_ref, o_ref):
    xr = ops.to_rows(x_ref[...])
    yr = ops.to_rows(y_ref[...])
    o_ref[...] = ops.from_rows(ops.mul_rows(xr, yr))


class TField:
    """(K, N) int32 arrays with a fused-Pallas mont_mul.

    `mont_mul(x, y, use_pallas=...)`: bit-identical to
    LimbField.mont_mul on the transposed data (test-asserted).
    """

    _cache: dict = {}

    def __new__(cls, F: LimbField):
        key = ("tf", F.modulus)
        if key in cls._cache:
            return cls._cache[key]
        self = super().__new__(cls)
        cls._cache[key] = self
        return self

    def __init__(self, F: LimbField, block_n: int = 1024):
        if getattr(self, "_initialized", False):
            return
        self._initialized = True
        self.F = F
        self.ops = TFieldOps(F)
        self.K = F.K
        self.block_n = block_n

    def transpose_in(self, x_nk):
        """(N, K) -> (K, N)."""
        return jnp.transpose(x_nk, (1, 0))

    def transpose_out(self, x_kn):
        return jnp.transpose(x_kn, (1, 0))

    @partial(jax.jit, static_argnums=(0, 3))
    def mont_mul(self, x, y, use_pallas: bool = True):
        n = x.shape[-1]
        bn = self.block_n
        if not use_pallas or n % bn or jax.default_backend() == "cpu":
            ops = self.ops
            return ops.from_rows(ops.mul_rows(ops.to_rows(x),
                                              ops.to_rows(y)))
        K = self.K
        return pl.pallas_call(
            partial(_mul_kernel, self.ops),
            grid=(n // bn,),
            in_specs=[pl.BlockSpec((K, bn), lambda i: (0, i)),
                      pl.BlockSpec((K, bn), lambda i: (0, i))],
            out_specs=pl.BlockSpec((K, bn), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((K, n), jnp.int32),
        )(x, y)
