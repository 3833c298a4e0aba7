"""Transposed-layout EC group-law ops (the MSM hot path).

Same complete RCB16 a=0 schedules as ops/ec.py (alg. 7 mixed / alg. 9
double), but points are (K, N) transposed limb arrays: limbs on sublanes,
batch on lanes — so every elementwise pass is unpadded (the (N, K) layout
wastes 8x lane padding, PERF_NOTES.md) and each Montgomery mul is one small
fused Pallas kernel at the measured 127 M muls/s VPU-bound rate.

Design note: an earlier variant fused a WHOLE group op into one Pallas
kernel; bit-exact, but ~17 unrolled montmuls (~25k vector ops) stall the
Mosaic compiler for >30 min. Since the op is compute-bound on the VPU's
int32 multiplier, per-mul kernels + XLA-fused (K, N) elementwise glue hit
the same throughput with second-scale compiles.

Bit-exactness: the reference path (use_pallas=False) traces the identical
row code without pallas_call; tests assert both against ops/ec.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .field import LimbField
from .field_t import TFieldOps, U32


def _mul_kernel(ops: TFieldOps, x_ref, y_ref, o_ref):
    xr = ops.to_rows(x_ref[...])
    yr = ops.to_rows(y_ref[...])
    o_ref[...] = ops.from_rows(ops.mul_rows(xr, yr))


def _mul_mxu_kernel(ops: TFieldOps, x_ref, y_ref, npt_ref, pt_ref, o_ref):
    xr = ops.to_rows(x_ref[...])
    yr = ops.to_rows(y_ref[...])
    o_ref[...] = ops.from_rows(
        ops.mul_rows_mxu(xr, yr, npt_ref[...], pt_ref[...])
    )


class TCurve:
    """a=0 curve ops on transposed (K, N) points; G1 (prime field) only —
    the MSM wave loop is the consumer.

    Points: tuples of (K, N) int32 arrays. Identity: (0, 1_mont, 0).
    """

    _cache: dict = {}

    def __new__(cls, F: LimbField, b3_host: int, block_n: int = 2048):
        key = ("tcurve", F.modulus, b3_host, block_n)
        if key in cls._cache:
            return cls._cache[key]
        self = super().__new__(cls)
        cls._cache[key] = self
        return self

    def __init__(self, F: LimbField, b3_host: int, block_n: int = 2048):
        if getattr(self, "_initialized", False):
            return
        self._initialized = True
        self.F = F
        self.t = TFieldOps(F)
        self.K = F.K
        self.block_n = block_n
        R = 1 << (16 * F.K)
        self.b3_mont = b3_host * R % F.modulus
        self.one_mont = R % F.modulus
        import os

        self.use_mxu = os.environ.get("GNARK_TPU_T_MXU", "1") != "0"
        # keep the REDC tables as HOST arrays: the singleton outlives any
        # single trace, and jnp constants created inside a jit trace would
        # leak tracers into later traces (UnexpectedTracerError)
        self._tables = tuple(self.t.redc_tables())

    # -- constructors --------------------------------------------------------
    def _const_col(self, v: int):
        K = self.K
        return jnp.asarray(
            [[(v >> (16 * i)) & 0xFFFF] for i in range(K)], jnp.int32
        )

    def identity(self, n: int):
        K = self.K
        z = jnp.zeros((K, n), jnp.int32)
        one = jnp.broadcast_to(self._const_col(self.one_mont), (K, n))
        return (z, one.astype(jnp.int32), z)

    def select(self, mask, P, Q):
        """mask: (N,) — P where true."""
        return tuple(jnp.where(mask[None, :], a, b) for a, b in zip(P, Q))

    # -- field ops at array level -------------------------------------------
    def _mul(self, x, y, use_pallas: bool):
        n = x.shape[1]
        if not use_pallas:
            t = self.t
            return t.from_rows(t.mul_rows(t.to_rows(x), t.to_rows(y)))
        K = self.K
        bn = self.block_n
        rem = (-n) % bn
        if rem:
            x = jnp.pad(x, ((0, 0), (0, rem)))
            y = jnp.pad(y, ((0, 0), (0, rem)))
        specs = [pl.BlockSpec((K, bn), lambda i: (0, i)),
                 pl.BlockSpec((K, bn), lambda i: (0, i))]
        args = [x, y]
        if self.use_mxu:
            kern = partial(_mul_mxu_kernel, self.t)
            for tbl in self._tables:
                specs.append(
                    pl.BlockSpec(tbl.shape, lambda i: (0, 0))
                )
                args.append(tbl)
        else:
            kern = partial(_mul_kernel, self.t)
        out = pl.pallas_call(
            kern,
            grid=((n + rem) // bn,),
            in_specs=specs,
            out_specs=pl.BlockSpec((K, bn), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((K, n + rem), jnp.int32),
        )(*args)
        return out[:, :n] if rem else out

    def _add(self, x, y):
        t = self.t
        return t.from_rows(t.add_rows(t.to_rows(x), t.to_rows(y)))

    def _sub(self, x, y):
        t = self.t
        return t.from_rows(t.sub_rows(t.to_rows(x), t.to_rows(y)))

    def _neg(self, y):
        t = self.t
        rows = t.to_rows(y)
        zero = [jnp.zeros_like(r) for r in rows]
        return t.from_rows(t.sub_rows(zero, rows))

    def _b3(self, n):
        return jnp.broadcast_to(
            self._const_col(self.b3_mont), (self.K, n)
        ).astype(jnp.int32)

    # -- group law (RCB16, mirrors ops/ec.py schedules) ----------------------
    def _add_mixed_impl(self, P, Q, use_pallas):
        X1, Y1, Z1 = P
        X2, Y2 = Q
        mul = partial(self._mul, use_pallas=use_pallas)
        add, sub = self._add, self._sub
        b3 = self._b3(X1.shape[1])
        t0 = mul(X1, X2)
        t1 = mul(Y1, Y2)
        t3 = mul(add(X1, Y1), add(X2, Y2))
        t3 = sub(t3, add(t0, t1))
        t4 = add(mul(Y2, Z1), Y1)
        Y3 = add(mul(X2, Z1), X1)
        t0 = add(add(t0, t0), t0)
        t2 = mul(b3, Z1)
        Z3 = add(t1, t2)
        t1 = sub(t1, t2)
        Y3 = mul(b3, Y3)
        X3 = sub(mul(t3, t1), mul(t4, Y3))
        Y3 = add(mul(Y3, t0), mul(t1, Z3))
        Z3 = add(mul(Z3, t4), mul(t0, t3))
        return (X3, Y3, Z3)

    def _add_impl(self, P, Q, use_pallas):
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        mul = partial(self._mul, use_pallas=use_pallas)
        add, sub = self._add, self._sub
        b3 = self._b3(X1.shape[1])
        t0 = mul(X1, X2)
        t1 = mul(Y1, Y2)
        t2 = mul(Z1, Z2)
        t3 = mul(add(X1, Y1), add(X2, Y2))
        t3 = sub(t3, add(t0, t1))
        t4 = mul(add(Y1, Z1), add(Y2, Z2))
        t4 = sub(t4, add(t1, t2))
        Y3 = mul(add(X1, Z1), add(X2, Z2))
        Y3 = sub(Y3, add(t0, t2))
        t0 = add(add(t0, t0), t0)
        t2 = mul(b3, t2)
        Z3 = add(t1, t2)
        t1 = sub(t1, t2)
        Y3 = mul(b3, Y3)
        X3 = sub(mul(t3, t1), mul(t4, Y3))
        Y3 = add(mul(Y3, t0), mul(t1, Z3))
        Z3 = add(mul(Z3, t4), mul(t0, t3))
        return (X3, Y3, Z3)

    def _double_impl(self, P, use_pallas):
        X, Y, Z = P
        mul = partial(self._mul, use_pallas=use_pallas)
        add, sub = self._add, self._sub
        b3 = self._b3(X.shape[1])
        t0 = mul(Y, Y)
        Z3 = add(t0, t0)
        Z3 = add(Z3, Z3)
        Z3 = add(Z3, Z3)
        t1 = mul(Y, Z)
        t2 = mul(b3, mul(Z, Z))
        X3 = mul(t2, Z3)
        Y3 = add(t0, t2)
        Z3 = mul(t1, Z3)
        t1 = add(t2, t2)
        t2 = add(t1, t2)
        t0 = sub(t0, t2)
        Y3 = add(mul(t0, Y3), X3)
        t1 = mul(X, Y)
        X3 = mul(t0, t1)
        X3 = add(X3, X3)
        return (X3, Y3, Z3)

    # -- public ops ----------------------------------------------------------
    @partial(jax.jit, static_argnums=(0, 5))
    def add_mixed_masked(self, P, Q_affine, mask, sign=None,
                         use_pallas: bool = True):
        """P + (±Q) where mask, else P (sign: per-lane y negation — the
        signed-digit MSM shape). Q lanes must be real points where mask is
        set."""
        n = P[0].shape[1]
        use_pallas = use_pallas and jax.default_backend() != "cpu"
        X2, Y2 = Q_affine
        if sign is not None:
            Y2 = jnp.where((sign != 0)[None, :], self._neg(Y2), Y2)
        new = self._add_mixed_impl(P, (X2, Y2), use_pallas)
        return self.select(mask, new, P)

    @partial(jax.jit, static_argnums=(0, 3))
    def add(self, P, Q, use_pallas: bool = True):
        use_pallas = use_pallas and jax.default_backend() != "cpu"
        return self._add_impl(P, Q, use_pallas)

    @partial(jax.jit, static_argnums=(0, 2))
    def double(self, P, use_pallas: bool = True):
        use_pallas = use_pallas and jax.default_backend() != "cpu"
        return self._double_impl(P, use_pallas)
