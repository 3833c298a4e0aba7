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
from .field_t import TFieldOps, TField2Ops, U32


def _mul2_kernel(ops2: TField2Ops, a0_ref, a1_ref, b0_ref, b1_ref,
                 o0_ref, o1_ref):
    """Fused Fp2 Karatsuba mont_mul on separate c0/c1 plane tiles."""
    t = ops2.base
    a = (t.to_rows(a0_ref[...]), t.to_rows(a1_ref[...]))
    b = (t.to_rows(b0_ref[...]), t.to_rows(b1_ref[...]))
    c0, c1 = ops2.mul_rows2(a, b)
    o0_ref[...] = t.from_rows(c0)
    o1_ref[...] = t.from_rows(c1)


def _mul2_mxu_kernel(ops2: TField2Ops, a0_ref, a1_ref, b0_ref, b1_ref,
                     npt_ref, pt_ref, o0_ref, o1_ref):
    """Fp2 Karatsuba with both REDC constant products of each base mul on
    the MXU (bf16 Toeplitz tables — the same 1.4x lever measured on G1)."""
    t = ops2.base
    a = (t.to_rows(a0_ref[...]), t.to_rows(a1_ref[...]))
    b = (t.to_rows(b0_ref[...]), t.to_rows(b1_ref[...]))
    npt, pt = npt_ref[...], pt_ref[...]

    def mul_mxu(xr, yr):
        return t.mul_rows_mxu(xr, yr, npt, pt)

    c0, c1 = ops2.mul_rows2(a, b, mul_rows=mul_mxu)
    o0_ref[...] = t.from_rows(c0)
    o1_ref[...] = t.from_rows(c1)


def _mul_kernel(ops: TFieldOps, x_ref, y_ref, o_ref):
    xr = ops.to_rows(x_ref[...])
    yr = ops.to_rows(y_ref[...])
    o_ref[...] = ops.from_rows(ops.mul_rows(xr, yr))


def _fused_add_mixed_kernel(ops: TFieldOps, b3_limbs, use_mxu,
                            x1_ref, y1_ref, z1_ref, x2_ref, y2_ref,
                            msk_ref, *rest):
    """ONE Pallas kernel for the complete RCB16 mixed add with mask+sign
    folded in: the ~11 montmuls, all add/sub glue, the sign-negation of
    y2 and the final valid-select happen in VMEM — no HBM round-trips
    between the muls and no per-mul kernel-launch overhead.

    Mosaic compile-size note: ~11 unrolled montmuls ≈ 10k vector ops —
    below the 17-mul fusion that stalled the compiler >30 min (module
    docstring), but still a minutes-scale one-time compile per shape.
    msk_ref: (2, bn) int32 — row 0 = valid, row 1 = sign."""
    if use_mxu:
        npt_ref, pt_ref, x3_ref, y3_ref, z3_ref = rest
        npt, pt = npt_ref[...], pt_ref[...]

        def mul(a_rows, b_rows):
            return ops.mul_rows_mxu(a_rows, b_rows, npt, pt)
    else:
        x3_ref, y3_ref, z3_ref = rest
        mul = ops.mul_rows

    add, sub = ops.add_rows, ops.sub_rows
    X1 = ops.to_rows(x1_ref[...])
    Y1 = ops.to_rows(y1_ref[...])
    Z1 = ops.to_rows(z1_ref[...])
    X2 = ops.to_rows(x2_ref[...])
    Y2 = ops.to_rows(y2_ref[...])
    msk = msk_ref[...].astype(U32)
    valid = msk[0]
    sign = msk[1]

    # y2 := sign ? −y2 : y2
    zero = [jnp.zeros_like(r) for r in Y2]
    negy = sub(zero, Y2)
    sm = sign != 0
    Y2 = [jnp.where(sm, n_, y_) for n_, y_ in zip(negy, Y2)]

    b3 = [jnp.full_like(X1[0], l) for l in b3_limbs]
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

    vm = valid != 0
    x3_ref[...] = jnp.where(vm, ops.from_rows(X3), x1_ref[...])
    y3_ref[...] = jnp.where(vm, ops.from_rows(Y3), y1_ref[...])
    z3_ref[...] = jnp.where(vm, ops.from_rows(Z3), z1_ref[...])


def _mul_mxu_kernel(ops: TFieldOps, x_ref, y_ref, npt_ref, pt_ref, o_ref):
    xr = ops.to_rows(x_ref[...])
    yr = ops.to_rows(y_ref[...])
    o_ref[...] = ops.from_rows(
        ops.mul_rows_mxu(xr, yr, npt_ref[...], pt_ref[...])
    )


def _fused_add_mixed2_kernel(ops2: TField2Ops, b3_limbs, use_mxu,
                             x10_ref, x11_ref, y10_ref, y11_ref,
                             z10_ref, z11_ref,
                             x20_ref, x21_ref, y20_ref, y21_ref,
                             msk_ref, *rest):
    """Fp2 analog of _fused_add_mixed_kernel: the whole RCB16 mixed add
    (11 Fp2 Karatsuba muls ≈ 33 base montmuls) in ONE kernel. Mosaic
    compile-size risk is real (the 17-mul G1 fusion stalled >30 min);
    strictly opt-in via GNARK_TPU_FUSED_ADD2 pending an on-chip compile
    + A/B (bench/check_fused_add.py --g2)."""
    t = ops2.base
    if use_mxu:
        npt_ref, pt_ref = rest[0], rest[1]
        outs = rest[2:]
        npt, pt = npt_ref[...], pt_ref[...]

        def base_mul(a_rows, b_rows):
            return t.mul_rows_mxu(a_rows, b_rows, npt, pt)
    else:
        outs = rest

        def base_mul(a_rows, b_rows):
            return t.mul_rows(a_rows, b_rows)

    def mul(a, b):
        return ops2.mul_rows2(a, b, mul_rows=base_mul)

    def add(a, b):
        return ops2.add_rows2(a, b)

    def sub(a, b):
        return ops2.sub_rows2(a, b)

    rows = lambda ref: t.to_rows(ref[...])
    X1 = (rows(x10_ref), rows(x11_ref))
    Y1 = (rows(y10_ref), rows(y11_ref))
    Z1 = (rows(z10_ref), rows(z11_ref))
    X2 = (rows(x20_ref), rows(x21_ref))
    Y2 = (rows(y20_ref), rows(y21_ref))
    msk = msk_ref[...].astype(U32)
    valid = msk[0] != 0
    sm = msk[1] != 0

    def negf(c):
        zero = [jnp.zeros_like(r) for r in c]
        return t.sub_rows(zero, c)

    Y2 = tuple(
        [jnp.where(sm, n_, y_) for n_, y_ in zip(negf(comp), comp)]
        for comp in Y2
    )
    b3 = tuple(
        [jnp.full_like(X1[0][0], l) for l in limbs] for limbs in b3_limbs
    )
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

    ins = (x10_ref, x11_ref, y10_ref, y11_ref, z10_ref, z11_ref)
    news = (X3[0], X3[1], Y3[0], Y3[1], Z3[0], Z3[1])
    for o_ref, new_rows, in_ref in zip(outs, news, ins):
        o_ref[...] = jnp.where(valid, t.from_rows(new_rows), in_ref[...])


class TCurve:
    """a=0 curve ops on transposed (K, N) points; G1 (prime field) only —
    the MSM wave loop is the consumer.

    Points: tuples of (K, N) int32 arrays. Identity: (0, 1_mont, 0).
    """

    _cache: dict = {}

    def __new__(cls, F: LimbField, b3_host: int, block_n: int | None = None):
        key = ("tcurve", F.modulus, b3_host, block_n)
        if key in cls._cache:
            return cls._cache[key]
        self = super().__new__(cls)
        cls._cache[key] = self
        return self

    def __init__(self, F: LimbField, b3_host: int,
                 block_n: int | None = None):
        if getattr(self, "_initialized", False):
            return
        self._initialized = True
        self.F = F
        self.t = TFieldOps(F)
        self.K = F.K
        # VMEM-bounded lane block: the fused kernels hold ~10 (K, block_n)
        # i32 temps; 2048 lanes fit at K=16 but overflow VMEM at the
        # 48-limb BW6-761 Fp (the r4d remote-compile OOM) — scale 1/K
        self.block_n = block_n or max(512, (2048 * 16 // F.K) // 256 * 256)
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

    def neg_point(self, P):
        """(x, −y, z) — the flat-tuple point negation the generic MSM
        reduction code calls (TCurve2 overrides for its plane layout)."""
        return (P[0], self._neg(P[1]), P[2])

    def affine_to_proj(self, planes, inf):
        """Affine (x, y) planes + (N,) identity flags -> projective
        3-tuple (identity = (0 : 1 : 0))."""
        x, y = planes
        one = jnp.broadcast_to(
            self._const_col(self.one_mont), x.shape
        ).astype(jnp.int32)
        zero = jnp.zeros_like(x)
        im = inf[None, :]
        return (jnp.where(im, zero, x),
                jnp.where(im, one, y),
                jnp.where(im, zero, one))

    # -- batched inversion (the affine-wave MSM support) ----------------------
    def _inv1(self, x):
        """Elementwise Fermat inverse x^(p−2) of a small (K, n) array:
        MSB-first square-and-multiply as ONE lax.scan (2 traced muls).
        This is the only sequential-latency part of batch_inv — ~2·|p|
        tiny dependent muls — so it runs once per wave on the tree root,
        never per lane. Plain-jnp muls: the operand is (K, 1)."""
        e = self.F.modulus - 2
        nb = e.bit_length()
        bits = jnp.asarray(
            [(e >> (nb - 1 - i)) & 1 for i in range(1, nb)], jnp.uint32
        )

        def body(acc, b):
            acc = self._mul(acc, acc, False)
            withx = self._mul(acc, x, False)
            return jnp.where(b != 0, withx, acc), None

        acc, _ = jax.lax.scan(body, x, bits)
        return acc

    def batch_inv(self, x, use_pallas: bool = True):
        """Elementwise Montgomery-form inverses of (K, N) canonical limbs.

        Montgomery's trick reshaped for lanes (gnark-crypto
        ecc/bn254/fp/element.go BatchInvert's role): a split-half product
        tree (build ≈ N muls, unwind ≈ 2N — all full-width batched) plus
        ONE Fermat inversion of the root. Zero lanes poison the whole
        product — callers must pre-replace them with 1 (the affine wave
        masks inactive lanes before calling)."""
        stack = []
        cur = x
        n = cur.shape[1]
        while n > 1:
            half = n // 2
            left = cur[:, :half]
            right = cur[:, half:2 * half]
            tail = cur[:, 2 * half:]
            prod = self._mul(left, right, use_pallas and half >= 512)
            stack.append((left, right, half))
            cur = (jnp.concatenate([prod, tail], axis=1)
                   if tail.shape[1] else prod)
            n = cur.shape[1]
        inv = self._inv1(cur)
        for left, right, half in reversed(stack):
            ip = inv[:, :half]
            itail = inv[:, half:]
            il = self._mul(ip, right, use_pallas and half >= 512)
            ir = self._mul(ip, left, use_pallas and half >= 512)
            inv = jnp.concatenate([il, ir, itail], axis=1)
        return inv

    @partial(jax.jit, static_argnums=(0, 6))
    def affine_add_masked(self, acc, inf, q, valid, sign=None,
                          use_pallas: bool = True):
        """Affine bucket accumulate: (acc ± q) where valid, else acc.

        acc: (x1, y1) (K, N) affine planes + `inf` (N,) bool identity
        flags; q: (x2, y2) REAL affine points on every valid lane.
        Complete for prime-order-subgroup inputs: identity (inf flags),
        doubling (x_eq ∧ y_eq → tangent slope), and P + (−P) (→ inf) are
        resolved per lane with selects. The one excluded input class is
        y = 0 (2-torsion) points, which cannot lie in a prime-order
        subgroup.

        ≈7 montmuls per lane — 1 square, ~3 amortized batch-inversion
        muls, slope, slope², y3 — vs the projective mixed add's 11, and
        the accumulator is 2 planes instead of 3 (2/3 the HBM traffic).
        Role: gnark-crypto's batch-affine bucket accumulation
        (ecc/bn254/multiexp_affine.go), with the serial add queue replaced
        by lane-wise selects and the batch inversion done as a product
        tree + one Fermat root inversion per wave."""
        use_pallas = use_pallas and jax.default_backend() != "cpu"
        x1, y1 = acc
        x2, y2 = q
        if sign is not None:
            y2 = jnp.where((sign != 0)[None, :], self._neg(y2), y2)
        mul = partial(self._mul, use_pallas=use_pallas)
        add, sub = self._add, self._sub
        dx = sub(x2, x1)
        dy = sub(y2, y1)
        x_eq = jnp.all(dx == 0, axis=0)
        y_eq = jnp.all(dy == 0, axis=0)
        is_dbl = x_eq & y_eq
        x1sq = mul(x1, x1)
        num = jnp.where(is_dbl[None, :], add(add(x1sq, x1sq), x1sq), dy)
        den = jnp.where(is_dbl[None, :], add(y1, y1), dx)
        active = valid & (~inf) & ~(x_eq & ~y_eq)
        one = jnp.broadcast_to(
            self._const_col(self.one_mont), x1.shape
        ).astype(jnp.int32)
        den_safe = jnp.where(active[None, :], den, one)
        lam = mul(num, self.batch_inv(den_safe, use_pallas))
        lam2 = mul(lam, lam)
        x3 = sub(sub(lam2, x1), x2)
        y3 = sub(mul(lam, sub(x1, x3)), y1)
        res_x = jnp.where(inf[None, :], x2, x3)
        res_y = jnp.where(inf[None, :], y2, y3)
        res_inf = (~inf) & x_eq & (~y_eq)
        vm = valid[None, :]
        return ((jnp.where(vm, res_x, x1), jnp.where(vm, res_y, y1)),
                jnp.where(valid, res_inf, inf))

    def to_curve_tree(self, flat):
        """Flat plane tuple -> the DevCurve pytree shape (identity for G1)."""
        return tuple(flat)

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

    @partial(jax.jit, static_argnums=(0,))
    def add_mixed_masked_fused(self, P, Q_affine, mask, sign=None):
        """add_mixed_masked as ONE fused Pallas kernel per lane block —
        the whole RCB16 schedule + mask/sign logic stays in VMEM (no HBM
        round-trips between the 11 montmuls, 1 kernel launch instead of
        ~11 + XLA glue passes). Bit-identical to add_mixed_masked
        (asserted in tests). Opt-in via GNARK_TPU_FUSED_ADD=1 in the MSM
        wave loop; on CPU the kernel runs in Pallas interpret mode (slow —
        bit-exactness tests only)."""
        interpret = jax.default_backend() == "cpu"
        K = self.K
        n = P[0].shape[1]
        # one mul's REDC internals (~512 rows) + the EC temps must fit
        # VMEM: half the per-mul kernel's lane block
        bn = max(256, (1024 * 16 // K) // 256 * 256)
        rem = (-n) % bn
        sgn = (jnp.zeros_like(mask, dtype=jnp.int32) if sign is None
               else sign.astype(jnp.int32))
        msk = jnp.stack([mask.astype(jnp.int32), sgn])  # (2, n)
        ins = [P[0], P[1], P[2], Q_affine[0], Q_affine[1]]
        if rem:
            ins = [jnp.pad(a, ((0, 0), (0, rem))) for a in ins]
            msk = jnp.pad(msk, ((0, 0), (0, rem)))
        specs = [pl.BlockSpec((K, bn), lambda i: (0, i))] * 5
        specs.append(pl.BlockSpec((2, bn), lambda i: (0, i)))
        args = ins + [msk]
        b3_limbs = tuple(
            (self.b3_mont >> (16 * i)) & 0xFFFF for i in range(K)
        )
        if self.use_mxu:
            for tbl in self._tables:
                specs.append(pl.BlockSpec(tbl.shape, lambda i: (0, 0)))
                args.append(tbl)
        kern = partial(_fused_add_mixed_kernel, self.t, b3_limbs,
                       self.use_mxu)
        out = pl.pallas_call(
            kern,
            grid=((n + rem) // bn,),
            in_specs=specs,
            out_specs=[pl.BlockSpec((K, bn), lambda i: (0, i))] * 3,
            out_shape=[jax.ShapeDtypeStruct((K, n + rem), jnp.int32)] * 3,
            interpret=interpret,
        )(*args)
        if rem:
            out = [o[:, :n] for o in out]
        return (out[0], out[1], out[2])

    @partial(jax.jit, static_argnums=(0, 3))
    def add(self, P, Q, use_pallas: bool = True):
        use_pallas = use_pallas and jax.default_backend() != "cpu"
        return self._add_impl(P, Q, use_pallas)

    @partial(jax.jit, static_argnums=(0, 2))
    def double(self, P, use_pallas: bool = True):
        use_pallas = use_pallas and jax.default_backend() != "cpu"
        return self._double_impl(P, use_pallas)


class TCurve2:
    """a=0 curve ops over Fp2 on transposed plane tuples — the G2 MSM hot
    path (≙ ICICLE's G2 device MSM, reference icicle.go:377-393).

    POINT LAYOUT: flat tuples of (K, N) int32 planes —
    projective (x0, x1, y0, y1, z0, z1), affine (x0, x1, y0, y1) — so the
    MSM kernel's generic tuple machinery (suffix scans, rolls, selects,
    packing) works unchanged; only the group law regroups planes into Fp2
    pairs. Each Fp2 mont_mul is ONE fused Pallas kernel (3 base muls +
    Karatsuba recombination in VMEM, separate c0/c1 plane refs — the
    round-2 packed-(2K,B)-tile layout paid ~2x in Mosaic sublane slicing
    and is retired)."""

    _cache: dict = {}

    # block 1024 (vs TCurve's 2048): the fused Karatsuba kernel holds ~3
    # concurrent base-mul intermediate sets — 2048 lanes needs 19.5 MB of
    # scoped VMEM vs the 16 MB limit (measured Mosaic OOM at 2^16 G2 MSM)
    def __new__(cls, F: LimbField, beta: int, b3_host,
                block_n: int | None = None):
        key = ("tcurve2", F.modulus, beta, b3_host, block_n)
        if key in cls._cache:
            return cls._cache[key]
        self = super().__new__(cls)
        cls._cache[key] = self
        return self

    def __init__(self, F: LimbField, beta: int, b3_host,
                 block_n: int | None = None):
        if getattr(self, "_initialized", False):
            return
        self._initialized = True
        self.F = F
        self.t = TFieldOps(F)
        self.t2 = TField2Ops(self.t, beta)
        self.K = F.K
        # Fp2 kernels hold twice the planes: half the G1 lane block
        self.block_n = block_n or max(256, (1024 * 16 // F.K) // 256 * 256)
        R = 1 << (16 * F.K)
        self.b3_mont = tuple(c * R % F.modulus for c in b3_host)  # (c0, c1)
        self.one_mont = R % F.modulus
        import os

        self.use_mxu = os.environ.get("GNARK_TPU_T_MXU", "1") != "0"
        self._tables = tuple(self.t.redc_tables())  # host arrays (see TCurve)

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
        return (z, z, one.astype(jnp.int32), z, z, z)

    def select(self, mask, P, Q):
        return tuple(jnp.where(mask[None, :], a, b) for a, b in zip(P, Q))

    # -- Fp2 ops on plane pairs ----------------------------------------------
    def _mul(self, x, y, use_pallas: bool):
        """x, y: (c0, c1) plane pairs."""
        if not use_pallas:
            t = self.t
            rows = self.t2.mul_rows2(
                (t.to_rows(x[0]), t.to_rows(x[1])),
                (t.to_rows(y[0]), t.to_rows(y[1])),
            )
            return (t.from_rows(rows[0]), t.from_rows(rows[1]))
        K = self.K
        bn = self.block_n
        n = x[0].shape[1]
        rem = (-n) % bn
        ins = [x[0], x[1], y[0], y[1]]
        if rem:
            ins = [jnp.pad(a, ((0, 0), (0, rem))) for a in ins]
        specs = [pl.BlockSpec((K, bn), lambda i: (0, i))] * 4
        if self.use_mxu:
            kern = partial(_mul2_mxu_kernel, self.t2)
            for tbl in self._tables:
                specs.append(pl.BlockSpec(tbl.shape, lambda i: (0, 0)))
                ins.append(tbl)
        else:
            kern = partial(_mul2_kernel, self.t2)
        out = pl.pallas_call(
            kern,
            grid=((n + rem) // bn,),
            in_specs=specs,
            out_specs=[pl.BlockSpec((K, bn), lambda i: (0, i))] * 2,
            out_shape=[jax.ShapeDtypeStruct((K, n + rem), jnp.int32)] * 2,
        )(*ins)
        if rem:
            out = [o[:, :n] for o in out]
        return (out[0], out[1])

    def _addf(self, x, y):
        t = self.t
        return tuple(
            t.from_rows(t.add_rows(t.to_rows(a), t.to_rows(b)))
            for a, b in zip(x, y)
        )

    def _subf(self, x, y):
        t = self.t
        return tuple(
            t.from_rows(t.sub_rows(t.to_rows(a), t.to_rows(b)))
            for a, b in zip(x, y)
        )

    def _negf(self, y):
        t = self.t
        out = []
        for a in y:
            rows = t.to_rows(a)
            zero = [jnp.zeros_like(r) for r in rows]
            out.append(t.from_rows(t.sub_rows(zero, rows)))
        return tuple(out)

    def _b3(self, n):
        return tuple(
            jnp.broadcast_to(self._const_col(c), (self.K, n)).astype(jnp.int32)
            for c in self.b3_mont
        )

    # -- group law (same RCB16 schedules as TCurve, Fp2 operands) ------------
    def _add_mixed_impl(self, P, Q, use_pallas):
        X1 = (P[0], P[1]); Y1 = (P[2], P[3]); Z1 = (P[4], P[5])
        X2 = (Q[0], Q[1]); Y2 = (Q[2], Q[3])
        mul = partial(self._mul, use_pallas=use_pallas)
        add, sub = self._addf, self._subf
        b3 = self._b3(P[0].shape[1])
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
        return X3 + Y3 + Z3  # flat 6-tuple

    def _add_impl(self, P, Q, use_pallas):
        X1 = (P[0], P[1]); Y1 = (P[2], P[3]); Z1 = (P[4], P[5])
        X2 = (Q[0], Q[1]); Y2 = (Q[2], Q[3]); Z2 = (Q[4], Q[5])
        mul = partial(self._mul, use_pallas=use_pallas)
        add, sub = self._addf, self._subf
        b3 = self._b3(P[0].shape[1])
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
        return X3 + Y3 + Z3

    def _double_impl(self, P, use_pallas):
        X = (P[0], P[1]); Y = (P[2], P[3]); Z = (P[4], P[5])
        mul = partial(self._mul, use_pallas=use_pallas)
        add, sub = self._addf, self._subf
        b3 = self._b3(P[0].shape[1])
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
        return X3 + Y3 + Z3

    def neg_point(self, P):
        neg_y = self._negf((P[2], P[3]))
        return (P[0], P[1], neg_y[0], neg_y[1], P[4], P[5])

    def to_curve_tree(self, flat):
        """Flat 6-plane tuple -> DevCurve G2 pytree ((x0,x1),(y0,y1),(z0,z1))."""
        return ((flat[0], flat[1]), (flat[2], flat[3]), (flat[4], flat[5]))

    def affine_to_proj(self, planes, inf):
        """Affine 4-plane tuple + (N,) identity flags -> projective
        6-plane tuple (identity = ((0,0) : (1,0) : (0,0)))."""
        x0, x1, y0, y1 = planes
        one = jnp.broadcast_to(
            self._const_col(self.one_mont), x0.shape
        ).astype(jnp.int32)
        zero = jnp.zeros_like(x0)
        im = inf[None, :]
        return (jnp.where(im, zero, x0), jnp.where(im, zero, x1),
                jnp.where(im, one, y0), jnp.where(im, zero, y1),
                jnp.where(im, zero, one), zero)

    # -- batched Fp2 inversion (the affine-wave G2 MSM support) ---------------
    @property
    def _base(self):
        """Base-field TCurve, for its scalar mul/batch_inv machinery (the
        b3 constant is irrelevant to field ops)."""
        return TCurve(self.F, 0, block_n=self.block_n)

    def batch_inv2(self, x, use_pallas: bool = True):
        """Fp2 inverses of a (c0, c1) plane pair: conj(a) · norm(a)^{-1}
        with norm = c0² + |β|·c1² inverted by ONE base-field batch_inv
        (product tree + Fermat root — TCurve.batch_inv)."""
        c0, c1 = x
        base = self._base
        m = partial(base._mul, use_pallas=use_pallas)
        sq0 = m(c0, c0)
        sq1 = m(c1, c1)
        mag = -self.t2.beta
        out = None
        acc = sq1
        while mag:  # |β|·sq1 via shift-adds (β is −1 or −5)
            if mag & 1:
                out = acc if out is None else base._add(out, acc)
            mag >>= 1
            if mag:
                acc = base._add(acc, acc)
        norm = base._add(sq0, out)
        invn = base.batch_inv(norm, use_pallas)
        return (m(c0, invn), base._neg(m(c1, invn)))

    @partial(jax.jit, static_argnums=(0, 6))
    def affine_add_masked(self, acc, inf, q, valid, sign=None,
                          use_pallas: bool = True):
        """Fp2 analog of TCurve.affine_add_masked on flat 4-plane affine
        tuples (x0, x1, y0, y1): ≈19 base muls per lane (3 Fp2 muls +
        the 7-base-mul Fp2 batch inversion) vs the projective mixed
        add's 33. Same per-lane completeness contract (prime-order
        subgroup; identity flags; doubling and P+(−P) via selects)."""
        use_pallas = use_pallas and jax.default_backend() != "cpu"
        x1 = (acc[0], acc[1]); y1 = (acc[2], acc[3])
        x2 = (q[0], q[1]); y2 = (q[2], q[3])
        if sign is not None:
            ny = self._negf(y2)
            sel = (sign != 0)[None, :]
            y2 = (jnp.where(sel, ny[0], y2[0]),
                  jnp.where(sel, ny[1], y2[1]))
        mul = partial(self._mul, use_pallas=use_pallas)
        add, sub = self._addf, self._subf
        sel2 = lambda m_, a, b: tuple(
            jnp.where(m_[None, :], pa, pb) for pa, pb in zip(a, b)
        )
        dx = sub(x2, x1)
        dy = sub(y2, y1)
        x_eq = jnp.all((dx[0] == 0) & (dx[1] == 0), axis=0)
        y_eq = jnp.all((dy[0] == 0) & (dy[1] == 0), axis=0)
        is_dbl = x_eq & y_eq
        x1sq = mul(x1, x1)
        num = sel2(is_dbl, add(add(x1sq, x1sq), x1sq), dy)
        den = sel2(is_dbl, add(y1, y1), dx)
        active = valid & (~inf) & ~(x_eq & ~y_eq)
        one = jnp.broadcast_to(
            self._const_col(self.one_mont), acc[0].shape
        ).astype(jnp.int32)
        zero = jnp.zeros_like(one)
        den_safe = sel2(active, den, (one, zero))
        lam = mul(num, self.batch_inv2(den_safe, use_pallas))
        lam2 = mul(lam, lam)
        x3 = sub(sub(lam2, x1), x2)
        y3 = sub(mul(lam, sub(x1, x3)), y1)
        res_x = sel2(inf, x2, x3)
        res_y = sel2(inf, y2, y3)
        res_inf = (~inf) & x_eq & (~y_eq)
        out_x = sel2(valid, res_x, x1)
        out_y = sel2(valid, res_y, y1)
        return ((out_x[0], out_x[1], out_y[0], out_y[1]),
                jnp.where(valid, res_inf, inf))

    # -- public ops ----------------------------------------------------------
    @partial(jax.jit, static_argnums=(0, 5))
    def add_mixed_masked(self, P, Q_affine, mask, sign=None,
                         use_pallas: bool = True):
        use_pallas = use_pallas and jax.default_backend() != "cpu"
        Q = Q_affine
        if sign is not None:
            ny = self._negf((Q[2], Q[3]))
            sel = (sign != 0)[None, :]
            Q = (Q[0], Q[1],
                 jnp.where(sel, ny[0], Q[2]), jnp.where(sel, ny[1], Q[3]))
        new = self._add_mixed_impl(P, Q, use_pallas)
        return self.select(mask, new, P)

    @partial(jax.jit, static_argnums=(0,))
    def add_mixed_masked_fused(self, P, Q_affine, mask, sign=None):
        """ONE-kernel fused Fp2 mixed add (≈33 base montmuls in VMEM).
        Opt-in via GNARK_TPU_FUSED_ADD2=1 — pending the Mosaic
        compile-size check on chip; CPU runs interpret mode (tests)."""
        interpret = jax.default_backend() == "cpu"
        K = self.K
        n = P[0].shape[1]
        bn = max(256, (512 * 16 // K) // 256 * 256)
        rem = (-n) % bn
        sgn = (jnp.zeros_like(mask, dtype=jnp.int32) if sign is None
               else sign.astype(jnp.int32))
        msk = jnp.stack([mask.astype(jnp.int32), sgn])
        ins = list(P) + list(Q_affine)
        if rem:
            ins = [jnp.pad(a, ((0, 0), (0, rem))) for a in ins]
            msk = jnp.pad(msk, ((0, 0), (0, rem)))
        specs = [pl.BlockSpec((K, bn), lambda i: (0, i))] * 10
        specs.append(pl.BlockSpec((2, bn), lambda i: (0, i)))
        args = ins + [msk]
        b3_limbs = tuple(
            tuple((c >> (16 * i)) & 0xFFFF for i in range(K))
            for c in self.b3_mont
        )
        if self.use_mxu:
            for tbl in self._tables:
                specs.append(pl.BlockSpec(tbl.shape, lambda i: (0, 0)))
                args.append(tbl)
        kern = partial(_fused_add_mixed2_kernel, self.t2, b3_limbs,
                       self.use_mxu)
        out = pl.pallas_call(
            kern,
            grid=((n + rem) // bn,),
            in_specs=specs,
            out_specs=[pl.BlockSpec((K, bn), lambda i: (0, i))] * 6,
            out_shape=[jax.ShapeDtypeStruct((K, n + rem), jnp.int32)] * 6,
            interpret=interpret,
        )(*args)
        if rem:
            out = [o[:, :n] for o in out]
        return tuple(out)

    @partial(jax.jit, static_argnums=(0, 3))
    def add(self, P, Q, use_pallas: bool = True):
        use_pallas = use_pallas and jax.default_backend() != "cpu"
        return self._add_impl(P, Q, use_pallas)

    @partial(jax.jit, static_argnums=(0, 2))
    def double(self, P, use_pallas: bool = True):
        use_pallas = use_pallas and jax.default_backend() != "cpu"
        return self._double_impl(P, use_pallas)
