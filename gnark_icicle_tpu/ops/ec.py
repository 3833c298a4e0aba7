"""Batched elliptic-curve arithmetic on device (jnp over limb arrays).

TPU counterpart of ICICLE's CUDA curve kernels (SURVEY.md §2.3). Key design
choice vs the reference: we use the *complete* homogeneous-projective
addition/doubling formulas for a=0 short-Weierstrass curves
(Renes–Costello–Batina 2016, algorithms 7 & 9). Complete formulas are
branchless — identity, doubling and inverse cases all flow through the same
multiplication schedule — which is exactly what a SIMD machine wants, and it
removes the infinity-point filtering the reference must do before calling
ICICLE (reference: backend/groth16/bn254/icicle/icicle.go:98-109,343-347,
working around icicle#169).

Points are pytrees ``(X, Y, Z)`` with the identity at ``(0, 1, 0)``;
coordinates are base-field elements — ``(..., K)`` limb arrays for G1,
``((..., K), (..., K))`` pairs for G2 over Fp2. One generic implementation
covers both via the DevField/DevField2 adapters.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .field import LimbField, I32


class DevField:
    """Base-field adapter: elements are (..., K) limb arrays."""

    def __init__(self, F: LimbField):
        self.F = F

    def key(self):
        return ("fp", self.F.modulus, self.F.K)

    def mul(self, a, b):
        return self.F.mont_mul(a, b)

    def sqr(self, a):
        return self.F.mont_mul(a, a)

    def add(self, a, b):
        return self.F.add(a, b)

    def sub(self, a, b):
        return self.F.sub(a, b)

    def neg(self, a):
        return self.F.neg(a)

    def zero_like(self, a):
        return jnp.zeros_like(a)

    def one_like(self, a):
        return jnp.broadcast_to(self.F.one_mont, a.shape).astype(I32)

    def is_zero(self, a):
        return self.F.is_zero(a)

    def select(self, mask, a, b):
        return jnp.where(mask[..., None], a, b)

    def const(self, value: int, like):
        return jnp.broadcast_to(
            jnp.asarray(self.F.encode([value])[0], dtype=I32), like.shape
        )

    # host encode/decode of raw ints
    def encode(self, vals):
        return self.F.encode(vals)

    def encode_plain(self, vals):
        """Host ints -> plain-form (N, K) numpy limbs (no R scaling — pair
        with a device to_mont so staging skips per-value bigint mulmods)."""
        return self.F.encode_plain(vals)

    def decode(self, arr):
        return self.F.decode(arr)


def _scale_small(F, x, k: int):
    """x·k for a small positive int constant via an add chain (Montgomery
    form is linear, so plain adds preserve the encoding)."""
    assert k >= 1
    acc = None
    run = x
    for bit in bin(k)[:1:-1]:  # LSB first
        if bit == "1":
            acc = run if acc is None else F.add(acc, run)
        run = F.add(run, run)
    return acc


class DevField2:
    """Quadratic extension Fp2 = Fp[u]/(u² − β): elements are (c0, c1).

    β is any small NEGATIVE non-residue (−1 for BN254/BLS12-381, −5 for
    BLS12-377 — curves/tower.py TowerParams.beta)."""

    def __init__(self, F: LimbField, beta: int = -1):
        assert beta < 0, "device Fp2 expects a small negative non-residue"
        self.F = F
        self.beta = beta

    def key(self):
        return ("fp2", self.F.modulus, self.F.K, self.beta)

    def _beta_term(self, m1):
        """−β·m1 (β < 0 so this is a positive small multiple)."""
        F = self.F
        return m1 if self.beta == -1 else _scale_small(F, m1, -self.beta)

    def mul(self, a, b):
        F = self.F
        a0, a1 = a
        b0, b1 = b
        m0 = F.mont_mul(a0, b0)
        m1 = F.mont_mul(a1, b1)
        # Karatsuba: c1 = (a0+a1)(b0+b1) - m0 - m1; c0 = m0 + β·m1
        c1 = F.sub(F.mont_mul(F.add(a0, a1), F.add(b0, b1)), F.add(m0, m1))
        return (F.sub(m0, self._beta_term(m1)), c1)

    def sqr(self, a):
        F = self.F
        a0, a1 = a
        if self.beta == -1:
            # (a0+a1)(a0-a1), 2*a0*a1
            c0 = F.mont_mul(F.add(a0, a1), F.sub(a0, a1))
            t = F.mont_mul(a0, a1)
            return (c0, F.add(t, t))
        m0 = F.mont_mul(a0, a0)
        m1 = F.mont_mul(a1, a1)
        t = F.mont_mul(a0, a1)
        return (F.sub(m0, self._beta_term(m1)), F.add(t, t))

    def add(self, a, b):
        F = self.F
        return (F.add(a[0], b[0]), F.add(a[1], b[1]))

    def sub(self, a, b):
        F = self.F
        return (F.sub(a[0], b[0]), F.sub(a[1], b[1]))

    def neg(self, a):
        F = self.F
        return (F.neg(a[0]), F.neg(a[1]))

    def zero_like(self, a):
        return (jnp.zeros_like(a[0]), jnp.zeros_like(a[1]))

    def one_like(self, a):
        one = jnp.broadcast_to(self.F.one_mont, a[0].shape).astype(I32)
        return (one, jnp.zeros_like(a[1]))

    def is_zero(self, a):
        return jnp.logical_and(self.F.is_zero(a[0]), self.F.is_zero(a[1]))

    def select(self, mask, a, b):
        m = mask[..., None]
        return (jnp.where(m, a[0], b[0]), jnp.where(m, a[1], b[1]))

    def const(self, value, like):
        """value: host Fp2 (from curves.tower) or (c0, c1) ints."""
        c0, c1 = (value.c0, value.c1) if hasattr(value, "c0") else value
        e = self.F.encode([c0, c1])
        return (
            jnp.broadcast_to(jnp.asarray(e[0], dtype=I32), like[0].shape),
            jnp.broadcast_to(jnp.asarray(e[1], dtype=I32), like[1].shape),
        )

    def encode(self, vals):
        """vals: host Fp2 objects or (c0, c1) tuples -> pair of (N, K)."""
        c0s = [v.c0 if hasattr(v, "c0") else v[0] for v in vals]
        c1s = [v.c1 if hasattr(v, "c1") else v[1] for v in vals]
        return (self.F.encode(c0s), self.F.encode(c1s))

    def encode_plain(self, vals):
        c0s = [v.c0 if hasattr(v, "c0") else v[0] for v in vals]
        c1s = [v.c1 if hasattr(v, "c1") else v[1] for v in vals]
        return (self.F.encode_plain(c0s), self.F.encode_plain(c1s))

    def decode(self, arr):
        c0s = self.F.decode(arr[0])
        c1s = self.F.decode(arr[1])
        return list(zip(c0s, c1s))


class DevCurve:
    """Batched a=0 short-Weierstrass group ops over a device field adapter.

    ``b3`` is the curve constant 3·b as a host value (int for Fp, Fp2 for G2).
    """

    _cache: dict = {}

    def __new__(cls, fops, b3_host):
        key = (fops.key(), repr(b3_host))
        if key in cls._cache:
            return cls._cache[key]
        self = super().__new__(cls)
        cls._cache[key] = self
        return self

    def __init__(self, fops, b3_host):
        if getattr(self, "_initialized", False):
            return
        self._initialized = True
        self.f = fops
        self.b3_host = b3_host
        # Fused Pallas group-law kernels (ops/ec_pallas.py): attached by
        # DeviceCtx on TPU backends; batches below the threshold stay on the
        # fused-by-XLA jnp path (kernel launch isn't worth it for the tiny
        # Horner/reduction steps).
        self.pallas = None
        self.pallas_min_batch = 2048

    def _use_pallas(self, P) -> bool:
        if self.pallas is None:
            return False
        leaf = jax.tree.leaves(P)[0]
        n = 1
        for d in leaf.shape[:-1]:
            n *= d
        return n >= self.pallas_min_batch

    # -- constructors -------------------------------------------------------
    def identity_like(self, x_coord):
        f = self.f
        return (f.zero_like(x_coord), f.one_like(x_coord), f.zero_like(x_coord))

    def from_affine(self, x, y, inf_mask=None):
        """Affine coords (+ optional infinity mask) -> projective."""
        f = self.f
        one = f.one_like(x)
        if inf_mask is None:
            return (x, y, one)
        z = f.select(inf_mask, f.zero_like(x), one)
        xx = f.select(inf_mask, f.zero_like(x), x)
        yy = f.select(inf_mask, one, y)
        return (xx, yy, z)

    def is_identity(self, P):
        return self.f.is_zero(P[2])

    def _b3(self, like):
        return self.f.const(self.b3_host, like)

    # -- complete group law (RCB16 alg. 7 / alg. 9, a = 0) -------------------
    @partial(jax.jit, static_argnums=0)
    def add(self, P, Q):
        if self._use_pallas(P):
            return self.pallas.add(P, Q)
        f = self.f
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        b3 = self._b3(X1)
        t0 = f.mul(X1, X2)
        t1 = f.mul(Y1, Y2)
        t2 = f.mul(Z1, Z2)
        t3 = f.mul(f.add(X1, Y1), f.add(X2, Y2))
        t3 = f.sub(t3, f.add(t0, t1))
        t4 = f.mul(f.add(Y1, Z1), f.add(Y2, Z2))
        t4 = f.sub(t4, f.add(t1, t2))
        Y3 = f.mul(f.add(X1, Z1), f.add(X2, Z2))
        Y3 = f.sub(Y3, f.add(t0, t2))
        t0 = f.add(f.add(t0, t0), t0)  # 3*X1X2
        t2 = f.mul(b3, t2)
        Z3 = f.add(t1, t2)
        t1 = f.sub(t1, t2)
        Y3 = f.mul(b3, Y3)
        X3 = f.sub(f.mul(t3, t1), f.mul(t4, Y3))
        Y3 = f.add(f.mul(Y3, t0), f.mul(t1, Z3))
        Z3 = f.add(f.mul(Z3, t4), f.mul(t0, t3))
        return (X3, Y3, Z3)

    @partial(jax.jit, static_argnums=0)
    def add_mixed(self, P, Q_affine):
        """P (projective) + Q (affine, assumed NOT infinity) — saves 1 mul.

        Complete in P (identity/doubling/inverse safe); Q must be a real
        point. Used by MSM inner loops where masked lanes substitute b3-free
        identity handling via select on the result instead.
        """
        if self._use_pallas(P):
            return self.pallas.add_mixed(P, Q_affine)
        f = self.f
        X1, Y1, Z1 = P
        X2, Y2 = Q_affine
        b3 = self._b3(X1)
        t0 = f.mul(X1, X2)
        t1 = f.mul(Y1, Y2)
        t3 = f.mul(f.add(X1, Y1), f.add(X2, Y2))
        t3 = f.sub(t3, f.add(t0, t1))
        t4 = f.add(f.mul(Y2, Z1), Y1)
        Y3 = f.add(f.mul(X2, Z1), X1)
        t0 = f.add(f.add(t0, t0), t0)
        t2 = f.mul(b3, Z1)
        Z3 = f.add(t1, t2)
        t1 = f.sub(t1, t2)
        Y3 = f.mul(b3, Y3)
        X3 = f.sub(f.mul(t3, t1), f.mul(t4, Y3))
        Y3 = f.add(f.mul(Y3, t0), f.mul(t1, Z3))
        Z3 = f.add(f.mul(Z3, t4), f.mul(t0, t3))
        return (X3, Y3, Z3)

    @partial(jax.jit, static_argnums=0)
    def double(self, P):
        if self._use_pallas(P):
            return self.pallas.double(P)
        f = self.f
        X, Y, Z = P
        b3 = self._b3(X)
        t0 = f.sqr(Y)
        Z3 = f.add(t0, t0)
        Z3 = f.add(Z3, Z3)
        Z3 = f.add(Z3, Z3)  # 8Y²
        t1 = f.mul(Y, Z)
        t2 = f.mul(b3, f.sqr(Z))
        X3 = f.mul(t2, Z3)
        Y3 = f.add(t0, t2)
        Z3 = f.mul(t1, Z3)
        t1 = f.add(t2, t2)
        t2 = f.add(t1, t2)
        t0 = f.sub(t0, t2)
        Y3 = f.add(f.mul(t0, Y3), X3)
        t1 = f.mul(X, Y)
        X3 = f.mul(t0, t1)
        X3 = f.add(X3, X3)
        return (X3, Y3, Z3)

    def neg(self, P):
        X, Y, Z = P
        return (X, self.f.neg(Y), Z)

    def select(self, mask, P, Q):
        f = self.f
        return tuple(f.select(mask, a, b) for a, b in zip(P, Q))

    @partial(jax.jit, static_argnums=0)
    def tree_reduce(self, P):
        """Sum a batch of points over the leading axis (log-depth, branchless).

        Odd tails are padded with the identity — harmless under the complete
        group law.
        """
        n = jax.tree.leaves(P)[0].shape[0]
        while n > 1:
            if n % 2:
                ident = self.identity_like(jax.tree.map(lambda c: c[:1], P)[0])
                P = jax.tree.map(
                    lambda a, b: jnp.concatenate([a, b], 0), P, ident
                )
                n += 1
            half = n // 2
            P = self.add(
                jax.tree.map(lambda c: c[:half], P),
                jax.tree.map(lambda c: c[half:], P),
            )
            n = half
        return P

    # -- host-side decode (test/verify path) --------------------------------
    def to_affine_host(self, P, p_modulus: int):
        """Projective device point(s) -> list of host affine tuples/None."""
        f = self.f
        X, Y, Z = jax.tree.map(np.asarray, P)
        xs = f.decode(X)
        ys = f.decode(Y)
        zs = f.decode(Z)
        out = []
        for x, y, z in zip(xs, ys, zs):
            if _is0(z):
                out.append(None)
            else:
                beta = getattr(f, "beta", -1)
                zi = _inv(z, p_modulus, beta)
                out.append((_mul(x, zi, p_modulus, beta),
                            _mul(y, zi, p_modulus, beta)))
        return out


def _is0(z):
    return z == 0 if isinstance(z, int) else (z[0] == 0 and z[1] == 0)


def _inv(z, p, beta=-1):
    if isinstance(z, int):
        return pow(z, -1, p)
    # Fp2 (c0, c1): 1/z = conj(z)/(c0² − β·c1²)
    c0, c1 = z
    d = pow((c0 * c0 - beta * c1 * c1) % p, -1, p)
    return (c0 * d % p, -c1 * d % p)


def _mul(a, b, p, beta=-1):
    if isinstance(a, int) and isinstance(b, int):
        return a * b % p
    a0, a1 = a if isinstance(a, tuple) else (a, 0)
    b0, b1 = b if isinstance(b, tuple) else (b, 0)
    return ((a0 * b0 + beta * a1 * b1) % p, (a0 * b1 + a1 * b0) % p)
