"""Batched fixed-base scalar multiplication + batch normalization (device).

Role parity: gnark-crypto's BatchScalarMultiplicationG1/G2 as used by
Groth16 Setup (reference setup.go:251,320 — one batch for all pk/vk points)
and by SRS generation (test/unsafekzg). TPU shape: precompute the 2^i·G
ladder on host (cheap — one point), upload once, then one lax.scan of masked
complete mixed-adds over all scalars; work is bits·N adds, fully batched, and
rides the fused Pallas group-law kernels when attached.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .field import LimbField, I32
from .ec import DevCurve


class FixedBaseMul:
    """scalars × one base point, batched over the scalars."""

    _cache: dict = {}

    def __new__(cls, dev_curve: DevCurve, host_group, base, scalar_bits: int):
        key = (id(dev_curve), repr(base), scalar_bits)
        if key in cls._cache:
            return cls._cache[key]
        self = super().__new__(cls)
        cls._cache[key] = self
        return self

    def __init__(self, dev_curve: DevCurve, host_group, base,
                 scalar_bits: int):
        if getattr(self, "_initialized", False):
            return
        self._initialized = True
        self.curve = dev_curve
        self.bits = scalar_bits
        # host ladder 2^i · base (affine; base has prime order so no ∞)
        pows = []
        cur = base
        for _ in range(scalar_bits):
            pows.append(cur)
            cur = host_group.add(cur, cur)
        f = dev_curve.f
        self.ladder_x = jax.tree.map(
            jnp.asarray, f.encode([p[0] for p in pows])
        )
        self.ladder_y = jax.tree.map(
            jnp.asarray, f.encode([p[1] for p in pows])
        )

    @partial(jax.jit, static_argnums=0)
    def mul(self, scalar_limbs):
        """(N, Kr) plain 16-bit limbs -> projective points (leaves (N, K)).

        The ladder points and the per-bit masks ride the scan as xs (sliced
        by lax.scan itself) — no dynamic gathers in the body.
        """
        curve = self.curve
        n = scalar_limbs.shape[0]
        # bits matrix (bits, N): bit i of every scalar
        limb_idx = np.arange(self.bits) // 16
        shift = np.arange(self.bits) % 16
        bits = (
            (scalar_limbs[:, limb_idx] >> shift[None, :]) & 1
        ).T.astype(bool)  # (bits, N)

        x0 = jax.tree.map(lambda a: a[0], self.ladder_x)
        acc = curve.identity_like(
            jax.tree.map(lambda a: jnp.zeros((n,) + a.shape, a.dtype), x0)
        )

        def body(acc, xs):
            px, py, bit = xs
            pxb = jax.tree.map(
                lambda a: jnp.broadcast_to(a, (n,) + a.shape), px
            )
            pyb = jax.tree.map(
                lambda a: jnp.broadcast_to(a, (n,) + a.shape), py
            )
            added = curve.add_mixed(acc, (pxb, pyb))
            return curve.select(bit, added, acc), None

        acc, _ = jax.lax.scan(
            body, acc, (self.ladder_x, self.ladder_y, bits)
        )
        return acc


def batch_normalize(dev_curve: DevCurve, P):
    """Projective -> affine on device (Fermat inversion), plus ∞ mask.

    Returns ((x, y), inf_mask) in the MSM kernel's input layout.
    """
    f = dev_curve.f
    X, Y, Z = P
    if hasattr(f, "F") and not isinstance(jax.tree.leaves(X)[0], tuple) \
            and not isinstance(X, tuple):
        F = f.F
        inf = F.is_zero(Z)
        zi = F.mont_inv(Z)
        return (F.mont_mul(X, zi), F.mont_mul(Y, zi)), inf
    # Fp2 coordinates
    F = f.F
    z0, z1 = Z
    inf = jnp.logical_and(F.is_zero(z0), F.is_zero(z1))
    norm = F.add(F.mont_mul(z0, z0), F.mont_mul(z1, z1))
    ninv = F.mont_inv(norm)
    zi = (F.mont_mul(z0, ninv), F.neg(F.mont_mul(z1, ninv)))
    return (f.mul(X, zi), f.mul(Y, zi)), inf


def batch_scalar_mul_host(dev_curve: DevCurve, host_group, ctx_fr_scalars,
                          base, scalars, scalar_bits: int,
                          chunk: int = 1 << 16):
    """Host ints -> list of host affine points (None = infinity).

    Device compute, host I/O — the Setup/SRS convenience path. Work is
    CHUNKED to one fixed padded shape: arbitrary-N single-shot dispatch
    compiled a fresh 254-step scan per distinct size (minutes each), and
    odd shapes repeatedly crashed the axon worker mid-setup (r3 groth16
    bench, twice). One shape = one cache entry, bounded memory.
    """
    fb = FixedBaseMul(dev_curve, host_group, base, scalar_bits)
    p_mod = dev_curve.f.F.modulus
    n = len(scalars)
    out = []
    for lo in range(0, n, chunk):
        part = list(scalars[lo : lo + chunk])
        # pad to a power-of-two bucket (zero scalars -> infinity outputs,
        # dropped below): few distinct compile shapes for any input size
        bucket = 256
        while bucket < len(part):
            bucket *= 2
        part_padded = part + [0] * (bucket - len(part))
        proj = fb.mul(ctx_fr_scalars(part_padded))
        if len(part_padded) != len(part):
            proj = jax.tree.map(lambda a: a[: len(part)], proj)
        out.extend(dev_curve.to_affine_host(proj, p_mod))
    return out
