"""Device context: per-curve bundle of device fields, curves, and kernels.

Role parity: the iciclegnark device-runtime layer (reference:
backend/groth16/bn254/icicle/provingkey.go:10-28 deviceInfo holds
G1Device/G2Device/DomainDevice pointers; icicle.go:31-130 setupDevicePointers
uploads them once). Here "device pointers" are jax arrays cached on key
objects; the context is the factory for the kernels they feed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .ops.field import LimbField, field_for, I32
from .ops.ec import DevCurve, DevField, DevField2
from .ops.ntt import Domain, domain_for
from .ops.msm import MSMKernel, scalars_to_limbs


def _mont_chunked(dev_field: LimbField, values: np.ndarray) -> jnp.ndarray:
    """Plain (N, K) int limbs -> Montgomery form on device, chunked over N
    (the (N, K, K) half-product temp inside mont_mul is ~1-3 KB/element).

    The chunk scales as 1/K²: temps grow quadratically with the limb count,
    so the 2^20 chunk tuned for fr (K=16) would OOM HBM staging ≥2^20
    BW6-761 Fp points (K=48, ~9x the temp bytes per element)."""
    n = values.shape[0]
    k = values.shape[1]
    budget = max(1 << 14, ((1 << 20) * 16 * 16) // (k * k))
    chunk = 1 << (budget.bit_length() - 1)  # pow2: one jit shape per field

    def stage(arr):
        # limbs are 16-bit values: ship them over the (slow) axon tunnel
        # as uint16 and widen ON DEVICE — halves the H2D bytes (the r5c
        # computeH breakdown showed pad_mont ≈ 8 s at 2^20, transfer-bound)
        return dev_field.to_mont(
            jnp.asarray(arr.astype(np.uint16)).astype(jnp.int32))

    if n <= chunk:
        return stage(values)
    parts = [stage(values[lo : lo + chunk]) for lo in range(0, n, chunk)]
    return jnp.concatenate(parts, axis=0)


class DeviceCtx:
    """Device-side kernels + conversions for one host curve object."""

    _cache: dict = {}

    def __new__(cls, curve):
        if curve.name in cls._cache:
            return cls._cache[curve.name]
        return super().__new__(cls)

    def __init__(self, curve):
        if getattr(self, "_initialized", False):
            return
        self.curve = curve
        self.fp_dev = field_for(curve.fp.modulus)
        self.fr_dev = field_for(curve.fr.modulus)
        g1_b3 = (3 * curve.g1.b) % curve.fp.modulus  # int
        self.g1_dev = DevCurve(DevField(self.fp_dev), g1_b3)
        g2_b = curve.g2.b
        # G2 lives over Fp2 for embedding-degree-12 curves (BN254/BLS12)
        # but over Fp itself for BW6-761 (embedding degree 6: the sextic
        # twist is defined over the base field, curves/bw6_761.py)
        self._g2_fp2 = hasattr(g2_b, "c0")
        if self._g2_fp2:
            g2_b3 = g2_b * 3
            self.g2_dev = DevCurve(
                DevField2(self.fp_dev, beta=curve.tower.beta),
                (g2_b3.c0, g2_b3.c1),
            )
        else:
            g2_b3 = (3 * g2_b) % curve.fp.modulus
            self.g2_dev = DevCurve(DevField(self.fp_dev), g2_b3)
        bits = curve.fr.modulus.bit_length()
        self.msm_g1 = MSMKernel(self.g1_dev, bits)
        self.msm_g2 = MSMKernel(self.g2_dev, bits)

        # fused Pallas group-law kernels on TPU (ops/ec_pallas.py); the jnp
        # path stays authoritative on CPU and for small batches. Override
        # with GNARK_TPU_PALLAS=0/1.
        import os

        flag = os.environ.get("GNARK_TPU_PALLAS", "auto")
        on_tpu = jax.default_backend() not in ("cpu",)
        if flag == "1" or (flag == "auto" and on_tpu):
            from .ops.ec_pallas import PallasEC

            interpret = not on_tpu
            self.g1_dev.pallas = PallasEC(
                self.fp_dev, g1_b3, fp2=False, interpret=interpret
            )
            # The Fp2 (G2) kernel now compiles on v5e (the Mosaic CHECK was
            # triggered by sub-tile (1, K) bias blocks — fixed by replicating
            # b3 to a full block) and is bit-exact, but the packed-tile
            # sublane slicing makes it ~2x SLOWER than the XLA-fused jnp
            # path — so G2 stays on jnp until the layout is reworked
            # (ROADMAP.md). Opt in for experiments:
            if (os.environ.get("GNARK_TPU_PALLAS_G2", "0") == "1"
                    and self._g2_fp2):
                self.g2_dev.pallas = PallasEC(
                    self.fp_dev, (g2_b3.c0, g2_b3.c1), fp2=True,
                    interpret=interpret, beta=curve.tower.beta,
                )

        # register only after a fully successful init — a transient device
        # failure mid-construction must not poison the singleton cache
        self._initialized = True
        DeviceCtx._cache[curve.name] = self

    # -- domains -----------------------------------------------------------
    def domain(self, log_n: int, coset: bool = False) -> Domain:
        return domain_for(self.fr_dev, self.curve.fr, log_n, coset=coset)

    # -- host <-> device conversions ----------------------------------------
    def fr_scalars(self, values) -> jnp.ndarray:
        """Host ints or (N, K) int32 limb array -> plain-form limbs."""
        if isinstance(values, np.ndarray) and values.ndim == 2:
            # u16 over the tunnel, widen on device (see _mont_chunked)
            return jnp.asarray(values.astype(np.uint16)).astype(jnp.int32)
        return jnp.asarray(
            scalars_to_limbs([v % self.curve.fr.modulus for v in values],
                             self.fr_dev.K)
        )

    def fr_mont(self, values) -> jnp.ndarray:
        """Host ints or plain limb array -> Montgomery-form limbs.

        Array inputs convert on device (to_mont = one mont_mul by R²) — the
        native-solver fast path never touches Python bigints. Conversion is
        chunked over N: the (N, K, K) half-product temp inside mont_mul is
        ~3 KB/element, which OOMs HBM at 2^24 in one shot (49.5 GB for a
        15.75 GB chip — the round-2 ntt-2^24 sweep failure)."""
        if isinstance(values, np.ndarray) and values.ndim == 2:
            return _mont_chunked(self.fr_dev, values)
        return jnp.asarray(self.fr_dev.encode(values))

    def g1_points(self, points_host):
        """Host affine G1 (None = infinity) -> (pytree, inf_mask) device."""
        return self._points(points_host, self.g1_dev, (0, 1))

    def g2_points(self, points_host):
        if not self._g2_fp2:  # BW6-761: G2 coordinates live in Fp
            return self._points(points_host, self.g2_dev, (0, 1))
        from .curves.tower import Fp2

        zero = Fp2.zero(self.curve.tower)
        one = Fp2.one(self.curve.tower)
        return self._points(points_host, self.g2_dev, (zero, one))

    def _points(self, points_host, dev_curve, inf_sub):
        """PK staging hot path: plain host encode (C-level to_bytes) + the
        R-scaling as a chunked device mont_mul — no per-value bigint mulmod
        (was ~half of Groth16 pk staging at 2^20 wires)."""
        inf = np.array([p is None for p in points_host], dtype=bool)
        filled = [p if p is not None else inf_sub for p in points_host]
        f = dev_curve.f
        # convert in the curve's own coordinate field (today always a view
        # over fp_dev, but the coupling stays explicit — ADVICE r3)
        enc = lambda plain: _mont_chunked(f.F, plain)  # noqa: E731
        x = jax.tree.map(enc, f.encode_plain([p[0] for p in filled]))
        y = jax.tree.map(enc, f.encode_plain([p[1] for p in filled]))
        return (x, y), jnp.asarray(inf)

    def g1_to_host(self, P):
        """Projective device point (unbatched) -> host affine / None."""
        batched = jax.tree.map(lambda a: a[None], P)
        return self.g1_dev.to_affine_host(batched, self.curve.fp.modulus)[0]

    def g2_to_host(self, P):
        batched = jax.tree.map(lambda a: a[None], P)
        res = self.g2_dev.to_affine_host(batched, self.curve.fp.modulus)[0]
        if res is None or not self._g2_fp2:
            return res
        from .curves.tower import Fp2

        tp = self.curve.tower
        return (Fp2(tp, *res[0]), Fp2(tp, *res[1]))
