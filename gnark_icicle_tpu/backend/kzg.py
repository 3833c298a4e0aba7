"""KZG polynomial commitments over the device MSM kernel.

Role parity: gnark-crypto's kzg package as used by the PLONK backend
(reference: backend/plonk/bn254/prove.go KZG commits/opens; test SRS from
test/unsafekzg — insecure tau, kzgsrs.go:64). Commitments are device MSMs
over the SRS powers; openings divide by (X−z) with Horner synthetic division
(host big-int, O(n) — the commit MSM dominates); pairing checks ride the
host verifier oracle.
"""

from __future__ import annotations

import secrets
from dataclasses import dataclass

from ..device import DeviceCtx
from ..ops.msm import pick_window


@dataclass
class SRS:
    """Powers of tau: [τ^i]₁ for i ≤ n, plus [1]₂, [τ]₂."""

    g1_powers: list  # host affine points
    g2_gen: tuple
    g2_tau: tuple
    _device: dict = None

    def device_points(self, ctx: DeviceCtx, n: int):
        """Upload-once device staging of the first n G1 powers."""
        if self._device is None:
            self._device = {}
        if n not in self._device:
            self._device[n] = ctx.g1_points(self.g1_powers[:n])
        return self._device[n]


def unsafe_srs(curve, size: int, tau: int | None = None, rng=None,
               engine: str = "auto") -> SRS:
    """Insecure SRS for tests/benchmarks (≙ test/unsafekzg, kzgsrs.go:64).

    Knowing tau lets the host build the power list in O(n) field ops + n
    fixed-base scalar muls.
    """
    q = curve.fr.modulus
    if tau is None:
        tau = (rng.randrange if rng else (lambda m: secrets.randbelow(m - 1) + 1))(q)
    g1 = curve.g1
    scalars = []
    acc = 1
    for _ in range(size):
        scalars.append(acc)
        acc = acc * tau % q
    if engine != "host" and size >= 256:  # device fixed-base batch
        from .. import device as _device
        from ..ops.fixed_base import batch_scalar_mul_host

        ctx = _device.DeviceCtx(curve)
        powers = batch_scalar_mul_host(
            ctx.g1_dev, g1, ctx.fr_scalars, g1.generator, scalars,
            q.bit_length(),
        )
    else:
        powers = [g1.scalar_mul(g1.generator, s) for s in scalars]
    return SRS(
        g1_powers=powers,
        g2_gen=curve.g2.generator,
        g2_tau=curve.g2.scalar_mul(curve.g2.generator, tau),
    )


class KZG:
    """Commit/open/verify bound to one curve + SRS."""

    def __init__(self, curve, srs: SRS):
        self.curve = curve
        self.srs = srs
        self._ctx = None
        self.q = curve.fr.modulus

    @property
    def ctx(self):
        """Lazy device context: verify-only callers (host pairing) never
        touch the device — required for curves without a device layer
        (bls24-315's Fp4 G2) and cheaper for host-engine verifiers."""
        if self._ctx is None:
            self._ctx = DeviceCtx(self.curve)
        return self._ctx

    # -- commit (device MSM) -------------------------------------------------
    def commit(self, coeffs: list) -> tuple:
        """[p(τ)]₁ for coefficient list (host ints, low-to-high degree)."""
        n = len(coeffs)
        if n == 0:
            return None
        return self._commit_scal(self.ctx.fr_scalars(coeffs), n)

    def commit_mont(self, coeffs_mont) -> tuple:
        """[p(τ)]₁ for a device Montgomery-form (n, K) coefficient array —
        the PLONK quotient path commits without any host round-trip."""
        n = coeffs_mont.shape[0]
        return self._commit_scal(self.ctx.fr_dev.from_mont(coeffs_mont), n)

    def _commit_scal(self, scal, n):
        assert n <= len(self.srs.g1_powers), "SRS too small"
        pts, inf = self.srs.device_points(self.ctx, n)
        res = self.ctx.msm_g1.msm(pts, inf, scal, pick_window(n))
        return self.ctx.g1_to_host(res)

    # -- batched commits (one wave loop for M polynomials) -------------------
    def commit_batch(self, coeffs_list) -> list:
        """[p_m(τ)]₁ for M equal-length coefficient lists via ONE msm_batch
        over the SHARED SRS table (≙ ICICLE MSM cfg.BatchSize) — the M
        problems ride one wave while_loop, paying the per-wave fixed
        overhead once instead of M times (the PLONK prover's a/b/c and
        t1/t2/t3 commit groups, prove.go:320-340,718-720)."""
        ns = {len(c) for c in coeffs_list}
        assert len(ns) == 1, "commit_batch needs equal-length polynomials"
        n = ns.pop()
        if n == 0:
            return [None] * len(coeffs_list)
        import jax.numpy as jnp

        scal = jnp.stack([self.ctx.fr_scalars(c) for c in coeffs_list])
        return self._commit_scal_batch(scal, n)

    def commit_mont_batch(self, mont_list) -> list:
        """Batched commit_mont: M device Montgomery (n, K) arrays."""
        import jax.numpy as jnp

        n = mont_list[0].shape[0]
        assert all(m.shape[0] == n for m in mont_list)
        scal = jnp.stack(
            [self.ctx.fr_dev.from_mont(m) for m in mont_list])
        return self._commit_scal_batch(scal, n)

    def _commit_scal_batch(self, scal, n):
        assert n <= len(self.srs.g1_powers), "SRS too small"
        import jax
        import jax.numpy as jnp

        pts, inf = self.srs.device_points(self.ctx, n)
        M = scal.shape[0]
        res = self.ctx.msm_g1.msm_batch(
            jax.tree.map(lambda a: a[None], pts),   # shared point table
            jnp.broadcast_to(inf, (M, n)), scal, pick_window(n),
        )
        return [
            self.ctx.g1_to_host(jax.tree.map(lambda a, m=m: a[m], res))
            for m in range(M)
        ]

    # -- open ------------------------------------------------------------------
    def open(self, coeffs: list, z: int):
        """(value p(z), proof [q(τ)]₁) with q = (p − p(z))/(X − z)."""
        q = self.q
        z %= q
        # synthetic division, highest degree first
        quot = [0] * (len(coeffs) - 1)
        acc = 0
        for i in range(len(coeffs) - 1, 0, -1):
            acc = (acc * z + coeffs[i]) % q
            quot[i - 1] = acc
        value = (acc * z + coeffs[0]) % q
        proof = self.commit(quot) if quot else None
        return value, proof

    # -- verify (host pairing) ---------------------------------------------------
    def verify(self, commitment, z: int, value: int, proof) -> bool:
        """e(C − [v]₁ + z·π, [1]₂) · e(−π, [τ]₂) == 1."""
        g1, g2 = self.curve.g1, self.curve.g2
        q = self.q
        # C − v·G1 + z·π
        acc = commitment
        acc = g1.add(acc, g1.scalar_mul(g1.generator, (-value) % q))
        if proof is not None:
            acc = g1.add(acc, g1.scalar_mul(proof, z % q))
        pairs = [(acc, self.srs.g2_gen)]
        if proof is not None:
            pairs.append((g1.neg(proof), self.srs.g2_tau))
        return self.curve.pairing(pairs)

    def batch_verify_same_point(self, commitments, z, values, proofs,
                                gamma: int) -> bool:
        """Fold commitments/openings at the same z with powers of gamma
        (≙ kzg.BatchVerifySinglePoint)."""
        g1 = self.curve.g1
        q = self.q
        acc_c = None
        acc_v = 0
        acc_p = None
        g = 1
        for cm, v, pf in zip(commitments, values, proofs):
            acc_c = g1.add(acc_c, g1.scalar_mul(cm, g))
            acc_v = (acc_v + g * v) % q
            acc_p = g1.add(acc_p, g1.scalar_mul(pf, g))
            g = g * gamma % q
        return self.verify(acc_c, z, acc_v, acc_p)
