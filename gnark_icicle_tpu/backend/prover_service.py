"""Persistent prover service — amortize per-process warmup across proofs.

Role parity: the reference's whole ``deviceInfo`` design exists for this
(backend/groth16/bn254/icicle/icicle.go:145-150 — lazy setupDevicePointers
runs once and every later Prove reuses the device-resident PK and warm
CUDA kernels). On the axon TPU stack the analogous per-process costs are:

  1. kernel executable loads — a persistent-compile-cache HIT still costs
     30-170 s per kernel (executable deserialize + axon AOT load; CLAUDE.md
     round-4 measurement). Paid once per (shape, kernel) per process.
  2. PK device staging — host→HBM transfer of the proving key's point
     tables; cached on the ProvingKey after the first prove.
  3. solver schedule/staging arrays — cached on the constraint system.

A ``Groth16Prover``/``PlonkProver`` holds (cs, pk, curve) for its lifetime
so ALL of these are first-proof-only; ``prove()`` then runs at the marginal
latency (bench: tools/run_2chain_device.py --iters N measures first vs
marginal; BASELINE.md records both). Deployments should keep ONE prover
process alive per (circuit, key) pair rather than forking per proof.
"""

from __future__ import annotations


class Groth16Prover:
    """Long-lived Groth16 prover bound to one (cs, pk, curve).

    ≙ the reference usage pattern groth16.Prove(..., WithIcicleAcceleration)
    called repeatedly in a resident service — device state reused across
    calls (icicle.go:145-150)."""

    def __init__(self, cs, pk, curve, engine: str = "device"):
        self.cs = cs
        self.pk = pk
        self.curve = curve
        self.engine = engine
        self._warm = False

    def warmup(self, public_values, secret_values, rng=None) -> float:
        """Run one full throwaway prove to force every kernel executable
        load + PK staging + solver schedule build. Returns the first-proof
        latency in seconds. Optional — the first prove() pays the same
        cost if warmup is skipped."""
        import time

        t0 = time.perf_counter()
        self.prove(public_values, secret_values, rng=rng)
        return time.perf_counter() - t0

    def prove(self, public_values, secret_values, rng=None,
              checkpoint_dir=None, commitment_hash="sha256"):
        from .groth16 import prove

        p = prove(self.cs, self.pk, public_values, secret_values,
                  self.curve, rng=rng, engine=self.engine,
                  checkpoint_dir=checkpoint_dir,
                  commitment_hash=commitment_hash)
        self._warm = True
        return p


class PlonkProver:
    """Long-lived PLONK prover bound to one (cs, pk, curve) — same
    amortization contract as Groth16Prover."""

    def __init__(self, cs, pk, curve, engine: str = "device"):
        self.cs = cs
        self.pk = pk
        self.curve = curve
        self.engine = engine
        self._warm = False

    def warmup(self, public_values, secret_values, rng=None) -> float:
        import time

        t0 = time.perf_counter()
        self.prove(public_values, secret_values, rng=rng)
        return time.perf_counter() - t0

    def prove(self, public_values, secret_values, rng=None,
              checkpoint_dir=None, fs_hash: str = "sha256"):
        from .plonk import prove

        p = prove(self.cs, self.pk, public_values, secret_values,
                  self.curve, rng=rng, engine=self.engine,
                  checkpoint_dir=checkpoint_dir, fs_hash=fs_hash)
        self._warm = True
        return p
