"""PLONK proof system (≙ reference backend/plonk/ — SURVEY.md §2.2).

The reference has no accelerated PLONK (ICICLE is Groth16-only); here both
the FFT farm and the KZG MSMs ride the same device kernels as Groth16
(SURVEY.md §3.5 "on TPU both map to the same two kernels")."""

from .setup import setup, build_permutation
from .prove import prove
from .verify import verify, is_valid, PlonkVerificationError
from .keys import ProvingKey, VerifyingKey, Proof

__all__ = [
    "setup", "build_permutation", "prove", "verify", "is_valid",
    "PlonkVerificationError", "ProvingKey", "VerifyingKey", "Proof",
]
