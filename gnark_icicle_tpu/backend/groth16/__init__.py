"""Groth16 proof system (≙ reference backend/groth16/ + the icicle
accelerated prover whose role the device kernels replace)."""

from .keys import ProvingKey, VerifyingKey, Proof
from .setup import setup
from .prove import prove
from .verify import verify, is_valid, VerificationError

__all__ = [
    "ProvingKey",
    "VerifyingKey",
    "Proof",
    "setup",
    "prove",
    "verify",
    "is_valid",
    "VerificationError",
]
