"""Hash gadgets (≙ reference std/hash/)."""

from .mimc import MiMC, MiMCHost, keccak256

__all__ = ["MiMC", "MiMCHost", "keccak256"]
