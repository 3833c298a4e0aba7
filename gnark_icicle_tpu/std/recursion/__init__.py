"""In-circuit proof verification — recursion gadgets.

Role parity: reference std/recursion (groth16/verifier.go,
plonk/verifier.go) — verify an inner proof inside an outer circuit, built
on the emulated curve/pairing gadgets.
"""

from .groth16 import Groth16Verifier, VerifierProof  # noqa: F401
from .plonk import PlonkVerifier, PlonkVerifierProof  # noqa: F401
