"""Serialization example: every artifact round-trips through bytes.

≙ reference examples/serialization/main.go:17-47 (R1CS WriteTo/ReadFrom,
pk WriteRawTo/ReadFrom, vk through a generic encoder).
Run: python examples/serialization.py
"""

import os
import sys

if os.environ.get("JAX_PLATFORMS") == "cpu":  # honor the env var even though
    import jax                                # site config pins the platform

    jax.config.update("jax_platforms", "cpu")

import random

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import compile_circuit
from gnark_icicle_tpu.backend import groth16
from gnark_icicle_tpu.io.serialize import (
    proof_from_bytes, proof_to_bytes, vk_from_bytes, vk_to_bytes,
)
from gnark_icicle_tpu.io.keys import (
    pk_from_bytes, pk_to_bytes, r1cs_from_bytes, r1cs_to_bytes,
)

from cubic import CubicCircuit  # noqa: E402 (examples dir on sys.path)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    curve = bn254.BN254
    cs = compile_circuit(bn254.R, CubicCircuit)

    blob = r1cs_to_bytes(cs)
    cs2 = r1cs_from_bytes(blob)
    print(f"r1cs: {len(blob)} bytes, "
          f"{cs2.nb_constraints} constraints after round-trip")

    pk, vk = groth16.setup(cs2, curve, rng=random.Random(1), engine="host")
    pk2 = pk_from_bytes(curve, pk_to_bytes(curve, pk))
    vk_blob = vk_to_bytes(curve, vk)  # compressed points
    vk2, _ = vk_from_bytes(curve, vk_blob)
    print(f"pk/vk round-tripped (vk = {len(vk_blob)} bytes compressed)")

    proof = groth16.prove(cs2, pk2, [35], [3], curve,
                          rng=random.Random(2), engine="host")
    p_blob = proof_to_bytes(curve, proof)
    proof2, _ = proof_from_bytes(curve, p_blob)
    groth16.verify(proof2, vk2, [35], curve)
    print(f"proof round-tripped ({len(p_blob)} bytes) and verified "
          "with the deserialized vk")


if __name__ == "__main__":
    main()
