"""Input-packing example: replace many public inputs with ONE public hash.

≙ reference examples/inputpacking/doc.go:1-19 + inputpacking_test.go — the
verifier receives only MiMC(inputs) as the public input; the real inputs
become witnesses whose in-circuit hash must match. This shrinks verifier
work, recursion cost and Solidity calldata.
Run: python examples/inputpacking.py
"""

import os
import sys

if os.environ.get("JAX_PLATFORMS") == "cpu":  # honor the env var even though
    import jax                                # site config pins the platform

    jax.config.update("jax_platforms", "cpu")

import random

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import Circuit, Public, Secret, compile_circuit
from gnark_icicle_tpu.backend import groth16
from gnark_icicle_tpu.std.hash.mimc import MiMC, mimc_hash


class Packed(Circuit):
    digest = Public()          # the ONLY public input
    a = Secret()               # logically-public values, now witnesses
    b = Secret()
    c = Secret()

    def define(self, api):
        h = MiMC(api, bn254.R)
        h.write(self.a, self.b, self.c)
        api.assert_is_equal(h.sum(), self.digest)
        # ... the real statement about a, b, c goes here:
        api.assert_is_equal(api.add(self.a, self.b), self.c)


def main():
    rng = random.Random(4)
    a = rng.randrange(bn254.R)
    b = rng.randrange(bn254.R)
    c = (a + b) % bn254.R

    # the VERIFIER recomputes the digest from the public values it knows
    digest = mimc_hash(bn254.R, [a, b, c])

    cs = compile_circuit(bn254.R, Packed)
    print(f"packed circuit: {cs.nb_constraints} constraints, "
          f"1 public input instead of 3")
    pk, vk = groth16.setup(cs, bn254.BN254, rng=random.Random(1),
                           engine="host")
    proof = groth16.prove(cs, pk, [digest], [a, b, c], bn254.BN254,
                          rng=random.Random(2), engine="host")
    groth16.verify(proof, vk, [digest], bn254.BN254)
    print("proof verified against the packed digest")

    assert not groth16.is_valid(proof, vk, [(digest + 1) % bn254.R],
                                bn254.BN254)
    print("wrong digest rejected")


if __name__ == "__main__":
    main()
