"""Cubic example: prove knowledge of x with x³ + x + 5 == y.

≙ reference examples/cubic/cubic.go:22-36 — the canonical first circuit.
Run: python examples/cubic.py
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import Circuit, Public, Secret, compile_circuit
from gnark_icicle_tpu.backend import groth16


class CubicCircuit(Circuit):
    x = Secret()
    y = Public()

    def define(self, api):
        x3 = api.mul(self.x, self.x, self.x)
        api.assert_is_equal(self.y, api.add(x3, self.x, 5))


def main():
    curve = bn254.BN254
    t0 = time.time()
    cs = compile_circuit(bn254.R, CubicCircuit)
    print(f"compiled: {cs} ({time.time()-t0:.3f}s)")

    rng = random.Random()
    t0 = time.time()
    pk, vk = groth16.setup(cs, curve, rng=rng)
    print(f"setup done ({time.time()-t0:.3f}s)")

    witness = CubicCircuit(x=3, y=35)
    pub, sec = witness.witness_values(bn254.R)
    t0 = time.time()
    proof = groth16.prove(cs, pk, pub, sec, curve, rng=rng)
    print(f"proved ({time.time()-t0:.3f}s)")

    t0 = time.time()
    groth16.verify(proof, vk, pub, curve)
    print(f"verified ({time.time()-t0:.3f}s)")


if __name__ == "__main__":
    main()
