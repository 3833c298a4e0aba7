"""PLONK example (≙ reference examples/plonk/main.go:73-120): compile a
circuit under the sparse (gate) arithmetization, set up with a universal
(test) SRS, prove on the device kernels, verify.

Run: python examples/plonk.py
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import Circuit, Public, Secret, compile_circuit
from gnark_icicle_tpu.backend import plonk


class PlonkCircuit(Circuit):
    """x**3 + x == y, with a selector-style conditional thrown in."""

    x = Secret()
    y = Public()

    def define(self, api):
        x3 = api.mul(self.x, self.x, self.x)
        s = api.is_zero(self.x)
        val = api.select(s, 0, api.add(x3, self.x))
        api.assert_is_equal(val, self.y)


def main():
    curve = bn254.BN254
    t0 = time.time()
    cs = compile_circuit(bn254.R, PlonkCircuit, builder="scs")
    print(f"compiled: {cs} ({time.time()-t0:.2f}s)")
    rng = random.Random()
    t0 = time.time()
    pk, vk = plonk.setup(cs, curve, rng=rng)
    print(f"setup (universal SRS + trace commitments) ({time.time()-t0:.1f}s)")
    x = 4
    y = (x**3 + x) % bn254.R
    pub, sec = PlonkCircuit(x=x, y=y).witness_values(bn254.R)
    t0 = time.time()
    proof = plonk.prove(cs, pk, pub, sec, curve, rng=rng)
    print(f"proved ({time.time()-t0:.1f}s)")
    plonk.verify(proof, vk, pub, curve)
    print("verified")


if __name__ == "__main__":
    main()
