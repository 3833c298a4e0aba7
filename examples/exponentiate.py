"""Exponentiation example: prove y == x**e with a public small exponent done
bit-by-bit (≙ reference examples/exponentiate — square-and-multiply over
ToBinary bits). Run: python examples/exponentiate.py"""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import Circuit, Public, Secret, compile_circuit
from gnark_icicle_tpu.backend import groth16

BITS = 8


class ExponentiateCircuit(Circuit):
    x = Public()
    e = Secret()
    y = Public()

    def define(self, api):
        out = 1
        bits = api.to_binary(self.e, BITS)
        for i in range(BITS - 1, -1, -1):
            if i != BITS - 1:
                out = api.mul(out, out)
            multiplied = api.mul(out, self.x)
            out = api.select(bits[i], multiplied, out)
        api.assert_is_equal(self.y, out)


def main():
    curve = bn254.BN254
    cs = compile_circuit(bn254.R, ExponentiateCircuit)
    print(f"compiled: {cs}")
    rng = random.Random()
    pk, vk = groth16.setup(cs, curve, rng=rng)
    x, e = 2, 12
    y = pow(x, e, bn254.R)
    pub, sec = ExponentiateCircuit(x=x, e=e, y=y).witness_values(bn254.R)
    proof = groth16.prove(cs, pk, pub, sec, curve, rng=rng)
    groth16.verify(proof, vk, pub, curve)
    print("verified: 2^12 == 4096")


if __name__ == "__main__":
    main()
