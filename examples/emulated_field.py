"""Non-native field arithmetic example: prove x·y == res over secp256k1 Fp
inside a BN254 circuit.

≙ reference examples/emulated/emulated.go:8-23 (emulated.Element limbs as
circuit inputs, field ops through the emulated API).
Run: python examples/emulated_field.py
"""

import os
import sys

if os.environ.get("JAX_PLATFORMS") == "cpu":  # honor the env var even though
    import jax                                # site config pins the platform

    jax.config.update("jax_platforms", "cpu")

import random

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import Circuit, Secret, compile_circuit
from gnark_icicle_tpu.constraint.solver import solve
from gnark_icicle_tpu.std.emulated import SECP256K1_FP, EmulatedField

NL = SECP256K1_FP.n_limbs
W = SECP256K1_FP.limb_bits
P = SECP256K1_FP.modulus


def limbs(v):
    return [(int(v) >> (W * i)) & ((1 << W) - 1) for i in range(NL)]


class EmulatedMul(Circuit):
    x = Secret(shape=NL)
    y = Secret(shape=NL)
    res = Secret(shape=NL)

    def define(self, api):
        f = EmulatedField(api, SECP256K1_FP, bn254.R)
        prod = f.mul(f.from_limbs(self.x), f.from_limbs(self.y))
        f.assert_equal(prod, f.from_limbs(self.res))


def main():
    rng = random.Random(6)
    x = rng.randrange(P)
    y = rng.randrange(P)
    cs = compile_circuit(bn254.R, EmulatedMul)
    print(f"secp256k1-Fp mul inside bn254: {cs.nb_constraints} constraints")
    res = solve(cs, [], limbs(x) + limbs(y) + limbs(x * y % P))
    assert res.wires[0] == 1
    print("valid product solves")
    try:
        solve(cs, [], limbs(x) + limbs(y) + limbs((x * y + 1) % P))
        raise SystemExit("BUG: wrong product accepted")
    except Exception:
        print("wrong product rejected")


if __name__ == "__main__":
    main()
