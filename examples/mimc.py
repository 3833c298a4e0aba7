"""MiMC preimage example (≙ reference examples/mimc — prove knowledge of a
hash preimage). Run: python examples/mimc.py"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import Circuit, Public, Secret, compile_circuit
from gnark_icicle_tpu.backend import groth16
from gnark_icicle_tpu.std.hash.mimc import MiMC, mimc_hash


class MiMCCircuit(Circuit):
    pre_image = Secret()
    hash = Public()

    def define(self, api):
        m = MiMC(api, bn254.R)
        m.write(self.pre_image)
        api.assert_is_equal(m.sum(), self.hash)


def main():
    curve = bn254.BN254
    cs = compile_circuit(bn254.R, MiMCCircuit)
    print(f"compiled: {cs}")
    rng = random.Random()
    t0 = time.time()
    pk, vk = groth16.setup(cs, curve, rng=rng)
    print(f"setup ({time.time()-t0:.1f}s)")
    pre = 0xC0FFEE
    h = mimc_hash(bn254.R, [pre])
    pub, sec = MiMCCircuit(pre_image=pre, hash=h).witness_values(bn254.R)
    t0 = time.time()
    proof = groth16.prove(cs, pk, pub, sec, curve, rng=rng)
    print(f"proved ({time.time()-t0:.1f}s)")
    groth16.verify(proof, vk, pub, curve)
    print("verified")


if __name__ == "__main__":
    main()
