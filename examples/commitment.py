"""BSB22 commitment example: in-circuit randomness from api.commit.

≙ reference test/commitments_test.go usage: commit to witness values to get
a circuit variable that behaves like verifier-chosen randomness (backed by
a Pedersen commitment in the proof). Works under both Groth16 and PLONK.
Run: python examples/commitment.py
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import Circuit, Public, Secret, compile_circuit
from gnark_icicle_tpu.backend import groth16, plonk


class SetMembership(Circuit):
    """Prove x is one of three public values via a committed random
    challenge: (x−v0)(x−v1)(x−v2) == 0, plus a commitment binding x so the
    prover cannot grind the witness after seeing the challenge."""

    x = Secret()
    v = Public(shape=3)

    def define(self, api):
        c = api.commit(self.x)
        api.assert_is_different(c, 0)
        prod = 1
        for vi in self.v:
            prod = api.mul(prod, api.sub(self.x, vi))
        api.assert_is_equal(prod, 0)


def main():
    curve = bn254.BN254
    rng = random.Random()
    cs = compile_circuit(bn254.R, SetMembership)
    print(f"compiled: {cs}; commitments: {len(cs.commitments)}")

    pk, vk = groth16.setup(cs, curve, rng=rng)
    w = SetMembership(x=7, v=[5, 7, 11])
    pub, sec = w.witness_values(bn254.R)
    t0 = time.time()
    proof = groth16.prove(cs, pk, pub, sec, curve, rng=rng)
    print(f"groth16 proof with {len(proof.commitments)} Pedersen "
          f"commitment(s) + PoK ({time.time()-t0:.1f}s)")
    groth16.verify(proof, vk, pub, curve)
    print("groth16 verify: OK")
    print("wrong set rejected:",
          not groth16.is_valid(proof, vk, [5, 8, 11], curve))

    scs = compile_circuit(bn254.R, SetMembership, builder="scs")
    ppk, pvk = plonk.setup(scs, curve, rng=rng)
    t0 = time.time()
    pproof = plonk.prove(scs, ppk, pub, sec, curve, rng=rng)
    print(f"plonk proof with {len(pproof.bsb22_commitments)} BSB22 "
          f"commitment(s) ({time.time()-t0:.1f}s)")
    plonk.verify(pproof, pvk, pub, curve)
    print("plonk verify: OK")


if __name__ == "__main__":
    main()
