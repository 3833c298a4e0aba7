"""Recursion over a BSB22-commitment proof (the api.commit + recursion
combination the reference enables via recursion.NewShort — reference:
std/recursion/groth16/verifier.go:632-683 + std/commitments/pedersen).

Inner: a BLS12-377 circuit using api.commit, proved with the
recursion-friendly MiMC commitment hash. Outer: the native 2-chain
verifier folds the commitment into kSum and checks the Pedersen PoK —
here engine-level; compile the same circuit for a real BW6-761 outer
proof (tests/test_commit_recursion.py::test_outer_compiled_* does).

Run:  python examples/commit_recursion.py   (pure host, no TPU needed)
"""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from gnark_icicle_tpu.curves import bls12_377 as b377
from gnark_icicle_tpu.frontend import Circuit, Public, Secret, compile_circuit
from gnark_icicle_tpu.frontend.engine import Engine
from gnark_icicle_tpu.backend import groth16
from gnark_icicle_tpu.std.recursion.native_groth16 import (
    NativeGroth16Verifier,
)


class InnerCommit(Circuit):
    x = Secret()
    y = Public()

    def define(self, api):
        c = api.commit(self.x, self.y)   # BSB22 commitment binding x, y
        api.assert_is_different(c, 0)
        api.assert_is_equal(api.mul(self.x, self.x), self.y)


def main():
    cs = compile_circuit(b377.R, InnerCommit)
    pk, vk = groth16.setup(cs, b377.BLS12_377, rng=random.Random(1),
                           engine="host")
    pub, sec = [49], [7]
    # the outer circuit's native field is BW6-761's Fr == BLS12-377's Fp:
    # the commitment hash must be the outer-native MiMC so the verifier
    # can replay it (≙ WithProverHashToFieldFunction(recursion.NewShort))
    proof = groth16.prove(cs, pk, pub, sec, b377.BLS12_377,
                          rng=random.Random(2), engine="host",
                          commitment_hash=("mimc", b377.P))
    groth16.verify(proof, vk, pub, b377.BLS12_377,
                   commitment_hash=("mimc", b377.P))
    print("inner commitment proof verifies (host)")

    gv = NativeGroth16Verifier(Engine(b377.P), vk)
    gv.assert_proof(gv.proof_witness(proof), pub)
    print("outer in-circuit verification of the commitment proof: OK")


if __name__ == "__main__":
    main()
