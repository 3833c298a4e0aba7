"""Cross-curve recursion: BLS12-381 proofs verified inside BN254 circuits.

≙ reference std/recursion/{groth16,plonk} instantiated with sw_bls12381
(the aggregation pattern: prove on one curve, verify — and eventually
wrap — on another). Every scalar of the verifier, including the MiMC
Fiat-Shamir transcript replay, runs through the EMULATED inner Fr.

Pipeline:
  1. inner:  compile a cubic circuit over BLS12-381, Groth16-prove it;
             PLONK-prove it too with fs_hash="mimc" (recursion-friendly
             transcript, ≙ recursion.NewShort)
  2. outer:  bind both proofs as witnesses of the in-circuit verifiers
             over a BN254 engine — subgroup ladders (BLS12-381's G1
             cofactor!), kSum/linearization algebra, pairing products
Run: python examples/cross_curve_recursion.py
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gnark_icicle_tpu.backend import groth16, plonk
from gnark_icicle_tpu.curves import bls12_381 as b381
from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import Circuit, Public, Secret, compile_circuit
from gnark_icicle_tpu.frontend.engine import Engine, EngineUnsatisfiedError
from gnark_icicle_tpu.std.recursion import Groth16Verifier
from gnark_icicle_tpu.std.recursion.plonk import PlonkVerifier

Q = bn254.R  # the outer (native) field


class Cubic(Circuit):
    x = Secret()
    y = Public()

    def define(self, api):
        x3 = api.mul(self.x, self.x, self.x)
        api.assert_is_equal(self.y, api.add(x3, self.x, 5))


def main():
    rng = random.Random(1)

    # ---- inner proofs over BLS12-381 ----------------------------------
    t0 = time.time()
    cs = compile_circuit(b381.R, Cubic)
    pk, vk = groth16.setup(cs, b381.BLS12_381, rng=rng)
    g_proof = groth16.prove(cs, pk, [35], [3], b381.BLS12_381, rng=rng)
    groth16.verify(g_proof, vk, [35], b381.BLS12_381)
    print(f"inner Groth16 over BLS12-381: proved+verified "
          f"({time.time()-t0:.1f}s)")

    t0 = time.time()
    scs = compile_circuit(b381.R, Cubic, builder="scs")
    ppk, pvk = plonk.setup(scs, b381.BLS12_381, rng=rng)
    p_proof = plonk.prove(scs, ppk, [35], [3], b381.BLS12_381, rng=rng,
                          fs_hash="mimc")
    plonk.verify(p_proof, pvk, [35], b381.BLS12_381, fs_hash="mimc")
    print(f"inner PLONK over BLS12-381 (mimc transcript): proved+verified "
          f"({time.time()-t0:.1f}s)")

    # ---- outer: in-circuit verification over BN254 --------------------
    t0 = time.time()
    gv = Groth16Verifier(Engine(Q), Q, vk, curve_id="bls12-381")
    gv.assert_proof(gv.proof_witness(g_proof), [35])
    print(f"outer Groth16Verifier accepted the real proof "
          f"({time.time()-t0:.1f}s)")

    t0 = time.time()
    pv = PlonkVerifier(Engine(Q), Q, pvk, curve_id="bls12-381")
    pv.assert_proof(pv.proof_witness(p_proof), [35])
    print(f"outer PlonkVerifier replayed the emulated-Fr transcript and "
          f"accepted ({time.time()-t0:.1f}s)")

    try:
        bad = Groth16Verifier(Engine(Q), Q, vk, curve_id="bls12-381")
        bad.assert_proof(bad.proof_witness(g_proof), [36])
        raise AssertionError("wrong public input accepted!")
    except EngineUnsatisfiedError:
        print("wrong public input rejected")


if __name__ == "__main__":
    main()
