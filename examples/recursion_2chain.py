"""Native 2-chain recursion: a BW6-761 Groth16 proof that verifies a
BLS12-377 Groth16 proof in-circuit.

≙ reference std/recursion/groth16 with the sw_bls12377 native instantiation
(std/algebra/native/doc.go): BW6-761's scalar field equals BLS12-377's base
field, so every inner-curve coordinate operation is ONE native constraint —
the cheap recursion path (contrast examples with emulated BN254-in-BN254).

Pipeline:
  1. inner:  compile cubic circuit over BLS12-377, setup, prove, verify
  2. outer:  compile a BW6-761 circuit embedding NativeGroth16Verifier
             (pairing + subgroup ladders + kSum, all native), setup,
             prove the VERIFICATION of the inner proof, verify
Run: python examples/recursion_2chain.py
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gnark_icicle_tpu.backend import groth16
from gnark_icicle_tpu.curves import bls12_377 as b377
from gnark_icicle_tpu.curves import bw6_761 as bw6
from gnark_icicle_tpu.frontend import Circuit, Public, Secret, compile_circuit
from gnark_icicle_tpu.std.recursion.native_groth16 import (
    NativeGroth16Verifier, NativeVerifierProof,
)


class Cubic(Circuit):
    """x³ + x + 5 == y — the classic inner statement."""

    x = Secret()
    y = Public()

    def define(self, api):
        x3 = api.mul(self.x, self.x, self.x)
        api.assert_is_equal(api.add(x3, self.x, 5), self.y)


def main(engine=None):
    if engine is None:
        import jax

        engine = "device" if jax.default_backend() == "tpu" else "host"
    t0 = time.time()
    inner_cs = compile_circuit(b377.R, Cubic)
    ipk, ivk = groth16.setup(inner_cs, b377.BLS12_377, rng=random.Random(1),
                             engine=engine)
    pub, sec = [35], [3]
    iproof = groth16.prove(inner_cs, ipk, pub, sec, b377.BLS12_377,
                           engine=engine,
                           rng=random.Random(2))
    groth16.verify(iproof, ivk, pub, b377.BLS12_377)
    print(f"inner BLS12-377 proof: OK ({time.time()-t0:.1f}s)")

    class OuterG16(Circuit):
        inner_pub = Public()
        pr = Secret(shape=8)  # ax ay | bx0 bx1 by0 by1 | cx cy

        def define(self, api):
            gv = NativeGroth16Verifier(api, ivk)
            p = self.pr
            w = NativeVerifierProof(
                ar=(p[0], p[1]),
                bs=((p[2], p[3]), (p[4], p[5])),
                krs=(p[6], p[7]),
            )
            gv.assert_proof(w, [self.inner_pub])

    t0 = time.time()
    outer_cs = compile_circuit(b377.P, OuterG16)
    print(f"outer circuit: {outer_cs.nb_constraints} constraints "
          f"({time.time()-t0:.1f}s compile)")
    t0 = time.time()
    opk, ovk = groth16.setup(outer_cs, bw6.BW6_761, rng=random.Random(3),
                             engine=engine)
    print(f"outer setup: {time.time()-t0:.1f}s")
    w = OuterG16(
        inner_pub=pub[0],
        pr=[iproof.ar[0], iproof.ar[1],
            iproof.bs[0].c0, iproof.bs[0].c1,
            iproof.bs[1].c0, iproof.bs[1].c1,
            iproof.krs[0], iproof.krs[1]],
    )
    opub, osec = w.witness_values(b377.P)
    t0 = time.time()
    oproof = groth16.prove(outer_cs, opk, opub, osec, bw6.BW6_761,
                           engine=engine,
                           rng=random.Random(4))
    print(f"outer prove: {time.time()-t0:.1f}s")
    groth16.verify(oproof, ovk, opub, bw6.BW6_761)
    print("outer BW6-761 proof of inner verification: OK")


if __name__ == "__main__":
    main()
