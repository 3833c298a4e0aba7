"""ECDSA example: prove knowledge of a valid secp256k1 signature without
revealing it.

≙ reference std/signature/ecdsa usage (ecdsa_test.go): sign on the host,
verify in-circuit over emulated fields. The engine run demonstrates the
gadget end-to-end instantly; compiling the full 256-bit circuit is a
multi-minute build (millions of constraints) — enable with --compile.
Run: python examples/ecdsa.py
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gnark_icicle_tpu.curves import bn254, secp256k1
from gnark_icicle_tpu.frontend import Circuit, Public, Secret, is_solved
from gnark_icicle_tpu.std.sw_emulated import SECP256K1, EmulatedCurve
from gnark_icicle_tpu.std import ecdsa
from gnark_icicle_tpu.std.emulated import SECP256K1_FP, SECP256K1_FR

Q = bn254.R


def limbs(v):
    return [(v >> (64 * i)) & ((1 << 64) - 1) for i in range(4)]


class EcdsaCircuit(Circuit):
    pub_x = Secret(shape=4)
    pub_y = Secret(shape=4)
    sig_r = Secret(shape=4)
    sig_s = Secret(shape=4)
    msg = Public(shape=4)

    def define(self, api):
        c = EmulatedCurve(api, SECP256K1, Q)
        ecdsa.verify(
            c,
            ecdsa.PublicKey(c.witness_point(self.pub_x, self.pub_y)),
            c.fr.from_limbs(self.msg),
            ecdsa.Signature(
                c.fr.from_limbs(self.sig_r), c.fr.from_limbs(self.sig_s)
            ),
        )


def main():
    rng = random.Random()
    d, pub = secp256k1.keygen(rng)
    msg_hash = rng.randrange(1, secp256k1.N)
    r, s = secp256k1.sign(d, msg_hash)
    print("host signature verifies:", secp256k1.verify(pub, msg_hash, (r, s)))

    w = EcdsaCircuit(
        pub_x=limbs(pub[0]), pub_y=limbs(pub[1]),
        sig_r=limbs(r), sig_s=limbs(s), msg=limbs(msg_hash),
    )
    t0 = time.time()
    print("in-circuit verify (engine):", is_solved(w, Q),
          f"({time.time()-t0:.1f}s)")

    bad = EcdsaCircuit(
        pub_x=limbs(pub[0]), pub_y=limbs(pub[1]),
        sig_r=limbs(r), sig_s=limbs((s + 1) % secp256k1.N),
        msg=limbs(msg_hash),
    )
    print("tampered signature rejected:", not is_solved(bad, Q))


if __name__ == "__main__":
    main()
