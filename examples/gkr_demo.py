"""GKR example: prove many instances of a small arithmetic circuit with one
logarithmic-size proof, verified in-circuit.

≙ reference std/gkr usage: the prover evaluates out = a·b + a over 2^k
instances and produces layered sumcheck proofs; the verifier only touches
the inputs/outputs plus O(k) field work per wire.
Run: python examples/gkr_demo.py
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend.engine import Engine
from gnark_icicle_tpu.std import gkr
from gnark_icicle_tpu.std.gkr import (
    AddGate, MulGate, Wire, Circuit, evaluate_circuit,
)

Q = bn254.R


def main():
    rng = random.Random()
    n_vars = 10
    n = 1 << n_vars  # 1024 instances

    circuit = Circuit([
        Wire(),                 # input a
        Wire(),                 # input b
        Wire(MulGate, [0, 1]),  # a·b
        Wire(AddGate, [2, 0]),  # a·b + a  (output)
    ])
    inputs = {
        0: [rng.randrange(Q) for _ in range(n)],
        1: [rng.randrange(Q) for _ in range(n)],
    }

    eng = Engine(Q)
    t0 = time.time()
    assignments = evaluate_circuit(eng, circuit, inputs)
    proof = gkr.prove(eng, circuit, assignments)
    nb_vals = sum(
        sum(len(p) for p in sp.partial_sum_polys) + len(sp.final_eval_proof)
        for sp in proof.sumchecks.values()
    )
    print(f"proved {n} instances in {time.time()-t0:.2f}s "
          f"(proof: {nb_vals} field elements)")

    t0 = time.time()
    gkr.verify(Engine(Q), circuit, inputs, {3: assignments[3]}, proof, n_vars)
    print(f"verified in {time.time()-t0:.2f}s")

    bad = dict(inputs)
    bad[0] = list(inputs[0])
    bad[0][n // 2] = (bad[0][n // 2] + 1) % Q
    try:
        gkr.verify(Engine(Q), circuit, bad, {3: assignments[3]}, proof,
                   n_vars)
        print("tampered input accepted (BUG)")
    except Exception:
        print("tampered input rejected")

    groth16_pipeline()


def groth16_pipeline(engine=None):
    """The standard compile→setup→prove→verify path with api-level GKR (≙
    reference constraint/bn254/gkr.go integration: the GKR sub-proof is
    produced by solver hints and verified inside the SNARK circuit — no
    manual proof plumbing). engine defaults to the device kernels on TPU
    and the host prover elsewhere."""
    if engine is None:
        import jax

        engine = "device" if jax.default_backend() == "tpu" else "host"
    from gnark_icicle_tpu.backend import groth16
    from gnark_icicle_tpu.frontend import (
        Circuit as FrontCircuit, Public, Secret, compile_circuit,
    )
    from gnark_icicle_tpu.std.gkr import GkrApi

    n = 4  # instances inside the SNARK (kept small: in-circuit verify cost)

    class GkrInside(FrontCircuit):
        a = Secret(shape=n)
        b = Secret(shape=n)
        want = Public(shape=n)

        def define(self, api):
            g = GkrApi()
            wa = g.import_(list(self.a))
            wb = g.import_(list(self.b))
            out = g.add(g.mul(wa, wb), wa)  # a·b + a per instance
            sol = g.solve(api)
            for o, w in zip(sol.export(out), self.want):
                api.assert_is_equal(o, w)
            sol.verify()  # GKR sumcheck proof checked in-circuit

    rng = random.Random(7)
    A = [rng.randrange(Q) for _ in range(n)]
    B = [rng.randrange(Q) for _ in range(n)]
    W = [(a * b + a) % Q for a, b in zip(A, B)]

    t0 = time.time()
    cs = compile_circuit(Q, GkrInside)
    print(f"compiled GKR circuit: {cs.nb_constraints} constraints "
          f"({time.time()-t0:.2f}s)")
    pk, vk = groth16.setup(cs, bn254.BN254, rng=random.Random(1),
                           engine=engine)
    w = GkrInside(a=A, b=B, want=W)
    pub, sec = w.witness_values(Q)
    t0 = time.time()
    proof = groth16.prove(cs, pk, pub, sec, bn254.BN254,
                          rng=random.Random(2), engine=engine)
    print(f"proved in {time.time()-t0:.2f}s")
    groth16.verify(proof, vk, pub, bn254.BN254)
    print("Groth16 proof of GKR-verified computation: OK")


if __name__ == "__main__":
    main()
