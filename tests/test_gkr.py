"""Sumcheck + GKR: host prover vs in-circuit verifier.

Parity model: reference std/sumcheck/sumcheck_test.go and
std/gkr/gkr_test.go (single/double gates, mul/add circuits, proof
tampering). The prover runs with the test engine; the verifier runs both on
the engine (fast) and compiled+solved (the in-circuit path).
"""

import random

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import Circuit as FrontCircuit, Public, Secret
from gnark_icicle_tpu.frontend import compile_circuit, is_solved
from gnark_icicle_tpu.frontend.engine import Engine
from gnark_icicle_tpu.constraint import is_satisfied
from gnark_icicle_tpu.std import gkr
from gnark_icicle_tpu.std.gkr import (
    AddGate, MulGate, IdentityGate, Wire, Circuit, evaluate_circuit,
)

Q = bn254.R


def _mimic_square_circuit():
    """out = (a·b) + a over 2^k instances: a DAG with a reused input."""
    return Circuit([
        Wire(),                      # 0: input a
        Wire(),                      # 1: input b
        Wire(MulGate, [0, 1]),       # 2: a·b
        Wire(AddGate, [2, 0]),       # 3: a·b + a  (output)
    ])


def _run_prove(circuit, inputs, q=Q):
    eng = Engine(q)
    assignments = evaluate_circuit(eng, circuit, inputs)
    proof = gkr.prove(eng, circuit, assignments)
    return assignments, proof


def test_gkr_engine_roundtrip():
    rng = random.Random(5)
    n = 8
    circuit = _mimic_square_circuit()
    inputs = {
        0: [rng.randrange(Q) for _ in range(n)],
        1: [rng.randrange(Q) for _ in range(n)],
    }
    assignments, proof = _run_prove(circuit, inputs)
    eng = Engine(Q)
    gkr.verify(eng, circuit, inputs, {3: assignments[3]}, proof, 3)


def test_gkr_rejects_wrong_output():
    rng = random.Random(6)
    n = 4
    circuit = _mimic_square_circuit()
    inputs = {
        0: [rng.randrange(Q) for _ in range(n)],
        1: [rng.randrange(Q) for _ in range(n)],
    }
    assignments, proof = _run_prove(circuit, inputs)
    bad_out = list(assignments[3])
    bad_out[1] = (bad_out[1] + 1) % Q
    eng = Engine(Q)
    with pytest.raises(Exception):
        gkr.verify(eng, circuit, inputs, {3: bad_out}, proof, 2)


def test_gkr_rejects_tampered_proof():
    rng = random.Random(7)
    n = 4
    circuit = _mimic_square_circuit()
    inputs = {
        0: [rng.randrange(Q) for _ in range(n)],
        1: [rng.randrange(Q) for _ in range(n)],
    }
    assignments, proof = _run_prove(circuit, inputs)
    sp = proof.sumchecks[3]
    sp.partial_sum_polys[0][0] = (sp.partial_sum_polys[0][0] + 1) % Q
    eng = Engine(Q)
    with pytest.raises(Exception):
        gkr.verify(eng, circuit, inputs, {3: assignments[3]}, proof, 2)


def test_gkr_deep_circuit_engine():
    """Three layers incl. identity fan-out."""
    rng = random.Random(8)
    circuit = Circuit([
        Wire(),                       # 0: x
        Wire(),                       # 1: y
        Wire(MulGate, [0, 0]),        # 2: x²
        Wire(MulGate, [2, 1]),        # 3: x²·y
        Wire(AddGate, [3, 2]),        # 4: x²y + x² (output)
        Wire(IdentityGate, [3]),      # 5: x²y (output)
    ])
    n = 4
    inputs = {
        0: [rng.randrange(Q) for _ in range(n)],
        1: [rng.randrange(Q) for _ in range(n)],
    }
    assignments, proof = _run_prove(circuit, inputs)
    eng = Engine(Q)
    gkr.verify(eng, circuit, inputs,
               {4: assignments[4], 5: assignments[5]}, proof, 2)


class GkrCircuit(FrontCircuit):
    """In-circuit verification of a GKR proof over witness inputs.

    The proof values enter as secret witness (shape derived from the fixed
    topology); output values are recomputed... here supplied as witness and
    checked against public expected outputs.
    """

    a = Secret(shape=4)
    b = Secret(shape=4)
    out = Public(shape=4)
    # proof shape for the 2-wire DAG at n_vars=2: wire 3 then wire 2
    psp3 = Secret(shape=(2, 2))   # wire 3 (AddGate): deg 2, 2 vars
    fin3 = Secret(shape=2)
    psp2 = Secret(shape=(2, 3))   # wire 2 (MulGate): deg 3, 2 vars
    fin2 = Secret(shape=2)

    def define(self, api):
        from gnark_icicle_tpu.std.sumcheck import SumcheckProof

        circuit = _mimic_square_circuit()
        proof = gkr.GkrProof(sumchecks={
            3: SumcheckProof(list(list(r) for r in self.psp3),
                             list(self.fin3)),
            2: SumcheckProof(list(list(r) for r in self.psp2),
                             list(self.fin2)),
        })
        gkr.verify(api, circuit, {0: list(self.a), 1: list(self.b)},
                   {3: list(self.out)}, proof, 2)


def test_gkr_in_circuit_solver():
    rng = random.Random(9)
    n = 4
    circuit = _mimic_square_circuit()
    inputs = {
        0: [rng.randrange(Q) for _ in range(n)],
        1: [rng.randrange(Q) for _ in range(n)],
    }
    assignments, proof = _run_prove(circuit, inputs)
    w = GkrCircuit(
        a=inputs[0], b=inputs[1], out=assignments[3],
        psp3=[list(p) for p in proof.sumchecks[3].partial_sum_polys],
        fin3=list(proof.sumchecks[3].final_eval_proof),
        psp2=[list(p) for p in proof.sumchecks[2].partial_sum_polys],
        fin2=list(proof.sumchecks[2].final_eval_proof),
    )
    assert is_solved(w, Q)
    cs = compile_circuit(Q, GkrCircuit)
    pub, sec = w.witness_values(Q)
    assert is_satisfied(cs, pub, sec)
    # tampered output rejected by the compiled verifier
    bad = list(assignments[3])
    bad[0] = (bad[0] + 1) % Q
    w2 = GkrCircuit(
        a=inputs[0], b=inputs[1], out=bad,
        psp3=[list(p) for p in proof.sumchecks[3].partial_sum_polys],
        fin3=list(proof.sumchecks[3].final_eval_proof),
        psp2=[list(p) for p in proof.sumchecks[2].partial_sum_polys],
        fin2=list(proof.sumchecks[2].final_eval_proof),
    )
    bpub, bsec = w2.witness_values(Q)
    assert not is_satisfied(cs, bpub, bsec)

# ---------------------------------------------------------------------------
# frontend integration (GkrApi: hint-driven solve + prove, ≙ std/gkr
# compile.go API/Solution + constraint gkr hints)
# ---------------------------------------------------------------------------

class GkrApiCircuit(FrontCircuit):
    a = Secret(shape=4)
    b = Secret(shape=4)
    want = Public(shape=4)

    def define(self, api):
        from gnark_icicle_tpu.std.gkr import GkrApi

        g = GkrApi()
        wa = g.import_(list(self.a))
        wb = g.import_(list(self.b))
        out = g.add(g.mul(wa, wb), wa)  # a·b + a
        sol = g.solve(api)
        for o, w in zip(sol.export(out), self.want):
            api.assert_is_equal(o, w)
        sol.verify()


def test_gkr_api_end_to_end():
    rng = random.Random(13)
    A = [rng.randrange(Q) for _ in range(4)]
    B = [rng.randrange(Q) for _ in range(4)]
    W = [(A[i] * B[i] + A[i]) % Q for i in range(4)]
    w = GkrApiCircuit(a=A, b=B, want=W)
    assert is_solved(w, Q)
    assert not is_solved(GkrApiCircuit(a=A, b=B,
                                       want=[(x + 1) % Q for x in W]), Q)
    cs = compile_circuit(Q, GkrApiCircuit)
    pub, sec = w.witness_values(Q)
    assert is_satisfied(cs, pub, sec)
    bad = GkrApiCircuit(a=A, b=B, want=[(x + 1) % Q for x in W])
    bpub, bsec = bad.witness_values(Q)
    assert not is_satisfied(cs, bpub, bsec)


def test_gkr_groth16_pipeline_integration():
    """VERDICT item 8 (≙ constraint/bn254/gkr.go integration): api-level
    GkrApi inside a standard circuit — the solver hints produce the GKR
    sumcheck proof, the compiled constraints verify it, tampered outputs
    are rejected. Device-free (compile+solve); the full prove of this
    exact circuit is examples/gkr_demo.py groth16_pipeline."""
    import random

    from gnark_icicle_tpu.constraint.solver import (
        UnsatisfiedConstraintError, solve,
    )
    from gnark_icicle_tpu.frontend import (
        Circuit, Public, Secret, compile_circuit,
    )
    from gnark_icicle_tpu.std.gkr import GkrApi

    n = 4

    class GkrInside(Circuit):
        a = Secret(shape=n)
        b = Secret(shape=n)
        want = Public(shape=n)

        def define(self, api):
            g = GkrApi()
            wa = g.import_(list(self.a))
            wb = g.import_(list(self.b))
            out = g.add(g.mul(wa, wb), wa)
            sol = g.solve(api)
            for o, w in zip(sol.export(out), self.want):
                api.assert_is_equal(o, w)
            sol.verify()

    rng = random.Random(7)
    A = [rng.randrange(Q) for _ in range(n)]
    B = [rng.randrange(Q) for _ in range(n)]
    W = [(a * b + a) % Q for a, b in zip(A, B)]
    cs = compile_circuit(Q, GkrInside)
    pub, sec = GkrInside(a=A, b=B, want=W).witness_values(Q)
    solve(cs, pub, sec)
    bad = GkrInside(a=A, b=B, want=[(x + 1) % Q for x in W])
    bpub, bsec = bad.witness_values(Q)
    with pytest.raises(UnsatisfiedConstraintError):
        solve(cs, bpub, bsec)
