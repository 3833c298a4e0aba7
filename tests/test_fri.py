"""FRI proof-of-proximity tests (≙ std/commitments/fri tests: honest
low-degree polys verify; high-degree/tampered proofs fail)."""

import random

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import Circuit, Public, Secret, compile_circuit
from gnark_icicle_tpu.frontend.engine import Engine, EngineUnsatisfiedError
from gnark_icicle_tpu.constraint import is_satisfied
from gnark_icicle_tpu.std.fri import Fri, FriProof, FriQueryRound

Q = bn254.R


def test_fri_roundtrip_engine():
    rng = random.Random(5)
    fri = Fri(bn254.FR, size=16, nb_queries=4)
    proof = fri.prove([rng.randrange(Q) for _ in range(16)])
    fri.verify(Engine(Q), proof)


def test_fri_rejects_high_degree():
    rng = random.Random(6)
    fri = Fri(bn254.FR, size=16, nb_queries=6)
    evals = [rng.randrange(Q) for _ in range(fri.n0)]
    proof = fri.prove_evals(evals)
    with pytest.raises(EngineUnsatisfiedError):
        fri.verify(Engine(Q), proof)


def test_fri_rejects_tampering():
    rng = random.Random(7)
    fri = Fri(bn254.FR, size=8, nb_queries=4)
    coeffs = [rng.randrange(Q) for _ in range(8)]
    p1 = fri.prove(coeffs)
    p1.queries[0][1].hi = (p1.queries[0][1].hi + 1) % Q
    with pytest.raises(EngineUnsatisfiedError):
        fri.verify(Engine(Q), p1)
    p2 = fri.prove(coeffs)
    p2.evaluation = (p2.evaluation + 1) % Q
    with pytest.raises(EngineUnsatisfiedError):
        fri.verify(Engine(Q), p2)
    p3 = fri.prove(coeffs)
    p3.roots[0] = (p3.roots[0] + 1) % Q
    with pytest.raises(EngineUnsatisfiedError):
        fri.verify(Engine(Q), p3)


def test_fri_compiled_verifier():
    """The verifier as a real circuit: proof enters as witness."""
    rng = random.Random(8)
    fri = Fri(bn254.FR, size=4, nb_queries=2)
    coeffs = [rng.randrange(Q) for _ in range(4)]
    proof = fri.prove(coeffs)
    steps = fri.nb_steps
    depth0 = fri.log_n0  # round-0 tree depth

    class FriCircuit(Circuit):
        roots = Public(shape=steps)
        evaluation = Public()
        # flatten openings: per query, per round: lo, hi, sibs...
        flat = Secret(shape=sum(
            2 + 2 * (fri.log_n0 - i) for _ in range(fri.nb_queries)
            for i in range(steps)
        ))

        def define(self, api):
            it = iter(self.flat)
            queries = []
            for _ in range(fri.nb_queries):
                rounds = []
                for i in range(steps):
                    d = fri.log_n0 - i
                    lo = next(it)
                    hi = next(it)
                    lo_s = [next(it) for _ in range(d)]
                    hi_s = [next(it) for _ in range(d)]
                    rounds.append(FriQueryRound(lo, hi, lo_s, hi_s))
                queries.append(rounds)
            p = FriProof(roots=list(self.roots), evaluation=self.evaluation,
                         queries=queries)
            fri.verify(api, p)

    def flatten(pf):
        out = []
        for rounds in pf.queries:
            for r in rounds:
                out.append(r.lo)
                out.append(r.hi)
                out.extend(r.lo_sibs)
                out.extend(r.hi_sibs)
        return out

    w = FriCircuit(roots=proof.roots, evaluation=proof.evaluation,
                   flat=flatten(proof))
    cs = compile_circuit(Q, FriCircuit)
    pub, sec = w.witness_values(Q)
    assert is_satisfied(cs, pub, sec)
    bad = list(sec)
    bad[0] = (bad[0] + 1) % Q
    assert not is_satisfied(cs, pub, bad)
