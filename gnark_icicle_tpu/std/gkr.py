"""GKR protocol: host prover + in-circuit verifier over layered circuits.

Role parity: reference std/gkr (gkr.go — Gate/Wire/Circuit over multilinear
wire assignments, one eq·gate sumcheck per wire walked output-to-input with
a claims manager combining multiple downstream claims by a random
coefficient) and the host prover role of gnark-crypto's gkr package (reached
through constraint/bn254/gkr.go solve hints in the reference).

Prover and verifier share the transcript and sumcheck code
(std/sumcheck.py); the prover runs them with the test engine as its api, so
challenges agree by construction. Structural simplification vs the
reference (documented): input wires' claims are checked by evaluating the
input multilinear directly in-circuit (O(2ⁿ) muls per claim) instead of a
dedicated input sumcheck — same statement, fewer moving parts.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .fiat_shamir import CircuitTranscript
from .polynomial import Polynomial
from . import sumcheck as sc


# ---------------------------------------------------------------------------
# gates & circuit topology (≙ gkr.Gate / Wire / Circuit, gkr.go:18-56)
# ---------------------------------------------------------------------------

class AddGate:
    degree = 1

    @staticmethod
    def evaluate(api, *ins):
        acc = ins[0]
        for v in ins[1:]:
            acc = api.add(acc, v)
        return acc


class MulGate:
    degree = 2

    @staticmethod
    def evaluate(api, a, b):
        return api.mul(a, b)


class IdentityGate:
    degree = 1

    @staticmethod
    def evaluate(api, a):
        return a


@dataclass
class Wire:
    gate: object = None      # None => input wire
    inputs: list = field(default_factory=list)  # indices of input wires

    @property
    def is_input(self) -> bool:
        return self.gate is None


class Circuit:
    """Wires in topological order (inputs before consumers)."""

    def __init__(self, wires: list):
        self.wires = wires
        n = len(wires)
        self.nb_unique_outputs = [0] * n
        for w in wires:
            for u in sorted(set(w.inputs)):
                self.nb_unique_outputs[u] += 1
        for i, w in enumerate(wires):
            for u in w.inputs:
                assert u < i, "wires must be topologically ordered"

    def is_output(self, i: int) -> bool:
        return self.nb_unique_outputs[i] == 0

    def nb_claims(self, i: int) -> int:
        return 1 if self.is_output(i) else self.nb_unique_outputs[i]


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------

def _eq_table(api, z: list) -> list:
    """eq(z, ·) over the hypercube with z[0] on the HIGHEST index bit —
    consistent with Polynomial.eval_multilinear, which folds at[0] against
    the table halves. (Each concatenation step makes the just-processed
    variable the new top bit, so iterate in reverse.)"""
    tab = [1]
    for zk in reversed(z):
        one_m = api.sub(1, zk)
        tab = [api.mul(e, one_m) for e in tab] + [api.mul(e, zk) for e in tab]
    return tab


def _fold(api, tab: list, r) -> list:
    half = len(tab) // 2
    return [
        api.add(tab[i], api.mul(r, api.sub(tab[half + i], tab[i])))
        for i in range(half)
    ]


def _extend(api, tab: list, t: int) -> list:
    """Table at X_j = t for a small integer t (linear extension)."""
    half = len(tab) // 2
    if t == 0:
        return tab[:half]
    if t == 1:
        return tab[half:]
    return [
        api.add(tab[i], api.mul(t, api.sub(tab[half + i], tab[i])))
        for i in range(half)
    ]


def _transcript_names(circuit: Circuit, n_vars: int) -> list:
    names = [f"gkr.z.{i}" for i in range(n_vars)]
    for i in reversed(range(len(circuit.wires))):
        if not circuit.wires[i].is_input:
            names += sc.challenge_names(
                f"gkr.w{i}.", circuit.nb_claims(i), n_vars
            )
    return names


def _unique_inputs(wire: Wire) -> list:
    seen = []
    for u in wire.inputs:
        if u not in seen:
            seen.append(u)
    return seen


# ---------------------------------------------------------------------------
# claims (≙ eqTimesGateEvalSumcheckClaims / LazyClaims, gkr.go:62-260)
# ---------------------------------------------------------------------------

class _WireClaims:
    """One wire's accumulated claims, usable as both prover and verifier
    sumcheck claims. As verifier claims, verify_final_eval also feeds the
    downstream claims into `manager` (≙ claimsManager, gkr.go)."""

    def __init__(self, api, circuit, wire_idx, points, values,
                 assignments=None, manager=None):
        self.api = api
        self.circuit = circuit
        self.wire = circuit.wires[wire_idx]
        self.points = points
        self.values = values
        self.n_vars = len(points[0])
        self.manager = manager
        # prover state
        self.assignments = assignments
        self._tabs = None
        self._eq = None
        self.r = []

    # -- shared (verifier) interface ---------------------------------------
    def claims_num(self):
        return len(self.points)

    def vars_num(self):
        return self.n_vars

    def degree(self, j):
        return 1 + self.wire.gate.degree

    def combined_sum(self, api, comb):
        acc = self.values[0]
        pw = comb
        for v in self.values[1:]:
            acc = api.add(acc, api.mul(v, pw))
            pw = api.mul(pw, comb)
        return acc if len(self.values) > 1 else self.values[0]

    def verify_final_eval(self, api, r, comb, purported, final_proof):
        poly = Polynomial(api)
        # Σ comb^i eq(z_i, r) by Horner from the last point (gkr.go:71-79)
        ev = poly.eval_equal(self.points[-1], r)
        for i in range(len(self.points) - 2, -1, -1):
            ev = api.mul(ev, comb)
            ev = api.add(ev, poly.eval_equal(self.points[i], r))
        uniq = _unique_inputs(self.wire)
        eval_by_wire = dict(zip(uniq, final_proof))
        gate_ins = [eval_by_wire[u] for u in self.wire.inputs]
        gate_val = self.wire.gate.evaluate(api, *gate_ins)
        api.assert_is_equal(api.mul(ev, gate_val), purported)
        if self.manager is not None:
            for u, e_u in zip(uniq, final_proof):
                self.manager[u][0].append(list(r))
                self.manager[u][1].append(e_u)

    # -- prover interface ---------------------------------------------------
    def _g_evals(self, comb_unused=None):
        """[g(1)..g(D)] for the current variable from the live tables."""
        api = self.api
        D = self.degree(0)
        out = []
        for t in range(1, D + 1):
            eq_t = _extend(api, self._eq, t)
            tabs_t = [_extend(api, tab, t) for tab in self._tabs]
            acc = 0
            for i in range(len(eq_t)):
                gate_ins = [tabs_t[self._pos[u]][i]
                            for u in self.wire.inputs]
                acc = api.add(
                    acc, api.mul(eq_t[i],
                                 self.wire.gate.evaluate(api, *gate_ins))
                )
            out.append(acc)
        return out

    def combine(self, comb):
        api = self.api
        uniq = _unique_inputs(self.wire)
        self._pos = {u: k for k, u in enumerate(uniq)}
        self._tabs = [list(self.assignments[u]) for u in uniq]
        eq = _eq_table(api, self.points[0])
        pw = comb
        for pt in self.points[1:]:
            tab = _eq_table(api, pt)
            eq = [api.add(e, api.mul(t, pw)) for e, t in zip(eq, tab)]
            pw = api.mul(pw, comb)
        self._eq = eq
        return self._g_evals()

    def next(self, rj):
        api = self.api
        self.r.append(rj)
        self._eq = _fold(api, self._eq, rj)
        self._tabs = [_fold(api, tab, rj) for tab in self._tabs]
        if len(self._eq) == 1:
            return None  # all variables bound; prove_final_eval is next
        return self._g_evals()

    def prove_final_eval(self):
        # all folds applied: each table holds exactly V_u(r)
        assert all(len(t) == 1 for t in self._tabs)
        return [tab[0] for tab in self._tabs]


# ---------------------------------------------------------------------------
# prover / verifier (≙ gkr.Prove role in gnark-crypto + gkr.Verify)
# ---------------------------------------------------------------------------

@dataclass
class GkrProof:
    # wire idx (non-input, reverse topo order) -> SumcheckProof
    sumchecks: dict = field(default_factory=dict)


def evaluate_circuit(api, circuit: Circuit, inputs: dict) -> dict:
    """Forward evaluation: {input wire idx: [2^n values]} -> all wires."""
    assign = {i: list(v) for i, v in inputs.items()}
    n_inst = len(next(iter(inputs.values())))
    for i, w in enumerate(circuit.wires):
        if w.is_input:
            assert i in assign, f"missing input assignment for wire {i}"
            continue
        assign[i] = [
            w.gate.evaluate(api, *[assign[u][k] for u in w.inputs])
            for k in range(n_inst)
        ]
    return assign


def _initial_claims(api, circuit, assignments, transcript, n_vars):
    """Bind outputs, draw the common evaluation point z, claim each output
    wire's multilinear at z."""
    poly = Polynomial(api)
    out_wires = [i for i in range(len(circuit.wires)) if circuit.is_output(i)]
    out_values = []
    for i in out_wires:
        out_values.extend(assignments[i])
    transcript.bind("gkr.z.0", out_values)
    z = [transcript.compute_challenge(f"gkr.z.{i}") for i in range(n_vars)]
    claims = {i: ([], []) for i in range(len(circuit.wires))}
    for i in out_wires:
        claims[i][0].append(z)
        claims[i][1].append(poly.eval_multilinear(z, assignments[i]))
    return claims


def prove(api, circuit: Circuit, assignments: dict) -> GkrProof:
    """Host prover: run with the test engine as api over int assignments
    (≙ the gnark-crypto gkr prover the reference reaches via solve hints)."""
    n_inst = len(next(iter(assignments.values())))
    n_vars = (n_inst - 1).bit_length()
    assert n_inst == 1 << n_vars and n_vars >= 1
    transcript = CircuitTranscript(
        api, api.q, _transcript_names(circuit, n_vars)
    )
    claims = _initial_claims(api, circuit, assignments, transcript, n_vars)
    proof = GkrProof()
    for i in reversed(range(len(circuit.wires))):
        w = circuit.wires[i]
        if w.is_input:
            continue
        pts, vals = claims[i]
        wc = _WireClaims(api, circuit, i, pts, vals, assignments=assignments)
        sp = sc.prove(api, wc, transcript, prefix=f"gkr.w{i}.")
        proof.sumchecks[i] = sp
        for u, ev in zip(_unique_inputs(w), sp.final_eval_proof):
            claims[u][0].append(list(wc.r))
            claims[u][1].append(ev)
    return proof


def verify(api, circuit: Circuit, inputs: dict, outputs: dict,
           proof: GkrProof, n_vars: int) -> None:
    """In-circuit verifier (≙ gkr.Verify, gkr.go:330+).

    inputs/outputs: {wire idx: [2ⁿ circuit variables]}. Proof values enter
    as circuit variables (hint outputs or witness). Input-wire claims are
    checked by evaluating the input multilinear directly.
    """
    transcript = CircuitTranscript(
        api, api.q, _transcript_names(circuit, n_vars)
    )
    claims = _initial_claims(api, circuit, outputs, transcript, n_vars)
    for i in reversed(range(len(circuit.wires))):
        w = circuit.wires[i]
        if w.is_input:
            continue
        pts, vals = claims[i]
        wc = _WireClaims(api, circuit, i, pts, vals, manager=claims)
        sc.verify(api, wc, proof.sumchecks[i], transcript,
                  prefix=f"gkr.w{i}.")
    poly = Polynomial(api)
    for i, w in enumerate(circuit.wires):
        if not w.is_input:
            continue
        pts, vals = claims[i]
        for z, c in zip(pts, vals):
            api.assert_is_equal(
                poly.eval_multilinear(z, inputs[i]), c
            )
