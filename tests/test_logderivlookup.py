"""Log-derivative lookup table tests (≙ std/lookup/logderivlookup tests:
in-bounds lookups succeed, wrong values / out-of-bounds rejected)."""

import random

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import (
    Circuit, Public, Secret, compile_circuit, is_solved,
)
from gnark_icicle_tpu.constraint import is_satisfied
from gnark_icicle_tpu.std.logderivlookup import Table

Q = bn254.R


class LookupCircuit(Circuit):
    """Table of 8 witness entries; 4 witness indices; expected values
    public."""

    entries = Secret(shape=8)
    inds = Secret(shape=4)
    want = Public(shape=4)

    def define(self, api):
        t = Table(api)
        for e in self.entries:
            t.insert(e)
        vals = t.lookup(*self.inds)
        for v, w in zip(vals, self.want):
            api.assert_is_equal(v, w)


def _mk(rng):
    entries = [rng.randrange(Q) for _ in range(8)]
    inds = [rng.randrange(8) for _ in range(4)]
    want = [entries[i] for i in inds]
    return entries, inds, want


def test_lookup_engine_and_solver():
    rng = random.Random(11)
    entries, inds, want = _mk(rng)
    w = LookupCircuit(entries=entries, inds=inds, want=want)
    assert is_solved(w, Q)
    cs = compile_circuit(Q, LookupCircuit)
    pub, sec = w.witness_values(Q)
    assert is_satisfied(cs, pub, sec)
    # constraint count sanity: linear in n+m (dominated by the MiMC row
    # coefficients + per-term inversions), far below quadratic mux cost
    assert cs.nb_constraints < 1000


def test_lookup_wrong_value_rejected():
    rng = random.Random(12)
    entries, inds, want = _mk(rng)
    bad = list(want)
    bad[2] = (bad[2] + 1) % Q
    w = LookupCircuit(entries=entries, inds=inds, want=bad)
    assert not is_solved(w, Q)
    cs = compile_circuit(Q, LookupCircuit)
    pub, sec = w.witness_values(Q)
    assert not is_satisfied(cs, pub, sec)


def test_lookup_out_of_bounds_rejected():
    rng = random.Random(13)
    entries, _, _ = _mk(rng)
    w = LookupCircuit(entries=entries, inds=[0, 1, 2, 9],
                      want=[entries[0], entries[1], entries[2], 0])
    assert not is_solved(w, Q)


def test_lookup_duplicate_indices():
    rng = random.Random(14)
    entries = [rng.randrange(Q) for _ in range(8)]
    inds = [3, 3, 3, 3]
    want = [entries[3]] * 4
    assert is_solved(LookupCircuit(entries=entries, inds=inds, want=want), Q)


def test_lookup_under_scs_builder():
    rng = random.Random(15)
    entries, inds, want = _mk(rng)
    w = LookupCircuit(entries=entries, inds=inds, want=want)
    cs = compile_circuit(Q, LookupCircuit, builder="scs")
    from gnark_icicle_tpu.constraint.scs import solve_scs, SparseUnsatisfiedError

    pub, sec = w.witness_values(Q)
    solve_scs(cs, pub, sec)
    bad = list(pub)
    bad[0] = (bad[0] + 1) % Q
    with pytest.raises(SparseUnsatisfiedError):
        solve_scs(cs, bad, sec)


# ---------------------------------------------------------------------------
# range-table rangecheck built on the lookup argument (≙ std/rangecheck
# commit variant)
# ---------------------------------------------------------------------------

class RangeCircuit(Circuit):
    v = Secret(shape=3)

    def define(self, api):
        from gnark_icicle_tpu.std.rangecheck import RangeChecker

        rc = RangeChecker(api)
        rc.check(self.v[0], 16)
        rc.check(self.v[1], 12)   # partial top limb path
        rc.check(self.v[2], 8)


def test_rangecheck_table():
    ok = RangeCircuit(v=[0xFFFF, 0xFFF, 0xFF])
    assert is_solved(ok, Q)
    cs = compile_circuit(Q, RangeCircuit)
    pub, sec = ok.witness_values(Q)
    assert is_satisfied(cs, pub, sec)
    for bad in ([0x10000, 0, 0], [0, 0x1000, 0], [0, 0, 0x100]):
        w = RangeCircuit(v=bad)
        assert not is_solved(w, Q), bad
        bpub, bsec = w.witness_values(Q)
        assert not is_satisfied(cs, bpub, bsec), bad


def test_rangecheck_amortizes():
    """Many checks share one 256-entry table: cost grows ~linearly with
    checks, not with table rebuilds."""

    class Many(Circuit):
        v = Secret(shape=16)

        def define(self, api):
            from gnark_icicle_tpu.std.rangecheck import RangeChecker

            rc = RangeChecker(api)
            for x in self.v:
                rc.check(x, 16)

    w = Many(v=[i * 1000 for i in range(16)])
    assert is_solved(w, Q)
    cs = compile_circuit(Q, Many)
    pub, sec = w.witness_values(Q)
    assert is_satisfied(cs, pub, sec)
