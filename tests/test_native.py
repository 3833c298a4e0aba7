"""Native C++ solver core vs the pure-Python solver — identical results.

(≙ the reference's trust in gnark-crypto asm: same results as the generic
path, exercised across the corpus + a large hint-heavy circuit.)"""

import random
import time

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import compile_circuit
from gnark_icicle_tpu.constraint import solve, UnsatisfiedConstraintError
from gnark_icicle_tpu.native import get_lib, solve_native, NativeField, ints_to_u64x4, u64x4_to_ints

from circuits import corpus

Q = bn254.R

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="no C++ toolchain available"
)


def test_u64x4_roundtrip():
    xs = [0, 1, Q - 1, 1 << 200, 123456789]
    assert u64x4_to_ints(ints_to_u64x4(xs)) == xs


@pytest.mark.parametrize("name,cls,valid,invalid", corpus(Q),
                         ids=[c[0] for c in corpus(Q)])
def test_native_matches_python(name, cls, valid, invalid):
    cs = compile_circuit(Q, cls)
    for assignment in valid:
        pub, sec = cls(**assignment).witness_values(Q)
        py = solve(cs, pub, sec, native=False)
        nat = solve_native(cs, pub, sec)
        assert nat.wires == py.wires, f"{name}: wire mismatch"
        assert nat.a == py.a and nat.b == py.b and nat.c == py.c
    for assignment in invalid:
        pub, sec = cls(**assignment).witness_values(Q)
        with pytest.raises(Exception):
            solve_native(cs, pub, sec)


def test_native_rollup_scale():
    """21k-constraint circuit: native must agree with Python and be fast."""
    import examples.rollup as rollup

    op = rollup.Operator()
    w = op.transfer(0, 1, 250)
    cs = compile_circuit(Q, rollup.TransferCircuit)
    pub, sec = w.witness_values(Q)

    t0 = time.perf_counter()
    nat = solve_native(cs, pub, sec)
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    py = solve(cs, pub, sec, native=False)
    t_py = time.perf_counter() - t0
    assert nat.wires == py.wires
    assert nat.a == py.a and nat.b == py.b and nat.c == py.c
    # not a strict perf assert (CI noise) — just record the ratio
    print(f"native {t_nat*1e3:.0f} ms vs python {t_py*1e3:.0f} ms "
          f"({t_py/max(t_nat,1e-9):.0f}x)")


def test_level_solve_bit_identical():
    """Dependency-levelled native solving (≙ the reference's per-level
    worker pool) matches the sequential native path and the Python oracle
    across the corpus; levels respect producer-before-consumer."""
    import os
    from circuits import corpus
    from gnark_icicle_tpu.constraint.solver import solve
    from gnark_icicle_tpu.constraint.system import INSTR_R1C, INSTR_HINT

    for name, cls, valid, _ in corpus(Q):
        cs = compile_circuit(Q, cls)
        levels = cs.compute_levels()
        assert sum(len(l) for l in levels) == len(cs.instructions)
        # every wire read at level L is produced before L
        produced_at = {}
        for lvl, poss in enumerate(levels):
            for pos in poss:
                kind, idx = cs.instructions[pos]
                outs = (cs.hints[idx].outputs if kind == INSTR_HINT
                        else ([cs.solved_wire[idx]]
                              if cs.solved_wire[idx] >= 0 else []))
                for w in outs:
                    produced_at[w] = lvl
        n_in = cs.nb_public + cs.nb_secret
        for lvl, poss in enumerate(levels):
            for pos in poss:
                kind, idx = cs.instructions[pos]
                if kind == INSTR_HINT:
                    reads = [w for e in cs.hints[idx].inputs for _, w in e]
                else:
                    (ls, _), _, (_, oe) = cs.constraint_slots(idx)
                    sw = cs.solved_wire[idx]
                    reads = [cs.term_wire[t] for t in range(ls, oe)
                             if cs.term_wire[t] != sw]
                for w in reads:
                    if w >= n_in and w in produced_at:
                        assert produced_at[w] < lvl, (name, lvl, w)
        for w in valid:
            pub, sec = cls(**w).witness_values(Q)
            os.environ["GNARK_TPU_LEVEL_SOLVE"] = "1"
            try:
                r1 = solve(cs, pub, sec, native=True)
                os.environ["GNARK_TPU_LEVEL_SOLVE"] = "0"
                r0 = solve(cs, pub, sec, native=True)
            finally:
                os.environ.pop("GNARK_TPU_LEVEL_SOLVE", None)
            rp = solve(cs, pub, sec, native=False)
            assert r1.wires == r0.wires == rp.wires
            assert (r1.a, r1.b, r1.c) == (r0.a, r0.b, r0.c) \
                == (rp.a, rp.b, rp.c)


def test_native_6limb_bw6_761():
    """The 6x64-limb instantiation (BW6-761's 377-bit fr — the native
    2-chain outer curve) is bit-identical to the Python solver on both
    arithmetizations, including hints (div) and unsatisfied detection."""
    from gnark_icicle_tpu.curves import bw6_761 as bw6
    from gnark_icicle_tpu.frontend import Circuit, Public, Secret
    from gnark_icicle_tpu.constraint.scs import solve_scs

    Q6 = bw6.BW6_761.fr.modulus
    assert Q6.bit_length() == 377

    class C(Circuit):
        x = Secret()
        y = Public()

        def define(self, api):
            v = self.x
            for i in range(40):
                v = api.add(api.mul(v, v), v, i)
            inv = api.div(1, self.x)
            api.assert_is_equal(api.mul(inv, self.x), 1)
            api.assert_is_equal(v, self.y)

    cs = compile_circuit(Q6, C)
    x0 = (1 << 370) + 12345  # exercises limbs 5..6
    v = x0
    for i in range(40):
        v = (v * v + v + i) % Q6
    rn = solve(cs, [v], [x0], native=True)
    rp = solve(cs, [v], [x0], native=False)
    assert rn.wires == rp.wires
    assert (rn.a, rn.b, rn.c) == (rp.a, rp.b, rp.c)
    with pytest.raises(UnsatisfiedConstraintError):
        solve(cs, [(v + 1) % Q6], [x0], native=True)

    scs = compile_circuit(Q6, C, builder="scs")
    wn = solve_scs(scs, [v], [x0], native=True)
    wp = solve_scs(scs, [v], [x0], native=False)
    assert wn == wp
