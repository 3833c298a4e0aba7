"""EVM precompile gadgets COMPILED to constraints and solved
(≙ reference std/evmprecompiles circuit tests, 0x01/0x06/0x07/0x08 —
promotes the engine-verified gadgets of test_evmprecompiles.py to real
constraint systems with locked counts and solve/reject probes).
"""

import random

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import Circuit, Public, Secret, compile_circuit
from gnark_icicle_tpu.constraint.solver import solve, UnsatisfiedConstraintError
from gnark_icicle_tpu.std import evmprecompiles as evm
from gnark_icicle_tpu.std.evmprecompiles import _SECP_G, _SECP_N, _h_mul
from gnark_icicle_tpu.std.sw_emulated import BN254G1, SECP256K1, EmulatedCurve

Q = bn254.R
FP = BN254G1.fp
FR = BN254G1.fr
SFP = SECP256K1.fp
SFR = SECP256K1.fr

# locked counts (update intentionally only) — the regression net for the
# emulated stack at precompile scale, like internal/stats for small snippets
ECADD_CONSTRAINTS = 5_447
ECMUL_CONSTRAINTS = 336_220
ECRECOVER_CONSTRAINTS = 867_307
ECPAIR_CONSTRAINTS = 6_193_305


def _limbs(value, params):
    return [(int(value) >> (params.limb_bits * i))
            & ((1 << params.limb_bits) - 1) for i in range(params.n_limbs)]


class EcAdd(Circuit):
    px = Secret(shape=FP.n_limbs)
    py = Secret(shape=FP.n_limbs)
    qx = Secret(shape=FP.n_limbs)
    qy = Secret(shape=FP.n_limbs)
    rx = Secret(shape=FP.n_limbs)
    ry = Secret(shape=FP.n_limbs)

    def define(self, api):
        c = EmulatedCurve(api, BN254G1, Q)
        p = c.witness_point(self.px, self.py)
        q = c.witness_point(self.qx, self.qy)
        out = evm.ec_add(api, Q, p, q)
        c.assert_is_equal(out, c.witness_point(self.rx, self.ry))


def test_ecadd_compiles_and_solves():
    g1 = bn254.G1
    rng = random.Random(7)
    p = g1.random_point(rng)
    q = g1.random_point(rng)
    r = g1.add(p, q)
    cs = compile_circuit(Q, EcAdd)
    print(f"evm ecadd compiled: {cs.nb_constraints} constraints")
    assert cs.nb_constraints == ECADD_CONSTRAINTS, "ecadd count shifted"

    def sec(rr):
        return (_limbs(p[0], FP) + _limbs(p[1], FP)
                + _limbs(q[0], FP) + _limbs(q[1], FP)
                + _limbs(rr[0], FP) + _limbs(rr[1], FP))

    res = solve(cs, [], sec(r))
    assert res.wires[0] == 1
    with pytest.raises(UnsatisfiedConstraintError):
        solve(cs, [], sec(g1.add(r, g1.generator)))  # wrong sum


def test_ecadd_identity_encoding():
    """(0,0) operand: ec_add must honor the EVM identity encoding."""
    g1 = bn254.G1
    rng = random.Random(8)
    p = g1.random_point(rng)
    cs = compile_circuit(Q, EcAdd)
    sec = (_limbs(p[0], FP) + _limbs(p[1], FP)
           + _limbs(0, FP) + _limbs(0, FP)
           + _limbs(p[0], FP) + _limbs(p[1], FP))
    res = solve(cs, [], sec)
    assert res.wires[0] == 1


class EcMul(Circuit):
    px = Secret(shape=FP.n_limbs)
    py = Secret(shape=FP.n_limbs)
    u = Secret(shape=FR.n_limbs)
    rx = Secret(shape=FP.n_limbs)
    ry = Secret(shape=FP.n_limbs)

    def define(self, api):
        c = EmulatedCurve(api, BN254G1, Q)
        p = c.witness_point(self.px, self.py)
        out = evm.ec_mul(api, Q, p, c.fr.from_limbs(self.u))
        c.assert_is_equal(out, c.witness_point(self.rx, self.ry))


@pytest.mark.slow
def test_ecmul_compiles_and_solves():
    g1 = bn254.G1
    rng = random.Random(9)
    p = g1.random_point(rng)
    u = rng.randrange(1, bn254.R)
    r = g1.scalar_mul(p, u)
    cs = compile_circuit(Q, EcMul)
    print(f"evm ecmul compiled: {cs.nb_constraints} constraints")
    assert cs.nb_constraints == ECMUL_CONSTRAINTS, "ecmul count shifted"

    def sec(rr):
        return (_limbs(p[0], FP) + _limbs(p[1], FP) + _limbs(u, FR)
                + _limbs(rr[0], FP) + _limbs(rr[1], FP))

    res = solve(cs, [], sec(r))
    assert res.wires[0] == 1
    with pytest.raises(UnsatisfiedConstraintError):
        solve(cs, [], sec(g1.add(r, g1.generator)))


class EcRecover(Circuit):
    msg = Secret(shape=SFR.n_limbs)
    v = Secret()
    r = Secret(shape=SFR.n_limbs)
    s = Secret(shape=SFR.n_limbs)
    pubx = Secret(shape=SFP.n_limbs)
    puby = Secret(shape=SFP.n_limbs)

    def define(self, api):
        c = EmulatedCurve(api, SECP256K1, Q)
        fr = c.fr
        P = evm.ec_recover(api, Q, fr.from_limbs(self.msg), self.v,
                           fr.from_limbs(self.r), fr.from_limbs(self.s))
        c.assert_is_equal(P, c.witness_point(self.pubx, self.puby))


@pytest.mark.slow
def test_ecrecover_compiles_and_solves():
    rng = random.Random(41)
    priv = rng.randrange(1, _SECP_N)
    pub = _h_mul(_SECP_G, priv)
    msg = rng.randrange(1, _SECP_N)
    # host sign (mirrors test_evmprecompiles._sign)
    while True:
        k = rng.randrange(1, _SECP_N)
        R = _h_mul(_SECP_G, k)
        r = R[0] % _SECP_N
        if r == 0 or R[0] >= _SECP_N:
            continue
        s = (msg + r * priv) * pow(k, -1, _SECP_N) % _SECP_N
        if s == 0:
            continue
        v = R[1] & 1
        break

    cs = compile_circuit(Q, EcRecover)
    print(f"evm ecrecover compiled: {cs.nb_constraints} constraints")
    assert cs.nb_constraints == ECRECOVER_CONSTRAINTS, "ecrecover count shifted"

    def sec(px, py):
        return (_limbs(msg, SFR) + [v] + _limbs(r, SFR) + _limbs(s, SFR)
                + _limbs(px, SFP) + _limbs(py, SFP))

    res = solve(cs, [], sec(*pub))
    assert res.wires[0] == 1
    # wrong claimed key must not solve
    bad = _h_mul(_SECP_G, priv + 1)
    with pytest.raises(UnsatisfiedConstraintError):
        solve(cs, [], sec(*bad))


class EcPair(Circuit):
    """∏ e(Pᵢ, Qᵢ) == 1 for two pairs — the minimal nontrivial 0x08 call."""

    p1x = Secret(shape=FP.n_limbs)
    p1y = Secret(shape=FP.n_limbs)
    p2x = Secret(shape=FP.n_limbs)
    p2y = Secret(shape=FP.n_limbs)
    qx0 = Secret(shape=FP.n_limbs)
    qx1 = Secret(shape=FP.n_limbs)
    qy0 = Secret(shape=FP.n_limbs)
    qy1 = Secret(shape=FP.n_limbs)

    def define(self, api):
        c = EmulatedCurve(api, BN254G1, Q)
        fp = c.fp
        p1 = c.witness_point(self.p1x, self.p1y)
        p2 = c.witness_point(self.p2x, self.p2y)
        q2 = ((fp.from_limbs(self.qx0), fp.from_limbs(self.qx1)),
              (fp.from_limbs(self.qy0), fp.from_limbs(self.qy1)))
        evm.ec_pair(api, Q, [(p1, q2), (p2, q2)])


@pytest.mark.slow
def test_ecpair_compiles_and_solves():
    """e(P, Q)·e(−P, Q) == 1 solves; e(P, Q)·e(P, Q) != 1 rejects.
    Full-scale compile (two Miller loops + final exp + two G2 membership
    ladders as constraints) — several minutes, like the KZG-gadget test."""
    g1 = bn254.G1
    rng = random.Random(12)
    p = g1.random_point(rng)
    neg = g1.neg(p)
    q2 = bn254.G2.generator
    cs = compile_circuit(Q, EcPair)
    print(f"evm ecpair compiled: {cs.nb_constraints} constraints")
    assert cs.nb_constraints == ECPAIR_CONSTRAINTS, "ecpair count shifted"

    def sec(second):
        return (_limbs(p[0], FP) + _limbs(p[1], FP)
                + _limbs(second[0], FP) + _limbs(second[1], FP)
                + _limbs(q2[0].c0, FP) + _limbs(q2[0].c1, FP)
                + _limbs(q2[1].c0, FP) + _limbs(q2[1].c1, FP))

    res = solve(cs, [], sec(neg))
    assert res.wires[0] == 1
    with pytest.raises(UnsatisfiedConstraintError):
        solve(cs, [], sec(p))  # product = e(P,Q)^2 != 1
