"""MiMC tests: keccak vectors, gadget vs host-hash agreement, and a Groth16
preimage proof (parity model: std/hash/mimc/mimc_test.go + examples/mimc)."""

import random

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import Circuit, Public, Secret, compile_circuit, is_solved
from gnark_icicle_tpu.constraint import solve
from gnark_icicle_tpu.std.hash import keccak256, MiMCHost
from gnark_icicle_tpu.std.hash.mimc import MiMC, mimc_hash

Q = bn254.R


def test_keccak256_vectors():
    assert keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )
    # > one rate block (136 bytes)
    assert keccak256(b"x" * 200) == keccak256(b"x" * 100 + b"x" * 100)


class MiMCPreimage(Circuit):
    """≙ examples/mimc: prove knowledge of a hash preimage."""

    pre = Secret()
    h = Public()

    def define(self, api):
        m = MiMC(api, Q)
        m.write(self.pre)
        api.assert_is_equal(m.sum(), self.h)


def test_gadget_matches_host():
    pre = 0xDEADBEEF
    want = mimc_hash(Q, [pre])
    assert is_solved(MiMCPreimage(pre=pre, h=want), Q)
    assert not is_solved(MiMCPreimage(pre=pre, h=want + 1), Q)


def test_gadget_matches_host_multi_block():
    rng = random.Random(1)
    vals = [rng.randrange(Q) for _ in range(3)]

    class Multi(Circuit):
        xs = Secret(shape=3)
        h = Public()

        def define(self, api):
            m = MiMC(api, Q)
            m.write(*self.xs)
            api.assert_is_equal(m.sum(), self.h)

    want = mimc_hash(Q, vals)
    assert is_solved(Multi(xs=vals, h=want), Q)


def test_solver_agrees():
    cs = compile_circuit(Q, MiMCPreimage)
    pre = 12345
    want = mimc_hash(Q, [pre])
    pub, sec = MiMCPreimage(pre=pre, h=want).witness_values(Q)
    res = solve(cs, pub, sec)
    # 110 rounds × 3 muls + 1 chain: ~331 constraints (reference
    # latest_stats.csv lists mimc bn254 r1cs = 330-ish)
    assert 300 < cs.nb_constraints < 400


@pytest.mark.slow
def test_groth16_mimc_preimage():
    from gnark_icicle_tpu.backend import groth16

    cs = compile_circuit(Q, MiMCPreimage)
    rng = random.Random(21)
    pk, vk = groth16.setup(cs, bn254.BN254, rng=rng)
    pre = 999
    want = mimc_hash(Q, [pre])
    pub, sec = MiMCPreimage(pre=pre, h=want).witness_values(Q)
    proof = groth16.prove(cs, pk, pub, sec, bn254.BN254, rng=rng)
    groth16.verify(proof, vk, pub, bn254.BN254)


def test_emulated_mimc_matches_host():
    """EmulatedMiMC over BLS12-381 Fr inside a BN254 engine equals the
    host MiMC bit-for-bit (the cross-curve transcript primitive)."""
    from gnark_icicle_tpu.curves import bls12_381 as b381
    from gnark_icicle_tpu.curves import bn254
    from gnark_icicle_tpu.frontend.engine import Engine
    from gnark_icicle_tpu.std.emulated import BLS12381_FR, EmulatedField
    from gnark_icicle_tpu.std.hash.mimc import EmulatedMiMC, MiMCHost

    eng = Engine(bn254.R)
    fp = EmulatedField(eng, BLS12381_FR, bn254.R)
    em = EmulatedMiMC(fp)
    vals = [12345, b381.R - 1, 777]
    em.write(*(fp.constant(v) for v in vals))
    got = fp.value_hint(fp.reduce(em.sum()))
    host = MiMCHost(b381.R)
    host.write(*vals)
    assert got == host.sum()
    # chaining continues across sum() calls like the reference gadget
    em.write(fp.constant(1))
    host.write(1)
    assert fp.value_hint(fp.reduce(em.sum())) == host.sum()
