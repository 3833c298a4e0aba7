"""EdDSA gadget tests: host sign ↔ circuit verify agreement
(≙ std/signature/eddsa tests)."""

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.curves import twisted_edwards as te
from gnark_icicle_tpu.frontend import Circuit, Public, Secret, is_solved
from gnark_icicle_tpu.std.eddsa import verify_signature

Q = bn254.R


def test_host_curve_sanity():
    assert te.is_on_curve(te.BASE)
    p2 = te.scalar_mul(te.BASE, 2)
    assert te.is_on_curve(p2)
    assert te.add(te.BASE, te.BASE) == p2
    # subgroup order annihilates the base point
    assert te.scalar_mul(te.BASE, te.SUBGROUP_ORDER) == (0, 1)


def test_host_sign_verify():
    kp = te.generate_key(b"alice")
    msg = 123456789
    R, s = te.sign(kp, msg)
    assert te.verify(kp.public, R, s, msg)
    assert not te.verify(kp.public, R, s, msg + 1)
    assert not te.verify(kp.public, R, (s + 1) % te.SUBGROUP_ORDER, msg)


class EddsaCircuit(Circuit):
    pub_x = Public()
    pub_y = Public()
    msg = Public()
    r_x = Secret()
    r_y = Secret()
    s = Secret()

    def define(self, api):
        verify_signature(
            api, Q, (self.pub_x, self.pub_y), (self.r_x, self.r_y),
            self.s, self.msg,
        )


def test_eddsa_circuit_accepts_valid():
    kp = te.generate_key(b"bob")
    msg = 42
    R, s = te.sign(kp, msg)
    circ = EddsaCircuit(
        pub_x=kp.public[0], pub_y=kp.public[1], msg=msg,
        r_x=R[0], r_y=R[1], s=s,
    )
    assert is_solved(circ, Q)


def test_eddsa_circuit_rejects_invalid():
    kp = te.generate_key(b"carol")
    msg = 42
    R, s = te.sign(kp, msg)
    bad = EddsaCircuit(
        pub_x=kp.public[0], pub_y=kp.public[1], msg=msg + 1,
        r_x=R[0], r_y=R[1], s=s,
    )
    assert not is_solved(bad, Q)
