"""Selector/map/step-mask + in-circuit Fiat-Shamir gadget tests
(≙ std/selector tests + std/fiat-shamir tests)."""

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import Circuit, Public, Secret, is_solved
from gnark_icicle_tpu.std.selector import mux, map_lookup, step_mask
from gnark_icicle_tpu.std.fiat_shamir import CircuitTranscript

Q = bn254.R


class MuxCircuit(Circuit):
    sel = Secret()
    vals = Public(shape=4)
    out = Public()

    def define(self, api):
        api.assert_is_equal(mux(api, self.sel, *self.vals), self.out)


@pytest.mark.parametrize("sel", [0, 2, 3])
def test_mux(sel):
    vals = [10, 20, 30, 40]
    assert is_solved(MuxCircuit(sel=sel, vals=vals, out=vals[sel]), Q)
    assert not is_solved(MuxCircuit(sel=sel, vals=vals, out=99), Q)


def test_mux_out_of_range_rejected():
    assert not is_solved(MuxCircuit(sel=7, vals=[1, 2, 3, 4], out=1), Q)


class MapCircuit(Circuit):
    query = Secret()
    out = Public()

    def define(self, api):
        api.assert_is_equal(
            map_lookup(api, self.query, [5, 9, 13], [50, 90, 130]), self.out
        )


def test_map_lookup():
    assert is_solved(MapCircuit(query=9, out=90), Q)
    assert not is_solved(MapCircuit(query=9, out=50), Q)
    assert not is_solved(MapCircuit(query=7, out=50), Q)  # no match


class MaskCircuit(Circuit):
    length = Secret()
    mask = Public(shape=5)

    def define(self, api):
        outs = step_mask(api, self.length, 5)
        for o, m in zip(outs, self.mask):
            api.assert_is_equal(o, m)


def test_step_mask():
    assert is_solved(MaskCircuit(length=3, mask=[1, 1, 1, 0, 0]), Q)
    assert is_solved(MaskCircuit(length=0, mask=[0, 0, 0, 0, 0]), Q)
    assert not is_solved(MaskCircuit(length=3, mask=[1, 1, 0, 0, 0]), Q)


class FSCircuit(Circuit):
    a = Secret()
    c1 = Public()
    c2 = Public()

    def define(self, api):
        ts = CircuitTranscript(api, Q, ["alpha", "beta"])
        ts.bind("alpha", [self.a])
        alpha = ts.compute_challenge("alpha")
        api.assert_is_equal(alpha, self.c1)
        beta = ts.compute_challenge("beta")
        api.assert_is_equal(beta, self.c2)


def test_fiat_shamir_matches_host_mimc():
    from gnark_icicle_tpu.std.hash.mimc import MiMCHost

    a = 777
    h = MiMCHost(Q)
    tag1 = int.from_bytes(b"alpha", "big") % Q
    h.write(tag1, a)
    c1 = h.h
    h2 = MiMCHost(Q)
    tag2 = int.from_bytes(b"beta", "big") % Q
    h2.write(tag2, a, c1)
    c2 = h2.h
    assert is_solved(FSCircuit(a=a, c1=c1, c2=c2), Q)
    assert not is_solved(FSCircuit(a=a, c1=c1, c2=(c2 + 1) % Q), Q)


def test_fs_order_enforced():
    class BadOrder(Circuit):
        a = Secret()

        def define(self, api):
            ts = CircuitTranscript(api, Q, ["alpha", "beta"])
            ts.bind("alpha", [self.a])
            ts.compute_challenge("beta")  # skips alpha

    with pytest.raises(ValueError):
        is_solved(BadOrder(a=1), Q)
