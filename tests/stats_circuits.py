"""Gadget-level stats corpus — constraint-count-locked std/ circuits.

Extends the api-level corpus (circuits.py) toward the reference's
internal/stats breadth (253 rows, internal/stats/latest_stats.csv): hashes,
signatures, merkle, range checks, lookups, selectors, emulated field/curve
ops. Circuits here only need to COMPILE deterministically — the snapshot
locks (nbConstraints, nbWires) per builder (stats.py / test_stats.py).
"""

from gnark_icicle_tpu.frontend import Circuit, Public, Secret
from gnark_icicle_tpu.std.selector import mux, map_lookup, step_mask
from gnark_icicle_tpu.std.fiat_shamir import CircuitTranscript
from gnark_icicle_tpu.std.hash.mimc import MiMC
from gnark_icicle_tpu.std.hash.sha2 import sha256_words, pad_message_words
from gnark_icicle_tpu.std.hash.keccakf import keccakf
from gnark_icicle_tpu.std.math_bits import UWord
from gnark_icicle_tpu.std.merkle import verify_proof
from gnark_icicle_tpu.std.rangecheck import RangeChecker, range_checker
from gnark_icicle_tpu.std.logderivlookup import Table
from gnark_icicle_tpu.std.bitslice import partition
from gnark_icicle_tpu.std.polynomial import Polynomial
from gnark_icicle_tpu.std.multicommit import with_commitment
from gnark_icicle_tpu.std.eddsa import verify_signature
from gnark_icicle_tpu.std.emulated import (
    EmulatedField, SECP256K1_FP, BN254_FP, BLS12381_FP,
)
from gnark_icicle_tpu.std.sw_emulated import (
    EmulatedCurve, BN254G1, SECP256K1, P256,
)


def _emu_binop(params, op):
    class C(Circuit):
        x = Secret(shape=params.n_limbs)
        y = Secret(shape=params.n_limbs)
        z = Public(shape=params.n_limbs)

        def define(self, api):
            f = EmulatedField(api, params, self._q)
            a, b = f.from_limbs(self.x), f.from_limbs(self.y)
            f.assert_equal(getattr(f, op)(a, b), f.from_limbs(self.z))

    return C


def _emu_unop(params, op):
    class C(Circuit):
        x = Secret(shape=params.n_limbs)
        z = Public(shape=params.n_limbs)

        def define(self, api):
            f = EmulatedField(api, params, self._q)
            a = f.from_limbs(self.x)
            f.assert_equal(getattr(f, op)(a), f.from_limbs(self.z))

    return C


def _mimc(n):
    class C(Circuit):
        xs = Secret(shape=n)
        h = Public()

        def define(self, api):
            m = MiMC(api, self._q)
            m.write(*self.xs)
            api.assert_is_equal(m.sum(), self.h)

    return C


def _sha256(blocks):
    n_words = 16 * blocks

    class C(Circuit):
        msg = Secret(shape=n_words)   # padded message words as WITNESS
        digest = Public(shape=8)

        def define(self, api):
            out = sha256_words(api, list(self.msg))
            for o, w in zip(out, self.digest):
                api.assert_is_equal(o, w)

    return C


class KeccakF(Circuit):
    lanes = Secret(shape=25)
    out = Public(shape=25)

    def define(self, api):
        words = [UWord.from_var(api, v, 64) for v in self.lanes]
        res = keccakf(api, words)
        for r, o in zip(res, self.out):
            api.assert_is_equal(r.value(), o)


def _merkle(depth):
    class C(Circuit):
        root = Public()
        leaf = Secret()
        siblings = Secret(shape=depth)
        dirs = Secret(shape=depth)

        def define(self, api):
            verify_proof(api, self._q, self.root, self.leaf,
                         self.siblings, self.dirs)

    return C


def _range_bits(bits):
    class C(Circuit):
        v = Secret()

        def define(self, api):
            RangeChecker(api).check(self.v, bits)

    return C


def _range_commit(bits):
    class C(Circuit):
        v = Secret(shape=4)

        def define(self, api):
            rc = range_checker(api)
            for x in self.v:
                rc.check(x, bits)

    return C


def _lookup(n_entries, n_queries):
    class C(Circuit):
        entries = Secret(shape=n_entries)
        inds = Secret(shape=n_queries)
        want = Public(shape=n_queries)

        def define(self, api):
            t = Table(api)
            for e in self.entries:
                t.insert(e)
            for v, w in zip(t.lookup(*self.inds), self.want):
                api.assert_is_equal(v, w)

    return C


def _mux(n):
    class C(Circuit):
        sel = Secret()
        vals = Secret(shape=n)
        out = Public()

        def define(self, api):
            api.assert_is_equal(mux(api, self.sel, *self.vals), self.out)

    return C


class MapLookup4(Circuit):
    query = Secret()
    out = Public()

    def define(self, api):
        api.assert_is_equal(
            map_lookup(api, self.query, [5, 9, 13, 21],
                       [50, 90, 130, 210]), self.out)


class StepMask8(Circuit):
    length = Secret()
    mask = Public(shape=8)

    def define(self, api):
        for o, m in zip(step_mask(api, self.length, 8), self.mask):
            api.assert_is_equal(o, m)


def _partition(split, digits):
    class C(Circuit):
        v = Secret()
        lo = Public()
        hi = Public()

        def define(self, api):
            hi, lo = partition(api, self.v, split, nb_digits=digits)
            api.assert_is_equal(lo, self.lo)
            api.assert_is_equal(hi, self.hi)

    return C


def _poly_eval(deg):
    class C(Circuit):
        coeffs = Secret(shape=deg + 1)
        at = Secret()
        out = Public()

        def define(self, api):
            p = Polynomial(api)
            api.assert_is_equal(
                p.eval_univariate(list(self.coeffs), self.at), self.out)

    return C


class Multilinear3(Circuit):
    at = Secret(shape=3)
    values = Secret(shape=8)
    out = Public()

    def define(self, api):
        p = Polynomial(api)
        api.assert_is_equal(
            p.eval_multilinear(list(self.at), list(self.values)), self.out)


class MulticommitPair(Circuit):
    a = Secret()
    b = Secret()

    def define(self, api):
        def cb(api_, ch):
            api_.assert_is_different(api_.add(ch, self.a), 0)

        with_commitment(api, cb, self.a, self.b)


class FiatShamir2(Circuit):
    a = Secret()
    c1 = Public()
    c2 = Public()

    def define(self, api):
        ts = CircuitTranscript(api, self._q, ["alpha", "beta"])
        ts.bind("alpha", [self.a])
        api.assert_is_equal(ts.compute_challenge("alpha"), self.c1)
        api.assert_is_equal(ts.compute_challenge("beta"), self.c2)


class EdDSAVerify(Circuit):
    pub_x = Public()
    pub_y = Public()
    r_x = Secret()
    r_y = Secret()
    s = Secret()
    msg = Public()

    def define(self, api):
        verify_signature(api, self._q, (self.pub_x, self.pub_y),
                         (self.r_x, self.r_y), self.s, self.msg)


def _sw_op(params, op):
    nl = params.fp.n_limbs

    class C(Circuit):
        px = Secret(shape=nl)
        py = Secret(shape=nl)
        qx = Secret(shape=nl)
        qy = Secret(shape=nl)
        rx = Public(shape=nl)
        ry = Public(shape=nl)

        def define(self, api):
            c = EmulatedCurve(api, params, self._q)
            p = c.witness_point(self.px, self.py)
            q = c.witness_point(self.qx, self.qy)
            r = c.witness_point(self.rx, self.ry)
            if op == "add":
                c.assert_is_equal(c.add(p, q), r)
            elif op == "add_unified":
                c.assert_is_equal(c.add_unified(p, q), r)
            elif op == "double":
                c.assert_is_equal(c.double(p), r)
            elif op == "on_curve":
                c.assert_on_curve(p)
                c.assert_on_curve(q)

    return C


def _sw_scalar_mul(params, n_bits):
    nl = params.fp.n_limbs
    sl = params.fr.n_limbs

    class C(Circuit):
        px = Secret(shape=nl)
        py = Secret(shape=nl)
        s = Secret(shape=sl)
        rx = Public(shape=nl)
        ry = Public(shape=nl)

        def define(self, api):
            c = EmulatedCurve(api, params, self._q)
            p = c.witness_point(self.px, self.py)
            fr = EmulatedField(api, params.fr, self._q)
            s = fr.from_limbs(self.s)
            r = c.scalar_mul(p, s, n_bits=n_bits)
            c.assert_is_equal(r, c.witness_point(self.rx, self.ry))

    return C


def gadget_corpus(q: int):
    """name -> circuit class (bound to modulus q via the _q attribute)."""
    out = {
        "std/mimc": _mimc(1),
        "std/mimc_multi4": _mimc(4),
        "std/sha256_1block": _sha256(1),
        "std/sha256_2block": _sha256(2),
        "std/keccakf": KeccakF,
        "std/merkle_d4": _merkle(4),
        "std/merkle_d8": _merkle(8),
        "std/merkle_d16": _merkle(16),
        "std/rangecheck_bits16": _range_bits(16),
        "std/rangecheck_bits64": _range_bits(64),
        "std/rangecheck_commit16": _range_commit(16),
        "std/rangecheck_commit64": _range_commit(64),
        "std/lookup_8x4": _lookup(8, 4),
        "std/lookup_64x16": _lookup(64, 16),
        "std/mux4": _mux(4),
        "std/mux8": _mux(8),
        "std/mux16": _mux(16),
        "std/map_lookup4": MapLookup4,
        "std/step_mask8": StepMask8,
        "std/partition_8of16": _partition(8, 16),
        "std/partition_16of32": _partition(16, 32),
        "std/poly_eval_deg15": _poly_eval(15),
        "std/poly_multilinear3": Multilinear3,
        "std/multicommit_pair": MulticommitPair,
        "std/fiat_shamir2": FiatShamir2,
        "std/eddsa_verify": EdDSAVerify,
        "emulated/secp256k1_mul": _emu_binop(SECP256K1_FP, "mul"),
        "emulated/secp256k1_div": _emu_binop(SECP256K1_FP, "div"),
        "emulated/secp256k1_add": _emu_binop(SECP256K1_FP, "add"),
        "emulated/secp256k1_sub": _emu_binop(SECP256K1_FP, "sub"),
        "emulated/bn254fp_mul": _emu_binop(BN254_FP, "mul"),
        "emulated/bn254fp_div": _emu_binop(BN254_FP, "div"),
        "sw_emulated/bn254_add": _sw_op(BN254G1, "add"),
        "sw_emulated/bn254_add_unified": _sw_op(BN254G1, "add_unified"),
        "sw_emulated/bn254_double": _sw_op(BN254G1, "double"),
        "sw_emulated/bn254_on_curve": _sw_op(BN254G1, "on_curve"),
        "sw_emulated/secp256k1_add": _sw_op(SECP256K1, "add"),
        "sw_emulated/secp256k1_scalar_mul16": _sw_scalar_mul(SECP256K1, 16),
        "sw_emulated/bn254_scalar_mul16": _sw_scalar_mul(BN254G1, 16),
        "std/mimc_multi8": _mimc(8),
        "std/merkle_d24": _merkle(24),
        "std/mux32": _mux(32),
        "std/lookup_256x32": _lookup(256, 32),
        "std/rangecheck_bits32": _range_bits(32),
        "std/rangecheck_commit32": _range_commit(32),
        "std/poly_eval_deg31": _poly_eval(31),
        "std/partition_4of16": _partition(4, 16),
        "emulated/bls12381fp_mul": _emu_binop(BLS12381_FP, "mul"),
        "emulated/secp256k1_inv": _emu_unop(SECP256K1_FP, "inverse"),
        "sw_emulated/p256_add": _sw_op(P256, "add"),
        "sw_emulated/p256_on_curve": _sw_op(P256, "on_curve"),
    }
    for cls in out.values():
        cls._q = q
    return out
