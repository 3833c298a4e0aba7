"""Aux subsystem tests: profiler, logger, Println, examples compile.

Parity model: profile/profile_test.go (constraint attribution), the solver
LogEntry tests, and the reference CI running examples."""

import logging

import pytest

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu import profile
from gnark_icicle_tpu.frontend import Circuit, Public, Secret, compile_circuit
from gnark_icicle_tpu.constraint import solve

Q = bn254.R


def test_profiler_counts_constraints():
    from circuits import Cubic

    p = profile.start()
    compile_circuit(Q, Cubic)
    p.stop()
    assert p.total == 3  # cubic = 3 R1CS constraints
    report = p.top()
    assert "total constraints: 3" in report
    assert "define" in report  # attributed to the circuit's define()


def test_profiler_scs():
    from circuits import Cubic

    p = profile.start()
    compile_circuit(Q, Cubic, builder="scs")
    p.stop()
    assert p.total >= 4


def test_println_resolves_at_solve(caplog):
    class P(Circuit):
        x = Secret()

        def define(self, api):
            api.println("x is", api.add(self.x, 1))
            api.assert_is_equal(api.mul(self.x, 1), self.x)

    cs = compile_circuit(Q, P)
    from gnark_icicle_tpu.logger import logger as _get_logger

    lg = _get_logger()  # force lazy init before overriding the level
    old = lg.level
    lg.setLevel(logging.INFO)
    try:
        with caplog.at_level(logging.INFO, logger="gnark_icicle_tpu"):
            solve(cs, [], [41])
    finally:
        lg.setLevel(old)
    assert any("42" in r.getMessage() for r in caplog.records)


def test_examples_importable():
    import examples.cubic
    import examples.mimc
    import examples.exponentiate

    cs = compile_circuit(Q, examples.cubic.CubicCircuit)
    assert cs.nb_constraints == 3
    cs2 = compile_circuit(Q, examples.exponentiate.ExponentiateCircuit)
    assert cs2.nb_constraints > 8


def test_profiler_pprof_binary_format(tmp_path):
    """dump_pprof emits a REAL pprof profile (gzipped profile.proto) —
    validated here with an independent minimal wire-format decoder:
    string table, sample/location/function cross-references and the total
    count must reconstruct (≙ the reference writing google/pprof profiles,
    profile/profile.go:71-105)."""
    import gzip

    from gnark_icicle_tpu.curves import bn254
    from gnark_icicle_tpu.frontend import compile_circuit
    from circuits import Cubic

    p = profile.start()
    compile_circuit(bn254.R, Cubic)
    p.stop()
    path = tmp_path / "cubic.pb.gz"
    p.dump_pprof(str(path))

    raw = gzip.open(path, "rb").read()

    def rd_varint(buf, i):
        v = s = 0
        while True:
            b = buf[i]
            i += 1
            v |= (b & 0x7F) << s
            s += 7
            if not b & 0x80:
                return v, i

    def parse(buf):
        fields = {}
        i = 0
        while i < len(buf):
            key, i = rd_varint(buf, i)
            fno, wire = key >> 3, key & 7
            if wire == 0:
                v, i = rd_varint(buf, i)
            elif wire == 2:
                ln, i = rd_varint(buf, i)
                v = buf[i:i + ln]
                i += ln
            else:
                raise AssertionError(f"unexpected wire type {wire}")
            fields.setdefault(fno, []).append(v)
        return fields

    top = parse(raw)
    strings = [b.decode() for b in top[6]]
    assert strings[0] == ""
    assert "constraints" in strings and "count" in strings

    samples = [parse(b) for b in top[2]]
    locs = {parse(b)[1][0]: parse(b) for b in top[4]}
    funcs = {parse(b)[1][0]: parse(b) for b in top[5]}
    total = sum(s[2][0] for s in samples)
    assert total == p.total > 0
    for s in samples:
        for lid in s[1]:
            loc = locs[lid]
            line = parse(loc[4][0])
            fn = funcs[line[1][0]]
            assert strings[fn[2][0]]          # function name resolves
            assert strings[fn[4][0]].endswith(".py")


def test_profiler_flat_dump(tmp_path):
    from gnark_icicle_tpu.curves import bn254
    from gnark_icicle_tpu.frontend import compile_circuit
    from circuits import Cubic

    p = profile.start()
    compile_circuit(bn254.R, Cubic)
    p.stop()
    path = tmp_path / "flat.txt"
    p.dump_pprof_like(str(path))
    text = path.read_text()
    assert text.startswith("total constraints:")


def test_prover_service_marginal_faster_api():
    """Groth16Prover/PlonkProver: N proofs from one resident object, all
    verifying — the persistent-service API (host engine; the device
    amortization numbers live in BASELINE.md via tools/run_2chain_device
    --iters)."""
    import random

    from gnark_icicle_tpu.curves import bn254
    from gnark_icicle_tpu.frontend import compile_circuit
    from gnark_icicle_tpu.backend import groth16, plonk
    from gnark_icicle_tpu.backend.prover_service import (
        Groth16Prover, PlonkProver,
    )
    from circuits import Cubic

    cs = compile_circuit(bn254.R, Cubic)
    pk, vk = groth16.setup(cs, bn254.BN254, rng=random.Random(1),
                           engine="host")
    svc = Groth16Prover(cs, pk, bn254.BN254, engine="host")
    first = svc.warmup([35], [3], rng=random.Random(2))
    assert first > 0
    for i in range(2):
        proof = svc.prove([35], [3], rng=random.Random(3 + i))
        groth16.verify(proof, vk, [35], bn254.BN254)

    scs = compile_circuit(bn254.R, Cubic, builder="scs")
    ppk, pvk = plonk.setup(scs, bn254.BN254, rng=random.Random(4),
                           engine="host")
    psvc = PlonkProver(scs, ppk, bn254.BN254, engine="host")
    psvc.warmup([35], [3], rng=random.Random(5))
    proof = psvc.prove([35], [3], rng=random.Random(6))
    plonk.verify(proof, pvk, [35], bn254.BN254)
