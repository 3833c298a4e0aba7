"""Witness-solve variance probe (VERDICT r4 weak item 3).

The r4c groth16 2^20 prove logs showed the warm native solve ranging
12-34 s across iterations (3x spread on a cached schedule). This probe
isolates the solve: compile the bench chain circuit once, then run
N warm solves back-to-back and report per-iteration times + p50/p95.

Pure host work — forces CPU so it can never touch the axon tunnel.

  SOLVE_LOG_N=20 SOLVE_ITERS=6 python bench/probe_solve.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")  # before any device touch


def main():
    from gnark_icicle_tpu.curves import bn254
    from gnark_icicle_tpu.frontend import (
        Circuit, Public, Secret, compile_circuit,
    )
    from gnark_icicle_tpu.constraint.solver import solve

    q = bn254.R
    log_n = int(os.environ.get("SOLVE_LOG_N", "20"))
    iters = int(os.environ.get("SOLVE_ITERS", "6"))
    steps = (1 << log_n) - 2

    class Chain(Circuit):
        x = Secret()
        out = Public()

        def define(self, api):
            v = self.x
            for i in range(steps):
                v = api.add(api.mul(v, v), v, i)
            api.assert_is_equal(v, self.out)

    t0 = time.perf_counter()
    cs = compile_circuit(q, Chain)
    print(json.dumps({"probe": "compile", "log_n": log_n,
                      "s": round(time.perf_counter() - t0, 2)}), flush=True)

    x0 = 3
    v = x0
    for i in range(steps):
        v = (v * v + v + i) % q
    pub, sec = [v], [x0]

    times = []
    for it in range(iters):
        t0 = time.perf_counter()
        res = solve(cs, pub, sec)  # raises on any unsatisfied constraint
        dt = time.perf_counter() - t0
        times.append(dt)
        assert res is not None
        print(json.dumps({"probe": "solve", "iter": it,
                          "s": round(dt, 3)}), flush=True)

    ts = sorted(times[1:]) or sorted(times)  # drop the schedule-build iter
    p50 = ts[len(ts) // 2]
    p95 = ts[min(len(ts) - 1, int(round(0.95 * (len(ts) - 1))))]
    print(json.dumps({
        "probe": "summary", "log_n": log_n, "iters": iters,
        "warm_min": round(min(ts), 3), "warm_max": round(max(ts), 3),
        "p50": round(p50, 3), "p95": round(p95, 3),
        "p95_over_p50": round(p95 / p50, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
