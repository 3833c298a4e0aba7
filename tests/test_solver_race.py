"""Race-detection analog for the OpenMP level solver (SURVEY §5: the
reference CI runs `go test -race` over its goroutine pools,
.github/workflows/push.yml:162-163; C++/OpenMP has no -race, so this
stress tier OVERSUBSCRIBES threads on wide dependency levels and asserts
bit-identical results against the sequential native path and the pure
Python solver — a data race in the per-level batch entry would surface as
a wire/abc divergence under scheduling jitter)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import os, random, sys
sys.path.insert(0, "@REPO@")
import jax; jax.config.update("jax_platforms", "cpu")
from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.frontend import Circuit, Public, Secret, compile_circuit
from gnark_icicle_tpu.constraint.solver import solve

Q = bn254.R
WIDE = 700  # one instruction level far above the par_min coalescing floor

class Wide(Circuit):
    xs = Secret(shape=WIDE)
    out = Public()

    def define(self, api):
        # WIDE independent squares (one wide level), then a reduction
        sq = [api.mul(x, x) for x in self.xs]
        api.assert_is_equal(api.add(*sq), self.out)

cs = compile_circuit(Q, Wide)
rng = random.Random(11)
xs = [rng.randrange(Q) for _ in range(WIDE)]
out = sum(x * x for x in xs) % Q

ref = solve(cs, [out], xs, native=False)          # big-int oracle
seq = None
for trial in range(@TRIALS@):
    res = solve(cs, [out], xs)                    # native (level-parallel)
    assert res.wires == ref.wires, f"wire divergence on trial {trial}"
    assert (res.a, res.b, res.c) == (ref.a, ref.b, ref.c), \
        f"abc divergence on trial {trial}"
print("OK")
"""


@pytest.mark.parametrize("threads", ["1", "8"])
def test_level_solver_oversubscribed_bit_exact(threads):
    env = dict(os.environ, JAX_PLATFORMS="cpu", OMP_NUM_THREADS=threads,
               GNARK_TPU_LEVEL_SOLVE="1")
    proc = subprocess.run(
        [sys.executable, "-c",
         _SCRIPT.replace("@REPO@", REPO).replace("@TRIALS@", "5")],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "OK" in proc.stdout


def test_level_parallel_vs_sequential_entry():
    """GNARK_TPU_LEVEL_SOLVE=0 (sequential stream) must agree with the
    levelled schedule on the same system."""
    env = dict(os.environ, JAX_PLATFORMS="cpu", OMP_NUM_THREADS="8",
               GNARK_TPU_LEVEL_SOLVE="0")
    proc = subprocess.run(
        [sys.executable, "-c",
         _SCRIPT.replace("@REPO@", REPO).replace("@TRIALS@", "2")],
        env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
