"""Multi-chip sharding tests (subprocess with an 8-device virtual CPU mesh;
see conftest.py for why this is not in-process).

Parity model: SURVEY.md §4 implication 5 — the same kernels must run on
1 chip and N chips and agree bit-exactly (a tier the reference never needed:
it has no distributed anything, §2.4)."""

import os
import subprocess
import sys

import pytest


def test_sharded_kernels_8_devices():
    script = os.path.join(os.path.dirname(__file__), "parallel_check.py")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, script], env=env, capture_output=True, text=True,
        timeout=1150,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PARALLEL_CHECK_PASSED" in proc.stdout
