"""One-command green CPU suite (VERDICT r3 item 5).

Runs every test file under tests/ as its OWN pytest subprocess and
aggregates the results. Rationale: a single-process run of the full suite
segfaults inside jax at tests/test_field.py::test_pow_inv after ~100 tests
(exit 139; CLAUDE.md "OPEN FLAKE" — ruled out: the persistent compile
cache, the OpenMP level solver; any per-file subset passes). Process
isolation per file is the standard CI mitigation for interpreter-level
crashes and keeps the whole suite usable as one regression gate
(≙ the reference CI matrix, .github/workflows/pr.yml:64-71, which also
shards the suite across jobs).

Usage:
    python tools/cpu_suite.py            # CPU-only, -m "not slow"
    python tools/cpu_suite.py --slow     # include slow tests (hours)
    python tools/cpu_suite.py -k expr    # forwarded to pytest

Writes a per-file summary to bench/.cpu_suite.log and exits nonzero if
any file fails.
"""

from __future__ import annotations

import argparse
import glob
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--slow", action="store_true",
                    help="include tests marked slow")
    ap.add_argument("--timeout", type=int, default=2400,
                    help="per-file timeout (s)")
    ap.add_argument("-k", default=None, help="forwarded to pytest -k")
    args = ap.parse_args()

    files = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    env = dict(os.environ, JAX_PLATFORMS="cpu")

    log_path = os.path.join(REPO, "bench", ".cpu_suite.log")
    results = []
    t_suite = time.time()
    with open(log_path, "w") as log:
        log.write(f"# cpu suite start {time.strftime('%FT%TZ', time.gmtime())}"
                  f" slow={args.slow}\n")
        for path in files:
            name = os.path.basename(path)
            cmd = [sys.executable, "-m", "pytest", path, "-q",
                   "--no-header", "-p", "no:cacheprovider"]
            if not args.slow:
                cmd += ["-m", "not slow"]
            if args.k:
                cmd += ["-k", args.k]
            t0 = time.time()
            try:
                proc = subprocess.run(
                    cmd, cwd=REPO, env=env, capture_output=True, text=True,
                    timeout=args.timeout,
                )
                rc = proc.returncode
                tail = (proc.stdout.strip().splitlines() or [""])[-1]
            except subprocess.TimeoutExpired:
                rc, tail = 124, "TIMEOUT"
            dt = time.time() - t0
            # pytest exit 5 = no tests collected (e.g. all deselected)
            ok = rc in (0, 5)
            results.append((name, ok, rc, dt, tail))
            line = (f"{'PASS' if ok else 'FAIL':4} {name:40} "
                    f"{dt:7.1f}s rc={rc} {tail}")
            print(line, flush=True)
            log.write(line + "\n")
        n_fail = sum(1 for _, ok, *_ in results if not ok)
        summary = (f"# cpu suite done: {len(results)} files, {n_fail} failed, "
                   f"{time.time() - t_suite:.0f}s total")
        print(summary)
        log.write(summary + "\n")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
