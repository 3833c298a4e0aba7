"""Constraint profiler: attribute constraint counts to source locations.

Role parity: reference profile/ — ``profile.Start()`` collects a sample per
added constraint with the caller stack, sample value = constraints added
(profile/profile.go:71-105; recorded from constraint/core.go:348,365). Here
``start()`` arms a process-global collector; every builder ``add_r1c``/
``add_gate`` records the defining Python frame stack; ``top()`` prints the
hot spots and ``dump_pprof_like()`` emits a flat text profile.
"""

from __future__ import annotations

import traceback
from collections import Counter
from dataclasses import dataclass, field

_ACTIVE: list = []


@dataclass
class Profile:
    name: str = "constraints"
    by_site: Counter = field(default_factory=Counter)
    by_stack: Counter = field(default_factory=Counter)
    total: int = 0

    def record(self, n: int = 1):
        stack = [
            f"{fr.name} ({fr.filename.rsplit('/', 1)[-1]}:{fr.lineno})"
            for fr in traceback.extract_stack()
            if "gnark_icicle_tpu" not in fr.filename
            and "profile/__init__" not in fr.filename
        ]
        if stack:
            self.by_site[stack[-1]] += n
            self.by_stack[" > ".join(stack[-4:])] += n
        self.total += n

    def top(self, n: int = 10) -> str:
        """Flat top-N report (≙ p.Top())."""
        lines = [f"total constraints: {self.total}"]
        for site, cnt in self.by_site.most_common(n):
            pct = 100.0 * cnt / max(self.total, 1)
            lines.append(f"{cnt:>10}  {pct:5.1f}%  {site}")
        return "\n".join(lines)

    def stop(self) -> "Profile":
        if self in _ACTIVE:
            _ACTIVE.remove(self)
        return self


def start(name: str = "constraints") -> Profile:
    p = Profile(name)
    _ACTIVE.append(p)
    return p


def record_constraint(n: int = 1):
    """Called by builders on every constraint (no-op when not profiling,
    ≙ profile.RecordConstraint at constraint/core.go:348)."""
    for p in _ACTIVE:
        p.record(n)


def is_profiling() -> bool:
    return bool(_ACTIVE)


# ---------------------------------------------------------------------------
# device-kernel tracing (≙ the reference's zerolog Dur("took") prover timing,
# upgraded to real jax profiler traces for kernel-level inspection)
# ---------------------------------------------------------------------------

import contextlib


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax profiler trace around a prover region.

    Usage::

        with profile.device_trace("/tmp/trace"):
            groth16.prove(...)

    The trace opens in TensorBoard / Perfetto and shows every XLA kernel the
    prover dispatched (MSM waves, NTT stages, elementwise passes) with
    durations — the TPU analog of the reference's per-stage Dur logs
    (backend/groth16/bn254/prove.go:322) at kernel granularity.
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a device trace (≙ jax.profiler.TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
