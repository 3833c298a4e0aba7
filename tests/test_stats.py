"""Constraint-count regression test (≙ internal/stats/latest_stats.csv diff
driven by the stats TestCircuitStatistics)."""

import os

from gnark_icicle_tpu.curves import bn254
from gnark_icicle_tpu.stats import snapshot, from_csv, diff

from circuits import corpus

LOCKED = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "gnark_icicle_tpu", "latest_stats.csv",
)


def _all_circuits():
    from stats_circuits import gadget_corpus

    circuits = {name: cls for name, cls, _, _ in corpus(bn254.R)}
    circuits.update(gadget_corpus(bn254.R))
    return circuits


def test_constraint_counts_locked():
    current = snapshot(_all_circuits(), bn254.R, "bn254")
    locked = from_csv(open(LOCKED).read())
    problems = diff(locked, current)
    assert not problems, (
        "constraint-count regression (update gnark_icicle_tpu/latest_stats.csv "
        "if intentional):\n" + "\n".join(problems)
    )
