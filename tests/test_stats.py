"""Constraint-count regression test (≙ internal/stats/latest_stats.csv diff
driven by the stats TestCircuitStatistics).

The reference locks 253 rows over 18 snippets x 7 curves x 2 backends
(/root/reference/internal/stats/latest_stats.csv). Here the full 77-circuit
corpus is locked on bn254 and the 26-circuit field-generic base corpus is
additionally locked on bls12-381 / bls12-377 / bw6-761 — catching both
builder regressions and any curve-dependent count drift (e.g. rangecheck
decompositions tracking the field bit length)."""

import os

import pytest

from gnark_icicle_tpu.curves import (
    bls12_377, bls12_381, bls24_315, bn254, bw6_761,
)
from gnark_icicle_tpu.stats import snapshot, from_csv, diff

from circuits import corpus

LOCKED = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "gnark_icicle_tpu", "latest_stats.csv",
)

EXTRA_CURVES = [
    ("bls12-381", bls12_381.R),
    ("bls12-377", bls12_377.R),
    ("bw6-761", bw6_761.R),
    ("bls24-315", bls24_315.R),
]


def _all_circuits():
    from stats_circuits import gadget_corpus

    circuits = {name: cls for name, cls, _, _ in corpus(bn254.R)}
    circuits.update(gadget_corpus(bn254.R))
    return circuits


def full_snapshot():
    rows = snapshot(_all_circuits(), bn254.R, "bn254")
    for cname, q in EXTRA_CURVES:
        base = {name: cls for name, cls, _, _ in corpus(q)}
        rows.extend(snapshot(base, q, cname))
    return rows


def _locked():
    return from_csv(open(LOCKED).read())


def test_locked_row_count_matches_reference_scale():
    # the reference net is 253 rows per its stats CSV; ours must be >= that
    assert len(_locked()) >= 253


def test_constraint_counts_locked_bn254():
    current = snapshot(_all_circuits(), bn254.R, "bn254")
    locked = [r for r in _locked() if r["curve"] == "bn254"]
    problems = diff(locked, current)
    assert not problems, (
        "constraint-count regression (update gnark_icicle_tpu/latest_stats.csv "
        "if intentional):\n" + "\n".join(problems)
    )


@pytest.mark.parametrize("cname,q", EXTRA_CURVES)
def test_constraint_counts_locked_extra_curves(cname, q):
    base = {name: cls for name, cls, _, _ in corpus(q)}
    current = snapshot(base, q, cname)
    locked = [r for r in _locked() if r["curve"] == cname]
    problems = diff(locked, current)
    assert not problems, (
        f"constraint-count regression on {cname} (update "
        "gnark_icicle_tpu/latest_stats.csv if intentional):\n"
        + "\n".join(problems)
    )


if __name__ == "__main__":
    # regenerate the locked CSV:  python tests/test_stats.py > /tmp/stats.csv
    from gnark_icicle_tpu.stats import to_csv

    print(to_csv(full_snapshot()), end="")
