"""Selector/mux gadgets (≙ reference std/selector: Mux, Map, Slice helpers).
"""

from __future__ import annotations


def mux(api, sel, *values):
    """values[sel], constraining sel ∈ [0, len(values)) (≙ selector.Mux).

    Indicator construction: ind_i = (sel == i) via is_zero; Σ ind_i == 1
    follows from Σ over the complete index range.
    """
    assert values
    indicators = [api.is_zero(api.sub(sel, i)) for i in range(len(values))]
    api.assert_is_equal(api.add(*indicators) if len(indicators) > 1
                        else indicators[0], 1)
    acc = api.mul(indicators[0], values[0])
    for i in range(1, len(values)):
        acc = api.add(acc, api.mul(indicators[i], values[i]))
    return acc


def map_lookup(api, query, keys, values):
    """Value whose key equals query; constrains exactly one match
    (≙ selector.Map)."""
    assert len(keys) == len(values) and keys
    indicators = [api.is_zero(api.sub(query, k)) for k in keys]
    total = indicators[0]
    for ind in indicators[1:]:
        total = api.add(total, ind)
    api.assert_is_equal(total, 1)
    acc = api.mul(indicators[0], values[0])
    for ind, v in zip(indicators[1:], values[1:]):
        acc = api.add(acc, api.mul(ind, v))
    return acc


def step_mask(api, length, max_len: int):
    """Indicator list: out[i] = 1 iff i < length (≙ selector.Partition's
    stepMask). length must be ≤ max_len."""
    n_bits = max(max_len.bit_length() + 2, 2)
    outs = []
    for i in range(max_len):
        gt = api.cmp(length, i, n_bits)  # 1 if length > i
        outs.append(api.is_zero(api.sub(gt, 1)))
    return outs
