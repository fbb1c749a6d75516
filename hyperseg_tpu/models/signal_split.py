"""Signal-channel division arithmetic.

The hypernetwork signal (stride-32 context tensor) is split across the
decoder's weight generators proportionally to how many parameters each must
produce. Three historical variants of this integer division exist in the
reference and are *load-bearing for checkpoint parity* (they size every
signal2weights convolution):

  * `divide_feature`        — hyperseg_v1_0.py:763-810 (and utils/utils.py:298)
  * `divide_feature_legacy_v02` — hyperseg_v0_2.py:764-813, including the
    "TODO: major bug!" else-branch that drops the remainder when the last
    group is reached with >1 groups.
  * `divide_feature_legacy_v01` — hyperseg_v0_1.py:366-406, the oldest form
    used by Conv2dMulti in the v0_1 WeightMapper.

All reproduce the reference's arithmetic exactly (verified by
tests/test_signal_split.py against the reference functions).

Shared scheme: channels are counted in units of `min_unit`; equal-sized
outputs are grouped so they receive identical shares; groups are processed in
decreasing order of total parameter mass; the smallest group absorbs the
rounding remainder (modulo the v0_2 bug).
"""

from __future__ import annotations

from itertools import groupby
from typing import List, Sequence

import numpy as np


def next_multiply(x: int, base: int) -> int:
    """Round up to a multiple of base (hyperseg_v1_0.py:451)."""
    return type(x)(np.ceil(x / base) * base)


def _sorted_groups(out_features: Sequence[int]):
    """Group indices of equal out_features; order groups by total mass desc.

    Mirrors the argsort+groupby construction (hyperseg_v1_0.py:781-784)."""
    idx = np.argsort(out_features)
    vals = np.array(out_features)[idx]
    groups = [(k, idx[list(g)]) for k, g in
              groupby(range(len(idx)), lambda i: vals[i])]
    groups.sort(key=lambda g: g[0] * len(g[1]), reverse=True)
    return groups


def _scatter(groups, group_units, n_out, min_unit):
    out = np.zeros(n_out, dtype=int)
    for (_, members), units in zip(groups, group_units):
        share = units // len(members) * min_unit
        for j in members:
            out[j] = share
    return out


def divide_feature(in_feature: int, out_features: Sequence[int], min_unit: int = 8):
    """v1_0 variant (hyperseg_v1_0.py:763-810)."""
    assert in_feature % min_unit == 0, (
        f"in_feature ({in_feature}) must be divisible by min_unit ({min_unit})")
    units = in_feature // min_unit
    groups = _sorted_groups(out_features)
    ratio = float(units) / sum(out_features)

    group_units = [len(g[1]) for g in groups]  # every member gets >= 1 unit
    remaining = units - sum(group_units)
    for i, (feat, members) in enumerate(groups):
        if i < len(groups) - 1:
            n = len(members)
            share = max(feat * n * ratio, n)
            share = share // n * n - n  # snap to group size, minus the pre-grant
            share = min(share, remaining)
            group_units[i] += share
            remaining -= share
            if remaining == 0:
                break
        else:
            group_units[-1] += remaining
    return _scatter(groups, group_units, len(out_features), min_unit)


def divide_feature_legacy_v02(in_feature: int, out_features: Sequence[int],
                              min_unit: int = 8):
    """v0_2 variant (hyperseg_v0_2.py:764-813). Identical to `divide_feature`
    except the final group only absorbs the remainder when it is the *only*
    group; otherwise the remainder is appended past the end of the share list
    and silently dropped (the reference's acknowledged bug)."""
    assert in_feature % min_unit == 0, (
        f"in_feature ({in_feature}) must be divisible by min_unit ({min_unit})")
    units = in_feature // min_unit
    groups = _sorted_groups(out_features)
    ratio = float(units) / sum(out_features)

    group_units = [len(g[1]) for g in groups]
    remaining = units - sum(group_units)
    for i, (feat, members) in enumerate(groups):
        if i < len(groups) - 1:
            n = len(members)
            share = max(feat * n * ratio, n)
            share = share // n * n - n
            share = min(share, remaining)
            group_units[i] += share
            remaining -= share
            if remaining == 0:
                break
        elif len(groups) == 1:
            group_units[-1] += remaining
        # else: remainder dropped (reference appends it past the end)
    return _scatter(groups, group_units, len(out_features), min_unit)


def divide_feature_legacy_v01(in_feature: int, out_features: Sequence[int],
                              min_unit: int = 8):
    """v0_1 variant (hyperseg_v0_1.py:366-406): no per-member pre-grant, float
    shares floored to the group size, last group takes the whole remainder."""
    assert in_feature % min_unit == 0, (
        f"in_feature ({in_feature}) must be divisible by min_unit ({min_unit})")
    units = in_feature // min_unit
    groups = _sorted_groups(out_features)
    ratio = float(units) / sum(out_features)

    remaining = units
    group_units: List[float] = []
    for i, (feat, members) in enumerate(groups):
        if i < len(groups) - 1:
            n = len(members)
            share = max(feat * n * ratio, 1)
            share = share // n * n
            group_units.append(share)
            remaining -= share
        else:
            group_units.append(remaining)
    return _scatter(groups, [int(u) for u in group_units],
                    len(out_features), min_unit)
