"""Oracles for order-dependent scans: near-duplicate filter and time-slice.

Transliterations of
/root/reference/hypercane/hfilter/near_duplicates.py:101-117 and
/root/reference/hypercane/cluster/time_slice.py:58-102.
"""

from __future__ import annotations

import math


def near_dup_scan(
    rows: list[dict],
    simhash_key: str = "tf_simhash",
    mdt_key: str = "memento_datetime",
    key: str = "urim",
    threshold: float = 0.2,
) -> list[str]:
    """Within one group (TimeMap), sorted by (mdt, urim): keep a row iff
    hamming(simhash, last_kept)/64 > threshold; first row always kept."""
    ordered = sorted(rows, key=lambda r: (r[mdt_key], r[key]))
    kept = []
    last = None
    for r in ordered:
        if last is None:
            kept.append(r[key])
            last = r[simhash_key]
            continue
        x = (r[simhash_key] ^ last) & ((1 << 64) - 1)
        if bin(x).count("1") / 64.0 > threshold:
            kept.append(r[key])
            last = r[simhash_key]
    return kept


def time_slice(
    rows: list[dict],
    k: int | None,
    mdt_key: str = "memento_datetime",
    key: str = "urim",
) -> dict[str, int]:
    """urim → slice id; k slices of ceil(n/k) consecutive rows after sorting
    by (mdt, urim). k=None → story-size heuristic."""
    n = len(rows)
    if k is None:
        k = math.ceil(28 + math.log(n)) if n > 767 else math.ceil(math.sqrt(n))
    fill = math.ceil(n / k) if n else 1
    ordered = sorted(rows, key=lambda r: (r[mdt_key], r[key]))
    return {r[key]: i // fill for i, r in enumerate(ordered)}
