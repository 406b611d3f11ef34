"""Transliteration of /root/reference/hypercane/sample/probability.py
(list algebra, stdlib random) — the byte-parity oracle for samplers.
Each function cites the reference lines it mirrors.
"""

from __future__ import annotations

import random
from collections import OrderedDict


def select_true_random(urims: list[str], k: int, seed: int | None = None) -> list[str]:
    """probability.py:3-11 — random.sample, all rows when len<=k."""
    rng = random.Random(seed) if seed is not None else random
    if len(urims) <= k:
        return list(urims)
    return rng.sample(urims, k)


def select_systematic(urims: list[str], j: int) -> list[str]:
    """probability.py:13-27 — 1-indexed, keep positions where i % j == 0."""
    out = []
    for i, u in enumerate(urims, start=1):
        if i % j == 0:
            out.append(u)
    return out


def group_by_cluster(rows: list[dict], cluster_key: str = "cluster") -> "OrderedDict[str, list[dict]]":
    """utils.py:860-868 — dict-of-lists pivot preserving encounter order."""
    out: OrderedDict[str, list[dict]] = OrderedDict()
    for r in rows:
        out.setdefault(r[cluster_key], []).append(r)
    return out


def select_stratified_systematic(
    rows: list[dict], j: int, key: str = "urim", cluster_key: str = "cluster"
) -> list[str]:
    """probability.py:39-47 — per cluster, every j-th in input order."""
    out = []
    for _, members in group_by_cluster(rows, cluster_key).items():
        out.extend(select_systematic([m[key] for m in members], j))
    return out


def select_random_cluster(
    rows: list[dict], n: int, seed: int, cluster_key: str = "cluster", key: str = "urim"
) -> list[str]:
    """probability.py:49-59 — n random clusters, all members."""
    clusters = list(OrderedDict.fromkeys(r[cluster_key] for r in rows))
    chosen = set(select_true_random(clusters, n, seed))
    return [r[key] for r in rows if r[cluster_key] in chosen]


def select_random_oversample(
    rows: list[dict], seed: int, cluster_key: str = "cluster", key: str = "urim"
) -> list[str]:
    """probability.py:61-92 — batch-draw with replacement across batches
    until every cluster reaches the largest cluster's size."""
    groups = group_by_cluster(rows, cluster_key)
    max_size = max(len(v) for v in groups.values())
    rng = random.Random(seed)
    out = []
    for _, members in groups.items():
        urims = [m[key] for m in members]
        if len(urims) >= max_size:
            out.extend(urims)
            continue
        picked: list[str] = []
        while len(picked) < max_size:
            batch = rng.sample(urims, min(len(urims), max_size - len(picked)))
            picked.extend(batch)
        out.extend(picked)
    return out


def select_random_undersample(
    rows: list[dict], seed: int, cluster_key: str = "cluster", key: str = "urim"
) -> list[str]:
    """probability.py:94-126 — every cluster down to the smallest size."""
    groups = group_by_cluster(rows, cluster_key)
    min_size = min(len(v) for v in groups.values())
    rng = random.Random(seed)
    out = []
    for _, members in groups.items():
        urims = [m[key] for m in members]
        out.extend(select_true_random(urims, min_size, rng.randint(0, 1 << 30)))
    return out
