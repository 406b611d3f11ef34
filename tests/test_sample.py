"""Sampler semantics vs the probability.py oracle transliteration."""

from __future__ import annotations

from hypercane_spark.operators import sample as S
from hypercane_spark.oracle import probability as O


def _urims(df):
    return [r["urim"] for r in df.select("urim").collect()]


def test_true_random_parity(spark, mementos, memento_rows):
    got = sorted(_urims(S.true_random(mementos, 28, seed=7, parity_with_reference=True)))
    want = sorted(
        O.select_true_random([r["urim"] for r in memento_rows], 28, seed=7)
    )
    assert got == want


def test_true_random_small_returns_all(spark, mementos):
    small = mementos.limit(5)
    assert S.true_random(small, 28, seed=7, parity_with_reference=True).count() == 5


def test_true_random_hash_mode_deterministic(spark, mementos):
    a = sorted(_urims(S.true_random(mementos, 28, seed=1)))
    b = sorted(_urims(S.true_random(mementos, 28, seed=1)))
    c = sorted(_urims(S.true_random(mementos, 28, seed=2)))
    assert a == b and len(a) == 28
    assert a != c


def test_systematic_parity(spark, mementos, memento_rows):
    got = sorted(_urims(S.systematic(mementos, 5)))
    want = sorted(O.select_systematic([r["urim"] for r in memento_rows], 5))
    assert got == want


def test_stratified_systematic_parity(spark, mementos, memento_rows):
    got = sorted(_urims(S.stratified_systematic(mementos, 3)))
    # oracle iterates clusters in encounter order; within cluster = seq order
    want = sorted(O.select_stratified_systematic(memento_rows, 3))
    assert got == want


def test_stratified_random_counts(spark, mementos):
    out = S.stratified_random(mementos, 4, seed=9)
    sizes = {
        r["cluster"]: r["count"]
        for r in out.groupBy("cluster").count().collect()
    }
    orig = {
        r["cluster"]: r["count"]
        for r in mementos.groupBy("cluster").count().collect()
    }
    for c, n in sizes.items():
        assert n == min(4, orig[c])


def test_random_cluster(spark, mementos):
    out = S.random_cluster(mementos, 2, seed=3)
    assert out.select("cluster").distinct().count() == 2
    # all members of chosen clusters present
    chosen = [r["cluster"] for r in out.select("cluster").distinct().collect()]
    assert out.count() == mementos.where(mementos.cluster.isin(chosen)).count()


def test_random_undersample(spark, mementos):
    out = S.random_undersample(mementos, seed=5)
    sizes = [r["count"] for r in out.groupBy("cluster").count().collect()]
    orig_min = min(
        r["count"] for r in mementos.groupBy("cluster").count().collect()
    )
    assert all(s == orig_min for s in sizes)


def test_random_oversample(spark, mementos):
    out = S.random_oversample(mementos, seed=5)
    sizes = [r["count"] for r in out.groupBy("cluster").count().collect()]
    orig_max = max(
        r["count"] for r in mementos.groupBy("cluster").count().collect()
    )
    assert all(s == orig_max for s in sizes)
    # oversampling duplicates rows, never invents keys
    assert out.select("urim").distinct().count() == mementos.select("urim").distinct().count()
