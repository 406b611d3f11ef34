"""Filter operator semantics, incl. the order-dependent near-dup scan."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hypercane_spark.operators import filters as X
from hypercane_spark.oracle.scan import near_dup_scan


def test_include_languages(spark, mementos):
    out = X.include_languages(mementos, ["en"])
    assert out.count() == mementos.where("language = 'en'").count()
    assert out.where("language != 'en'").count() == 0


def test_near_datetime(spark, mementos):
    lo, hi = dt.datetime(2017, 1, 1), dt.datetime(2019, 1, 1)
    out = X.near_datetime(mementos, lo, hi)
    assert out.count() > 0
    assert out.where((F.col("memento_datetime") < lo) | (F.col("memento_datetime") > hi)).count() == 0


def test_score_range(spark, mementos):
    out = X.score_range(mementos, "score_seed", ">", 5.0)
    assert out.count() == mementos.where("score_seed > 5.0").count()


def test_cluster_id_subcluster_match(spark, mementos):
    inc = X.include_cluster_id(mementos, "x")
    # only composite 'a~~~x' rows match subcluster 'x'
    assert inc.select("cluster").distinct().collect()[0]["cluster"] == "a~~~x"
    exc = X.exclude_cluster_id(mementos, "a")
    assert exc.where(F.col("cluster").isin("a", "a~~~x")).count() == 0
    assert inc.count() + X.exclude_cluster_id(mementos, "x").count() == mementos.count()


def test_largest_clusters(spark, mementos):
    out = X.largest_clusters(mementos, 2)
    kept = sorted(r["cluster"] for r in out.select("cluster").distinct().collect())
    counts = {
        r["cluster"]: r["count"] for r in mementos.groupBy("cluster").count().collect()
    }
    want = sorted(
        sorted(counts, key=lambda c: (counts[c], c), reverse=True)[:2]
    )
    assert kept == want


def test_highest_score_per_cluster(spark, mementos):
    out = X.highest_score_per_cluster(mementos, "score_seed")
    assert out.count() == mementos.select("cluster").distinct().count()
    per = {r["cluster"]: r["score_seed"] for r in out.collect()}
    want = {
        r["cluster"]: r["m"]
        for r in mementos.groupBy("cluster").agg(F.max("score_seed").alias("m")).collect()
    }
    assert per == want


def test_containing_pattern_anchored(spark):
    df = spark.createDataFrame(
        [("abc def", "u1"), ("xx abc", "u2")], "bpfree_text string, urim string"
    )
    # re.match anchors at start: only u1 matches 'abc'
    out = X.containing_pattern(df, "abc")
    assert [r["urim"] for r in out.collect()] == ["u1"]


def test_near_duplicates_matches_oracle(spark, mementos, memento_rows):
    got = sorted(
        r["urim"] for r in X.near_duplicates(mementos).select("urim").collect()
    )
    want = []
    groups: dict[str, list[dict]] = {}
    for r in memento_rows:
        groups.setdefault(r["urit"], []).append(r)
    for g in groups.values():
        want.extend(near_dup_scan(g))
    assert got == sorted(want)
    assert len(got) < len(memento_rows)  # fixtures contain near-dups


def test_off_topic_measures(spark, mementos):
    for measure in ["cosine", "jaccard", "wordcount", "bytecount"]:
        out = X.off_topic(mementos, measure=measure)
        n = out.count()
        assert 0 < n <= mementos.count(), measure
    # first memento of each timemap is always on-topic under cosine
    # (cosine with itself = 1 > 0.12)
    firsts = (
        mementos.groupBy("urit")
        .agg(F.min_by("urim", F.struct(F.col("memento_datetime"), F.col("urim"))).alias("urim"))
    )
    kept = X.off_topic(mementos, measure="cosine").select("urim")
    missing = firsts.join(kept, "urim", "left_anti").count()
    assert missing == 0
