"""Structured Streaming surfaces: file-stream ingest, watermarked window
aggregation, foreachBatch frontier merge, stateful politeness limiter."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hypercane_spark.streaming.ingest import (
    DISCOVERED_SCHEMA,
    host_discovery_rates,
    politeness_rate_limit,
    stream_discovered_urls,
    stream_frontier_merge,
)


@pytest.fixture()
def drop_dir(spark, tmp_path):
    """Two parquet drops of discovered URLs (deterministic)."""
    d = str(tmp_path / "drops")
    rows1 = [
        (f"https://a.example/m{i}", f"http://a.example/p{i}", "a.example",
         float(i), None, f"2024-01-01 00:0{i % 6}:00")
        for i in range(6)
    ]
    rows2 = [
        (f"https://b.example/m{i}", f"http://b.example/p{i}", "b.example",
         float(10 - i), "https://a.example/m0", f"2024-01-01 00:0{i % 6}:30")
        for i in range(6)
    ] + [rows1[0]]  # duplicate of an earlier URL
    for i, rows in enumerate([rows1, rows2]):
        df = spark.createDataFrame(rows, DISCOVERED_SCHEMA.replace(
            "event_time timestamp", "event_time string"
        )).withColumn("event_time", F.to_timestamp("event_time"))
        df.coalesce(1).write.mode("append").parquet(d)
    return d


def test_windowed_host_rates(spark, drop_dir, tmp_path):
    stream = stream_discovered_urls(spark, drop_dir)
    assert stream.isStreaming
    rates = host_discovery_rates(stream, window="1 minute", watermark="2 minutes")
    q = (
        rates.writeStream.format("memory")
        .queryName("rates")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # append mode only emits windows older than the watermark; run a second
    # complete-mode pass to check the aggregation itself
    q2 = (
        host_discovery_rates(stream)
        .writeStream.format("memory")
        .queryName("rates_all")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got = {
        (r["host"], r["window"].start.minute): r["discovered"]
        for r in spark.table("rates_all").collect()
    }
    assert sum(v for (h, _), v in got.items() if h == "a.example") == 7
    assert sum(v for (h, _), v in got.items() if h == "b.example") == 6


def test_frontier_merge_dedups(spark, drop_dir, tmp_path):
    frontier_dir = str(tmp_path / "frontier")
    seen_dir = str(tmp_path / "seen")
    # pre-seed the seen table with one already-crawled URL
    from hypercane_spark.oracle.crawl import surt_key_py

    spark.createDataFrame(
        [(surt_key_py("https://a.example/m1"),)], "surt string"
    ).write.parquet(seen_dir)

    q = stream_frontier_merge(
        stream_discovered_urls(spark, drop_dir),
        frontier_dir,
        seen_dir,
        str(tmp_path / "ck3"),
    )
    q.awaitTermination(120)
    frontier = spark.read.parquet(frontier_dir)
    urims = [r["urim"] for r in frontier.select("urim").collect()]
    # 12 distinct discovered, minus the 1 already seen; batch-internal
    # duplicate collapsed
    assert len(urims) == len(set(urims))
    assert "https://a.example/m1" not in urims
    assert len(urims) == 11


def test_politeness_rate_limit_stateful(spark, drop_dir, tmp_path):
    limited = politeness_rate_limit(
        stream_discovered_urls(spark, drop_dir), budget_per_batch=3
    )
    q = (
        limited.writeStream.format("memory")
        .queryName("limited")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck4"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("limited").collect()
    by_host: dict = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append((r["priority"], r["urim"]))
    # budget respected per host per micro-batch (availableNow may process
    # the files as 1..2 batches → at most 3 per host per batch)
    assert all(len(v) <= 6 for v in by_host.values())
    assert by_host
    # top-priority first: a.example priorities are 0..5 → expect the max
    a = sorted(by_host.get("a.example", []), reverse=True)
    if a:
        assert a[0][0] == 5.0


def test_token_bucket_carries_across_batches(spark, tmp_path):
    """True token-bucket semantics: a host admitting fewer URLs than its
    refill banks the leftovers (up to burst_capacity) for later batches."""
    d = str(tmp_path / "carry_drops")
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows,
        DISCOVERED_SCHEMA.replace("event_time timestamp", "event_time string"),
    ).withColumn("event_time", F.to_timestamp("event_time"))
    # batch 1: one c.example row (admits 1 of 2 tokens → banks 1)
    mk(
        [("https://c.example/m0", "http://c.example/p0", "c.example", 1.0,
          None, "2024-01-01 00:00:00")]
    ).coalesce(1).write.mode("append").parquet(d)
    # batch 2: six c.example rows (tokens = min(4, 1 + 2) = 3 → admits 3)
    mk(
        [(f"https://c.example/m{i}", f"http://c.example/p{i}", "c.example",
          float(i), None, "2024-01-01 00:01:00") for i in range(1, 7)]
    ).coalesce(1).write.mode("append").parquet(d)

    limited = politeness_rate_limit(
        stream_discovered_urls(spark, d, max_files_per_trigger=1),
        budget_per_batch=2,
        burst_capacity=4,
    )
    q = (
        limited.writeStream.format("memory")
        .queryName("carry")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_carry"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("carry").collect()
    # 1 (batch 1) + 3 (batch 2, with 1 banked token) = 4; without carry: 3
    assert len(rows) == 4


def test_frontier_merge_cross_batch_dedup(spark, drop_dir, tmp_path):
    """A urim discovered in two different micro-batches of the same query
    is appended to the frontier once (anti-join vs the frontier table)."""
    frontier_dir = str(tmp_path / "frontier_xb")
    q = stream_frontier_merge(
        stream_discovered_urls(spark, drop_dir, max_files_per_trigger=1),
        frontier_dir,
        None,
        str(tmp_path / "ck_xb"),
    )
    q.awaitTermination(120)
    urims = [
        r["urim"]
        for r in spark.read.parquet(frontier_dir).select("urim").collect()
    ]
    assert len(urims) == len(set(urims))  # rows1[0] arrives in both batches
    assert len(urims) == 12
