"""robots.txt gating for the crawl frontier.

The reference never configures robots handling (bare ``CrawlerProcess()``,
/root/reference/hypercane/identify/archivecrawl.py:113) — this gate is NEW
behavior required by the north_rule.

The robots table ``(host, disallow array<string>, crawl_delay double)`` is
a dimension table (one row per host) — always broadcast. The prefix test is
a higher-order ``exists`` over the disallow array, pure Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hypercane_spark.functions.urls import url_path


def robots_gate(
    frontier: DataFrame,
    robots: DataFrame,
    url: str = "urir",
    host: str = "host",
) -> DataFrame:
    """Drop frontier rows whose URL path matches a disallow prefix for its
    host. Hosts absent from the robots table are allowed (crawl_delay 0)."""
    r = robots.select(
        F.col("host").alias("__rhost"),
        F.col("disallow").alias("__disallow"),
        F.col("crawl_delay").alias("crawl_delay"),
    )
    j = frontier.join(
        F.broadcast(r), frontier[host] == F.col("__rhost"), "left"
    )
    path = url_path(F.col(url))
    eff_path = F.when(path == "", "/").otherwise(path)
    blocked = F.exists(
        F.coalesce(F.col("__disallow"), F.array().cast("array<string>")),
        lambda d: eff_path.startswith(d),
    )
    return (
        j.where(~blocked)
        .withColumn("crawl_delay", F.coalesce(F.col("crawl_delay"), F.lit(0.0)))
        .drop("__rhost", "__disallow")
    )
