"""Input dispatcher + discovery sources (SURVEY.md §2.1).

The reference routes ``-i {archiveit,trove,pandora-*,timemaps,mementos,
original-resources}`` through ``discover_resource_data_by_input_type``
(/root/reference/hypercane/identify/__init__.py:692-739), each branch a
live-web walk (TimeMap downloads, Scrapy spiders, TimeGate negotiation).
Here the dispatcher is a ``load_input(spark, kind, arg)`` factory over lake
tables; live-web branches (TimeMap fan-out fetch, TimeGate, archivenow
push) are the crawl engine's fetch stage — in this sandbox there is no
network, so the fetch callable is pluggable and the default raises with a
clear message while the offline path (faux timemaps, table reads, comma
lists, file:// inlining) is fully functional.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hypercane_spark.sources.io import (
    explode_timemaps,
    faux_timemaps,
    read_tsv_resource,
)
from hypercane_spark.sources.sinks import generate_archiveit_urits

KINDS = (
    "mementos",
    "timemaps",
    "original-resources",
    "archiveit",
)


def extract_uris_from_input(spark: SparkSession, input_string: str) -> DataFrame:
    """Comma-separated URI list; a ``file://`` item is inlined one-URI-per-
    line (reference extract_uris_from_input,
    /root/reference/hypercane/identify/__init__.py:34-55)."""
    uris: list[str] = []
    for item in input_string.split(","):
        item = item.strip()
        if not item:
            continue
        if item.startswith("file://"):
            path = item[len("file://"):]
            with open(path) as f:
                uris.extend(x.strip() for x in f if x.strip())
        else:
            uris.append(item)
    return spark.createDataFrame([(u, i) for i, u in enumerate(uris)], "uri string, seq long")


def load_input(
    spark: SparkSession,
    kind: str,
    arg: str,
    tables: dict[str, DataFrame] | None = None,
    collection_id: str | int | None = None,
) -> DataFrame:
    """Route an input spec to a mementos DataFrame (urim-keyed) — the
    analogue of the reference's input dispatcher.

    kind='mementos'            → TSV/URI-list of URI-Ms (read_tsv_resource)
    kind='timemaps'            → timemaps table path (parquet) or TSV of
                                 URI-Ts joined against a provided
                                 ``tables['timemaps']``; exploded to rows
    kind='original-resources'  → URI-R list; faux timemaps are synthesized
                                 from ``tables['mementos']`` when given
                                 (offline), else requires a fetch stage
    kind='archiveit'           → collection id → templated URI-Ts against
                                 ``tables['timemaps']``
    """
    if kind == "mementos":
        df = read_tsv_resource(spark, arg, key_field="URI-M")
        return df.withColumnRenamed("URI-M", "urim")
    if kind == "timemaps":
        if arg.endswith(".parquet") or os.path.isdir(arg):
            return explode_timemaps(spark.read.parquet(arg))
        urits = read_tsv_resource(spark, arg, key_field="URI-T")
        if tables and "timemaps" in tables:
            tm = tables["timemaps"].join(
                urits.select(F.col("URI-T").alias("urit")), on="urit", how="left_semi"
            )
            return explode_timemaps(tm)
        raise NotImplementedError(
            "live TimeMap download needs a fetch stage; provide "
            "tables={'timemaps': df} for the offline path"
        )
    if kind == "original-resources":
        urirs = read_tsv_resource(spark, arg, key_field="URI-R")
        if tables and "mementos" in tables:
            m = tables["mementos"].join(
                urirs.select(F.col("URI-R").alias("urir")), on="urir", how="left_semi"
            )
            return explode_timemaps(
                faux_timemaps(m).select("urit", "urir", "mementos")
            )
        raise NotImplementedError(
            "TimeGate negotiation needs a fetch stage; provide "
            "tables={'mementos': df} for the offline (faux-TimeMap) path"
        )
    if kind == "archiveit":
        if not (tables and "timemaps" in tables):
            raise NotImplementedError(
                "Archive-It discovery needs tables={'timemaps': df} offline"
            )
        seeds = tables["timemaps"].select("urir").distinct()
        urits = generate_archiveit_urits(seeds, collection_id or arg)
        return urits
    raise ValueError(f"unknown input kind {kind!r}; one of {KINDS}")
