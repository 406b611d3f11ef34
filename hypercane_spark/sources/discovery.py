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
    "trove",
    "pandora-collection",
    "pandora-subject",
)


def walk_collection_graph(
    spark: SparkSession,
    root_id: str,
    edges: DataFrame,
    members: DataFrame,
    id_col: str = "collection_id",
    child_col: str = "subcollection_id",
    urim_col: str = "urim",
    dedup: bool = False,
    max_depth: int = 100,
) -> DataFrame:
    """BFS over a (collection → subcollection) edge table from ``root_id``,
    accumulating member URI-Ms of every visited node — the offline shape of
    the reference's Trove/Pandora walkers
    (/root/reference/hypercane/identify/__init__.py:399-475,557-635:
    ``generate_subcollection`` extend/remove loops over live NLA JSON).
    Each node is visited once (the reference's list-walk re-visits on
    cyclic graphs; a visited-set BFS is the documented sane semantics).
    Per-round state is two small id DataFrames (collections ≪ mementos);
    localCheckpoint truncates the iterative lineage like the crawl engine."""
    visited = spark.createDataFrame([(root_id,)], f"{id_col} string")
    frontier = visited
    for _ in range(max_depth):
        children = (
            edges.join(frontier, on=id_col, how="left_semi")
            .select(F.col(child_col).alias(id_col))
            .distinct()
            .join(visited, on=id_col, how="left_anti")
            .localCheckpoint()
        )
        if children.isEmpty():
            break
        visited = visited.unionByName(children).localCheckpoint()
        frontier = children
    out = members.join(visited, on=id_col, how="left_semi").select(urim_col)
    return out.distinct() if dedup else out


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


def timegate_negotiate(
    df: DataFrame,
    negotiator=None,
    accept_datetime: str | None = None,
    urir: str = "urir",
    out: str = "urim",
    batch_hosts_sorted: bool = True,
) -> DataFrame:
    """Fetch-stage UDF shape for TimeGate negotiation (reference
    /root/reference/hypercane/identify/__init__.py:178-273: HEAD the
    TimeGate with Accept-Datetime, follow the 302 to the closest memento;
    archivenow push when absent).

    ``negotiator`` is the network plug-point: a callable
    ``(urirs: list[str], accept_datetime: str | None) -> list[str | None]``
    applied per Arrow batch inside mapInPandas — plug a requests/aiohttp
    TimeGate client (or an archivenow pusher for misses) there. Rows whose
    negotiation returns None are dropped (the reference logs and skips).
    This sandbox has no network, so there is NO default negotiator — the
    call raises with instructions; the offline equivalent is
    ``load_input('original-resources', …, tables={'mementos': df})``
    (faux-TimeMap join). ``batch_hosts_sorted`` sorts each batch by host
    so a politeness-aware client sees grouped hosts."""
    if negotiator is None:
        raise NotImplementedError(
            "TimeGate negotiation needs a network client: pass "
            "negotiator=(urirs, accept_datetime) -> [urim|None]; offline, "
            "use load_input('original-resources', …, tables={'mementos'})"
        )
    import pandas as pd

    from hypercane_spark.functions.urls import url_host

    work = df.withColumn("__h", url_host(F.col(urir)))
    out_schema = f"{urir} string, {out} string"

    def batches(it):
        for pdf in it:
            if not len(pdf):
                continue
            if batch_hosts_sorted:
                pdf = pdf.sort_values(["__h", urir], kind="mergesort")
            urirs = [str(u) for u in pdf[urir]]
            urims = negotiator(urirs, accept_datetime)
            res = pd.DataFrame({urir: urirs, out: urims})
            yield res[res[out].notna()]

    return work.select(urir, "__h").mapInPandas(batches, schema=out_schema)


def timemap_fetch(
    df: DataFrame,
    fetcher=None,
    retries: int = 3,
    backoff: float = 0.1,
    urit: str = "urit",
    batch_hosts_sorted: bool = True,
) -> DataFrame:
    """Live TimeMap fan-out: download each URI-T, explode its mementos
    (reference /root/reference/hypercane/identify/__init__.py:66-108
    ``download_urits`` → ``extract_urims_from_TimeMap``; retry/backoff per
    request, /root/reference/hypercane/utils.py:95-104).

    ``fetcher`` is the network plug-point: a callable
    ``(urit: str) -> {"urir": str, "mementos": [(datetime, urim), …]} | None``
    invoked per row inside mapInPandas with ``retries`` attempts and
    exponential ``backoff`` between them (the reference's retry loop).
    A row whose fetch exhausts retries or returns None is dropped — the
    reference records the failure and skips (errors.py contract; compose
    with errors.ErrorStore at the call site to keep the records).
    This sandbox has no network, so there is NO default fetcher; the
    offline path is ``load_input('timemaps', …, tables={'timemaps': df})``.
    ``batch_hosts_sorted`` sorts each Arrow batch by the URI-T's host so a
    politeness-aware client sees grouped hosts (same shape as
    ``timegate_negotiate``)."""
    if fetcher is None:
        raise NotImplementedError(
            "live TimeMap download needs a network client: pass "
            "fetcher=(urit) -> {'urir', 'mementos': [(datetime, urim)…]}|None; "
            "offline, use load_input('timemaps', …, tables={'timemaps': df})"
        )
    import time as _time

    import pandas as pd

    from hypercane_spark.functions.urls import url_host

    work = df.select(urit).distinct().withColumn("__h", url_host(F.col(urit)))
    out_schema = (
        f"{urit} string, urir string, tm_pos int, "
        "memento_datetime timestamp, urim string"
    )

    def one(t: str):
        for attempt in range(retries):
            try:
                return fetcher(t)
            except Exception:
                if attempt == retries - 1:
                    return None
                _time.sleep(backoff * (2 ** attempt))
        return None

    def batches(it):
        for pdf in it:
            if not len(pdf):
                continue
            if batch_hosts_sorted:
                pdf = pdf.sort_values(["__h", urit], kind="mergesort")
            rows = []
            for t in pdf[urit]:
                res = one(str(t))
                if res is None:
                    continue
                for pos, (dt, urim) in enumerate(res.get("mementos", [])):
                    rows.append((str(t), res.get("urir"), pos, dt, urim))
            yield pd.DataFrame(
                rows,
                columns=[urit, "urir", "tm_pos", "memento_datetime", "urim"],
            )

    return work.mapInPandas(batches, schema=out_schema)


def urits_from_link_headers(
    df: DataFrame, link: str = "link_header", out: str = "urit"
) -> DataFrame:
    """URI-M → URI-T: extract the ``rel="timemap"`` target from an HTTP
    Link header column (reference
    /root/reference/hypercane/identify/__init__.py:110-147 reads
    ``memento_client``'s parsed Link relations per URI-M). Pure Catalyst
    regexp over the raw header string — rows without a timemap relation are
    dropped. The header column itself comes from the fetch stage (plug a
    HEAD client into timegate_negotiate/timemap_fetch to populate it)."""
    # <target>; … rel="… timemap …"  (rel may list several space-separated
    # relation types; quotes optional per RFC 8288)
    pat = r'<([^>]*)>\s*;[^,<]*rel="?[^",]*\btimemap\b[^",]*"?'
    extracted = df.withColumn(out, F.regexp_extract(F.col(link), pat, 1))
    return extracted.where(F.col(out) != "")


def load_input(
    spark: SparkSession,
    kind: str,
    arg: str,
    tables: dict[str, DataFrame] | None = None,
    collection_id: str | int | None = None,
    fetcher=None,
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
    kind='trove'               → BFS over ``tables['subcollections']``
                                 (collection_id, subcollection_id) edges
                                 from the given collection id, URI-Ms from
                                 ``tables['collection_mementos']``
                                 (collection_id, urim); duplicates kept —
                                 the reference extends a list
                                 (identify/__init__.py:399-423)
    kind='pandora-collection'  → URI-Ms of one collection id from
                                 ``tables['collection_mementos']``
                                 (identify/__init__.py:424-437)
    kind='pandora-subject'     → URI-Ms of the subject + a BFS over
                                 ``tables['subcategories']`` (subject_id,
                                 subcategory_id) with per-subject URI-Ms
                                 from ``tables['subject_mementos']``, plus
                                 the ROOT subject's collections via
                                 ``tables['subject_collections']``;
                                 set-deduped like the reference's
                                 list(set(...)) (identify/__init__.py:438-475)
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
        if fetcher is not None:  # live branch: download + explode
            return timemap_fetch(
                urits.select(F.col("URI-T").alias("urit")), fetcher=fetcher
            )
        raise NotImplementedError(
            "live TimeMap download needs a fetch stage; provide "
            "tables={'timemaps': df} for the offline path or pass "
            "fetcher=… (see timemap_fetch) for the live one"
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
    if kind == "trove":
        if not (tables and "subcollections" in tables and "collection_mementos" in tables):
            raise NotImplementedError(
                "live Trove walks need the NLA API; provide tables="
                "{'subcollections': edges, 'collection_mementos': members} "
                "for the offline path"
            )
        return walk_collection_graph(
            spark,
            arg,
            tables["subcollections"],
            tables["collection_mementos"],
            dedup=False,
        )
    if kind == "pandora-collection":
        if not (tables and "collection_mementos" in tables):
            raise NotImplementedError(
                "live Pandora walks need the NLA API; provide tables="
                "{'collection_mementos': members} for the offline path"
            )
        members = tables["collection_mementos"]
        return members.where(F.col("collection_id") == arg).select("urim")
    if kind == "pandora-subject":
        need = ("subcategories", "subject_mementos")
        if not (tables and all(t in tables for t in need)):
            raise NotImplementedError(
                "live Pandora walks need the NLA API; provide tables="
                "{'subcategories': edges, 'subject_mementos': members"
                "[, 'subject_collections', 'collection_mementos']} for the "
                "offline path"
            )
        urims = walk_collection_graph(
            spark,
            arg,
            tables["subcategories"],
            tables["subject_mementos"],
            id_col="subject_id",
            child_col="subcategory_id",
            dedup=False,
        )
        if "subject_collections" in tables and "collection_mementos" in tables:
            # the reference lists collections of the ROOT subject only
            root_colls = (
                tables["subject_collections"]
                .where(F.col("subject_id") == arg)
                .select("collection_id")
                .distinct()
            )
            coll_urims = tables["collection_mementos"].join(
                F.broadcast(root_colls), on="collection_id", how="left_semi"
            ).select("urim")
            urims = urims.unionByName(coll_urims)
        return urims.distinct()
    raise ValueError(f"unknown input kind {kind!r}; one of {KINDS}")
