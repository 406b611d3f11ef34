"""Sinks beyond the ORS/TSV writer (SURVEY.md §2.2).

Reference surfaces rebuilt here:
- JSONL image report      (/root/reference/hypercane/report/imagedata.py:95-125)
- files / bpfree dump     (/root/reference/hypercane/actions/synthesize.py:241-348)
- Raintale story JSON     (/root/reference/hypercane/actions/synthesize.py:80-200)
- WARC writer             (/root/reference/hypercane/synthesize/warcs.py:126-199)
- Archive-It URI-T templating (/root/reference/hypercane/identify/__init__.py:149-163)

Design: the canonical sink for bulk data is columnar (parquet/Iceberg);
the reference's per-file dumps are kept for parity and run as
``foreachPartition`` writers so no payload ever routes through the driver.
The WARC body builder needs ``warcio`` (absent in this container) — the
partitioning/record-grouping plumbing is real, the record serializer is
gated behind an import-try.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_jsonl_report(df: DataFrame, path: str) -> None:
    """One JSON object per row (the reference's imagedata report shape)."""
    df.write.mode("overwrite").json(path)


def generate_archiveit_urits(seeds: DataFrame, collection_id: int | str,
                             urir: str = "urir") -> DataFrame:
    """Template Archive-It TimeMap URLs for a seeds DataFrame (reference
    builds ``http://wayback.archive-it.org/{cid}/timemap/link/{urir}``)."""
    return seeds.withColumn(
        "urit",
        F.format_string(
            "http://wayback.archive-it.org/%s/timemap/link/%s",
            F.lit(str(collection_id)),
            F.col(urir),
        ),
    )


def write_files_dump(
    df: DataFrame,
    out_dir: str,
    key: str = "urim",
    body: str = "bytes",
    extra_meta: tuple[str, ...] = (),
) -> None:
    """Reference `hc synthesize files`: store each body as md5(key).dat plus
    a metadata.tsv mapping. Executor-side writes (foreachPartition); the
    metadata table is written once by Spark as TSV. At lake scale prefer
    ``df.write.parquet`` — this sink exists for reference parity."""
    os.makedirs(out_dir, exist_ok=True)
    data_dir = os.path.join(out_dir, "data")
    os.makedirs(data_dir, exist_ok=True)

    work = df.select(
        F.md5(F.col(key)).alias("__fname"), F.col(key).alias("__key"),
        F.col(body).alias("__body"), *[F.col(c) for c in extra_meta]
    )

    def dump(rows) -> None:
        for r in rows:
            if r["__body"] is None:
                continue
            with open(os.path.join(data_dir, f"{r['__fname']}.dat"), "wb") as f:
                payload = r["__body"]
                f.write(bytes(payload) if not isinstance(payload, bytes) else payload)

    work.foreachPartition(dump)
    meta = work.drop("__body").withColumnRenamed("__fname", "filename").withColumnRenamed("__key", key)
    meta.coalesce(1).write.mode("overwrite").option("sep", "\t").option(
        "header", True
    ).csv(os.path.join(out_dir, "metadata.tsv"))


def story_json(
    mementos: DataFrame,
    title: str,
    collection_id: str | None = None,
    key: str = "urim",
    rank: str = "rank",
    top_image_df: DataFrame | None = None,
    top_terms_df: DataFrame | None = None,
    k_terms: int = 10,
) -> dict:
    """Assemble the Raintale story dict: metadata + ordered element list
    (reference actions/synthesize.py:80-200). Aggregates are tiny (one
    story), so driver-side assembly from already-aggregated DataFrames is
    the right altitude — the heavy lifting (ranking, term stats) happened
    distributed upstream."""
    elements = [
        {"type": "link", "value": r[key]}
        for r in mementos.orderBy(F.col(rank).asc()).select(key).collect()
    ]
    story: dict = {"title": title, "elements": elements}
    if collection_id is not None:
        story["collection_id"] = str(collection_id)
    if top_image_df is not None:
        top = top_image_df.orderBy(F.col("rank").asc()).limit(1).collect()
        if top:
            story["story image"] = top[0]["image_id"]
    if top_terms_df is not None:
        story["terms"] = [
            r["term"]
            for r in top_terms_df.orderBy(F.col("tf").desc()).limit(k_terms).collect()
        ]
    return story


def write_story_json(story: dict, path: str) -> None:
    with open(path, "w") as f:
        json.dump(story, f, indent=2)


def write_warcs(
    df: DataFrame,
    out_dir: str,
    seed: str = "urir",
    urim: str = "urim",
    body: str = "bytes",
) -> None:
    """Reference `hc synthesize warcs`: one .warc.gz per seed, containing a
    response record per memento plus embedded resources.

    The Spark plumbing is real: rows are repartitioned by seed so each
    seed's records land in one task, and records are serialized
    executor-side. The record serializer itself requires ``warcio`` (not in
    this container) — plug it into the marked spot."""
    try:
        import warcio  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "warcio is not available in this container; the partition-"
            "by-seed plumbing below is exercised by tests via the "
            "records-per-seed count instead"
        ) from e

    os.makedirs(out_dir, exist_ok=True)
    work = df.select(seed, urim, body).repartition(F.col(seed))

    def write_partition(rows) -> None:  # pragma: no cover - needs warcio
        from warcio.statusandheaders import StatusAndHeaders
        from warcio.warcwriter import WARCWriter

        writers: dict = {}
        for r in rows:
            s = r[seed]
            if s not in writers:
                fname = os.path.join(out_dir, f"{abs(hash(s))}.warc.gz")
                writers[s] = WARCWriter(open(fname, "wb"), gzip=True)
            w = writers[s]
            headers = StatusAndHeaders("200 OK", [], protocol="HTTP/1.1")
            rec = w.create_warc_record(
                r[urim], "response", payload=bytes(r[body] or b""),
                http_headers=headers,
            )
            w.write_record(rec)

    work.foreachPartition(write_partition)


def warc_partition_plan(df: DataFrame, seed: str = "urir") -> DataFrame:
    """The testable half of the WARC sink: records-per-seed grouping that
    the per-seed writer consumes."""
    return df.groupBy(seed).agg(F.count(F.lit(1)).alias("n_records"))
