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
The WARC sink serializes ISO 28500 WARC/1.0 records with a pure-stdlib
writer (one gzip member per record, as the spec requires for .warc.gz) —
no warcio dependency.
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


def serialize_warc_record(
    target_uri: str,
    payload: bytes,
    warc_date: str = "2000-01-01T00:00:00Z",
    warc_type: str = "response",
    content_type: str = "text/html",
    status: str = "200 OK",
) -> bytes:
    """One ISO 28500 WARC/1.0 record as bytes (pure stdlib, deterministic).

    Mirrors what the reference builds through warcio
    (/root/reference/hypercane/synthesize/warcs.py:126-147): a ``response``
    record whose WARC-Target-URI is the original resource, WARC-Date is the
    memento-datetime (``%Y-%m-%dT%H:%M:%SZ``), and whose content block is
    an HTTP/1.0 ``200 OK`` response wrapping the raw payload. The record ID
    is a UUID derived from md5(target_uri + date) so output is byte-stable
    across runs; the payload digest uses warcio's ``sha1:<base32>``
    convention."""
    import base64
    import hashlib

    payload = bytes(payload or b"")
    http_block = (
        f"HTTP/1.0 {status}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode("ascii") + payload
    digest = base64.b32encode(hashlib.sha1(payload).digest()).decode("ascii")
    rec_uuid = hashlib.md5(
        (target_uri + warc_date).encode("utf8")
    ).hexdigest()
    rec_id = (
        f"<urn:uuid:{rec_uuid[:8]}-{rec_uuid[8:12]}-{rec_uuid[12:16]}-"
        f"{rec_uuid[16:20]}-{rec_uuid[20:32]}>"
    )
    headers = [
        ("WARC-Type", warc_type),
        ("WARC-Record-ID", rec_id),
        ("WARC-Date", warc_date),
        ("WARC-Target-URI", target_uri),
        ("WARC-Payload-Digest", f"sha1:{digest}"),
        ("Content-Type", "application/http; msgtype=response"),
        ("Content-Length", str(len(http_block))),
    ]
    head = "WARC/1.0\r\n" + "".join(f"{k}: {v}\r\n" for k, v in headers)
    return head.encode("ascii") + b"\r\n" + http_block + b"\r\n\r\n"


def serialize_warcinfo(filename: str, warc_date: str) -> bytes:
    """The leading ``warcinfo`` record every reference-written .warc.gz
    starts with (warcio WARCWriter emits one implicitly)."""
    import hashlib

    body = (
        "software: hypercane-spark\r\nformat: WARC File Format 1.0\r\n"
    ).encode("ascii")
    rec_uuid = hashlib.md5(filename.encode("utf8")).hexdigest()
    rec_id = (
        f"<urn:uuid:{rec_uuid[:8]}-{rec_uuid[8:12]}-{rec_uuid[12:16]}-"
        f"{rec_uuid[16:20]}-{rec_uuid[20:32]}>"
    )
    headers = [
        ("WARC-Type", "warcinfo"),
        ("WARC-Record-ID", rec_id),
        ("WARC-Date", warc_date),
        ("WARC-Filename", filename),
        ("Content-Type", "application/warc-fields"),
        ("Content-Length", str(len(body))),
    ]
    head = "WARC/1.0\r\n" + "".join(f"{k}: {v}\r\n" for k, v in headers)
    return head.encode("ascii") + b"\r\n" + body + b"\r\n\r\n"


def write_warcs(
    df: DataFrame,
    out_dir: str,
    seed: str = "urir",
    urim: str = "urim",
    body: str = "bytes",
    mdt: str | None = "memento_datetime",
    content_type: str | None = None,
) -> None:
    """Reference `hc synthesize warcs`
    (/root/reference/hypercane/synthesize/warcs.py:126-199): one .warc.gz
    per seed — named ``{md5(seed)}.warc.gz`` per the reference's
    urlhash-prefix convention (:136-143), skip-if-exists resume kept — a
    warcinfo record first, then a response record per memento.
    WARC-Target-URI is the seed (original resource), WARC-Date the
    memento-datetime.

    Scale shape: rows are hash-repartitioned by seed so each seed's
    records land in one task and are written executor-side (never through
    the driver); each record is an independent gzip member as the WARC
    spec requires, so files remain record-seekable."""
    os.makedirs(out_dir, exist_ok=True)
    cols = [seed, urim, body]
    have_mdt = mdt is not None and mdt in df.columns
    if have_mdt:
        cols.append(mdt)
    if content_type is not None and content_type in df.columns:
        cols.append(content_type)
    else:
        content_type = None
    work = df.select(*cols).repartition(F.col(seed))

    def write_partition(rows) -> None:
        import gzip
        import hashlib
        import uuid

        # Task-attempt atomicity: write to a unique temp name and
        # os.replace() to {md5(seed)}.warc.gz only on successful close. A
        # failed/retried or speculative task otherwise leaves a PARTIAL
        # .warc.gz that skip-if-exists (here and on any later resume) would
        # silently commit as final output. With the rename, only complete
        # files ever bear the final name, so skip-if-exists only matches
        # complete files; an abandoned attempt leaves a .tmp that the final
        # loop never promotes.
        handles: dict = {}
        tmp_paths: dict = {}
        for r in rows:
            s = r[seed]
            if s not in handles:
                urlhash = hashlib.md5(str(s).encode("utf8")).hexdigest()
                fname = f"{urlhash}.warc.gz"
                path = os.path.join(out_dir, fname)
                if os.path.exists(path):  # reference skip-if-exists resume
                    handles[s] = None
                    continue
                tmp = os.path.join(
                    out_dir, f".{urlhash}.{uuid.uuid4().hex}.tmp"
                )
                fh = open(tmp, "wb")
                handles[s] = fh
                tmp_paths[s] = (tmp, path)
                date0 = (
                    r[mdt].strftime("%Y-%m-%dT%H:%M:%SZ")
                    if have_mdt and r[mdt] is not None
                    else "2000-01-01T00:00:00Z"
                )
                fh.write(
                    gzip.compress(serialize_warcinfo(fname, date0), mtime=0)
                )
            fh = handles[s]
            if fh is None:
                continue
            date = (
                r[mdt].strftime("%Y-%m-%dT%H:%M:%SZ")
                if have_mdt and r[mdt] is not None
                else "2000-01-01T00:00:00Z"
            )
            rec = serialize_warc_record(
                str(s),
                r[body],
                warc_date=date,
                content_type=(
                    r[content_type] if content_type else "text/html"
                ),
            )
            fh.write(gzip.compress(rec, mtime=0))
        for s, fh in handles.items():
            if fh is not None:
                fh.close()
                tmp, path = tmp_paths[s]
                os.replace(tmp, path)

    work.foreachPartition(write_partition)


def warc_partition_plan(df: DataFrame, seed: str = "urir") -> DataFrame:
    """The testable half of the WARC sink: records-per-seed grouping that
    the per-seed writer consumes."""
    return df.groupBy(seed).agg(F.count(F.lit(1)).alias("n_records"))
