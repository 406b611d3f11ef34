"""Sinks: JSONL report, Archive-It templating, files dump, story JSON,
WARC partition plan + gated writer."""

from __future__ import annotations

import glob
import hashlib
import json
import os

import pytest
from pyspark.sql import functions as F

from hypercane_spark.sources.sinks import (
    generate_archiveit_urits,
    story_json,
    warc_partition_plan,
    write_files_dump,
    write_jsonl_report,
    write_story_json,
    write_warcs,
)


def test_jsonl_report_roundtrip(spark, images, tmp_path):
    out = str(tmp_path / "report")
    write_jsonl_report(images.select("image_id", "w", "h", "fmt"), out)
    back = spark.read.json(out)
    assert back.count() == images.count()
    assert set(back.columns) == {"image_id", "w", "h", "fmt"}


def test_archiveit_urit_templating(spark):
    seeds = spark.createDataFrame(
        [("http://example.com/a",), ("http://example.com/b",)], "urir string"
    )
    out = generate_archiveit_urits(seeds, 8778).collect()
    assert out[0]["urit"] == (
        "http://wayback.archive-it.org/8778/timemap/link/http://example.com/a"
    )


def test_files_dump(spark, images, tmp_path):
    out = str(tmp_path / "dump")
    subset = images.limit(20)
    write_files_dump(subset, out, key="image_id", body="bytes", extra_meta=("fmt",))
    rows = subset.select("image_id", "bytes").collect()
    for r in rows:
        fname = hashlib.md5(r["image_id"].encode()).hexdigest() + ".dat"
        p = os.path.join(out, "data", fname)
        assert os.path.exists(p), fname
        assert open(p, "rb").read() == bytes(r["bytes"])
    meta_files = glob.glob(os.path.join(out, "metadata.tsv", "*.csv"))
    assert meta_files
    meta = spark.read.option("sep", "\t").option("header", True).csv(
        os.path.join(out, "metadata.tsv")
    )
    assert meta.count() == 20
    assert set(meta.columns) == {"filename", "image_id", "fmt"}


def test_story_json(spark, tmp_path):
    m = spark.createDataFrame(
        [("u3", 3), ("u1", 1), ("u2", 2)], "urim string, rank int"
    )
    terms = spark.createDataFrame(
        [("alpha", 9), ("beta", 5), ("gamma", 2)], "term string, tf int"
    )
    imgs = spark.createDataFrame(
        [("img-b", 2), ("img-a", 1)], "image_id string, rank int"
    )
    story = story_json(
        m, title="t", collection_id=694, top_image_df=imgs, top_terms_df=terms,
        k_terms=2,
    )
    assert [e["value"] for e in story["elements"]] == ["u1", "u2", "u3"]
    assert story["story image"] == "img-a"
    assert story["terms"] == ["alpha", "beta"]
    p = str(tmp_path / "story.json")
    write_story_json(story, p)
    assert json.load(open(p))["collection_id"] == "694"


def test_warc_partition_plan(spark):
    df = spark.createDataFrame(
        [("s1", "m1"), ("s1", "m2"), ("s2", "m3")], "urir string, urim string"
    )
    plan = {r["urir"]: r["n_records"] for r in warc_partition_plan(df).collect()}
    assert plan == {"s1": 2, "s2": 1}


def _parse_warc_gz(path):
    """Minimal WARC/1.0 reader: gzip members → (headers dict, body bytes)."""
    import gzip

    records = []
    data = gzip.open(path, "rb").read()  # concatenated members decompress in sequence
    while data:
        head, _, rest = data.partition(b"\r\n\r\n")
        lines = head.decode("ascii").split("\r\n")
        assert lines[0] == "WARC/1.0"
        hdrs = dict(l.split(": ", 1) for l in lines[1:] if l)
        n = int(hdrs["Content-Length"])
        records.append((hdrs, rest[:n]))
        data = rest[n:].lstrip(b"\r\n")
    return records


def test_warc_writer_roundtrip(spark, tmp_path):
    import datetime as dt
    import glob
    import hashlib

    mdt = dt.datetime(2019, 3, 2, 10, 30, 0)
    df = spark.createDataFrame(
        [
            ("http://a.example/x", "m1", bytearray(b"hello-a1"), mdt),
            ("http://a.example/x", "m2", bytearray(b"hello-a2"), mdt),
            ("http://b.example/y", "m3", bytearray(b"hello-b"), None),
        ],
        "urir string, urim string, bytes binary, memento_datetime timestamp",
    )
    out = str(tmp_path / "warcs")
    write_warcs(df, out)
    files = sorted(glob.glob(out + "/*.warc.gz"))
    assert len(files) == 2  # one per seed, md5-named
    names = {f.split("/")[-1] for f in files}
    assert (
        hashlib.md5(b"http://a.example/x").hexdigest() + ".warc.gz" in names
    )
    by_seed = {}
    for f in files:
        recs = _parse_warc_gz(f)
        assert recs[0][0]["WARC-Type"] == "warcinfo"
        assert recs[0][0]["Content-Type"] == "application/warc-fields"
        for hdrs, body in recs[1:]:
            assert hdrs["WARC-Type"] == "response"
            assert hdrs["Content-Type"] == "application/http; msgtype=response"
            http_head, _, payload = body.partition(b"\r\n\r\n")
            assert http_head.startswith(b"HTTP/1.0 200 OK")
            by_seed.setdefault(hdrs["WARC-Target-URI"], []).append(payload)
    assert sorted(by_seed["http://a.example/x"]) == [b"hello-a1", b"hello-a2"]
    assert by_seed["http://b.example/y"] == [b"hello-b"]
    # memento-datetime propagated as WARC-Date (reference warcs.py:113-115)
    a_recs = _parse_warc_gz(
        out + "/" + hashlib.md5(b"http://a.example/x").hexdigest() + ".warc.gz"
    )
    assert a_recs[1][0]["WARC-Date"] == "2019-03-02T10:30:00Z"
    # skip-if-exists resume: rewriting must not duplicate records
    write_warcs(df, out)
    assert len(a_recs) == 3  # warcinfo + 2 responses, unchanged after rerun
