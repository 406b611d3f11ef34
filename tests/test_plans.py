"""Packaged-pipeline (DSA1-4, filtered-random) tests: structural
invariants, determinism, and .halg-style per-stage checkpoint resume."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hypercane_spark.plans import dsa1, dsa2, dsa3, dsa4, filtered_random
from hypercane_spark.plans.pipeline import ALGORITHMS, Pipeline


@pytest.fixture(scope="module")
def small_mementos(mementos):
    # keep ML stages cheap: ~300 rows, fresh cluster-free copy
    return mementos.where(F.col("seq") % 4 == 0).drop("cluster").cache()


def _collect_urims(df):
    return [r["urim"] for r in df.select("urim").orderBy("urim").collect()]


def test_registry_has_all_algorithms():
    assert set(ALGORITHMS) >= {
        "dsa1",
        "dsa2",
        "dsa3",
        "dsa4",
        "filtered-random",
    }


def test_dsa1_shape_and_order(small_mementos):
    out = dsa1(k_slices=6).run(small_mementos)
    rows = out.select("cluster", "rank", "dsa1_score").collect()
    assert len(rows) > 0
    # top-per-cluster: one row per final cluster
    clusters = [r["cluster"] for r in rows]
    assert len(clusters) == len(set(clusters))
    # the halg-bug variant composes two time-slice labels: "a~~~b"
    assert all(len(c.split("~~~")) == 2 for c in clusters)
    # order stage assigns a dense ascending rank
    assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))


def test_dsa1_intended_variant_uses_dbscan(small_mementos):
    p = dsa1(k_slices=6, replicate_halg_bug=False)
    assert "dbscan-raw-simhash" in p.stage_names()
    out = p.run(small_mementos)
    assert out.count() > 0


def test_dsa1_deterministic(small_mementos):
    a = dsa1(k_slices=6).run(small_mementos)
    b = dsa1(k_slices=6).run(small_mementos)
    assert _collect_urims(a) == _collect_urims(b)


def test_dsa2_shape(small_mementos):
    out = dsa2(num_topics=5).run(small_mementos)
    rows = out.select("cluster", "dsa2_score", "rank").collect()
    assert len(rows) > 0
    clusters = [r["cluster"] for r in rows]
    assert len(clusters) == len(set(clusters))
    # kmeans-mdt then lda: two composed labels
    assert all(len(c.split("~~~")) == 2 for c in clusters)


def test_dsa3_drops_outliers(small_mementos):
    out = dsa3().run(small_mementos)
    rows = out.select("cluster", "bm25_score", "rank").collect()
    assert len(rows) > 0
    assert all("-1" not in r["cluster"].split("~~~")[:1] for r in rows)
    clusters = [r["cluster"] for r in rows]
    assert len(clusters) == len(set(clusters))


def test_dsa4_shape(small_mementos):
    out = dsa4().run(small_mementos)
    rows = out.select("cluster", "centroid_distance", "rank").collect()
    assert len(rows) > 0
    clusters = [r["cluster"] for r in rows]
    assert len(clusters) == len(set(clusters))


def test_filtered_random_k_and_seeded(small_mementos):
    out = filtered_random(k=10, seed=7).run(small_mementos)
    assert out.count() == 10
    again = filtered_random(k=10, seed=7).run(small_mementos)
    assert _collect_urims(out) == _collect_urims(again)
    other = filtered_random(k=10, seed=8).run(small_mementos)
    assert _collect_urims(out) != _collect_urims(other)


def test_pipeline_checkpoint_resume(small_mementos, tmp_path):
    wd = str(tmp_path / "wd")
    p = filtered_random(k=10, seed=7)
    full = p.run(small_mementos, workdir=wd)
    expect = _collect_urims(full)
    # every stage materialized
    names = sorted(os.listdir(wd))
    assert names == [f"{i:02d}-{s}" for i, s in enumerate(p.stage_names())]

    # delete the LAST stage output → resume recomputes only that stage
    import shutil

    shutil.rmtree(os.path.join(wd, names[-1]))
    resumed = p.run(small_mementos, workdir=wd)
    assert _collect_urims(resumed) == expect

    # poison the penultimate stage output: if resume really fast-forwards
    # from it, the poisoned row must appear downstream
    poisoned_dir = os.path.join(wd, names[-2])
    spark = small_mementos.sparkSession
    poisoned = spark.read.parquet(poisoned_dir).limit(3)
    poisoned.write.mode("overwrite").parquet(poisoned_dir)
    shutil.rmtree(os.path.join(wd, names[-1]))
    out = p.run(small_mementos, workdir=wd)
    assert out.count() == 3  # k=10 > 3 rows → all 3 pass through


def test_pipeline_lazy_without_workdir(small_mementos):
    # no workdir → no files written anywhere, plan fuses lazily
    p = Pipeline(
        "tiny",
        [
            ("a", lambda df: df.where(F.col("seq") % 2 == 0)),
            ("b", lambda df: df.select("urim", "seq")),
        ],
    )
    out = p.run(small_mementos)
    assert out.columns == ["urim", "seq"]
    assert out.count() > 0


def test_llm_curate_stages_and_resume(spark, tmp_path):
    """Round 5: the packaged LM-data curation pipeline — stage list,
    end-to-end behavior on a crafted corpus, and .halg-style resume."""
    from hypercane_spark.plans import llm_curate

    good = "the quick brown fox and the lazy dog have seen many things today"
    rows = [
        (1, good + "\n\nall rights reserved"),
        (2, good + "\n\nall rights reserved"),       # near-dup of 1 + dup para
        (3, "short"),                                 # fails gopher n_words
        (4, "please contact me at a@b.com for all of the details today"),
        (53, "the secret eval answer is fourty two and that is that okay"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ev = df.where(F.col("doc_id") == 53)
    pipe = llm_curate(
        ev,
        gopher_overrides={"min_words": 5, "min_stopword_hits": 1},
        decon_shingle_n=3,
        decon_min_overlaps=3,
    )
    assert pipe.stage_names() == [
        "gopher-gate",
        "paragraph-dedup",
        "minhash-dedup",
        "decontaminate",
        "pii-scrub",
    ]
    out = {r["doc_id"]: r for r in pipe.run(df).collect()}
    assert 3 not in out           # gopher gate
    assert 53 not in out          # decontaminated (overlaps itself)
    assert 2 not in out           # minhash near-dup of 1 (min key survives)
    assert 1 in out and 4 in out
    assert out[4]["n_email"] == 1 and "<EMAIL>" in out[4]["text"]
    # duplicated paragraph kept only on its first (min doc_id) occurrence
    assert "all rights reserved" in out[1]["text"]
    # resume: run with workdir, nuke last stage, re-run → identical
    wd = str(tmp_path / "llm")
    full = {r["doc_id"] for r in pipe.run(df, workdir=wd).collect()}
    import shutil

    shutil.rmtree(wd + "/04-pii-scrub")
    resumed = {r["doc_id"] for r in pipe.run(df, workdir=wd).collect()}
    assert resumed == full == set(out)
