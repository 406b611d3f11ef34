"""DSA1-4 + filtered-random packaged pipelines.

Faithful stage-for-stage rebuilds of the reference `.halg` scripts
(/root/reference/hypercane/packaged_algorithms/), each over a mementos
DataFrame with the derived-metadata columns already joined in (urim, urit,
urir, memento_datetime, pubdate, language, tf_simhash, bpfree_text,
bpfree_len, image_count, card_* flags, damage — see FIXTURES.md):

- DSA1 (AlNoamany, dsa1.halg:35-126): off-topic → near-dup → English-only
  → time-slice → time-slice AGAIN → dsa1-score → top-per-cluster → order.
  The second time-slice replicates a literal reference bug — dsa1.halg:92
  invokes `hc cluster time-slice` where AlNoamany's algorithm calls for
  Simhash-DBSCAN. ``replicate_halg_bug=False`` restores the intended
  dbscan(raw-simhash) stage.
- DSA2 (dsa2.halg:192-262): off-topic → near-dup → kmeans(mdt, k=⌈√S⌉) →
  LDA topics → dsa2-score → top-per-cluster → order.
- DSA3 (dsa3.halg:326-426): off-topic → near-dup → dbscan(tfidf, eps=1.3)
  → drop outliers (label -1) → cluster-free → kmeans(mdt) → kmeans(tfidf)
  → BM25 vs top entities → top-per-cluster → order.
- DSA4 (dsa4.halg:491-561): kmeans(mdt) → kmeans(tfidf) →
  distance-from-centroid → top-per-cluster → order. (The reference's
  ``--more-similar`` flag is a no-op bug — distance_from_centroid.py:71-72
  assigns the negation to the wrong variable — so top-per-cluster keeps the
  FURTHEST row; replicated deliberately, documented here.)
- filtered-random (filtered-random.halg:562-643): near-dup → English-only
  → seeded true-random(k).

Cluster composition stays hierarchical (`a~~~b` strings) through every
stage, matching the reference's `"~~~"` join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hypercane_spark.operators.cluster import (
    dbscan_simhash,
    dbscan_tfidf,
    kmeans_mdt,
    kmeans_tfidf,
    lda_topics,
    time_slice,
)
from hypercane_spark.operators.filters import (
    highest_score_per_cluster,
    include_languages,
    near_duplicates,
    off_topic,
)
from hypercane_spark.operators.order import (
    by_pubdate_else_memento_datetime,
)
from hypercane_spark.operators.sample import true_random
from hypercane_spark.operators.score import (
    card_score,
    distance_from_centroid,
    dsa1_score,
    dsa2_score,
    top_entities_bm25,
)
from hypercane_spark.plans.pipeline import Pipeline, register


def _drop_cluster(df: DataFrame) -> DataFrame:
    """`hc synthesize cluster-free`
    (/root/reference/hypercane/actions/synthesize.py:350-389)."""
    return df.drop("cluster")


def _drop_outliers(df: DataFrame) -> DataFrame:
    """DSA3 drops DBSCAN noise: any cluster path component == -1
    (dsa3.halg's `hc filter exclude with-clusterid -a -1`)."""
    return df.where(
        ~F.array_contains(F.split(F.col("cluster"), "~~~"), "-1")
    )


@register("dsa1")
def dsa1(
    offtopic_measure: str = "cosine",
    k_slices: int | None = None,
    replicate_halg_bug: bool = True,
) -> Pipeline:
    stages = [
        ("exclude-off-topic", lambda df: off_topic(df, measure=offtopic_measure)),
        ("exclude-near-duplicates", lambda df: near_duplicates(df)),
        ("include-english", lambda df: include_languages(df, ["en"])),
        ("time-slice", lambda df: time_slice(df, k=k_slices)),
        (
            "time-slice-again"
            if replicate_halg_bug
            else "dbscan-raw-simhash",
            (lambda df: time_slice(df, k=k_slices))
            if replicate_halg_bug
            else (lambda df: dbscan_simhash(df, simhash="raw_simhash")),
        ),
        ("dsa1-score", lambda df: dsa1_score(df)),
        (
            "top-per-cluster",
            lambda df: highest_score_per_cluster(df, score="dsa1_score"),
        ),
        ("order", lambda df: by_pubdate_else_memento_datetime(df)),
    ]
    return Pipeline("dsa1", stages)


@register("dsa2")
def dsa2(offtopic_measure: str = "cosine", num_topics: int = 20) -> Pipeline:
    stages = [
        ("exclude-off-topic", lambda df: off_topic(df, measure=offtopic_measure)),
        ("exclude-near-duplicates", lambda df: near_duplicates(df)),
        ("kmeans-mdt", lambda df: kmeans_mdt(df)),  # k = ceil(sqrt(group))
        ("lda-topics", lambda df: lda_topics(df, num_topics=num_topics)),
        ("card-score", lambda df: card_score(df)),
        ("dsa2-score", lambda df: dsa2_score(df)),
        (
            "top-per-cluster",
            lambda df: highest_score_per_cluster(df, score="dsa2_score"),
        ),
        ("order", lambda df: by_pubdate_else_memento_datetime(df)),
    ]
    return Pipeline("dsa2", stages)


@register("dsa3")
def dsa3(
    offtopic_measure: str = "cosine",
    dbscan_eps: float = 1.3,
    k_entities: int = 5,
    kmeans_engine: str = "auto",
) -> Pipeline:
    """``kmeans_engine``: "auto" (default) counts the stage input and uses
    the byte-stable pandas parity labels only at story scale, switching to
    the distributed HashingTF+IDF+pyspark.ml.KMeans path above
    cluster.KMEANS_PANDAS_MAX_ROWS rows (no single-task ML stage on a
    corpus-sized input); "pandas"/"ml" force either path."""
    stages = [
        ("exclude-off-topic", lambda df: off_topic(df, measure=offtopic_measure)),
        ("exclude-near-duplicates", lambda df: near_duplicates(df)),
        ("dbscan-tfidf", lambda df: dbscan_tfidf(df, eps=dbscan_eps)),
        ("drop-outliers", _drop_outliers),
        ("cluster-free", _drop_cluster),
        ("kmeans-mdt", lambda df: kmeans_mdt(df)),
        ("kmeans-tfidf", lambda df: kmeans_tfidf(df, engine=kmeans_engine)),
        (
            "bm25-top-entities",
            lambda df: top_entities_bm25(df, k_entities=k_entities),
        ),
        (
            "top-per-cluster",
            lambda df: highest_score_per_cluster(df, score="bm25_score"),
        ),
        ("order", lambda df: by_pubdate_else_memento_datetime(df)),
    ]
    return Pipeline("dsa3", stages)


@register("dsa4")
def dsa4(kmeans_engine: str = "auto") -> Pipeline:
    """See dsa3 for the ``kmeans_engine`` flag."""
    stages = [
        ("kmeans-mdt", lambda df: kmeans_mdt(df)),
        ("kmeans-tfidf", lambda df: kmeans_tfidf(df, engine=kmeans_engine)),
        (
            "distance-from-centroid",
            lambda df: distance_from_centroid(df),
        ),
        (
            # reference quirk: more-similar is a no-op, max distance wins
            "top-per-cluster",
            lambda df: highest_score_per_cluster(df, score="centroid_distance"),
        ),
        ("order", lambda df: by_pubdate_else_memento_datetime(df)),
    ]
    return Pipeline("dsa4", stages)


@register("filtered-random")
def filtered_random(k: int = 28, seed: int = 42) -> Pipeline:
    stages = [
        ("exclude-near-duplicates", lambda df: near_duplicates(df)),
        ("include-english", lambda df: include_languages(df, ["en"])),
        ("true-random", lambda df: true_random(df, k, seed=seed)),
    ]
    return Pipeline("filtered-random", stages)
