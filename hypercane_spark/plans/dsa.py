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


@register("ordered-systematic")
def ordered_systematic(j: int = 5) -> Pipeline:
    """ordered-systematic.halg (order-by-memento-datetime-then-
    systematically-sample, /root/reference/hypercane/packaged_algorithms/
    ordered-systematic.halg:44-58): ``hc order memento-datetime`` then
    ``hc sample systematic -j`` over the ordered list.

    The ordering stage assigns the 1-based ``rank`` (newest-first with the
    reference's descending-urim tie quirk, order/memento_datetime.py:32);
    the systematic stage walks that rank as its sequence, keeping positions
    j, 2j, … — exactly the reference's every-jth-line-of-the-ordered-TSV
    semantics. Surviving rows keep their original rank column (multiples
    of j), which is what the ordered TSV's line numbers were.

    The systematic stage here is the direct ``rank % j == 0`` filter, not
    ``sample.systematic``: the ordering stage's rank IS already the dense
    1-based sequence the sampler would recompute, and the general sampler
    pays a second distributed global rank (sort + localCheckpoint +
    offsets — a fixed multi-second cost per call) to derive positions from
    an arbitrary seq column. Identical output, half the jobs."""
    from hypercane_spark.operators.order import by_memento_datetime

    stages = [
        ("order-memento-datetime", lambda df: by_memento_datetime(df)),
        ("systematic", lambda df: df.where(F.col("rank") % j == 0)),
    ]
    return Pipeline("ordered-systematic", stages)


@register("simple-search-engine")
def simple_search_engine(
    term: str,
    text: str = "bpfree_text",
    k: int | None = None,
    score_decimals: int | None = None,
) -> Pipeline:
    """simple-search-engine.halg (/root/reference/hypercane/
    packaged_algorithms/simple-search-engine.halg:40-70): include-only
    mementos containing the term → BM25-score the remainder with the term
    as the query (corpus statistics over the FILTERED set, as the
    reference's second ``hc score bm25`` run over the filtered TSV
    implies) → order by descending score. (The .halg's first stage
    invokes ``hc order memento-datetime --pattern`` — a copy-paste slip;
    its comment and the algorithm description say filter-by-pattern,
    which is what this builds.)

    ``term`` may be multi-word (whitespace-tokenized into BM25 query
    terms). The containing filter is a substring search — ``(?s).*term``
    under the reference's anchored-match semantics. ``k`` adds a final
    top-k stage (TakeOrderedAndProject). ``score_decimals`` rounds the
    BM25 score before the ordering stage: near-equal doubles otherwise
    make the final rank sensitive to float summation order — the
    determinism knob the oracle harness uses."""
    import re as _re

    from hypercane_spark.operators.filters import containing_pattern
    from hypercane_spark.operators.order import by_score, top_k
    from hypercane_spark.operators.score import bm25_score

    pattern = "(?s).*" + _re.escape(term.split()[0])
    stages = [
        (
            "include-containing-pattern",
            lambda df: containing_pattern(df, pattern, text=text),
        ),
        ("bm25", lambda df: bm25_score(df, term.split(), text=text)),
    ]
    if score_decimals is not None:
        stages.append(
            (
                "round-score",
                lambda df: df.withColumn(
                    "bm25_score", F.round(F.col("bm25_score"), score_decimals)
                ),
            )
        )
    stages.append(("order-score-desc", lambda df: by_score(df, "bm25_score")))
    if k is not None:
        stages.append(("top-k", lambda df: top_k(df, k, "bm25_score")))
    return Pipeline("simple-search-engine", stages)
