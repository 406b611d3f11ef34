"""Sampling operators (``hc sample …``).

Rebuilds /root/reference/hypercane/sample/probability.py (128 LoC, driver-side
``random`` over Python lists) as distributed DataFrame stages.

Each sampler has two determinism modes:

- ``seed`` + hash mode (default): ordering by ``det_rank`` =
  md5(key ':' seed). Fully distributed, reproducible on any engine
  (the DuckDB oracle replays it byte-identically), no driver collect.
- parity mode (``parity_with_reference=True``): collects the (small,
  post-filter) key list in input order and replays the reference's exact
  ``random.Random(seed).sample`` list algebra
  (/root/reference/hypercane/sample/probability.py:3-11) — for
  byte-identical ORS lists vs the reference under a shared seed.

All samplers treat ``seq`` (input ordinal) as the reference's dict insertion
order (/root/reference/hypercane/utils.py:697-763 builds an OrderedDict).
"""

from __future__ import annotations

import random as _random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hypercane_spark.functions.hashes import det_rank


def _seq_col(df: DataFrame, seq: str | None) -> tuple[DataFrame, str]:
    if seq and seq in df.columns:
        return df, seq
    # synthesize a stable ordinal from the key ordering if none provided
    raise ValueError("sample operators need an explicit ordinal column (seq=)")


def true_random(
    df: DataFrame,
    k: int,
    key: str = "urim",
    seed: int = 42,
    parity_with_reference: bool = False,
    seq: str = "seq",
) -> DataFrame:
    """Uniform random k-sample.

    Reference: select_random_string_from_list,
    /root/reference/hypercane/sample/probability.py:3-11 — returns all rows
    when len(df) <= k.
    """
    if parity_with_reference:
        rows = [r[0] for r in df.select(key).orderBy(F.col(seq)).collect()]
        if len(rows) > k:
            rows = _random.Random(seed).sample(rows, k)
        keep = df.sparkSession.createDataFrame([(r,) for r in rows], f"{key} string")
        return df.join(F.broadcast(keep), on=key, how="left_semi")
    # scale mode: global top-k by deterministic hash rank. orderBy+limit is
    # executed as TakeOrderedAndProject — a per-partition top-k then a
    # driver-side merge of k·P rows, no full sort/shuffle.
    return df.orderBy(det_rank(F.col(key), seed)).limit(k)


def systematic(df: DataFrame, j: int, seq: str = "seq") -> DataFrame:
    """Every j-th row in input order, 1-indexed: keeps positions j, 2j, …

    Reference: /root/reference/hypercane/sample/probability.py:13-27
    (``iteration % j == 0`` with iteration starting at 1).

    Positions come from the distributed exact global rank
    (order.with_global_rank: range-partition + broadcast offsets), never a
    single-partition global window — the input is the FULL corpus here, so
    an ``Exchange SinglePartition`` would serialize the whole relation into
    one task."""
    from hypercane_spark.operators.order import with_global_rank

    return (
        with_global_rank(df, [F.col(seq).asc()], rank_col="__pos")
        .where(F.col("__pos") % j == 0)
        .drop("__pos")
    )


def stratified_random(
    df: DataFrame,
    k_per_cluster: int,
    cluster: str = "cluster",
    key: str = "urim",
    seed: int = 42,
) -> DataFrame:
    """Per-cluster true-random(k) (reference probability.py:29-37).

    One hash-partitioned window, no driver involvement; clusters smaller
    than k keep all members (row_number ≤ k ≡ the reference's len<=k
    branch)."""
    w = Window.partitionBy(cluster).orderBy(det_rank(F.col(key), seed))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k_per_cluster)
        .drop("__rn")
    )


def stratified_systematic(
    df: DataFrame, j: int, cluster: str = "cluster", seq: str = "seq"
) -> DataFrame:
    """Per-cluster every-j-th in input order (reference probability.py:39-47)."""
    w = Window.partitionBy(cluster).orderBy(F.col(seq))
    return (
        df.withColumn("__pos", F.row_number().over(w))
        .where(F.col("__pos") % j == 0)
        .drop("__pos")
    )


def random_cluster(
    df: DataFrame, n_clusters: int, cluster: str = "cluster", seed: int = 42
) -> DataFrame:
    """Keep all members of n randomly chosen clusters
    (reference probability.py:49-59). The chosen-cluster set is a broadcast
    semi-join side (distinct cluster ids ≪ rows)."""
    chosen = (
        df.select(cluster)
        .distinct()
        .orderBy(det_rank(F.col(cluster), seed))
        .limit(n_clusters)
    )
    return df.join(F.broadcast(chosen), on=cluster, how="left_semi")


def random_oversample(
    df: DataFrame,
    cluster: str = "cluster",
    key: str = "urim",
    seed: int = 42,
) -> DataFrame:
    """Oversample every cluster up to the largest cluster's size.

    Reference (/root/reference/hypercane/sample/probability.py:61-92) draws
    ``random.sample`` *batches* until reaching the target — without
    replacement within a batch, with replacement across batches, so
    duplicates appear once a cluster is exhausted. Replicated per-group in
    a pandas UDF because the batch-draw loop is inherently sequential; groups
    are independent → embarrassingly parallel."""
    import pandas as pd

    max_size = df.groupBy(cluster).count().agg(F.max("count")).first()[0]
    if max_size is None:
        return df

    out_schema = df.schema

    def oversample(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__dr").reset_index(drop=True)
        n = len(pdf)
        if n >= max_size:
            return pdf.drop(columns="__dr")
        picked: list[int] = []
        rng = _random.Random(seed)
        idx = list(range(n))
        while len(picked) < max_size:
            batch = rng.sample(idx, min(n, max_size - len(picked)))
            picked.extend(batch)
        return pdf.iloc[picked].drop(columns="__dr")

    return (
        df.withColumn("__dr", det_rank(F.col(key), seed))
        .groupBy(cluster)
        .applyInPandas(oversample, schema=out_schema)
    )


def random_undersample(
    df: DataFrame,
    cluster: str = "cluster",
    key: str = "urim",
    seed: int = 42,
) -> DataFrame:
    """Downsample every cluster to the smallest cluster's size
    (reference probability.py:94-126). Pure window: row_number over a
    deterministic shuffle ≤ min_size."""
    min_size = df.groupBy(cluster).count().agg(F.min("count")).first()[0]
    if min_size is None:
        return df
    w = Window.partitionBy(cluster).orderBy(det_rank(F.col(key), seed))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= min_size)
        .drop("__rn")
    )
