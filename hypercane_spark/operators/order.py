"""Ordering operators (``hc order …``).

The reference's output contract is an *ordered* TSV — order is data. In a
distributed engine a global sort is a real shuffle, so these operators
return the DataFrame with an explicit ``rank`` column (dense, 1-based)
instead of relying on row order; the ORS writer sorts by it once at the
sink. Downstream operators that only need top-k use orderBy().limit() which
Spark executes as TakeOrderedAndProject (per-partition heap, no full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ranked(df: DataFrame, order_cols: list, rank_col: str, distributed: bool) -> DataFrame:
    """Route an ordering through the scale-safe distributed rank (default)
    or the single-window path (``distributed=False`` — only for inputs the
    caller KNOWS are small, e.g. an already-materialized story list)."""
    if distributed:
        return with_global_rank(df, order_cols, rank_col=rank_col)
    return df.withColumn(rank_col, F.row_number().over(Window.orderBy(*order_cols)))


def by_memento_datetime(
    df: DataFrame,
    mdt: str = "memento_datetime",
    key: str = "urim",
    rank_col: str = "rank",
    distributed: bool = True,
) -> DataFrame:
    """Newest-first ordering (the reference sorts ascending then reverses,
    /root/reference/hypercane/order/memento_datetime.py:7-34 — list.reverse()
    at :32; ties broken by urim within the tuple sort, which the reversal
    also flips → descending urim)."""
    return _ranked(
        df, [F.col(mdt).desc(), F.col(key).desc()], rank_col, distributed
    )


def by_pubdate_else_memento_datetime(
    df: DataFrame,
    pubdate: str = "pubdate",
    mdt: str = "memento_datetime",
    key: str = "urim",
    rank_col: str = "rank",
    distributed: bool = True,
) -> DataFrame:
    """Ascending by publication date, falling back to memento-datetime when
    the extractor found none (reference
    /root/reference/hypercane/order/dsa1_publication_alg.py:8-39; note this
    one is ascending while memento-datetime ordering is descending — a
    reference quirk kept deliberately)."""
    eff = F.coalesce(F.col(pubdate), F.col(mdt))
    return _ranked(df, [eff.asc(), F.col(key).asc()], rank_col, distributed)


def by_score(
    df: DataFrame,
    score: str,
    descending: bool = True,
    key: str = "urim",
    rank_col: str = "rank",
    distributed: bool = True,
) -> DataFrame:
    """Sort by a (numeric-cast) score column, urim tiebreak (reference
    /root/reference/hypercane/order/score.py:7-24 casts the TSV string to
    float at sort time; our columns are already typed, the cast is a no-op
    kept for TSV round-trips)."""
    s = F.col(score).cast("double")
    cols = (
        [s.desc(), F.col(key).desc()] if descending else [s.asc(), F.col(key).asc()]
    )
    return _ranked(df, cols, rank_col, distributed)


def top_k(df: DataFrame, k: int, score: str, key: str = "urim") -> DataFrame:
    """Global top-k by score — TakeOrderedAndProject, no full sort."""
    return df.orderBy(F.col(score).desc(), F.col(key).desc()).limit(k)


def with_global_rank(
    df: DataFrame,
    order_cols: list,
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Scalable exact global rank (1-based, row_number semantics).

    The window-based orderings above are correct but execute as a
    single-partition global window ("No Partition Defined" — every row
    moves to one task), which is fine for the small post-filter story
    outputs they serve but wrong for ranking a full corpus. This variant
    is the 100 TB path:

        range-partition by the order keys → sort within partitions →
        per-partition counts (tiny collect) → cumulative offsets as a
        literal map → rank = offset[partition] + local index, where the
        local index is decoded from ``monotonically_increasing_id()``
        (its contract: partition id in the upper bits, a CONSECUTIVE
        0-based record number within the partition in the lower 33 — and
        the id is stamped in the same stage as the partition sort, so the
        record number IS the sorted position)

    Two jobs over a localCheckpoint()ed sorted intermediate (eager: the
    sizes job needs the compute anyway), and the rank itself is a pure
    JVM column expression — no Python workers, no Arrow round-trip of the
    payload (the round-2 mapInPandas rank cost 1-2 s of fixed worker
    spawn + serialization per call at sf0.1, 2.25x on
    order_memento_datetime). No single-task stage. Unlike a bare
    ``persist()`` the checkpoint blocks are freed by the ContextCleaner
    as soon as the returned DataFrame is dropped, so repeated calls don't
    accumulate cached partitions (a measured storage leak in round 1).
    ``order_cols`` take Columns with asc()/desc() already applied;
    include a unique tiebreaker column for deterministic ranks.

    CALLER NOTE — project before ranking: the localCheckpoint
    MATERIALIZES every column present (checkpointing breaks column
    pruning), so expensive derived columns the caller never reads are
    fully computed and stored. Measured: carrying two unused simhash
    columns through a 5k-row rank cost ~8 s; pre-projecting to the two
    consumed columns cut the query 11.1 → 3.8 s (sf0.1)."""
    spark = df.sparkSession
    sc = spark.sparkContext
    n = num_partitions or max(2, sc.defaultParallelism)
    part = (
        df.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__mid", F.monotonically_increasing_id())
        .localCheckpoint()  # one compute shared by the sizes job and the rank job
    )
    sizes = {
        r["__pid"]: r["c"]
        for r in part.groupBy("__pid").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for p in sorted(sizes):  # range partition i holds the i-th key range
        offsets[p] = acc
        acc += sizes[p]
    off_map = F.create_map(
        *[F.lit(v) for p in offsets for v in (p, offsets[p])]
    )
    local_idx = F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1))
    rank = (
        F.coalesce(off_map[F.col("__pid")], F.lit(0)) + local_idx + 1
    ).cast("long")
    return part.withColumn(rank_col, rank).drop("__pid", "__mid")
