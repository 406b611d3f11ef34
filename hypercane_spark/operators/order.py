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


def by_memento_datetime(
    df: DataFrame,
    mdt: str = "memento_datetime",
    key: str = "urim",
    rank_col: str = "rank",
) -> DataFrame:
    """Newest-first ordering (the reference sorts ascending then reverses,
    /root/reference/hypercane/order/memento_datetime.py:7-34 — list.reverse()
    at :32; ties broken by urim within the tuple sort, which the reversal
    also flips → descending urim)."""
    w = Window.orderBy(F.col(mdt).desc(), F.col(key).desc())
    return df.withColumn(rank_col, F.row_number().over(w))


def by_pubdate_else_memento_datetime(
    df: DataFrame,
    pubdate: str = "pubdate",
    mdt: str = "memento_datetime",
    key: str = "urim",
    rank_col: str = "rank",
) -> DataFrame:
    """Ascending by publication date, falling back to memento-datetime when
    the extractor found none (reference
    /root/reference/hypercane/order/dsa1_publication_alg.py:8-39; note this
    one is ascending while memento-datetime ordering is descending — a
    reference quirk kept deliberately)."""
    eff = F.coalesce(F.col(pubdate), F.col(mdt))
    w = Window.orderBy(eff.asc(), F.col(key).asc())
    return df.withColumn(rank_col, F.row_number().over(w))


def by_score(
    df: DataFrame,
    score: str,
    descending: bool = True,
    key: str = "urim",
    rank_col: str = "rank",
) -> DataFrame:
    """Sort by a (numeric-cast) score column, urim tiebreak (reference
    /root/reference/hypercane/order/score.py:7-24 casts the TSV string to
    float at sort time; our columns are already typed, the cast is a no-op
    kept for TSV round-trips)."""
    s = F.col(score).cast("double")
    w = (
        Window.orderBy(s.desc(), F.col(key).desc())
        if descending
        else Window.orderBy(s.asc(), F.col(key).asc())
    )
    return df.withColumn(rank_col, F.row_number().over(w))


def top_k(df: DataFrame, k: int, score: str, key: str = "urim") -> DataFrame:
    """Global top-k by score — TakeOrderedAndProject, no full sort."""
    return df.orderBy(F.col(score).desc(), F.col(key).desc()).limit(k)
