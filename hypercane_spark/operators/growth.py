"""Collection growth-curve statistics (SURVEY §2.5).

The reference computes the growth curve's area-under-curve with sklearn's
trapezoidal ``auc`` over (mdts_pct, urims_pct)/(…, urirs_pct) point lists
(/root/reference/hypercane/actions/report.py:417-486; the point lists come
from /root/reference/hypercane/report/growth.py:13-165 — per memento in
(mdt, urim, urir) sort order, x = elapsed-time fraction, y = cumulative
distinct-count fraction).

Distributed shape: the curve's points get an exact global position from
``order.with_global_rank`` (no single-partition window), consecutive points
are paired by a co-partitioned self-join on ``pos+1`` (one shuffle on an
int key — fully parallel), and the trapezoid sum is a single partial
aggregate. Scales to a curve with billions of points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def trapezoid_auc(points: DataFrame, x: str, y: str, pos: str) -> DataFrame:
    """Trapezoidal AUC of a curve given as rows (pos, x, y) with ``pos``
    dense and 1-based (use order.with_global_rank). One co-partitioned
    self-join pairs point i with i+1; one sum reduces.

    → single-row DataFrame with column ``auc`` (double)."""
    a = points.select(
        F.col(pos).alias("__p"), F.col(x).alias("__xa"), F.col(y).alias("__ya")
    )
    b = points.select(
        (F.col(pos) - 1).alias("__p"),
        F.col(x).alias("__xb"),
        F.col(y).alias("__yb"),
    )
    seg = a.join(b, on="__p")
    return seg.agg(
        F.sum(
            (F.col("__xb") - F.col("__xa"))
            * (F.col("__yb") + F.col("__ya"))
            / F.lit(2.0)
        ).alias("auc")
    )


def growth_curve_points(
    df: DataFrame,
    mdt: str = "memento_datetime",
    key: str = "urim",
) -> DataFrame:
    """Growth-curve points over a memento table: one row per memento in
    (mdt, key) order with x = elapsed-time fraction ∈ [0,1] and
    y = cumulative memento fraction. The scalar extrema/count ride one
    partial-agg job and re-enter the plan as literals (the repo's standard
    scalar pattern); positions come from the distributed exact rank."""
    from hypercane_spark.operators.order import with_global_rank

    stats = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.unix_timestamp(F.col(mdt))).alias("t0"),
        F.max(F.unix_timestamp(F.col(mdt))).alias("t1"),
    ).collect()[0]
    n, t0, t1 = stats["n"], stats["t0"], stats["t1"]
    if not n:
        return df.sparkSession.createDataFrame([], "pos long, x double, y double")
    span = max(1, (t1 or 0) - (t0 or 0))
    ranked = with_global_rank(
        df.select(F.col(mdt).alias("__mdt"), F.col(key).alias("__k")),
        [F.col("__mdt").asc(), F.col("__k").asc()],
        rank_col="pos",
    )
    return ranked.select(
        "pos",
        (
            (F.unix_timestamp(F.col("__mdt")) - F.lit(t0)) / F.lit(float(span))
        ).alias("x"),
        (F.col("pos") / F.lit(float(n))).alias("y"),
    )


def growth_curve_auc_stats(
    df: DataFrame, mdt: str = "memento_datetime", key: str = "urim"
) -> DataFrame:
    """The reference's AUC scalars (report.py:446-449): the curve's
    trapezoidal AUC and its distance from the diagonal (0.5 = linear
    growth; above = early growth, below = late)."""
    pts = growth_curve_points(df, mdt=mdt, key=key)
    auc = trapezoid_auc(pts, "x", "y", "pos")
    return auc.select(
        F.round(F.col("auc"), 6).alias("auc_memento_curve"),
        F.round(F.col("auc") - 0.5, 6).alias("auc_memento_minus_diag"),
    )
