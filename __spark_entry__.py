"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship filtered-random pipeline (the reference's
  packaged filtered-random algorithm,
  /root/reference/hypercane/packaged_algorithms/filtered-random.halg)
  over a memento relation derived from the sf0.001 tables:
  near-duplicate simhash filter → language filter → deterministic
  true-random(k) sample.
- ``queries()`` / ``oracle_sql()``: one entry per implemented operator from
  SURVEY.md §2 (plus the training-data dedup/similarity/text ops), each
  paired with a DuckDB-runnable ANSI-SQL oracle where SQL-expressible.
  See hypercane_spark/entry_queries.py for the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark.sql import functions as F

    from hypercane_spark.entry_queries import _docs_mementos
    from hypercane_spark.functions.hashes import tf_simhash64
    from hypercane_spark.operators.filters import include_languages, near_duplicates
    from hypercane_spark.operators.sample import true_random
    from hypercane_spark.functions.text import language_guess

    m = (
        _docs_mementos(spark, SF0001)
        .withColumn("tf_simhash", tf_simhash64("text"))
        .withColumn("language", language_guess("text"))
        .withColumn("memento_datetime", F.to_timestamp(F.lit("2024-01-01")) )
        .withColumn("urim", F.col("urir"))
        .withColumn("urit", F.col("source"))
    )
    nondup = near_duplicates(
        m, simhash="tf_simhash", group="urit", mdt="doc_id", key="urim"
    )
    english = include_languages(nondup, ["en"])
    return true_random(english, 28, key="doc_id", seed=42).select(
        "doc_id", "urim", "language", "tf_simhash"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from hypercane_spark.entry_queries import REGISTRY

    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted for non-SQL ops)."""
    from hypercane_spark.entry_queries import REGISTRY

    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
