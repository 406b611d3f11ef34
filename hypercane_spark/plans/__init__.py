"""Pipeline DSL + packaged sampling algorithms (DSA1-4,
filtered-random, ordered-systematic, simple-search-engine — the
reference's full 7-algorithm surface).

The reference packages multi-stage algorithms as bash `.halg` scripts that
run one `hc` subprocess per stage with TSV intermediates and skip-if-output-
exists resume (/root/reference/hypercane/packaged_algorithms/*.halg;
executor /root/reference/hypercane/actions/sample.py:5-77). Here a pipeline
is a Python composition of DataFrame stages with optional per-stage parquet
checkpoints carrying the same resume semantics — Catalyst fuses any
unmaterialized stages into one job.
"""

from hypercane_spark.plans.pipeline import Pipeline, Stage
from hypercane_spark.plans.dsa import (
    dsa1,
    dsa2,
    dsa3,
    dsa4,
    filtered_random,
    ordered_systematic,
    simple_search_engine,
)
from hypercane_spark.plans.llm import llm_curate

__all__ = [
    "llm_curate",
    "Pipeline",
    "Stage",
    "dsa1",
    "dsa2",
    "dsa3",
    "dsa4",
    "filtered_random",
    "ordered_systematic",
    "simple_search_engine",
]
