"""llm-curate: the packaged LM-training-data curation pipeline.

The DSA family packages the reference's `.halg` algorithms
(/root/reference/hypercane/packaged_algorithms/); this module packages the
analogous end-to-end artifact for the training-data user — the standard
web-corpus curation chain, composed from the individually-oracled
operators:

    gopher-gate → paragraph-dedup → minhash-dedup → decontaminate → pii-scrub

Every stage is shuffle-conscious (see each operator's docstring); composed
through ``Pipeline`` the chain inherits `.halg`-style stage materialization
and resume (a ``workdir`` makes each stage a parquet checkpoint, and a
re-run fast-forwards past complete stages).

Scale notes for the composition itself:
- The only stage that needs a SECOND table is decontaminate; its eval set
  is broadcast (benchmarks are tiny next to a 100 TB corpus).
- Stages shrink the corpus monotonically, so the expensive shuffles
  (minhash bands, decontaminate grams) run on progressively smaller data —
  the gate order is the cheap-filter-first order.
- pii-scrub is pure Catalyst (regexp chain) and stays in whole-stage
  codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hypercane_spark.plans.pipeline import Pipeline, register


@register("llm-curate")
def llm_curate(
    eval_df: DataFrame | None = None,
    text: str = "text",
    key: str = "doc_id",
    gopher_overrides: dict | None = None,
    minhash_num_perm: int = 16,
    minhash_bands: int = 4,
    minhash_shingle_n: int = 3,
    decon_shingle_n: int = 13,
    decon_min_overlaps: int = 1,
) -> Pipeline:
    """Build the curation pipeline.

    ``eval_df`` is the benchmark/evaluation corpus for decontamination
    (None skips that stage). ``gopher_overrides`` are kwargs forwarded to
    ``gopher_quality_flags`` — production defaults assume real documents;
    short-text corpora lower ``min_words``/``min_stopword_hits``.

    Output schema: ``(key, text, n_email, n_ipv4, n_phone, n_pii)`` with
    ``text`` PII-scrubbed and rebuilt from surviving paragraphs.
    """
    from hypercane_spark.functions.text import gopher_quality_flags, pii_scrub
    from hypercane_spark.operators.dedup import (
        decontaminate,
        minhash_dedup,
        paragraph_dedup,
    )

    gk = gopher_overrides or {}

    def gate(df: DataFrame) -> DataFrame:
        flags = gopher_quality_flags(F.col(text), **gk)
        return df.where(flags["pass"]).select(key, text)

    def scrub(df: DataFrame) -> DataFrame:
        s = pii_scrub(F.col(text))
        return df.select(F.col(key), s.alias("__s")).select(
            key,
            F.col("__s.clean").alias(text),
            "__s.n_email",
            "__s.n_ipv4",
            "__s.n_phone",
            "__s.n_pii",
        )

    stages = [
        ("gopher-gate", gate),
        ("paragraph-dedup", lambda df: paragraph_dedup(df, text=text, key=key)),
        (
            "minhash-dedup",
            lambda df: minhash_dedup(
                df,
                text=text,
                key=key,
                num_perm=minhash_num_perm,
                bands=minhash_bands,
                shingle_n=minhash_shingle_n,
            ),
        ),
    ]
    if eval_df is not None:
        stages.append(
            (
                "decontaminate",
                lambda df: decontaminate(
                    df,
                    eval_df,
                    text=text,
                    key=key,
                    shingle_n=decon_shingle_n,
                    min_overlaps=decon_min_overlaps,
                ),
            )
        )
    stages.append(("pii-scrub", scrub))
    return Pipeline("llm-curate", stages)
