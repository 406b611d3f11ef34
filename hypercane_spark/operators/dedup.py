"""Deduplication operators for large-scale training-data pipelines.

Five families, all shuffle-conscious:

- exact         — md5(normalized text) groupBy; one shuffle on a 32-byte key
- minhash LSH   — shingle → md5-minhash signature → band keys → explode →
                  bucket join; candidate pairs only ever meet inside a
                  band bucket (no all-pairs)
- simhash       — 64-bit simhash + banded prefix buckets → hamming verify
- ngram jaccard — blocking key → within-block token-set jaccard
- embedding     — cosine near-dup via LSH bucketing (see similarity.py)

The minhash signature uses md5 (functions/hashes.py:minhash_hex) so the
whole pipeline — signature, bands, buckets — is reproducible in any SQL
oracle; this is what the correctness gate checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hypercane_spark.sources.io import with_min_parallelism
from hypercane_spark.functions.hashes import (
    hamming64,
    minhash_band_keys,
    simhash64,
    tokens_ws,
)


def exact_dedup(
    df: DataFrame,
    text: str = "text",
    key: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Keep one representative (min key) per exact text duplicate group.

    Hash-groupBy on md5 of the (optionally whitespace-normalized, lowercased)
    text: the shuffle key is 32 bytes regardless of document size, and the
    aggregate is partial (map-side min) — scales to any corpus size."""
    t = F.col(text)
    if normalize:
        t = F.lower(F.regexp_replace(F.trim(t), r"\s+", " "))
    h = F.md5(t)
    keep = (
        df.withColumn("__h", h)
        .groupBy("__h")
        .agg(F.min(key).alias(key))
        .drop("__h")
    )
    return df.join(keep, on=key, how="left_semi")


def shingles(text: str | F.Column, n: int = 3) -> F.Column:
    """n-gram (word) shingles as array<string>."""
    toks = tokens_ws(text)
    sz = F.size(toks)
    return F.when(
        sz >= n,
        F.transform(
            F.sequence(F.lit(1), sz - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        ),
    ).otherwise(F.array(F.array_join(toks, " ")))


# Operators that already warned once that a cap is active (per process):
# keeps the no-accounting path to exactly one warning, zero extra jobs.
_CAP_WARNED: set[str] = set()


def _cap_degenerate_buckets(
    banded: DataFrame,
    band_col: str,
    max_bucket: int | None,
    log_dropped: bool,
    what: str,
) -> DataFrame:
    """Drop buckets with more than ``max_bucket`` members before a bucket
    self-join: one pathological bucket (e.g. thousands of near-empty docs
    sharing a band) re-introduces O(b²) pair blow-up. Partitioned count
    window (shuffles on the band key the join shuffles on anyway).

    Truncation is never fully silent: a capped run without accounting warns
    ONCE per operator that the cap is active (zero extra jobs — a
    ``DataFrame.observe`` metric was tried and rejected: the banded frame
    feeds a self-join, and a CollectMetrics node on both join branches
    fails Spark's single-use assertion). ``log_dropped=True`` runs an eager
    count of the dropped BUCKETS and warns with the number — an extra
    Spark job over the banded table; opt in when auditing a new corpus."""
    if max_bucket is None:
        return banded
    import warnings

    w = Window.partitionBy(band_col)
    capped = banded.withColumn("__bn", F.count(F.lit(1)).over(w))
    if log_dropped:
        n = (
            capped.where(F.col("__bn") > max_bucket)
            .select(band_col)
            .distinct()
            .count()
        )
        if n:
            warnings.warn(
                f"{what}: dropped {n} degenerate bucket(s) with more than "
                f"{max_bucket} members — pairs within them are NOT emitted",
                stacklevel=3,
            )
    elif what not in _CAP_WARNED:
        _CAP_WARNED.add(what)
        warnings.warn(
            f"{what}: max_bucket={max_bucket} cap active — degenerate "
            "buckets are truncated WITHOUT accounting; pass "
            "log_dropped=True to count the dropped buckets (extra job)",
            stacklevel=3,
        )
    return capped.where(F.col("__bn") <= max_bucket).drop("__bn")


def minhash_lsh_candidates(
    df: DataFrame,
    text: str = "text",
    key: str = "doc_id",
    num_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket: int | None = None,
    log_dropped: bool = False,
) -> DataFrame:
    """Candidate near-duplicate pairs (key_a < key_b) sharing ≥1 LSH band.

    shingle → minhash (num_perm md5-min signatures) → band keys → explode →
    self-join on the band bucket. Rows only meet within a bucket: the join
    key is (band hash), so shuffle volume is O(rows·bands), never O(rows²)
    — EXCEPT inside a degenerate bucket, which ``max_bucket`` caps (drops
    the bucket, warns with a count; default off so the SQL oracle replays
    exactly).

    Band keys come from the one-pass ``minhash_band_keys`` aggregate —
    composing minhash/bands through projections lets CollapseProject
    re-evaluate the shingle+md5 tree 16–64× per row (see hashes.py)."""
    df = with_min_parallelism(df)
    banded = df.select(
        F.col(key).alias("k"),
        F.explode(
            minhash_band_keys(shingles(text, shingle_n), num_perm, bands)
        ).alias("band"),
    ).distinct()
    banded = _cap_degenerate_buckets(
        banded, "band", max_bucket, log_dropped, "minhash_lsh_candidates"
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(b, on="band")
        .where(F.col("a.k") < F.col("b.k"))
        .select(F.col("a.k").alias(f"{key}_a"), F.col("b.k").alias(f"{key}_b"))
        .distinct()
    )
    return pairs


def minhash_dedup(
    df: DataFrame,
    text: str = "text",
    key: str = "doc_id",
    num_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Drop near-duplicates: each LSH bucket keeps its min-key member.

    Greedy bucket-representative semantics (standard web-scale dedup): a
    row survives iff it is the min key in *every* band bucket it occupies.
    One aggregation per band — no pairwise joins at all."""
    banded = with_min_parallelism(df).select(
        F.col(key).alias("__k"),
        F.explode(
            minhash_band_keys(shingles(text, shingle_n), num_perm, bands)
        ).alias("__band"),
    )
    w = Window.partitionBy("__band")
    survivors = (
        banded.withColumn("__min", F.min("__k").over(w))
        .groupBy("__k")
        .agg(F.max(F.when(F.col("__k") != F.col("__min"), 1).otherwise(0)).alias("__dup"))
        .where(F.col("__dup") == 0)
        .select(F.col("__k").alias(key))
    )
    return df.join(survivors, on=key, how="left_semi")


def simhash_dedup(
    df: DataFrame,
    text: str = "text",
    key: str = "doc_id",
    max_hamming: int = 3,
    band_bits: int = 16,
    use_md5_hash: bool = False,
    max_bucket: int | None = None,
    log_dropped: bool = False,
) -> DataFrame:
    """SimHash near-dup: 64-bit simhash, banded into 64/band_bits chunks
    (pigeonhole: two hashes within max_hamming share ≥1 exact chunk when
    chunks > max_hamming), bucket-join candidates, verify with true hamming,
    keep min key per connected pair (greedy). ``max_bucket`` drops
    degenerate band buckets (with a warned count) before the self-join —
    default off so the SQL oracle replays exactly.

    ``use_md5_hash`` swaps the token hash family from xxhash64 to md5
    (functions/hashes.py:simhash64_md5) so an ANSI-SQL oracle can replicate
    every value — the correctness gate's dedup_simhash query uses it."""
    n_bands = 64 // band_bits
    if n_bands <= max_hamming:
        raise ValueError("need more bands than max_hamming for pigeonhole")
    from hypercane_spark.functions.hashes import simhash64_md5

    sh = simhash64_md5(text) if use_md5_hash else simhash64(text)

    # Bind the simhash through a single-element transform lambda before
    # deriving the band chunks: referencing the aggregate 4× (once per
    # chunk) lets CollapseProject inline and re-evaluate it 4× per row
    # (same failure mode as minhash_band_keys — see hashes.py). The
    # explode emits (sh, band) structs whose fields are real attributes.
    def chunk_structs(s: F.Column) -> F.Column:
        chunks = F.array(
            *[
                F.concat(
                    F.lit(f"{i}:"),
                    F.shiftrightunsigned(s, i * band_bits)
                    .bitwiseAND(F.lit((1 << band_bits) - 1))
                    .cast("string"),
                )
                for i in range(n_bands)
            ]
        )
        return F.transform(
            chunks, lambda c: F.struct(s.alias("sh"), c.alias("band"))
        )

    packed = F.element_at(
        F.transform(F.array(sh), lambda s: chunk_structs(s)), 1
    )
    banded = (
        with_min_parallelism(df)
        .select(F.col(key).alias("k"), F.explode(packed).alias("__pb"))
        .select("k", F.col("__pb.sh").alias("sh"), F.col("__pb.band").alias("band"))
    )
    banded = _cap_degenerate_buckets(
        banded, "band", max_bucket, log_dropped, "simhash_dedup"
    )
    a, b = banded.alias("a"), banded.alias("b")
    dup_pairs = (
        a.join(b, on="band")
        .where(F.col("a.k") < F.col("b.k"))
        .where(hamming64(F.col("a.sh"), F.col("b.sh")) <= max_hamming)
        .select(F.col("b.k").alias("loser"))
        .distinct()
    )
    return df.join(
        dup_pairs.withColumnRenamed("loser", key), on=key, how="left_anti"
    )


def _bands_for_threshold(
    threshold: float, num_perm: int, target_recall: float = 0.95
) -> int:
    """Derive the LSH band count from the verify threshold: the smallest
    number of bands b (i.e. the largest rows-per-band r = num_perm/b, the
    most selective buckets) whose s-curve recall at ``threshold``,
    1-(1-t^r)^b, still reaches ``target_recall``. Falls back to
    b = num_perm (r=1, maximum recall) when no divisor reaches the target
    — at low thresholds only single-hash buckets catch enough pairs."""
    for b in (b for b in range(1, num_perm + 1) if num_perm % b == 0):
        r = num_perm // b
        if 1.0 - (1.0 - threshold**r) ** b >= target_recall:
            return b
    return num_perm


def ngram_jaccard_pairs(
    df: DataFrame,
    text: str = "text",
    key: str = "doc_id",
    block: F.Column | None = None,
    threshold: float = 0.8,
    shingle_n: int = 2,
    num_perm: int = 16,
    bands: int | None = None,
) -> DataFrame:
    """n-gram Jaccard similarity pairs, blocked so no all-pairs join ever
    runs. Output: (key_a, key_b, jaccard) — the jaccard VALUES are exact
    (set intersection/union over the true shingles); under LSH blocking the
    pair RECALL is probabilistic.

    By default candidate pairs come from ``minhash_lsh_candidates`` over the
    same shingles (the documented LSH-generate → Jaccard-verify composition)
    with ``bands`` DERIVED from the threshold (``_bands_for_threshold``:
    recall at the threshold ≥ 0.95 by the s-curve; a fixed 4-band default
    missed ~12 % of J=0.8 pairs). Pass ``bands`` explicitly to trade recall
    for bucket selectivity — the SQL-oracle entry query pins bands=4 to
    stay in lockstep with its hand-written band SQL. An explicit ``block``
    column replaces LSH with single-key prefix blocking (the old
    first-token default was near-degenerate on natural text: a huge
    fraction of documents share "the"/"a" as token 1 → O(b²) block)."""
    if bands is None:
        bands = _bands_for_threshold(threshold, num_perm)
    work = with_min_parallelism(df).select(
        F.col(key).alias("k"),
        F.array_distinct(shingles(text, shingle_n)).alias("sh"),
    )
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    if block is None:
        cand = minhash_lsh_candidates(
            df, text=text, key=key, num_perm=num_perm,
            bands=bands, shingle_n=shingle_n,
        )
        a = work.select(F.col("k").alias(f"{key}_a"), F.col("sh").alias("__sa"))
        b = work.select(F.col("k").alias(f"{key}_b"), F.col("sh").alias("__sb"))
        joined = cand.join(a, on=f"{key}_a").join(b, on=f"{key}_b")
        pair_jac = joined.select(
            f"{key}_a",
            f"{key}_b",
            F.round(
                F.when(
                    F.size(F.array_union("__sa", "__sb")) > 0,
                    F.size(F.array_intersect("__sa", "__sb"))
                    / F.size(F.array_union("__sa", "__sb")),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("jaccard"),
        )
        return pair_jac.where(F.col("jaccard") >= threshold)
    blocked = with_min_parallelism(df).select(
        F.col(key).alias("k"),
        block.alias("blk"),
        F.array_distinct(shingles(text, shingle_n)).alias("sh"),
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(b, on="blk")
        .where(F.col("a.k") < F.col("b.k"))
        .select(
            F.col("a.k").alias(f"{key}_a"),
            F.col("b.k").alias(f"{key}_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def paragraph_dedup(
    df: DataFrame,
    text: str = "text",
    key: str = "doc_id",
    sep: str = r"\n\n+",
    drop_empty_docs: bool = True,
) -> DataFrame:
    """CCNet-style cross-corpus paragraph dedup: split each document into
    paragraphs, keep only the FIRST occurrence (lowest ``(key, position)``)
    of every exact normalized paragraph across the whole corpus, and
    reassemble documents from their surviving paragraphs.

    This removes the boilerplate that exact/near-dup document dedup can't
    touch (headers, cookie banners, share widgets repeated across millions
    of pages) — the CCNet/RefinedWeb preprocessing step.

    Scale shape: posexplode (narrow) → ONE shuffle on md5(paragraph) (a
    32-byte key regardless of paragraph size) with a map-side-partial
    min(struct(key,pos)) aggregate → broadcast-free semi-join back on the
    same hash key (co-partitioned: Catalyst reuses the exchange) → ONE
    shuffle on ``key`` to reassemble. No driver-side state; skew on a
    hyper-common paragraph is bounded because the aggregate (not a join)
    absorbs the hot hash.

    Returns ``(key, <text>)`` with ``<text>`` rebuilt from surviving
    paragraphs joined by a blank line; documents whose every paragraph was
    a duplicate are dropped (``drop_empty_docs=False`` keeps them with
    empty text)."""
    paras = F.filter(
        F.split(F.col(text), sep), lambda p: F.trim(p) != F.lit("")
    )
    exploded = df.select(
        F.col(key), F.posexplode(paras).alias("__pos", "__para")
    ).withColumn(
        "__h", F.md5(F.lower(F.regexp_replace(F.trim(F.col("__para")), r"\s+", " ")))
    )
    winners = exploded.groupBy("__h").agg(
        F.min(F.struct(F.col(key).alias("k"), F.col("__pos").alias("p"))).alias("__w")
    )
    kept = (
        exploded.join(winners, on="__h")
        .where((F.col(key) == F.col("__w.k")) & (F.col("__pos") == F.col("__w.p")))
        .drop("__h", "__w")
    )
    rebuilt = kept.groupBy(key).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__pos"), F.col("__para")))
                ),
                lambda s: s["__para"],
            ),
            "\n\n",
        ).alias(text)
    )
    if drop_empty_docs:
        return rebuilt
    return df.select(key).join(rebuilt, on=key, how="left").fillna({text: ""})


def decontaminate(
    df: DataFrame,
    eval_df: DataFrame,
    text: str = "text",
    key: str = "doc_id",
    eval_text: str = "text",
    shingle_n: int = 13,
    min_overlaps: int = 1,
    broadcast_eval: bool = True,
    flags_only: bool = False,
) -> DataFrame:
    """Benchmark decontamination: drop training documents sharing ≥
    ``min_overlaps`` distinct word n-grams with an evaluation set (the
    standard GPT-3/PaLM-style 13-gram overlap rule; tune ``shingle_n``
    down for short texts).

    Scale shape: the eval set's distinct gram hashes are a small relation
    (benchmarks are tiny next to a training corpus) — BROADCAST by default,
    so the corpus side is one explode → md5 → broadcast semi-join →
    groupBy(key) count with map-side partials, a single shuffle on the
    doc key and none on the corpus grams. ``broadcast_eval=False`` falls
    back to a shuffle join for pathologically large eval sets. Gram hashes
    are md5 so a SQL oracle replays the exact set.

    ``flags_only=True`` returns ``(key, n_contaminated_grams)`` for
    auditing instead of filtering."""
    eval_grams = (
        eval_df.select(
            F.explode(
                F.array_distinct(shingles(eval_text, shingle_n))
            ).alias("__g")
        )
        .select(F.md5("__g").alias("__g"))
        .distinct()
    )
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)
    corpus = df.select(
        F.col(key),
        F.explode(F.array_distinct(shingles(text, shingle_n))).alias("__g"),
    ).select(key, F.md5("__g").alias("__g"))
    # grams are distinct per doc, so count == distinct shared grams
    overlaps = (
        corpus.join(eval_grams, on="__g", how="left_semi")
        .groupBy(key)
        .agg(F.count(F.lit(1)).cast("int").alias("n_contaminated_grams"))
    )
    if flags_only:
        return overlaps
    contaminated = overlaps.where(
        F.col("n_contaminated_grams") >= min_overlaps
    ).select(key)
    return df.join(contaminated, on=key, how="left_anti")
