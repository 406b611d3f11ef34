"""Hashing / similarity scalar functions.

All of these are **pure Catalyst expressions** (higher-order functions over
arrays) — no Python UDFs — so they run inside whole-stage codegen and scale
linearly with executors.

- ``simhash64``: 64-bit simhash over whitespace tokens. Rebuilds the
  reference's raw/tf simhash (library calls at
  /root/reference/hypercane/utils.py:355-461) as:
  token → xxhash64 → per-bit ±1 vote → majority sign → bit.
- ``tf_simhash64``: simhash of the *sorted unique* word sequence — the
  reference's quirky "tf simhash" (/root/reference/hypercane/utils.py:438-443
  joins ``sorted(words)``).
- ``hamming64``: popcount(a ^ b), the reference's per-pair distance
  (/root/reference/hypercane/hfilter/near_duplicates.py:59,
  /root/reference/hypercane/cluster/dbscan.py:10-11 divide by 64).
- ``minhash_hex`` / ``lsh_bands_hex``: MinHash via lexicographic-min of
  md5(perm_id ':' token) hex digests. Using md5-of-string keeps the exact
  same signature computable by any ANSI-SQL oracle (DuckDB shares md5),
  which is how the correctness gate verifies it.
- ``det_rank``: deterministic pseudo-random rank md5(key ':' seed) — the
  scale-mode replacement for driver-side random.sample
  (/root/reference/hypercane/sample/probability.py:3-11) that any SQL engine
  can replay.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens_ws(text: Column | str, lowercase: bool = True) -> Column:
    """Whitespace tokens, empties dropped (reference tokenizes with
    ``.split()`` semantics throughout, e.g. score/bm25.py:20)."""
    t = _c(text)
    if lowercase:
        t = F.lower(t)
    return F.filter(F.split(t, r"\s+"), lambda x: x != F.lit(""))


def _bit_votes(hashes: Column) -> Column:
    """array<long>[64] of ±1 votes summed across token hashes.

    The 64 bit positions are static, so the per-bit extraction is unrolled
    at plan-build time (Python loop over ints) — the result is still one
    JVM-side aggregate over the token array, fully inside codegen."""
    zero = F.array_repeat(F.lit(0).cast("long"), 64)
    one = F.lit(1).cast("long")
    neg = F.lit(-1).cast("long")
    return F.aggregate(
        hashes,
        zero,
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(
                        F.shiftright(h, i).bitwiseAND(one) == 1, one
                    ).otherwise(neg)
                    for i in range(64)
                ]
            ),
            lambda a, b: a + b,
        ),
    )


def _votes_to_signed(votes: Column) -> Column:
    """array<long>[64] of votes → signed-64 simhash value (bit i set iff
    votes[i] > 0; bit 63 contributes -2^63 so the plain sum IS the exact
    two's-complement value — no overflow under ANSI mode)."""
    zero = F.lit(0).cast("long")
    # NB: `votes` must be referenced exactly once — each Column reference
    # clones its whole expression subtree, and 64 clones of a 64-wide
    # aggregate melt the optimizer. zip_with against a literal weight array
    # keeps the tree linear.
    weights = F.array(
        *[F.lit(1 << i).cast("long") for i in range(63)],
        F.lit(-(1 << 63)).cast("long"),
    )
    weighted = F.zip_with(
        votes, weights, lambda v, w: F.when(v > 0, w).otherwise(zero)
    )
    return F.aggregate(weighted, zero, lambda a, b: a + b)


def simhash_of_tokens(tokens: Column) -> Column:
    """64-bit simhash of an array<string> of tokens (signed long repr)."""
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))
    return _votes_to_signed(_bit_votes(hashes))


def simhash64_md5(text: Column | str) -> Column:
    """Raw simhash whose per-token 64-bit hash derives from md5 instead of
    xxhash64: hi 32 bits = hex chars 17-24, lo 32 bits = chars 25-32 (both
    big-endian). Same vote/threshold semantics as ``simhash64``; exists so
    an md5-capable ANSI-SQL oracle (DuckDB: ('0x'||substr(md5(t),…,8))::
    BIGINT) can replicate the value bit-for-bit — the correctness gate for
    simhash dedup rides on it.

    The hi/lo pair is bound through a single-element transform lambda so
    the md5 subtree is evaluated once per half, not once per bit."""
    toks = tokens_ws(text)
    zero64 = F.array_repeat(F.lit(0).cast("long"), 64)
    one = F.lit(1).cast("long")
    neg = F.lit(-1).cast("long")

    def merge(acc: Column, t: Column) -> Column:
        h = F.md5(t)
        pair = F.array(
            F.struct(
                F.conv(F.substring(h, 17, 8), 16, 10).cast("long").alias("hi"),
                F.conv(F.substring(h, 25, 8), 16, 10).cast("long").alias("lo"),
            )
        )
        bits = F.element_at(
            F.transform(
                pair,
                lambda s: F.array(
                    *[
                        F.when(
                            F.shiftright(
                                s["lo"] if i < 32 else s["hi"], i % 32
                            ).bitwiseAND(one)
                            == one,
                            one,
                        ).otherwise(neg)
                        for i in range(64)
                    ]
                ),
            ),
            1,
        )
        return F.zip_with(acc, bits, lambda a, b: a + b)

    return _votes_to_signed(F.aggregate(toks, zero64, merge))


def simhash64(text: Column | str) -> Column:
    """Raw simhash: simhash of whitespace tokens of the (lowercased) text."""
    return simhash_of_tokens(tokens_ws(text))


def tf_simhash64(text: Column | str) -> Column:
    """Reference 'tf simhash': simhash over the sorted token sequence
    (/root/reference/hypercane/utils.py:438-443 — ``' '.join(sorted(words))``;
    duplicates retained, order normalized)."""
    return simhash_of_tokens(F.array_sort(tokens_ws(text)))


def hamming64(a: Column | str, b: Column | str) -> Column:
    """Hamming distance between two 64-bit hashes (0..64)."""
    return F.bit_count(_c(a).bitwiseXOR(_c(b)))


def hamming_frac(a: Column | str, b: Column | str) -> Column:
    """hamming/64 — the reference's normalized distance
    (/root/reference/hypercane/hfilter/near_duplicates.py:110)."""
    return hamming64(a, b) / F.lit(64.0)


def minhash_hex(tokens: Column, num_perm: int = 16) -> Column:
    """array<string>[num_perm] MinHash signature: for permutation i, the
    lexicographic min of md5(i ':' token). Empty docs get 'z'*32 sentinels.

    md5-hex-min is a valid MinHash family (each salted md5 is a uniform
    pseudo-permutation of the token universe) and — unlike xxhash64 — is
    bit-reproducible in any SQL oracle."""
    perms = F.sequence(F.lit(0), F.lit(num_perm - 1))
    sentinel = F.lit("z" * 32)
    return F.transform(
        perms,
        lambda i: F.coalesce(
            F.array_min(
                F.transform(
                    tokens, lambda t: F.md5(F.concat(i.cast("string"), F.lit(":"), t))
                )
            ),
            sentinel,
        ),
    )


def minhash_band_keys(
    tokens: Column, num_perm: int = 16, bands: int = 4
) -> Column:
    """array<string>[bands] LSH band keys in ONE pass over ``tokens``.

    Produces exactly ``lsh_bands_hex(minhash_hex(tokens, num_perm), …)`` but
    as a single ``F.aggregate``: the merge folds element-wise mins of the
    per-permutation md5s, and the band keys are derived in the ``finish``
    lambda where the signature is a *bound lambda variable*. That last part
    is the point — Catalyst's CollapseProject inlines single-use projection
    aliases, so composing ``minhash_hex``/``lsh_bands_hex`` through
    ``select`` stages re-evaluates the whole shingle+md5 tree once per
    permutation reference (16×) and once per band (4×): measured 228 s vs
    ~2 s for 5 000 docs on local[32]. A lambda-bound accumulator cannot be
    inlined, so this form evaluates the expensive subtree exactly once per
    row no matter how the optimizer rewrites the plan."""
    rows_per_band = num_perm // bands
    init = F.array_repeat(F.lit("z" * 32), num_perm)
    perms = F.sequence(F.lit(0), F.lit(num_perm - 1))

    def merge(acc: Column, t: Column) -> Column:
        hashes = F.transform(
            perms,
            lambda i: F.md5(F.concat(i.cast("string"), F.lit(":"), t)),
        )
        return F.zip_with(acc, hashes, lambda a, b: F.least(a, b))

    def finish(sig: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.md5(
                F.concat(
                    b.cast("string"),
                    F.lit("|"),
                    F.array_join(
                        F.slice(sig, b * rows_per_band + 1, rows_per_band),
                        ",",
                    ),
                )
            ),
        )

    return F.aggregate(tokens, init, merge, finish)


def lsh_bands_hex(signature: Column, bands: int, rows_per_band: int) -> Column:
    """array<string>[bands] of band keys: md5 of the concatenated slice of the
    signature, prefixed with the band id so buckets never collide across
    bands."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.md5(
            F.concat(
                b.cast("string"),
                F.lit("|"),
                F.array_join(
                    F.slice(signature, b * rows_per_band + 1, rows_per_band), ","
                ),
            )
        ),
    )


def det_rank(key: Column | str, seed: int | str = 42) -> Column:
    """Deterministic pseudo-random rank in [0,1)-like hex space:
    md5(key ':' seed). ORDER BY det_rank ≡ a seeded shuffle that both Spark
    and any SQL oracle reproduce byte-identically."""
    return F.md5(F.concat(_c(key).cast("string"), F.lit(f":{seed}")))
