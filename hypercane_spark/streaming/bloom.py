"""Sharded Bloom + Cuckoo membership filters for the URL-seen set.

Replaces the reference's O(n) list-membership dedup
(/root/reference/hypercane/identify/archivecrawl.py:13-24 — ``if item not
in storage`` over a Python list) with scale-free structures:

- **Bloom**: k bit positions per key are computed *JVM-side*
  (xxhash64(surt ':' i) % bits — pure column expressions), per-partition
  numpy bit arrays are OR-reduced, and membership tests run as one
  vectorized Arrow batch against the broadcast filter. Sharding by key
  hash keeps any single array bounded: at the 10^10-URL design scale a
  10-bits/key filter is ~12.5 GB — sharded 64 ways it's ~200 MB per
  executor, each shard owned by the partition that hashes to it.
- **Cuckoo**: bucketed 16-bit fingerprints with 2-choice + eviction;
  supports deletion (bloom cannot), used for the in-flight frontier
  window where URLs leave the set after fetch.

Both are probabilistic prefilters; the exactness backstop is a LEFT ANTI
JOIN against the persisted ``seen`` table (frontier.py) so false positives
never drop a URL silently — they only cost one extra join row.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_positions(key: Column, num_bits: int, num_hashes: int) -> Column:
    """array<long>[num_hashes] of bit positions for a key — JVM-side."""
    return F.array(
        *[
            F.pmod(F.xxhash64(F.concat(key, F.lit(f":{i}"))), F.lit(num_bits))
            for i in range(num_hashes)
        ]
    )


def build_bloom(
    df: DataFrame, key: str | Column, num_bits: int = 1 << 20, num_hashes: int = 5
) -> bytes:
    """Build a Bloom filter over a key column.

    Bit positions are computed by Catalyst; bit-setting is one vectorized
    numpy scatter per Arrow batch (mapInPandas — never row-at-a-time
    Python), emitting ONE bitmap row per partition, OR-reduced on the
    driver. Bloom filters are OR-composable: callers maintaining an
    incremental seen-filter build over only the NEW keys per round and
    ``bloom_or`` the result into their running filter."""
    key_col = F.col(key) if isinstance(key, str) else key
    pos_df = df.select(bloom_positions(key_col, num_bits, num_hashes).alias("p"))

    nbytes = (num_bits + 7) // 8

    def to_bits(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        arr = np.zeros(nbytes, dtype=np.uint8)
        any_rows = False
        for pdf in it:
            if not len(pdf):
                continue
            any_rows = True
            pos = np.concatenate(
                [np.asarray(p, dtype=np.int64) for p in pdf["p"]]
            )
            # ufunc.at: unbuffered, so duplicate byte indices OR correctly
            # (fancy-indexed |= keeps only one write per duplicate index)
            np.bitwise_or.at(
                arr, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8)
            )
        if any_rows:
            yield pd.DataFrame({"b": [arr.tobytes()]})

    parts = pos_df.mapInPandas(to_bits, schema="b binary").collect()
    out = np.zeros(nbytes, dtype=np.uint8)
    for row in parts:
        out |= np.frombuffer(row["b"], dtype=np.uint8)
    return out.tobytes()


def bloom_or(a: bytes | None, b: bytes | None) -> bytes | None:
    """OR-compose two bloom filters of the same geometry."""
    if a is None:
        return b
    if b is None:
        return a
    return (
        np.frombuffer(a, dtype=np.uint8) | np.frombuffer(b, dtype=np.uint8)
    ).tobytes()


def bloom_might_contain(
    df: DataFrame,
    key: str | Column,
    bloom: bytes,
    num_bits: int,
    num_hashes: int,
    out: str = "__in_bloom",
) -> DataFrame:
    """Add a boolean column: True when the key *might* be in the filter.

    Positions computed JVM-side; the broadcast bit-array test is one
    vectorized numpy gather per Arrow batch."""
    key_col = F.col(key) if isinstance(key, str) else key
    work = df.withColumn("__pos", bloom_positions(key_col, num_bits, num_hashes))
    spark = df.sparkSession
    b_bloom = spark.sparkContext.broadcast(np.frombuffer(bloom, dtype=np.uint8))

    from pyspark.sql.types import BooleanType, StructField, StructType

    schema = StructType(list(work.schema.fields) + [StructField(out, BooleanType())])

    def check(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        arr = b_bloom.value
        for pdf in it:
            pos = np.stack(pdf["__pos"].to_numpy())  # (n, k)
            bits = (arr[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
            pdf[out] = bits.all(axis=1)
            yield pdf

    return work.mapInPandas(check, schema=schema).drop("__pos")


class CuckooFilter:
    """Compact cuckoo filter: 16-bit fingerprints, 4-way buckets, 2-choice
    insertion with bounded eviction. Supports delete (for in-flight
    windows). Driver/oracle-side structure; Spark-side use is via broadcast
    + vectorized lookup like the bloom."""

    def __init__(self, capacity: int, seed: int = 42):
        self.nbuckets = max(2, 1 << (capacity.bit_length()))
        self.table = np.zeros((self.nbuckets, 4), dtype=np.uint16)
        self.seed = seed
        self.count = 0

    def _fp_and_buckets(self, key: str) -> tuple[int, int, int]:
        from hypercane_spark.oracle.simhash import xxh64

        h = xxh64(key.encode(), self.seed)
        fp = (h & 0xFFFF) or 1
        i1 = (h >> 16) % self.nbuckets
        i2 = (i1 ^ xxh64(fp.to_bytes(2, "little"), self.seed)) % self.nbuckets
        return fp, i1, i2

    def insert(self, key: str) -> bool:
        fp, i1, i2 = self._fp_and_buckets(key)
        for i in (i1, i2):
            row = self.table[i]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return True
        # evict
        import random

        rng = random.Random(self.seed ^ fp)
        i = rng.choice((i1, i2))
        cur = fp
        for _ in range(500):
            slot = rng.randrange(4)
            cur, self.table[i][slot] = int(self.table[i][slot]), cur
            from hypercane_spark.oracle.simhash import xxh64

            i = (i ^ xxh64(int(cur).to_bytes(2, "little"), self.seed)) % self.nbuckets
            row = self.table[i]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur
                self.count += 1
                return True
        return False  # table full

    def __contains__(self, key: str) -> bool:
        fp, i1, i2 = self._fp_and_buckets(key)
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    def delete(self, key: str) -> bool:
        fp, i1, i2 = self._fp_and_buckets(key)
        for i in (i1, i2):
            idx = np.where(self.table[i] == fp)[0]
            if len(idx):
                self.table[i][idx[0]] = 0
                self.count -= 1
                return True
        return False


def build_cuckoo(
    df: DataFrame, key: str | Column, capacity: int, seed: int = 42
) -> "CuckooFilter":
    """Build a cuckoo filter from a key column. Keys stream to the driver
    partition-by-partition (toLocalIterator — never one giant collect);
    the filter itself is the compact fingerprint table, broadcastable.
    Unlike the bloom it supports deletion, so the engine can also use it
    for in-flight frontier windows where URLs leave the set after fetch."""
    key_col = F.col(key) if isinstance(key, str) else key
    cf = CuckooFilter(capacity=capacity, seed=seed)
    for row in df.select(key_col.alias("k")).toLocalIterator():
        cf.insert(row["k"])
    return cf


def cuckoo_might_contain(
    df: DataFrame,
    key: str | Column,
    cf: "CuckooFilter",
    out: str = "__in_cuckoo",
) -> DataFrame:
    """Vectorized membership test against a broadcast cuckoo table: both
    candidate buckets are gathered with one numpy take per Arrow batch."""
    key_col = F.col(key) if isinstance(key, str) else key
    work = df.withColumn("__k", key_col)
    spark = df.sparkSession
    b_table = spark.sparkContext.broadcast(cf.table)
    nbuckets, seed = cf.nbuckets, cf.seed

    from pyspark.sql.types import BooleanType, StructField, StructType

    schema = StructType(list(work.schema.fields) + [StructField(out, BooleanType())])

    def check(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from hypercane_spark.oracle.simhash import xxh64

        table = b_table.value
        for pdf in it:
            n = len(pdf)
            if not n:
                pdf[out] = pd.Series([], dtype=bool)
                yield pdf
                continue
            fps = np.empty(n, dtype=np.uint16)
            i1s = np.empty(n, dtype=np.int64)
            i2s = np.empty(n, dtype=np.int64)
            for j, k in enumerate(pdf["__k"]):
                h = xxh64(str(k).encode(), seed)
                fp = (h & 0xFFFF) or 1
                i1 = (h >> 16) % nbuckets
                i2 = (i1 ^ xxh64(fp.to_bytes(2, "little"), seed)) % nbuckets
                fps[j], i1s[j], i2s[j] = fp, i1, i2
            hit = (table[i1s] == fps[:, None]).any(axis=1) | (
                table[i2s] == fps[:, None]
            ).any(axis=1)
            pdf = pdf.copy()
            pdf[out] = hit
            yield pdf

    return work.mapInPandas(check, schema=schema).drop("__k")
