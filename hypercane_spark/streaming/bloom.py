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


# ------------------------------------------------------------ cuckoo filter
#
# Partial-key cuckoo filter (Fan et al., CoNEXT'14 — public algorithm):
# 16-bit fingerprints, 4-way buckets, alternate bucket i2 = i1 XOR
# H(fp) over a power-of-two bucket count, so the pair is recoverable from
# (bucket, fp) alone — which is what makes distributed builds mergeable
# and batch insertion vectorizable. The key hash is Spark's xxhash64
# (bit-exact Python replica in oracle/simhash.py), so fingerprint/bucket
# derivation happens JVM-side as a column and numpy-side as array ops —
# never per-row Python on either side.

_CUCKOO_MIX = np.uint64(0x5BD1E995)  # fp → alt-bucket offset multiplier


def _cuckoo_derive(h: np.ndarray, nbuckets: int) -> tuple[np.ndarray, np.ndarray]:
    """(fingerprint, primary bucket) from signed-int64 xxhash64 values."""
    hu = np.ascontiguousarray(h, dtype=np.int64).view(np.uint64)
    fp = (hu & np.uint64(0xFFFF)).astype(np.uint16)
    fp[fp == 0] = 1
    i1 = ((hu >> np.uint64(16)) & np.uint64(nbuckets - 1)).astype(np.int64)
    return fp, i1


def _cuckoo_alt(i: np.ndarray, fp: np.ndarray, nbuckets: int) -> np.ndarray:
    """Alternate bucket — XOR form over power-of-two buckets (involutive:
    alt(alt(i)) == i, so it works from EITHER bucket of the pair)."""
    return (
        (i.astype(np.uint64) ^ (fp.astype(np.uint64) * _CUCKOO_MIX))
        & np.uint64(nbuckets - 1)
    ).astype(np.int64)


def _cuckoo_hash_col(key_col: Column, seed: int) -> Column:
    """JVM-side key hash; a non-default seed is folded into the bytes
    (Spark's xxhash64 seed is fixed at 42)."""
    if seed == 42:
        return F.xxhash64(key_col)
    return F.xxhash64(F.concat(key_col, F.lit(f"\x00{seed}")))


def _cuckoo_hash_py(key: str, seed: int) -> int:
    from hypercane_spark.oracle.simhash import xxh64

    data = key.encode() if seed == 42 else (key + f"\x00{seed}").encode()
    h = xxh64(data, 42)
    return h - (1 << 64) if h >= (1 << 63) else h


class CuckooFilter:
    """Compact cuckoo filter: 16-bit fingerprints, 4-way buckets, 2-choice
    insertion with bounded eviction. Supports delete (for in-flight
    windows). ``insert_many`` is the engine path: vectorized group-rank
    placement of whole (fp, bucket) batches; the per-key ``insert`` exists
    for tests/oracle use. A failed insert (table full, or an eviction chain
    that displaced a resident fingerprint) sets ``self.full`` — unlike a
    bloom, an overfull cuckoo yields FALSE NEGATIVES, so callers must stop
    trusting it as a prefilter once full (frontier.py falls back to the
    exact anti-join)."""

    def __init__(self, capacity: int, seed: int = 42):
        self.nbuckets = max(2, 1 << (capacity.bit_length()))
        self.table = np.zeros((self.nbuckets, 4), dtype=np.uint16)
        self.occ = np.zeros(self.nbuckets, dtype=np.int64)  # slots used/bucket
        self.seed = seed
        self.count = 0
        self.full = False

    # ------------------------------------------------------------- derive

    def _derive_key(self, key: str) -> tuple[int, int, int]:
        h = np.array([_cuckoo_hash_py(key, self.seed)], dtype=np.int64)
        fp, i1 = _cuckoo_derive(h, self.nbuckets)
        i2 = _cuckoo_alt(i1, fp, self.nbuckets)
        return int(fp[0]), int(i1[0]), int(i2[0])

    # ------------------------------------------------------------- insert

    def _place_batch(self, fp: np.ndarray, buckets: np.ndarray) -> np.ndarray:
        """Vectorized placement of (fp, bucket) pairs into free slots.
        Returns a placed-mask. Buckets keep fingerprints left-compacted
        (delete() compacts), so the next free slot index == occupancy."""
        order = np.lexsort((fp, buckets))
        fb, bb = fp[order], buckets[order]
        uniq, start, cnt = np.unique(bb, return_index=True, return_counts=True)
        rank = np.arange(len(bb)) - np.repeat(start, cnt)
        occ_b = self.occ[bb]
        ok = rank < (4 - occ_b)
        self.table[bb[ok], (occ_b + rank)[ok]] = fb[ok]
        free_u = 4 - self.occ[uniq]
        self.occ[uniq] += np.minimum(cnt, free_u)
        placed = np.zeros(len(fp), dtype=bool)
        placed[order] = ok
        self.count += int(ok.sum())
        return placed

    def _insert_one_evict(self, fp: int, i1: int) -> bool:
        """Bounded-eviction fallback for a key whose both buckets are full."""
        import random

        rng = random.Random(self.seed ^ fp)
        i2 = int(_cuckoo_alt(np.array([i1]), np.array([fp], dtype=np.uint16), self.nbuckets)[0])
        i = rng.choice((i1, i2))
        cur = fp
        for _ in range(500):
            slot = rng.randrange(4)
            cur, self.table[i][slot] = int(self.table[i][slot]), cur
            i = int(
                _cuckoo_alt(
                    np.array([i]), np.array([cur], dtype=np.uint16), self.nbuckets
                )[0]
            )
            if self.occ[i] < 4:
                self.table[i][self.occ[i]] = cur
                self.occ[i] += 1
                self.count += 1
                return True
        # the evicted `cur` fingerprint is now homeless — a resident key
        # was displaced, so the filter can no longer promise no-false-
        # negatives. Mark full; callers must stop using it as a prefilter.
        self.full = True
        return False

    def insert_many(self, fp: np.ndarray, i1: np.ndarray) -> bool:
        """Batch insert (the engine path). Phase 1/2: vectorized placement
        into primary then alternate buckets; phase 3: per-key bounded
        eviction for the residue (a tiny fraction at sane load factors).
        Returns False (and sets ``full``) if any key could not be placed."""
        if not len(fp):
            return True
        fp = np.ascontiguousarray(fp, dtype=np.uint16)
        i1 = np.ascontiguousarray(i1, dtype=np.int64)
        placed = self._place_batch(fp, i1)
        if not placed.all():
            rest_fp, rest_i1 = fp[~placed], i1[~placed]
            i2 = _cuckoo_alt(rest_i1, rest_fp, self.nbuckets)
            placed2 = self._place_batch(rest_fp, i2)
            for f, b in zip(rest_fp[~placed2], rest_i1[~placed2]):
                if not self._insert_one_evict(int(f), int(b)):
                    return False
        return True

    def insert(self, key: str) -> bool:
        fp, i1, _ = self._derive_key(key)
        return self.insert_many(
            np.array([fp], dtype=np.uint16), np.array([i1], dtype=np.int64)
        )

    # -------------------------------------------------------------- query

    def __contains__(self, key: str) -> bool:
        fp, i1, i2 = self._derive_key(key)
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    def delete(self, key: str) -> bool:
        fp, i1, i2 = self._derive_key(key)
        for i in (i1, i2):
            idx = np.where(self.table[i] == fp)[0]
            if len(idx):
                # remove + left-compact so occupancy == next free slot
                row = list(self.table[i])
                row.pop(int(idx[0]))
                row.append(0)
                self.table[i] = row
                self.occ[i] -= 1
                self.count -= 1
                return True
        return False


def _cuckoo_pairs_df(df: DataFrame, key: str | Column, nbuckets: int, seed: int):
    """Distributed (fp, bucket) pair extraction: key hash computed JVM-side
    (xxhash64 column), fingerprint/bucket derivation one vectorized numpy
    pass per Arrow batch, emitted as ONE compact binary blob per partition
    (8 bytes/key — 1M keys ≈ 8 MB on the driver, vs per-row Python before)."""
    key_col = F.col(key) if isinstance(key, str) else key
    hdf = df.select(_cuckoo_hash_col(key_col, seed).alias("h"))

    def to_pairs(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fps: list[np.ndarray] = []
        i1s: list[np.ndarray] = []
        for pdf in it:
            if not len(pdf):
                continue
            fp, i1 = _cuckoo_derive(pdf["h"].to_numpy(), nbuckets)
            fps.append(fp)
            i1s.append(i1)
        if fps:
            yield pd.DataFrame(
                {
                    "fp": [np.concatenate(fps).tobytes()],
                    "i1": [np.concatenate(i1s).astype(np.int64).tobytes()],
                }
            )

    parts = hdf.mapInPandas(to_pairs, schema="fp binary, i1 binary").collect()
    if not parts:
        return np.array([], dtype=np.uint16), np.array([], dtype=np.int64)
    fp = np.concatenate(
        [np.frombuffer(r["fp"], dtype=np.uint16) for r in parts]
    )
    i1 = np.concatenate(
        [np.frombuffer(r["i1"], dtype=np.int64) for r in parts]
    )
    # deterministic insertion order regardless of partition arrival
    order = np.lexsort((fp, i1))
    return fp[order], i1[order]


def build_cuckoo(
    df: DataFrame, key: str | Column, capacity: int, seed: int = 42
) -> "CuckooFilter":
    """Build a cuckoo filter from a key column, fully partition-wise:
    hashing is a JVM column, per-partition (fp, bucket) pairs arrive as
    compact binary blobs, and the driver does one vectorized
    ``insert_many`` — no per-row Python anywhere (mirrors build_bloom's
    shape). Unlike the bloom it supports deletion, so the engine can also
    use it for in-flight frontier windows where URLs leave the set after
    fetch."""
    cf = CuckooFilter(capacity=capacity, seed=seed)
    fp, i1 = _cuckoo_pairs_df(df, key, cf.nbuckets, seed)
    cf.insert_many(fp, i1)
    return cf


def cuckoo_add_df(
    cf: "CuckooFilter", df: DataFrame, key: str | Column
) -> bool:
    """Incrementally add a key column to an existing filter (the per-round
    frontier path). Same partition-wise shape as build_cuckoo. Returns
    False when the filter went full — the caller must then stop using it
    as a prefilter (false negatives otherwise)."""
    fp, i1 = _cuckoo_pairs_df(df, key, cf.nbuckets, cf.seed)
    return cf.insert_many(fp, i1)


def cuckoo_might_contain(
    df: DataFrame,
    key: str | Column,
    cf: "CuckooFilter",
    out: str = "__in_cuckoo",
) -> DataFrame:
    """Vectorized membership test against a broadcast cuckoo table: the key
    hash is a JVM-side xxhash64 column; fingerprint/bucket derivation and
    the two-bucket gather are numpy array ops per Arrow batch — zero
    per-row Python."""
    key_col = F.col(key) if isinstance(key, str) else key
    work = df.withColumn("__h", _cuckoo_hash_col(key_col, cf.seed))
    spark = df.sparkSession
    b_table = spark.sparkContext.broadcast(cf.table)
    nbuckets = cf.nbuckets

    from pyspark.sql.types import BooleanType, StructField, StructType

    schema = StructType(list(work.schema.fields) + [StructField(out, BooleanType())])

    def check(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        table = b_table.value
        for pdf in it:
            n = len(pdf)
            if not n:
                pdf[out] = pd.Series([], dtype=bool)
                yield pdf
                continue
            fps, i1s = _cuckoo_derive(pdf["__h"].to_numpy(), nbuckets)
            i2s = _cuckoo_alt(i1s, fps, nbuckets)
            hit = (table[i1s] == fps[:, None]).any(axis=1) | (
                table[i2s] == fps[:, None]
            ).any(axis=1)
            pdf = pdf.copy()
            pdf[out] = hit
            yield pdf

    return work.mapInPandas(check, schema=schema).drop("__h")
