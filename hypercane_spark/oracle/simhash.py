"""Pure-Python XXH64 + simhash matching the Spark expressions bit-for-bit.

Spark's ``xxhash64`` is XXH64 over UTF-8 bytes with seed 42 (public
algorithm, spec at github.com/Cyan4973/xxHash). The simhash here mirrors
functions/hashes.py:simhash_of_tokens exactly: per-token XXH64, ±1 votes
per bit, bit set iff votes > 0, signed-64 representation.
"""

from __future__ import annotations

_M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * P2) & _M
    return (_rotl(acc, 31) * P1) & _M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * P1 + P4) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & _M
        v2 = (seed + P2) & _M
        v3 = seed & _M
        v4 = (seed - P1) & _M
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & _M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * P1) & _M
        h = (_rotl(h, 23) * P2 + P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * P5) & _M
        h = (_rotl(h, 11) * P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * P2) & _M
    h ^= h >> 29
    h = (h * P3) & _M
    h ^= h >> 32
    return h


def _signed(v: int) -> int:
    return v - (1 << 64) if v >= 1 << 63 else v


def xxhash64_str(s: str, seed: int = 42) -> int:
    """Spark-compatible: signed-64 XXH64 of the UTF-8 bytes, seed 42."""
    return _signed(xxh64(s.encode("utf-8"), seed))


def _tokens(text: str) -> list[str]:
    return [t for t in text.lower().split() if t]


def simhash_of_tokens(tokens: list[str]) -> int:
    votes = [0] * 64
    for t in tokens:
        h = xxhash64_str(t) & _M
        for i in range(64):
            votes[i] += 1 if (h >> i) & 1 else -1
    v = 0
    for i in range(64):
        if votes[i] > 0:
            v |= 1 << i
    return _signed(v)


def py_simhash64(text: str) -> int:
    return simhash_of_tokens(_tokens(text))


def py_tf_simhash64(text: str) -> int:
    return simhash_of_tokens(sorted(_tokens(text)))


def py_simhash64_md5(text: str) -> int:
    """Pure-Python mirror of functions/hashes.py:simhash64_md5."""
    import hashlib

    votes = [0] * 64
    for t in _tokens(text):
        h = hashlib.md5(t.encode("utf-8")).hexdigest()
        hi = int(h[16:24], 16)
        lo = int(h[24:32], 16)
        for i in range(64):
            b = (lo >> i) & 1 if i < 32 else (hi >> (i - 32)) & 1
            votes[i] += 1 if b else -1
    v = sum((1 << i) for i in range(63) if votes[i] > 0)
    if votes[63] > 0:
        v -= 1 << 63
    return v
