"""Independent scalar oracle implementations for differential testing.

These are written directly from the published algorithm specs (MurmurHash64A,
FNV-64, XXH64) in plain Python big-int arithmetic — deliberately a different
implementation style from qfspark.hashing's vectorized numpy versions, so a
bug in one is unlikely to be mirrored in the other. This plays the role of
the reference's cross-validation against the independent go-murmur library
(qf_test.go:443-470).
"""

MASK64 = (1 << 64) - 1


def murmur64a_scalar(data: bytes, seed: int = 0) -> int:
    m = 0xC6A4A7935BD1E995
    r = 47
    h = (seed ^ ((len(data) * m) & MASK64)) & MASK64
    n8 = len(data) // 8
    for i in range(n8):
        k = int.from_bytes(data[i * 8 : i * 8 + 8], "little")
        k = (k * m) & MASK64
        k ^= k >> r
        k = (k * m) & MASK64
        h ^= k
        h = (h * m) & MASK64
    tail = data[n8 * 8 :]
    if tail:
        h ^= int.from_bytes(tail, "little")
        h = (h * m) & MASK64
    h ^= h >> r
    h = (h * m) & MASK64
    h ^= h >> r
    return h


def fnv_scalar(data: bytes) -> int:
    """FNV-64 in the multiply-then-xor order the reference uses
    (hash.go:14-22)."""
    h = 14695981039346656037
    for c in data:
        h = (h * 1099511628211) & MASK64
        h ^= c
    return h


_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def xxh64_scalar(data: bytes, seed: int = 0) -> int:
    n = len(data)
    off = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & MASK64
        v2 = (seed + _P2) & MASK64
        v3 = seed & MASK64
        v4 = (seed - _P1) & MASK64

        def rnd(acc, lane):
            acc = (acc + lane * _P2) & MASK64
            return (_rotl(acc, 31) * _P1) & MASK64

        while off + 32 <= n:
            v1 = rnd(v1, int.from_bytes(data[off : off + 8], "little"))
            v2 = rnd(v2, int.from_bytes(data[off + 8 : off + 16], "little"))
            v3 = rnd(v3, int.from_bytes(data[off + 16 : off + 24], "little"))
            v4 = rnd(v4, int.from_bytes(data[off + 24 : off + 32], "little"))
            off += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK64
        for v in (v1, v2, v3, v4):
            k = (_rotl((v * _P2) & MASK64, 31) * _P1) & MASK64
            h = (((h ^ k) * _P1) + _P4) & MASK64
    else:
        h = (seed + _P5) & MASK64
    h = (h + n) & MASK64
    while off + 8 <= n:
        k = int.from_bytes(data[off : off + 8], "little")
        k = (_rotl((k * _P2) & MASK64, 31) * _P1) & MASK64
        h ^= k
        h = ((_rotl(h, 27) * _P1) + _P4) & MASK64
        off += 8
    if off + 4 <= n:
        k = int.from_bytes(data[off : off + 4], "little")
        h ^= (k * _P1) & MASK64
        h = ((_rotl(h, 23) * _P2) + _P3) & MASK64
        off += 4
    while off < n:
        h ^= (data[off] * _P5) & MASK64
        h = (_rotl(h, 11) * _P1) & MASK64
        off += 1
    h ^= h >> 33
    h = (h * _P2) & MASK64
    h ^= h >> 29
    h = (h * _P3) & MASK64
    h ^= h >> 32
    return h
