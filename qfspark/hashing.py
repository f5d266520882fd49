"""Vectorized 64-bit hash functions over batches of byte-string keys.

The reference uses scalar Go implementations (murmur64A: hash.go:30-79,
fnv: hash.go:14-22, pluggable via HashFn: hash.go:6, config.go:30-35).
Here every function is *batch* oriented: it takes a sequence of keys and
returns a ``numpy.ndarray(dtype=uint64)`` of hashes, computed with numpy
u64 arithmetic (wrapping multiply/xor/shift) so that a batch of a million
keys is hashed without per-row Python.

``xxhash64`` implements standard XXH64; with ``seed=42`` it matches Spark's
built-in ``F.xxhash64`` on string/binary columns, which lets the Spark
build pipeline compute hashes entirely JVM-side (whole-stage codegen) and
hand only uint64 hashes to the Python kernel.

All loops below iterate over *byte positions* (bounded by the longest key
in the batch), never over rows — each iteration is a vectorized operation
across the whole batch.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np

U64 = np.uint64

# murmur64A mixing constants (public MurmurHash64A algorithm; same values
# as reference hash.go:25-28)
_MUR_M = U64(0xC6A4A7935BD1E995)
_MUR_R = U64(47)

# FNV constants (reference hash.go:9-12)
_FNV_OFFSET = U64(14695981039346656037)
_FNV_PRIME = U64(1099511628211)

# XXH64 primes (public xxHash spec)
_XX_P1 = U64(11400714785074694791)
_XX_P2 = U64(14029467366897019727)
_XX_P3 = U64(1609587929392839161)
_XX_P4 = U64(9650029242287828579)
_XX_P5 = U64(2870177450012600261)


def _as_bytes_list(keys: Iterable) -> list[bytes]:
    """Normalize any sequence of str/bytes (incl. pandas Series) to a list
    of byte strings (str is UTF-8 encoded, matching Spark's string bytes).
    Fallback path only — ``_flat_offsets`` ingests via Arrow when it can."""
    out = []
    for k in keys:
        if isinstance(k, bytes):
            out.append(k)
        elif isinstance(k, bytearray) or isinstance(k, memoryview):
            out.append(bytes(k))
        elif isinstance(k, str):
            out.append(k.encode("utf-8"))
        elif k is None:
            out.append(b"")
        else:
            raise TypeError(f"unsupported key type {type(k)!r}")
    return out


def _flat_offsets(keys) -> tuple[np.ndarray, np.ndarray]:
    """(flat uint8 byte buffer, int64 offsets[n+1]) for a batch of keys,
    with NO per-key Python on the common paths: pandas Series / lists of
    str or bytes go through ``pyarrow.array`` (one C pass; UTF-8 bytes
    exactly as Spark sees them) and the Arrow offsets/data buffers are
    reinterpreted zero-copy. Mixed or exotic inputs fall back to the
    per-key normalizer. None hashes as the empty key."""
    import pyarrow as pa

    arr = None
    try:
        if isinstance(keys, pa.Array):
            arr = keys
        elif isinstance(keys, pa.ChunkedArray):
            arr = keys.combine_chunks()
        else:
            arr = pa.array(keys)
        if pa.types.is_string(arr.type) or pa.types.is_binary(arr.type):
            arr = arr.cast(pa.large_binary())
        elif pa.types.is_large_string(arr.type):
            arr = arr.cast(pa.large_binary())
        elif not pa.types.is_large_binary(arr.type):
            arr = None  # ints/floats/etc: not byte keys
    except (pa.ArrowInvalid, pa.ArrowTypeError, pa.ArrowNotImplementedError):
        arr = None
    if arr is not None:
        if arr.null_count:
            arr = arr.fill_null(b"")
        if isinstance(arr, pa.ChunkedArray):  # fill_null may re-chunk
            arr = arr.combine_chunks()
        buffers = arr.buffers()
        offsets = np.frombuffer(buffers[1], dtype=np.int64,
                                count=len(arr) + 1, offset=arr.offset * 8)
        data = (np.frombuffer(buffers[2], dtype=np.uint8)
                if buffers[2] is not None else np.zeros(0, np.uint8))
        return data, offsets.astype(np.int64, copy=False)

    byte_list = _as_bytes_list(keys)
    lengths = np.fromiter((len(b) for b in byte_list), dtype=np.int64,
                          count=len(byte_list))
    offsets = np.zeros(len(byte_list) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    flat = (np.frombuffer(b"".join(byte_list), dtype=np.uint8)
            if offsets[-1] else np.zeros(0, np.uint8))
    return flat, offsets


def _bucketed_hash(core, flat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Run a (buf, lengths) hash core over length-bucketed packed rows.

    Rows are grouped by power-of-two padded width (>= 8), so the padded
    matrix for each bucket is at most ~2x its payload bytes — one 10 kB
    outlier key no longer inflates the whole batch's matrix to
    (n x 10 kB) (the round-1 OOM hazard). The zero padding is
    load-bearing: tail handling reads whole little-endian words and
    relies on bytes past each key's length being 0."""
    lengths = np.diff(offsets)
    n = len(lengths)
    out = np.empty(n, dtype=U64)
    if n == 0:
        return out
    # power-of-two width class, minimum 8 (one LE word)
    cls = np.maximum(
        8, (1 << np.ceil(np.log2(np.maximum(lengths, 1))).astype(np.int64)))
    for w in np.unique(cls):
        rows = np.flatnonzero(cls == w)
        l = lengths[rows]
        nr = len(rows)
        w = int(w)
        base = offsets[rows]
        if nr >= w // 8 and int(l.sum()):
            # wide bucket of short keys: gather one 8-byte window per
            # WORD column (w/8 gathers total), then mask the padding
            # bytes per word with u64 bit ops — temps stay O(rows),
            # never O(total bytes)
            pad = np.zeros(len(flat) + w, dtype=np.uint8)
            pad[:len(flat)] = flat
            sw = np.lib.stride_tricks.sliding_window_view(pad, 8)
            buf = np.empty((nr, w), dtype=np.uint8)
            for j in range(w // 8):
                buf[:, 8 * j:8 * j + 8] = sw[base + 8 * j]
            wv = buf.view("<u8")
            ones = np.uint64(0xFFFFFFFFFFFFFFFF)
            with np.errstate(over="ignore"):
                for j in range(w // 8):
                    valid = np.clip(l - 8 * j, 0, 8).astype(np.uint64)
                    mask = np.where(
                        valid >= 8, ones,
                        (np.uint64(1) << (valid * np.uint64(8))) - np.uint64(1))
                    wv[:, j] &= mask
        else:
            # few (possibly very long) keys: per-row contiguous memcpy.
            # NOTE: core time for a multi-megabyte key is dominated by
            # the per-word python loop (sequential hash chains cannot
            # vectorize within a key) — keys are urls/shingles in this
            # engine; keep the murmur/fnv interop path to keys <~64 kB
            buf = np.zeros((nr, w), dtype=np.uint8)
            for i in range(nr):
                s, ln = int(base[i]), int(l[i])
                buf[i, :ln] = flat[s:s + ln]
        out[rows] = core(buf, l)
    return out


def murmur64a(keys: Iterable, seed: int = 0) -> np.ndarray:
    """Batch MurmurHash64A (seed 0 default, as the reference uses).

    Bit-exact with the reference's inlined scalar version (hash.go:30-79):
    full 8-byte little-endian chunks are mixed with M/R, the 1..7-byte tail
    is XORed in as a zero-padded LE word, then the 3-step finalizer runs.
    """
    flat, offsets = _flat_offsets(keys)
    return _bucketed_hash(lambda b, l: _murmur_core(b, l, seed), flat, offsets)


def _murmur_core(buf: np.ndarray, lengths: np.ndarray, seed: int) -> np.ndarray:
    n = len(lengths)
    words = buf.view("<u8")
    with np.errstate(over="ignore"):
        h = (U64(seed) ^ (lengths.astype(U64) * _MUR_M)).astype(U64)
        if n == 0:
            return h
        nfull = lengths // 8
        for j in range(int(nfull.max())):
            act = np.flatnonzero(nfull > j)
            if act.size == 0:
                break
            k = words[act, j].copy()
            k *= _MUR_M
            k ^= k >> _MUR_R
            k *= _MUR_M
            hj = h[act]
            hj ^= k
            hj *= _MUR_M
            h[act] = hj
        tail_len = lengths % 8
        tr = np.flatnonzero(tail_len > 0)
        if tr.size:
            tw = words[tr, lengths[tr] // 8]  # zero-padded LE tail word
            ht = h[tr]
            ht ^= tw
            ht *= _MUR_M
            h[tr] = ht
        h ^= h >> _MUR_R
        h *= _MUR_M
        h ^= h >> _MUR_R
    return h


def fnv1a(keys: Iterable) -> np.ndarray:
    """Batch FNV-64 in the reference's variant (multiply-then-xor per byte,
    i.e. classic FNV-1; reference hash.go:14-22 names it ``fnvhash``)."""
    flat, offsets = _flat_offsets(keys)
    return _bucketed_hash(_fnv_core, flat, offsets)


def _fnv_core(buf: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    n = len(lengths)
    h = np.full(n, _FNV_OFFSET, dtype=U64)
    with np.errstate(over="ignore"):
        for j in range(int(lengths.max()) if n else 0):
            act = np.flatnonzero(lengths > j)
            if act.size == 0:
                break
            hj = h[act]
            hj *= _FNV_PRIME
            hj ^= buf[act, j].astype(U64)
            h[act] = hj
    return h


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = U64(r)
    return (x << r) | (x >> (U64(64) - r))


def xxhash64(keys: Iterable, seed: int = 42) -> np.ndarray:
    """Batch standard XXH64. Default ``seed=42`` matches Spark's built-in
    ``F.xxhash64`` over string/binary columns (verified in tests), so a
    filter built from Spark-computed hashes can be probed from plain
    Python and vice versa."""
    flat, offsets = _flat_offsets(keys)
    return _bucketed_hash(lambda b, l: _xxhash_core(b, l, seed),
                          flat, offsets)


def _xxhash_core(buf: np.ndarray, lengths: np.ndarray, seed) -> np.ndarray:
    n = len(lengths)
    if n == 0:
        return np.zeros(0, dtype=U64)
    words = buf.view("<u8")
    dwords = buf.view("<u4")
    seed = U64(seed)
    with np.errstate(over="ignore"):
        n32 = lengths // 32
        has_stripes = n32 > 0
        v1 = np.full(n, seed + _XX_P1 + _XX_P2, dtype=U64)
        v2 = np.full(n, seed + _XX_P2, dtype=U64)
        v3 = np.full(n, seed, dtype=U64)
        v4 = np.full(n, seed - _XX_P1, dtype=U64)
        for s in range(int(n32.max())):
            act = np.flatnonzero(n32 > s)
            if act.size == 0:
                break
            base = s * 4
            for vi, lane in ((v1, 0), (v2, 1), (v3, 2), (v4, 3)):
                acc = vi[act]
                acc += words[act, base + lane] * _XX_P2
                acc = _rotl(acc, 31)
                acc *= _XX_P1
                vi[act] = acc

        def _merge(h: np.ndarray, v: np.ndarray) -> np.ndarray:
            k = _rotl(v * _XX_P2, 31) * _XX_P1
            return (h ^ k) * _XX_P1 + _XX_P4

        h_stripes = _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        h_stripes = _merge(h_stripes, v1)
        h_stripes = _merge(h_stripes, v2)
        h_stripes = _merge(h_stripes, v3)
        h_stripes = _merge(h_stripes, v4)
        h = np.where(has_stripes, h_stripes, seed + _XX_P5).astype(U64)
        h += lengths.astype(U64)

        # up to three full 8-byte words after the 32-byte stripes
        word_off = n32 * 4
        n8 = (lengths - n32 * 32) // 8
        for j in range(3):
            act = np.flatnonzero(n8 > j)
            if act.size == 0:
                break
            k = words[act, word_off[act] + j] * _XX_P2
            k = _rotl(k, 31) * _XX_P1
            hj = h[act]
            hj ^= k
            hj = _rotl(hj, 27) * _XX_P1 + _XX_P4
            h[act] = hj

        # one 4-byte chunk
        word_off = word_off + n8
        rem = lengths - n32 * 32 - n8 * 8
        act4 = np.flatnonzero(rem >= 4)
        if act4.size:
            dw = dwords[act4, word_off[act4] * 2].astype(U64)
            hj = h[act4]
            hj ^= dw * _XX_P1
            hj = _rotl(hj, 23) * _XX_P2 + _XX_P3
            h[act4] = hj

        # trailing bytes
        byte_off = word_off * 8 + np.where(rem >= 4, 4, 0)
        nb = rem - np.where(rem >= 4, 4, 0)
        for j in range(3):
            act = np.flatnonzero(nb > j)
            if act.size == 0:
                break
            b = buf[act, byte_off[act] + j].astype(U64)
            hj = h[act]
            hj ^= b * _XX_P5
            hj = _rotl(hj, 11) * _XX_P1
            h[act] = hj

        h ^= h >> U64(33)
        h *= _XX_P2
        h ^= h >> U64(29)
        h *= _XX_P3
        h ^= h >> U64(32)
    return h


#: Registry of named hash functions; the name is carried in filter/shard
#: metadata so a serialized filter knows its hash (unlike the reference,
#: which hard-codes murmur when reopening from disk, disk.go:69-70).
HASH_FNS = {
    "murmur64a": murmur64a,
    "fnv1a": fnv1a,
    "xxhash64": xxhash64,
}

#: Names of the hashes that ship with the library; anything else in
#: HASH_FNS arrived through register_hash().
BUILTIN_HASHES = frozenset(HASH_FNS)


def register_hash(name: str, fn, overwrite: bool = False) -> None:
    """Register a user-supplied batch hash under ``name`` — the extension
    point matching the reference's arbitrary ``HashFn`` config field
    (hash.go:6, config.go:30-35), with one deliberate difference: the
    NAME travels in every serialized filter header, so a filter built
    with a custom hash refuses to answer key probes in a process that
    has not registered the same name (clear ValueError from
    ``hash_bytes``) instead of silently probing with the wrong hash
    (the reference hard-codes murmur on reopen, disk.go:69-70).

    ``fn`` must take an iterable of str/bytes keys and return a uint64
    numpy array of the same length (hash over the UTF-8 bytes of str
    keys, to stay consistent with the built-ins). On a cluster, register
    the hash at import time in a module shipped via ``--py-files`` so
    every executor process knows it.
    """
    if not name or not name.isascii():
        raise ValueError(f"hash name must be non-empty ASCII, got {name!r}")
    if not callable(fn):
        raise TypeError(f"hash fn must be callable, got {type(fn)!r}")
    if name in HASH_FNS and not overwrite:
        raise ValueError(
            f"hash {name!r} is already registered; pass overwrite=True "
            f"to replace it" + (" (built-in)" if name in BUILTIN_HASHES else "")
        )
    probe = fn(["qfspark-register-probe", b"bytes-key"])
    arr = np.asarray(probe)
    if arr.dtype != np.uint64 or arr.shape != (2,):
        raise ValueError(
            f"hash {name!r} must map a batch of keys to a uint64 array of "
            f"the same length; probe returned dtype={arr.dtype}, "
            f"shape={arr.shape}")
    HASH_FNS[name] = fn


def hash_bytes(keys: Iterable, hash_name: str = "murmur64a") -> np.ndarray:
    """Hash a batch of keys with a registered hash. Returns uint64 array."""
    try:
        fn = HASH_FNS[hash_name]
    except KeyError:
        raise ValueError(
            f"unknown hash {hash_name!r}; expected one of {sorted(HASH_FNS)}"
        ) from None
    return fn(keys)
