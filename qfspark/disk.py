"""Zero-load read-only filter files (reference Disk parity, disk.go:18-139).

``save(qf, path)`` writes the native serialization to a file;
``open_readonly(path)`` memory-maps the word arrays instead of reading
them: opening costs one header read, and a probe in ``walk`` mode touches
only the pages holding the slots it visits — the reference's
pay-per-probe ReadAt behavior (disk.go:31-72, packed.go:168-219), with
the OS page cache in place of its manual reads.

Unlike the reference, which hard-codes murmur on reopen (disk.go:69-70),
the hash name is read from our header.
"""

from __future__ import annotations

import struct

import numpy as np

from .kernel import QF
from .serde import _MAGIC, _VERSION, qf_to_bytes
from .sizing import QFConfig
from .vector import PackedVector, UnpackedVector


def save(qf: QF, path: str) -> int:
    payload = qf_to_bytes(qf)
    with open(path, "wb") as f:
        f.write(payload)
    return len(payload)


def open_any(path: str, hash_name: str = "murmur64a") -> QF:
    """Open a filter file in either the native format (memory-mapped,
    zero-load) or the go-qfext wire format (fully loaded; the Go format
    carries no hash identifier, so ``hash_name`` applies — the reference
    itself assumes murmur, disk.go:69-70)."""
    with open(path, "rb") as f:
        magic = f.read(4)
    if magic == _MAGIC:
        return open_readonly(path)
    from .serde import qf_from_gqf_bytes

    with open(path, "rb") as f:
        return qf_from_gqf_bytes(f.read(), hash_name=hash_name)


def read_header_from_path(path: str) -> dict:
    """Peek header only (reference ReadHeaderFromPath, serialize.go:38-49)."""
    from .serde import read_header

    with open(path, "rb") as f:
        return read_header(f.read(64))


def open_readonly(path: str) -> QF:
    """Open a serialized filter without loading it: word arrays are
    memory-mapped read-only. Lookups work as usual; use
    ``lookup_hashes(..., mode='walk')`` to keep the pay-per-probe
    property (``'index'`` mode decodes the whole filter once, which
    faults in every page — the equivalent of a full load)."""
    with open(path, "rb") as f:
        head = f.read(struct.calcsize("<4sHBBBBHQ"))
        magic, version, flags, q_bits, counter_bits, hlen, _, entries = (
            struct.unpack("<4sHBBBBHQ", head)
        )
        if magic != _MAGIC:
            raise ValueError(f"bad magic {magic!r}; not a qfspark filter file")
        if version != _VERSION:
            raise ValueError(f"unsupported version {version}")
        hash_name = f.read(hlen).decode("ascii")
        offset = f.tell()
    bit_packed = bool(flags & 1)
    cfg = QFConfig(
        counter_bits=counter_bits, bit_packed=bit_packed,
        hash_name=hash_name, q_bits=q_bits,
    )
    qf = QF(cfg)
    cls = PackedVector if bit_packed else UnpackedVector

    def _mmap_vector(off: int, bits: int, size: int):
        with open(path, "rb") as f:
            f.seek(off)
            (nwords,) = struct.unpack("<Q", f.read(8))
        words = np.memmap(path, dtype="<u8", mode="r", offset=off + 8,
                          shape=(nwords,))
        vec = cls.__new__(cls)
        vec.bits = bits
        vec.size = size
        vec.words = words
        vec.mask = (
            np.uint64(0xFFFFFFFFFFFFFFFF)
            if bits == 64
            else np.uint64((1 << bits) - 1)
        )
        return vec, off + 8 + nwords * 8

    # serde vector sections are (u64 word count + raw words); geometry
    # (bits,size) is derived from the filter header
    qf.filter, offset = _mmap_vector(offset, 3 + qf.r_bits, qf.size)
    if counter_bits > 0:
        qf.storage, offset = _mmap_vector(offset, counter_bits, qf.size)
    qf.entries = entries
    return qf
