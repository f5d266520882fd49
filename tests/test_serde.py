"""Serialization round-trip tests (reference TestSerialization /
TestSerializationExternal, qf_test.go:368-431), for both the native and the
go-qfext-compatible wire formats, both storage variants."""

import struct

import numpy as np
import pytest

from qfspark import QF, QFConfig
from qfspark.serde import (
    qf_from_bytes,
    qf_from_gqf_bytes,
    qf_to_bytes,
    qf_to_gqf_bytes,
    read_header,
)

from .corpus import TEST_STRINGS


@pytest.mark.parametrize("bit_packed", [False, True])
@pytest.mark.parametrize("counter_bits", [0, 15])
def test_native_roundtrip(bit_packed, counter_bits):
    cfg = QFConfig(
        counter_bits=counter_bits, bit_packed=bit_packed, expected_entries=300
    )
    qf = QF.from_keys(TEST_STRINGS, config=cfg)
    payload = qf_to_bytes(qf)
    qf2 = qf_from_bytes(payload)
    assert qf2 == qf
    for s in TEST_STRINGS:
        assert qf2.contains(s)
    if counter_bits:
        from collections import Counter

        for s, n in Counter(TEST_STRINGS).items():
            assert qf2.lookup(s) == (True, n)
    # and re-serializing is byte-identical
    assert qf_to_bytes(qf2) == payload


@pytest.mark.parametrize("bit_packed", [False, True])
@pytest.mark.parametrize("counter_bits", [0, 15])
def test_gqf_roundtrip(bit_packed, counter_bits):
    cfg = QFConfig(
        counter_bits=counter_bits, bit_packed=bit_packed, expected_entries=300
    )
    qf = QF.from_keys(TEST_STRINGS, config=cfg)
    payload = qf_to_gqf_bytes(qf)
    qf2 = qf_from_gqf_bytes(payload)
    assert qf2 == qf


def test_gqf_header_layout_matches_reference():
    """The go-qfext header is 4 little-endian uint64s + 1 bool byte
    (serialize.go:19-34 via binary.Write): Version=0x0004, Entries,
    QBits, StorageBits, BitPacked."""
    qf = QF.from_keys(["x", "y"], config=QFConfig(counter_bits=9, q_bits=5))
    payload = qf_to_gqf_bytes(qf)
    version, entries, qbits, sbits = struct.unpack_from("<QQQQ", payload, 0)
    bitpacked = payload[32]
    assert version == 0x0004
    assert entries == 2
    assert qbits == 5
    assert sbits == 9
    assert bitpacked == 0
    # unpacked filter vector follows: u64 word count == 2^q, then words
    (nwords,) = struct.unpack_from("<Q", payload, 33)
    assert nwords == 32


def test_header_peek():
    qf = QF.from_keys(TEST_STRINGS, config=QFConfig(counter_bits=7, hash_name="murmur64a"))
    h = read_header(qf_to_bytes(qf))
    assert h["entries"] == qf.entries
    assert h["q_bits"] == qf.q_bits
    assert h["counter_bits"] == 7
    assert h["hash_name"] == "murmur64a"
    assert h["r_bits"] == 64 - qf.q_bits


def test_hash_name_travels():
    qf = QF.from_keys(["a", "b"], config=QFConfig(hash_name="xxhash64"))
    qf2 = qf_from_bytes(qf_to_bytes(qf))
    assert qf2.config.hash_name == "xxhash64"
    assert qf2.contains("a") and qf2.contains("b")


def test_bad_magic_rejected():
    with pytest.raises(ValueError):
        qf_from_bytes(b"XXXX" + b"\0" * 40)


def test_corrupt_payload_clean_errors():
    """Truncated or corrupt payloads fail at parse time with ValueError,
    not as numpy IndexErrors mid-probe."""
    import pytest

    from qfspark.kernel import QF
    from qfspark.serde import qf_from_bytes, qf_to_bytes
    from qfspark.sizing import QFConfig

    qf = QF.from_keys([f"k{i}" for i in range(1000)],
                      config=QFConfig(counter_bits=8))
    blob = qf_to_bytes(qf)

    with pytest.raises(ValueError):
        qf_from_bytes(blob[: len(blob) // 2])  # truncated vector bytes

    # corrupt the filter vector's word-count field (right after header)
    import struct

    hdr = struct.calcsize("<4sHBBBBHQ") + len(qf.config.hash_name)
    bad = bytearray(blob)
    struct.pack_into("<Q", bad, hdr, 7)  # absurd word count
    with pytest.raises(ValueError, match="words"):
        qf_from_bytes(bytes(bad))

    with pytest.raises(ValueError):
        qf_from_bytes(b"garbage-not-a-filter")

    # payloads SHORTER than the fixed header must also raise ValueError
    # (pre-0.4.0: a bare struct.error callers can't tell from a bug)
    for bad_short in (b"", b"garbage", blob[:19]):
        with pytest.raises(ValueError, match="too short"):
            qf_from_bytes(bad_short)


def test_gqf_geometry_validation():
    import struct

    import pytest

    from qfspark.kernel import QF
    from qfspark.serde import qf_from_gqf_bytes, qf_to_gqf_bytes
    from qfspark.sizing import QFConfig

    qf = QF.from_keys([f"k{i}" for i in range(500)],
                      config=QFConfig(counter_bits=4, bit_packed=True,
                                      hash_name="murmur64a"))
    blob = bytearray(qf_to_gqf_bytes(qf))
    # tamper with the packed section's size field (header offset 33 + 16)
    hdr = struct.calcsize("<QQQQ?")
    struct.pack_into("<Q", blob, hdr + 16, 12345)
    with pytest.raises(ValueError, match="geometry"):
        qf_from_gqf_bytes(bytes(blob))
