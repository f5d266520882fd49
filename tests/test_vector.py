"""Packed/unpacked vector tests, incl. the reference's fixed-seed
randomized width sweep (packed_test.go:15-33: every width 1..64, random
values round-trip through Set/Get)."""

import numpy as np
import pytest

from qfspark.vector import PackedVector, UnpackedVector


@pytest.mark.parametrize("bits", list(range(1, 65)))
def test_packed_roundtrip_all_widths(bits):
    rng = np.random.RandomState(77)
    size = 100
    mask = (1 << bits) - 1
    v = PackedVector(bits, size)
    vals = rng.randint(0, 2**62, size=size).astype(np.uint64) & np.uint64(mask)
    v.scatter_or(np.arange(size), vals)
    got = v.gather(np.arange(size))
    assert np.array_equal(got, vals)
    # scalar get agrees with vector gather
    for i in range(0, size, 17):
        assert v.get(i) == int(vals[i])


@pytest.mark.parametrize("bits", [1, 7, 13, 33, 63, 64])
def test_packed_scalar_set_get(bits):
    rng = np.random.RandomState(42)
    size = 200
    mask = (1 << bits) - 1
    v = PackedVector(bits, size)
    ref = {}
    for _ in range(500):
        ix = int(rng.randint(0, size))
        val = int(rng.randint(0, 2**62)) & mask
        v.set(ix, val)
        ref[ix] = val
    for ix, val in ref.items():
        assert v.get(ix) == val
    # overwrite must clear old bits
    v.set(0, mask)
    v.set(0, 0)
    assert v.get(0) == 0


def test_packed_overflow_raises():
    v = PackedVector(4, 10)
    with pytest.raises(OverflowError):
        v.set(0, 16)
    with pytest.raises(OverflowError):
        v.scatter_or(np.array([0]), np.array([16], dtype=np.uint64))


def test_unpacked_roundtrip():
    v = UnpackedVector(63, 50)
    vals = (np.arange(50, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(1)
    v.scatter_or(np.arange(50), vals)
    assert np.array_equal(v.gather(np.arange(50)), vals)
    assert v.swap(3, 7) == int(vals[3])
    assert v.get(3) == 7


@pytest.mark.parametrize("cls,bits", [(PackedVector, 13), (UnpackedVector, 13)])
def test_vector_serde(cls, bits):
    rng = np.random.RandomState(7)
    v = cls(bits, 64)
    vals = rng.randint(0, 1 << bits, size=64).astype(np.uint64)
    v.scatter_or(np.arange(64), vals)
    payload = v.to_bytes()
    v2, consumed = cls.from_bytes(payload)
    assert consumed == len(payload)
    assert v2.bits == bits and v2.size == 64
    assert np.array_equal(v2.gather(np.arange(64)), vals)
