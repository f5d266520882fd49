"""Hash function tests: differential vs independent scalar oracles plus
known public test vectors (the reference's technique: qf_test.go:443-470
cross-validates against an independent murmur implementation)."""

import random

import numpy as np
import pytest

from qfspark.hashing import fnv1a, hash_bytes, murmur64a, xxhash64

from .corpus import TEST_STRINGS
from .reference_impls import fnv_scalar, murmur64a_scalar, xxh64_scalar


def _random_byte_strings(seed: int, n: int, max_len: int = 100):
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        ln = rng.randrange(0, max_len)
        out.append(bytes(rng.randrange(256) for _ in range(ln)))
    return out


def test_murmur_known_vectors():
    # MurmurHash64A(seed=0) of the empty string is 0
    assert murmur64a([b""])[0] == 0
    # all 8 tail lengths + a multi-chunk string
    keys = [b"a", b"ab", b"abc", b"abcd", b"abcde", b"abcdef", b"abcdefg",
            b"abcdefgh", b"abcdefghi", b"the quick brown fox jumps over the lazy dog"]
    got = murmur64a(keys)
    want = [murmur64a_scalar(k) for k in keys]
    assert [int(x) for x in got] == want


def test_murmur_matches_scalar_oracle_on_corpus():
    got = murmur64a(TEST_STRINGS)
    want = [murmur64a_scalar(s.encode("utf-8")) for s in TEST_STRINGS]
    assert [int(x) for x in got] == want


def test_murmur_matches_scalar_oracle_random():
    keys = _random_byte_strings(7, 500, 130)
    got = murmur64a(keys)
    want = [murmur64a_scalar(k) for k in keys]
    assert [int(x) for x in got] == want


def test_fnv_matches_scalar_oracle():
    keys = _random_byte_strings(8, 300, 50) + [b"", b"hello"]
    got = fnv1a(keys)
    want = [fnv_scalar(k) for k in keys]
    assert [int(x) for x in got] == want


def test_xxhash64_known_vectors():
    # public XXH64 vectors
    assert int(xxhash64([b""], seed=0)[0]) == 0xEF46DB3751D8E999


@pytest.mark.parametrize("seed", [0, 42, 123456789])
def test_xxhash64_matches_scalar_oracle(seed):
    keys = _random_byte_strings(seed + 1, 400, 150) + [
        b"", b"a", b"abcd", b"abcdefgh",
        bytes(range(31)), bytes(range(32)), bytes(range(33)),
        bytes(range(63)), bytes(range(64)), bytes(range(65)),
        bytes(range(256)) * 3,
    ]
    got = xxhash64(keys, seed=seed)
    want = [xxh64_scalar(k, seed) for k in keys]
    assert [int(x) for x in got] == want


def test_hash_bytes_registry():
    (h1,) = hash_bytes(["hello"], "murmur64a")
    assert int(h1) == murmur64a_scalar(b"hello")
    with pytest.raises(ValueError):
        hash_bytes(["x"], "nope")


def test_str_and_bytes_agree():
    s = ["café", "’m", "plain"]
    b = [x.encode("utf-8") for x in s]
    assert np.array_equal(murmur64a(s), murmur64a(b))
    assert np.array_equal(xxhash64(s), xxhash64(b))


def test_empty_batch():
    assert murmur64a([]).shape == (0,)
    assert xxhash64([]).shape == (0,)
    assert fnv1a([]).shape == (0,)
