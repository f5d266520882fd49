"""Kernel tests, mirroring the reference's test strategy (SURVEY.md §5):

* checkConsistency invariants (qf_test.go:20-56),
* TestBasic / TestDoubling (qf_test.go:334-366),
* TestExternalStorage exact values (qf_test.go:472-499),
* eachHashValue differential vs independently computed hashes
  (qf_test.go:443-470),
* plus qfspark-specific guarantees: bulk build is byte-identical to the
  incremental shifting insert, probe modes agree, FP rate is bounded.
"""

import random

import numpy as np
import pytest

from qfspark import QF, QFConfig
from qfspark.hashing import murmur64a

from .corpus import TEST_STRINGS
from .reference_impls import murmur64a_scalar

U64 = np.uint64
_OCC, _CONT, _SHIFT, _META = 1, 2, 4, 7


def check_consistency(qf: QF) -> None:
    """Invariant checker re-derived from the reference's test-only
    checkConsistency (qf_test.go:20-56)."""
    assert qf.count_entries() == qf.entries, "entry count != occupancy scan"
    sv = qf.filter.gather(np.arange(qf.size, dtype=np.int64))
    used = (sv & U64(_META)) != 0
    occupied = (sv & U64(_OCC)) != 0
    cont = (sv & U64(_CONT)) != 0
    n_runs = int(np.count_nonzero(used & ~cont))
    assert n_runs == int(np.count_nonzero(occupied)), (
        "number of runs != number of occupied quotients"
    )
    # an empty slot can never be marked continuation or shifted
    assert not np.any(~used & ((sv & U64(_CONT | _SHIFT)) != 0))
    # decode must reproduce exactly `entries` hashes and rebuild identically
    hv, counts = qf.decode(sort=True)
    assert len(hv) == qf.entries
    assert len(np.unique(hv)) == len(hv), "decoded hashes must be unique"
    rebuilt = QF.from_hashes(hv, counts, qf.config)
    if rebuilt.q_bits == qf.q_bits:
        assert np.array_equal(rebuilt.filter.words, qf.filter.words), (
            "decode->rebuild is not canonical"
        )


@pytest.mark.parametrize("bit_packed", [False, True])
def test_basic_insert_contains(bit_packed):
    """Insert-then-contains after every insert (reference TestBasic)."""
    cfg = QFConfig(bit_packed=bit_packed)
    qf = QF(cfg)
    inserted = set()
    for s in TEST_STRINGS:
        expect_update = s in inserted
        got_update = qf.insert(s)
        assert got_update == expect_update, s
        inserted.add(s)
        assert qf.contains(s)
    assert qf.entries == len(inserted)
    check_consistency(qf)
    for s in TEST_STRINGS:
        assert qf.contains(s)


def test_doubling_preserves_everything():
    """Unsized filter grows on demand (reference TestDoubling)."""
    qf = QF(QFConfig(counter_bits=8))
    seen = {}
    for i, s in enumerate(TEST_STRINGS):
        qf.insert_hash(int(murmur64a([s])[0]), 1, add=True)
        seen[s] = seen.get(s, 0) + 1
        if i % 37 == 0:
            check_consistency(qf)
    check_consistency(qf)
    for s, n in seen.items():
        found, cnt = qf.lookup(s)
        assert found and cnt == n, (s, n, cnt)


@pytest.mark.parametrize("bit_packed", [False, True])
@pytest.mark.parametrize("counter_bits", [0, 15])
def test_bulk_build_matches_incremental(bit_packed, counter_bits):
    """THE canonical-layout theorem test: the vectorized sorted bulk build
    must produce a byte-identical filter to the reference-style sequential
    shifting insert over the same hash multiset."""
    rng = random.Random(1234)
    n = 3000
    # random hashes with some clustering to force long runs + wraparound
    hashes = []
    for _ in range(n):
        if rng.random() < 0.3:
            # cluster hot quotients, including table-end wraparound zone
            q = rng.choice([0, 1, 2, 4093, 4094, 4095, 2048])
            hashes.append((q << 52) | rng.getrandbits(52))
        else:
            hashes.append(rng.getrandbits(64))
    hashes = np.array(hashes, dtype=U64)

    cfg = QFConfig(
        counter_bits=counter_bits,
        bit_packed=bit_packed,
        expected_entries=n,
        q_bits=12,
    )
    bulk = QF.from_hashes(hashes, None, cfg)

    incr = QF(cfg)
    for hv in hashes.tolist():
        if counter_bits:
            incr.insert_hash(int(hv), 1, add=True)
        else:
            incr.insert_hash(int(hv))

    assert bulk.q_bits == incr.q_bits
    assert bulk.entries == incr.entries
    assert np.array_equal(bulk.filter.words, incr.filter.words), (
        "bulk layout differs from incremental shifting insert"
    )
    if counter_bits:
        assert np.array_equal(bulk.storage.words, incr.storage.words)
    check_consistency(bulk)


def test_decode_differential_vs_independent_hashes():
    """Reference TestCheckHashes: the set of hashes enumerated from the
    filter must equal the murmur hashes computed independently."""
    qf = QF.from_keys(TEST_STRINGS, config=QFConfig(expected_entries=300))
    want = sorted({murmur64a_scalar(s.encode("utf-8")) for s in TEST_STRINGS})
    got = qf.hashes().tolist()
    assert got == want


@pytest.mark.parametrize("mode", ["index", "walk"])
def test_probe_modes_agree_and_no_false_negatives(mode):
    rng = random.Random(99)
    keys = [f"key-{i}" for i in range(5000)]
    qf = QF.from_keys(keys, config=QFConfig(expected_entries=5000))
    f, _ = qf.lookup_hashes(murmur64a(keys), mode=mode)
    assert bool(f.all()), "false negative!"
    absent = [f"absent-{i}" for i in range(5000)]
    fa, _ = qf.lookup_hashes(murmur64a(absent), mode=mode)
    # with q=13, r=51: expected FP ~ 5000 * 2^-51 ~ 0
    assert int(fa.sum()) == 0


def test_probe_walk_equals_index_on_adversarial_layout():
    rng = random.Random(5)
    hashes = []
    for _ in range(2500):
        q = rng.randrange(0, 64)  # tiny quotient space -> huge clusters
        hashes.append((q << 58) | rng.getrandbits(58))
    hashes = np.array(hashes, dtype=U64)
    qf = QF.from_hashes(hashes, None, QFConfig(counter_bits=12, q_bits=12))
    probes = np.concatenate([hashes, np.array([rng.getrandbits(64) for _ in range(2000)], dtype=U64)])
    f1, c1 = qf.lookup_hashes(probes, mode="walk")
    f2, c2 = qf.lookup_hashes(probes, mode="index")
    assert np.array_equal(f1, f2)
    assert np.array_equal(c1, c2)
    assert bool(f1[: len(hashes)].all())


def test_external_storage_exact_values():
    """Distinct keys with value i -> lookup returns exactly i
    (reference TestExternalStorage qf_test.go:472-499)."""
    cfg = QFConfig(counter_bits=20, expected_entries=1000)
    qf = QF(cfg)
    for i in range(1000):
        qf.insert_with_value(f"k{i}", i)
    for i in range(1000):
        found, v = qf.lookup(f"k{i}")
        assert found and v == i
    check_consistency(qf)


def test_duplicate_insert_overwrites_value():
    """Reference semantics: duplicate insert OVERWRITES the stored value
    (qf.go:365-372)."""
    qf = QF(QFConfig(counter_bits=16))
    assert qf.insert_with_value("dup", 7) is False
    assert qf.insert_with_value("dup", 9) is True
    assert qf.lookup("dup") == (True, 9)


def test_counter_saturation():
    qf = QF(QFConfig(counter_bits=4))
    hv = int(murmur64a(["sat"])[0])
    for _ in range(100):
        qf.insert_hash(hv, 1, add=True)
    found, cnt = qf.lookup("sat")
    assert found and cnt == 15  # saturates at 2^4 - 1


def test_exact_counts_on_corpus():
    from collections import Counter

    want = Counter(TEST_STRINGS)
    qf = QF.from_keys(TEST_STRINGS, config=QFConfig(counter_bits=16))
    for s, n in want.items():
        found, cnt = qf.lookup(s)
        assert found and cnt == n


def test_fp_rate_bound():
    """Statistical FP-rate test.

    With the default geometry the full 64-bit hash is represented (q
    implicit + r stored), so FP = 64-bit hash collision probability — not
    measurable statistically. To exercise the generalized bound (FP <=
    2^-r for r informative remainder bits, README.md:94-97) we emulate a
    28-bit fingerprint space: q=16 bucket bits + r=12 informative bits
    (lower 36 bits zeroed). Expected FP rate ~ load * 2^-12."""
    rng = random.Random(31337)
    n = 20000
    member = np.unique(
        np.array([rng.getrandbits(28) << 36 for _ in range(n)], dtype=U64)
    )
    qf = QF.from_hashes(member, None, QFConfig(q_bits=16))
    n_probe = 400000
    probe_fp = np.array(
        [rng.getrandbits(28) << 36 for _ in range(n_probe)], dtype=U64
    )
    truly_member = np.isin(probe_fp, member)
    f, _ = qf.lookup_hashes(probe_fp)
    # zero false negatives
    assert bool(f[truly_member].all())
    # false positive rate bounded by 2^-r (r = 12 informative bits),
    # expected ~ load * 2^-12 ~ 0.3 * 2.4e-4
    fp_rate = float(f[~truly_member].sum()) / float((~truly_member).sum())
    assert fp_rate <= 2**-12, fp_rate
    # and it should be in the right ballpark, not accidentally zero-ish
    expected = len(member) / 2**28
    assert fp_rate <= 4 * expected


def test_resize_lossless():
    qf = QF.from_keys(TEST_STRINGS, config=QFConfig(counter_bits=8, expected_entries=300))
    before = qf.decode(sort=True)
    qf.resize(qf.q_bits + 3)
    after = qf.decode(sort=True)
    assert np.array_equal(before[0], after[0])
    assert np.array_equal(before[1], after[1])
    for s in TEST_STRINGS:
        assert qf.contains(s)
    check_consistency(qf)


def test_len_and_loading():
    qf = QF.from_keys(["a", "b", "c", "a"], config=QFConfig(expected_entries=4))
    assert len(qf) == 3
    assert 0 < qf.loading() <= 0.65
