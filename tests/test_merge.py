"""Merge property tests: the merge operator must be lossless, associative
and commutative — random partitionings of a corpus through random merge
trees must yield byte-identical canonical filters (SURVEY.md §5's
merge-associativity requirement; generalizes the reference's lossless
double(), qf.go:283-301)."""

import random

import numpy as np
import pytest

from qfspark import QF, QFConfig
from qfspark.serde import qf_to_bytes

U64 = np.uint64


def _random_corpus(seed, n=4000, dup_rate=0.3):
    rng = random.Random(seed)
    keys = []
    for i in range(n):
        if keys and rng.random() < dup_rate:
            keys.append(rng.choice(keys))  # heavy duplication, some hot keys
        else:
            keys.append(f"url-{seed}-{i}")
    return keys


def _random_partition(keys, k, seed):
    rng = random.Random(seed)
    parts = [[] for _ in range(k)]
    for key in keys:
        parts[rng.randrange(k)].append(key)
    return [p for p in parts if p]


def _merge_random_tree(filters, seed):
    rng = random.Random(seed)
    work = list(filters)
    while len(work) > 1:
        i = rng.randrange(len(work))
        a = work.pop(i)
        j = rng.randrange(len(work))
        b = work.pop(j)
        work.append(QF.merge(a, b))
    return work[0]


@pytest.mark.parametrize("trial", range(5))
def test_merge_tree_canonical(trial):
    keys = _random_corpus(trial)
    cfg = QFConfig(counter_bits=16)
    reference = QF.from_keys(keys, config=cfg)

    parts = _random_partition(keys, 2 + trial * 2, seed=trial * 7 + 1)
    partials = [QF.from_keys(p, config=cfg) for p in parts]
    merged = _merge_random_tree(partials, seed=trial * 13 + 5)
    # merged filter may sit at a larger q than the direct build if partial
    # geometry exceeded it; normalize then compare bytes
    if merged.q_bits != reference.q_bits:
        merged.resize(reference.q_bits)
    assert qf_to_bytes(merged) == qf_to_bytes(reference)


def test_merge_commutative():
    a = QF.from_keys([f"a{i}" for i in range(500)], config=QFConfig(counter_bits=8))
    b = QF.from_keys([f"b{i}" for i in range(700)], config=QFConfig(counter_bits=8))
    ab, ba = QF.merge(a, b), QF.merge(b, a)
    assert qf_to_bytes(ab) == qf_to_bytes(ba)


def test_merge_adds_counts_with_saturation():
    cfg = QFConfig(counter_bits=4)
    a = QF.from_keys(["k"] * 10, config=cfg)
    b = QF.from_keys(["k"] * 10, config=cfg)
    m = QF.merge(a, b)
    assert m.lookup("k") == (True, 15)  # 20 saturates at 2^4-1

    c = QF.from_keys(["k"] * 3, config=cfg)
    d = QF.from_keys(["k"] * 4, config=cfg)
    assert QF.merge(c, d).lookup("k") == (True, 7)


def test_merge_overlapping_and_disjoint():
    cfg = QFConfig(counter_bits=16)
    a = QF.from_keys([f"x{i}" for i in range(300)] + ["shared"] * 5, config=cfg)
    b = QF.from_keys([f"y{i}" for i in range(300)] + ["shared"] * 3, config=cfg)
    m = QF.merge(a, b)
    assert m.entries == 601
    assert m.lookup("shared") == (True, 8)
    for i in range(300):
        assert m.contains(f"x{i}") and m.contains(f"y{i}")


def test_merge_different_q_bits():
    cfg_small = QFConfig(counter_bits=8, q_bits=5)
    cfg_big = QFConfig(counter_bits=8, q_bits=10)
    a = QF.from_keys([f"s{i}" for i in range(15)], config=cfg_small)
    b = QF.from_keys([f"b{i}" for i in range(500)], config=cfg_big)
    m = QF.merge(a, b)
    assert m.q_bits >= 10
    assert m.entries == 515
    for i in range(15):
        assert m.contains(f"s{i}")


def test_merge_incompatible_raises():
    a = QF.from_keys(["a"], config=QFConfig(hash_name="murmur64a"))
    b = QF.from_keys(["b"], config=QFConfig(hash_name="xxhash64"))
    with pytest.raises(ValueError):
        QF.merge(a, b)
    c = QF.from_keys(["c"], config=QFConfig(counter_bits=4))
    d = QF.from_keys(["d"], config=QFConfig(counter_bits=8))
    with pytest.raises(ValueError):
        QF.merge(c, d)


def test_merge_many_equals_pairwise():
    cfg = QFConfig(counter_bits=16)
    parts = [
        QF.from_keys([f"p{j}-{i}" for i in range(100 + j * 50)], config=cfg)
        for j in range(6)
    ]
    import functools

    pairwise = functools.reduce(QF.merge, parts)
    allatonce = QF.merge_many(parts)
    if pairwise.q_bits != allatonce.q_bits:
        pairwise.resize(allatonce.q_bits)
    assert qf_to_bytes(pairwise) == qf_to_bytes(allatonce)
