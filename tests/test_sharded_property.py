"""Property tests for the sharded filter (pure kernel, no Spark): routing
by top hash bits + local shift must answer exactly like the collapsed
monolith, for arbitrary key multisets and shard widths."""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from qfspark.build import ShardedQF
from qfspark.kernel import QF
from qfspark.sizing import QFConfig

U64 = np.uint64

_SETTINGS = settings(
    max_examples=40, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

hash_lists = st.lists(
    st.integers(min_value=0, max_value=2**64 - 1), min_size=1, max_size=400
)


def _build_sharded(hv: np.ndarray, shard_bits: int, cfg: QFConfig) -> ShardedQF:
    sb = np.uint64(shard_bits)
    sid = (hv >> (np.uint64(64) - sb)).astype(np.int64) if shard_bits else np.zeros(len(hv), np.int64)
    shards = {}
    for s in np.unique(sid):
        mask = sid == s
        shards[int(s)] = QF.from_hashes(hv[mask] << sb, None, cfg)
    return ShardedQF(shard_bits, shards)


@_SETTINGS
@given(hashes=hash_lists, shard_bits=st.integers(0, 8),
       counter_bits=st.sampled_from([0, 8]))
def test_sharded_equals_monolith(hashes, shard_bits, counter_bits):
    hv = np.array(hashes, dtype=U64)
    cfg = QFConfig(counter_bits=counter_bits)
    sharded = _build_sharded(hv, shard_bits, cfg)
    mono = QF.from_hashes(hv, None, cfg)

    probes = np.concatenate([hv, (hv ^ U64(0x9E3779B97F4A7C15))])
    fs, cs = sharded.lookup_hashes(probes)
    fm, cm = mono.lookup_hashes(probes)
    assert np.array_equal(fs, fm)
    if counter_bits:
        assert np.array_equal(cs, cm)

    # collapsing the shards reproduces the monolith byte-for-byte
    collapsed = sharded.to_qf()
    if collapsed.q_bits != mono.q_bits:
        collapsed.resize(mono.q_bits)
    assert collapsed.to_bytes() == mono.to_bytes()
    assert sharded.entries == mono.entries
