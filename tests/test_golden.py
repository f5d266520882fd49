"""Wire-format goldens.

No Go toolchain exists in this environment, so goldens produced by the
actual Go library cannot be generated here (FIXTURES.md §5's ideal).
Two substitutes together close most of the same gap:

1. A HAND-CONSTRUCTED go-qfext file, assembled from first principles out
   of the published format (serialize.go:16-34 header; unpacked.go:40-50
   length-prefixed word slice; slot word = remainder<<3 | occupied,
   qf.go:179-186) using the independent scalar murmur oracle — zero
   qfspark serialization code involved. If qfspark reads/writes this
   byte-for-byte, a real Go file of the same shape loads identically.

2. Frozen regression goldens under tests/golden/ (all four
   packed/storage variants): any silent encoding drift in a future
   change breaks byte-exact equality.
"""

import os
import struct

import numpy as np
import pytest

from qfspark import QF, QFConfig
from qfspark.serde import qf_from_gqf_bytes, qf_to_gqf_bytes, qf_to_bytes, qf_from_bytes

from .reference_impls import murmur64a_scalar

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def test_hand_constructed_gqf_file():
    """Build the reference's exact bytes BY HAND for a 16-slot unpacked
    filter holding three non-colliding keys, and require qfspark to (a)
    load it with correct lookups and (b) re-serialize it byte-for-byte."""
    q_bits = 4
    r_bits = 64 - q_bits
    keys = []
    used = set()
    # pick keys whose murmur top-4-bits (quotients) are pairwise distinct
    i = 0
    while len(keys) < 3:
        k = f"golden-{i}".encode()
        dq = murmur64a_scalar(k) >> r_bits
        if dq not in used:
            used.add(dq)
            keys.append(k)
        i += 1

    # slot layout with no collisions: slot dq holds remainder<<3 | occupied
    slots = [0] * (1 << q_bits)
    for k in keys:
        h = murmur64a_scalar(k)
        dq, dr = h >> r_bits, h & ((1 << r_bits) - 1)
        assert slots[dq] == 0
        slots[dq] = (dr << 3) | 0b001  # is_occupied, qf.go:179-186

    # QFHeader (serialize.go:19-34): Version=4, Entries, QBits,
    # StorageBits, BitPacked — then unpacked word slice (len + words)
    blob = struct.pack("<QQQQ?", 0x0004, len(keys), q_bits, 0, False)
    blob += struct.pack("<Q", len(slots))
    blob += np.array(slots, dtype="<u8").tobytes()

    qf = qf_from_gqf_bytes(blob, hash_name="murmur64a")
    assert len(qf) == 3
    for k in keys:
        assert qf.contains(k)
    assert not qf.contains(b"absent-key")
    assert qf_to_gqf_bytes(qf) == blob

    # and the same filter built through the normal API serializes to the
    # hand-built bytes exactly
    built = QF.from_keys(keys, config=QFConfig(
        hash_name="murmur64a", counter_bits=0, q_bits=q_bits))
    assert qf_to_gqf_bytes(built) == blob


_VARIANTS = [
    ("unpacked_nostorage", dict(bit_packed=False, counter_bits=0)),
    ("unpacked_storage", dict(bit_packed=False, counter_bits=8)),
    ("packed_nostorage", dict(bit_packed=True, counter_bits=0)),
    ("packed_storage", dict(bit_packed=True, counter_bits=8)),
]


def _golden_qf(cfg_kwargs) -> QF:
    keys = [f"golden-key-{i}" for i in range(200)] + ["dup"] * 5
    return QF.from_keys(keys, config=QFConfig(
        hash_name="murmur64a", **cfg_kwargs))


@pytest.mark.parametrize("name,cfg", _VARIANTS)
def test_frozen_wire_goldens(name, cfg):
    """Byte-exact regression goldens for both wire formats: a future
    encoding change (field order, slack-word count, header packing)
    fails here instead of silently breaking cross-version loads."""
    qf = _golden_qf(cfg)
    for fmt, to_bytes, from_bytes in (
        ("gqf", qf_to_gqf_bytes, qf_from_gqf_bytes),
        ("native", qf_to_bytes, qf_from_bytes),
    ):
        path = os.path.join(GOLDEN_DIR, f"{name}.{fmt}.qf")
        blob = to_bytes(qf)
        assert os.path.exists(path), (
            f"golden missing: run scripts/gen_goldens.py ({path})")
        with open(path, "rb") as f:
            want = f.read()
        assert blob == want, f"{fmt} wire bytes drifted for {name}"
        loaded = from_bytes(want)
        assert loaded == qf
