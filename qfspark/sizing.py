"""Configuration and sizing math for the quotient filter.

Semantics match the reference's ``Config`` (reference: config.go:15-108) and
its load-factor / geometry derivations (reference: qf.go:17-20,159-177):

* table size is always ``2**q_bits``,
* ``r_bits = 64 - q_bits`` (the full 64-bit hash is represented: q bits
  implicit in the bucket index, r bits stored),
* filters are sized so that expected entries stay under a 0.65 load factor,
* minimum q_bits is 4 (3 metadata bits must fit in a slot word).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

#: Doubling threshold and pre-sizing target (reference: qf.go:17-20).
MAX_LOADING_FACTOR = 0.65

#: Minimum quotient bits (reference: config.go:12).
MIN_Q_BITS = 4

#: Bits in a word; the hash width. (reference: packed.go:19)
BITS_PER_WORD = 64


def q_bits_for(expected_entries: int) -> int:
    """Smallest q with ``2**q * MAX_LOADING_FACTOR >= expected_entries``,
    floored at MIN_Q_BITS (reference: config.go:59-70)."""
    x = 1
    bits = 0
    while x * MAX_LOADING_FACTOR < expected_entries:
        x <<= 1
        bits += 1
    return max(bits, MIN_Q_BITS)


@dataclass
class QFConfig:
    """Build-time knobs for a quotient filter.

    Mirrors the reference ``Config`` (config.go:15-36) with two extensions
    we need for distributed counting builds:

    * ``counter_bits`` is the reference's ``BitsOfStoragePerEntry`` — we
      name it for its role in the CQF (per-slot counter width),
    * ``hash_name`` replaces the pluggable function pointer so a filter's
      hash travels with its serialized form (fixes the reference's
      hard-coded-murmur defect at disk.go:69-70).
    """

    counter_bits: int = 0
    bit_packed: bool = False
    expected_entries: int = 0
    hash_name: str = "murmur64a"
    #: Optional explicit q_bits override (None -> derived from
    #: expected_entries).
    q_bits: int | None = None

    def __post_init__(self) -> None:
        if not (0 <= self.counter_bits <= 64):
            raise ValueError(f"counter_bits must be in [0, 64], got {self.counter_bits}")
        if self.q_bits is not None and not (MIN_Q_BITS <= self.q_bits <= 62):
            raise ValueError(f"q_bits must be in [{MIN_Q_BITS}, 62], got {self.q_bits}")

    # -- geometry ---------------------------------------------------------
    def derived_q_bits(self) -> int:
        if self.q_bits is not None:
            return self.q_bits
        return q_bits_for(self.expected_entries)

    def bucket_count(self) -> int:
        """2**q (reference: config.go:53-55)."""
        return 1 << self.derived_q_bits()

    def expected_loading(self) -> float:
        """Expected load as a percentage (reference: config.go:40-42)."""
        return 100.0 * self.expected_entries / self.bucket_count()

    def bytes_required(self) -> int:
        """Approximate bit-packed footprint (reference: config.go:46-49)."""
        q = self.derived_q_bits()
        bits_per_entry = (BITS_PER_WORD - q) + 3 + self.counter_bits
        return self.bucket_count() * bits_per_entry // 8

    def max_entries(self) -> int:
        """Doubling threshold: ceil(2**q * 0.65) (reference: qf.go:167)."""
        return math.ceil(self.bucket_count() * MAX_LOADING_FACTOR)

    def explain(self, indent: str = "") -> str:
        """Human-readable sizing report (reference: config.go:73-84)."""
        q = self.derived_q_bits()
        lines = [
            f"{indent}{q:2d} bits configured for quotient ({self.bucket_count()} buckets)",
            f"{indent}{BITS_PER_WORD - q:2d} bits needed per bucket for remainder",
            f"{indent} 3 bits metadata per bucket",
            f"{indent}{self.counter_bits:2d} bits external storage",
            f"{indent}   {human_bytes(self.bytes_required())} storage size expected",
        ]
        return "\n".join(lines)


def human_bytes(n: int) -> str:
    """Format a byte count (reference: config.go:86-108)."""
    v = float(n)
    suffix = "bytes"
    if v > 1024:
        v /= 1024.0
        suffix = "KB"
        if v > 1024.0:
            v /= 1024.0
            suffix = "MB"
            if v > 1024.0:
                v /= 1024.0
                suffix = "GB"
    if v < 10:
        return f"{v:0.2f} {suffix}"
    if v < 100:
        return f"{v:0.1f} {suffix}"
    return f"{v:0.0f} {suffix}"
