"""qfspark — a PySpark-native counting quotient filter (CQF) library.

A from-scratch re-architecture (NOT a port) of the semantics of
facebookincubator/go-qfext (see /root/reference) for distributed operation
on Spark:

* numpy-packed uint64 bitvector kernel with a *sorted bulk build* that
  produces the same canonical run/cluster slot layout the reference's
  shifting insert produces (reference algorithm: qf.go:319-405; our
  re-derivation: kernel.py),
* a lossless, associative slot-level ``merge`` so per-partition partial
  filters combine under tree aggregation (generalizes the reference's
  ``double``, qf.go:283-301),
* vectorized Arrow/pandas UDAF build + broadcast-lookup UDFs over
  DataFrames (build.py / lookup.py),
* counting semantics (the "C" in CQF): per-slot counters in the external
  storage vector (reference "external storage", config.go:16-18) with
  pre-aggregated counts and saturating arithmetic.

Key semantic guarantees (matching the reference's tests):
  zero false negatives; false-positive rate <= 2^-r for r stored remainder
  bits; exact counts under the configured counter width; lossless
  serialization round-trip; merge associativity.
"""

from .sizing import QFConfig, MAX_LOADING_FACTOR, MIN_Q_BITS
from .hashing import (
    murmur64a, fnv1a, xxhash64, hash_bytes, register_hash, HASH_FNS,
)
from .kernel import QF
from .vector import PackedVector, UnpackedVector

__version__ = "0.7.0"

__all__ = [
    "QF",
    "QFConfig",
    "PackedVector",
    "UnpackedVector",
    "murmur64a",
    "fnv1a",
    "xxhash64",
    "hash_bytes",
    "register_hash",
    "HASH_FNS",
    "MAX_LOADING_FACTOR",
    "MIN_Q_BITS",
]

# Spark-dependent modules (build, lookup, streaming, dedup, similarity,
# textops, multimodal, webpages, sources) import pyspark and are loaded
# on demand: `from qfspark.build import build_qf` etc. This keeps the
# kernel importable in pyspark-free environments (CLI local builds,
# plain-Python probing of .qf files).
