#!/usr/bin/env python3
"""Single-threaded kernel microbenchmarks, comparable to the reference's
go-bench numbers (BASELINE.md): ns per insert (bulk build amortized) and
ns per lookup, for packed/unpacked, with/without counters.

Usage: python scripts/microbench.py [n_keys]
Prints one JSON line.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from qfspark.hashing import murmur64a
from qfspark.kernel import QF
from qfspark.sizing import QFConfig


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    rng = np.random.RandomState(7)
    hashes = rng.randint(-2**63, 2**63, size=n, dtype=np.int64).view(np.uint64)
    hashes = np.unique(hashes)
    n = len(hashes)
    probes_hit = hashes[rng.randint(0, n, size=n)]
    probes_miss = rng.randint(-2**63, 2**63, size=n, dtype=np.int64).view(np.uint64)

    out = {"n_keys": n}

    # hashing throughput (vectorized murmur64a over ~20-byte keys);
    # min of 2 reps — the first pays page-fault first-touch on the big
    # buffers, which amortizes away in a long-lived executor
    keys = [f"https://example.com/{i}" for i in range(200_000)]
    best = None
    for _ in range(2):
        t0 = time.time()
        murmur64a(keys)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    out["murmur64a_ns_per_key"] = round(best / len(keys) * 1e9, 1)

    for packed in (False, True):
        for cbits in (0, 15):
            tag = f"{'packed' if packed else 'unpacked'}_c{cbits}"
            cfg = QFConfig(counter_bits=cbits, bit_packed=packed)
            t0 = time.time()
            qf = QF.from_hashes(hashes, None, cfg, assume_unique=True)
            out[f"build_{tag}_ns_per_key"] = round((time.time() - t0) / n * 1e9, 1)

            qf.build_index()
            t0 = time.time()
            f, _ = qf.lookup_hashes(probes_hit, mode="index")
            out[f"lookup_hit_{tag}_ns_per_key"] = round((time.time() - t0) / n * 1e9, 1)
            assert bool(f.all())

            t0 = time.time()
            qf.lookup_hashes(probes_miss, mode="index")
            out[f"lookup_miss_{tag}_ns_per_key"] = round((time.time() - t0) / n * 1e9, 1)

            if cbits == 0:
                t0 = time.time()
                qf.lookup_hashes(probes_hit[:200_000], mode="walk")
                out[f"lookup_walk_{tag}_ns_per_key"] = round(
                    (time.time() - t0) / 200_000 * 1e9, 1
                )

    # serde round trip
    qf = QF.from_hashes(hashes, None, QFConfig(counter_bits=15), assume_unique=True)
    t0 = time.time()
    blob = qf.to_bytes()
    out["serialize_ms"] = round((time.time() - t0) * 1e3, 1)
    t0 = time.time()
    QF.from_bytes(blob)
    out["deserialize_ms"] = round((time.time() - t0) * 1e3, 1)
    out["serialized_mb"] = round(len(blob) / 1e6, 1)

    # merge of two halves
    a = QF.from_hashes(hashes[: n // 2], None, QFConfig(counter_bits=15), assume_unique=True)
    b = QF.from_hashes(hashes[n // 2 :], None, QFConfig(counter_bits=15), assume_unique=True)
    t0 = time.time()
    QF.merge(a, b)
    out["merge_ns_per_key"] = round((time.time() - t0) / n * 1e9, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
