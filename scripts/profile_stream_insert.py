#!/usr/bin/env python3
"""Microbench for the streaming dedup incremental branch
(QF.insert_hashes): per-batch cost must stay flat as the state filter
grows — the property that makes applyInPandasWithState dedup O(batch)
per micro-batch in steady state rather than O(state).

Representative numbers on this box (round 4): ~3-5 us/insert at every
state size from 1e5 to 4e6 — FLAT in state (the claim under test; a
batch of 200 costs under 1 ms whether the state holds 1e5 or 4e6
keys). The batched entry point's win over the per-key insert_hash loop
is modest at these scales (one index invalidation and one growth-check
hoist); its real value is giving the streaming state function a single
vectorizable call with differential-tested parity. The decode+rebuild
path costs ~0.14 s per million state rows, which is why the streaming
branch switches to rebuild once batch*16 >= state.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from qfspark.kernel import QF  # noqa: E402
from qfspark.sizing import QFConfig  # noqa: E402

rng = np.random.RandomState(7)


def rand64(n):
    """Full 64-bit hash domain — quotient width must match the config's
    hash width or every key lands in a fraction of the home slots."""
    return (rng.randint(0, 2 ** 63, n).astype(np.uint64) * np.uint64(2)
            + rng.randint(0, 2, n).astype(np.uint64))


def main():
    batch_n = 200
    print(f"{'state':>12} {'batched ms':>11} {'us/insert':>10} "
          f"{'scalar ms':>10} {'load':>5}")
    for n_state in (100_000, 1_000_000, 4_000_000):
        state_h = np.unique(rand64(n_state))
        qf = QF.from_hashes(state_h, None, QFConfig(counter_bits=0))
        batch = rand64(batch_n)
        t0 = time.time()
        qf.insert_hashes(batch, value=1)
        dt = time.time() - t0

        qf2 = QF.from_hashes(state_h, None, QFConfig(counter_bits=0))
        t0 = time.time()
        for h in batch.tolist():
            qf2.insert_hash(int(h), value=1)
        dt2 = time.time() - t0
        print(f"{n_state:>12,} {dt * 1000:>11.2f} "
              f"{dt / batch_n * 1e6:>10.1f} {dt2 * 1000:>10.2f} "
              f"{qf.loading():>5.2f}")


if __name__ == "__main__":
    main()
