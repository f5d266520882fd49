#!/usr/bin/env python3
"""Scaling evidence for the SKETCH-family builds (north rule: the
sketch *library* must scale from N to 4N workers, not just the CQF).

Same protocol as bench.py's CQF scaling section — one FRESH
ActiveProcessorCount-bounded JVM per trial, levels interleaved so a
slow system window hits both equally, one untimed warmup build per JVM,
medians of >= 3 trials. Workload: the four SQL-expressible sketches
(HLL p=14, count-min 4x4096, Bloom 2^20 bits, bottom-k 4096) built over
a 6M-key slice of the CQF scaling corpus; each build is one
explode + one map-side-partial groupBy, so the exchange is sketch-sized
(registers/cells/bits), never data-sized.

  python scripts/profile_sketch_scaling.py             # full protocol
  python scripts/profile_sketch_scaling.py --one 8     # one child trial
"""

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
LEVELS = (2, 8)
TRIALS = int(os.environ.get("SKETCH_SCALE_TRIALS", "3"))


def one_trial(cores: int) -> None:
    from bench import SCALE_MULT, _scaling_keys, _session
    from qfspark import sketches

    spark = _session(cores)
    # quarter of the CQF job's corpus: the sketch workload is
    # md5-hash-bound (4-6 hashes per key), so 6M keys already gives
    # multi-ten-second jobs at the low level
    keys = _scaling_keys(spark, SF_DIR, SCALE_MULT // 4, cores).cache()
    n = keys.count()  # materialize input before timing

    def job() -> float:
        t0 = time.time()
        sketches.hll_registers(keys, "key", p=14).count()
        sketches.countmin_table(keys, "key", depth=4, width=4096).count()
        sketches.bloom_bits(keys, "key", m_bits=1 << 20, k=4).count()
        sketches.bottomk_sketch(keys, "key", "key", k=4096).count()
        return time.time() - t0

    job()  # untimed warmup: JIT + first-touch, as in the CQF job
    sec = job()
    print(json.dumps({"cores": cores, "rows": n, "sec": round(sec, 3)}))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        one_trial(int(sys.argv[2]))
        return
    lo, hi = LEVELS
    secs = {lo: [], hi: []}
    rows = None
    for _ in range(TRIALS):
        for c in LEVELS:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", str(c)],
                capture_output=True, text=True, timeout=1200,
                env={**os.environ, "SPARK_GRAFT_SF_DIR": SF_DIR},
            )
            line = next(
                (ln for ln in reversed(out.stdout.strip().splitlines())
                 if ln.strip().startswith("{")), None)
            if line is None:
                raise RuntimeError(out.stderr[-2000:])
            r = json.loads(line)
            rows = r["rows"]
            secs[c].append(r["sec"])
    med = {c: statistics.median(secs[c]) for c in LEVELS}
    thr = {c: rows / med[c] for c in LEVELS}
    eff = (thr[hi] / thr[lo]) / (hi / lo)
    print(json.dumps({
        "workload": "hll+countmin+bloom+bottomk over 6M keys",
        f"local[{lo}]": {"sec_median": med[lo], "rows_per_sec": round(thr[lo]),
                         "trials": secs[lo]},
        f"local[{hi}]": {"sec_median": med[hi], "rows_per_sec": round(thr[hi]),
                         "trials": secs[hi]},
        "efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
