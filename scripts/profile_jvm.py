#!/usr/bin/env python3
"""Isolate the JVM-side cost of the scaling job's input pipeline.

Usage: python scripts/profile_jvm.py <cores>
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main(cores: int) -> None:
    import pandas as pd
    from pyspark.sql import functions as F

    from bench import _scaling_keys, _session
    from qfspark.build import with_hash, HASH_COL

    spark = _session(cores)
    keys = _scaling_keys(spark, SF_DIR, 40, cores).cache()
    n = keys.count()
    hashed = with_hash(keys.select("key"), "key", "xxhash64").select(HASH_COL)

    def _noop_pd(batches):
        total = 0
        for b in batches:
            total += len(b)
        yield pd.DataFrame({"n": [total]})

    keys.limit(100000).mapInPandas(_noop_pd, "n long").collect()

    t = {}
    for trial in range(3):
        # full JVM work, no Python: every string read + hashed, result aggregated
        t0 = time.time()
        hashed.agg(F.max(HASH_COL), F.min(HASH_COL)).collect()
        t.setdefault("jvm_hash_agg", []).append(time.time() - t0)

        # string scan only (no hash): force string materialization via max(key)
        t0 = time.time()
        keys.agg(F.max("key")).collect()
        t.setdefault("jvm_scan_max", []).append(time.time() - t0)

        # python transfer of a CONSTANT column (no cache scan of strings):
        # isolates channel cost from input-scan cost
        t0 = time.time()
        const = keys.select(F.xxhash64(F.lit("x")).alias(HASH_COL))
        const.mapInPandas(_noop_pd, "n long").collect()
        t.setdefault("py_const_transfer", []).append(time.time() - t0)

        # full transfer
        t0 = time.time()
        hashed.mapInPandas(_noop_pd, "n long").collect()
        t.setdefault("py_full", []).append(time.time() - t0)

    out = {"cores": cores, "rows": n}
    for k, v in t.items():
        out[k] = round(min(v), 2)
        out[k + "_trials"] = [round(x, 2) for x in v]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]))
