#!/usr/bin/env python3
"""Stage-level profiling of the scaling job at one parallelism level.

Splits the sharded build into its pipeline stages and times each with a
materializing action, so we can see which stage fails to scale 2->8.

Usage: python scripts/profile_scaling.py <cores>
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
    from qfspark.build import (
        _local_shard_blobs, build_sharded_qf, with_hash, HASH_COL,
    )
    from qfspark.sizing import QFConfig

    spark = _session(cores)
    keys = _scaling_keys(spark, SF_DIR, 40, cores).cache()
    n = keys.count()

    def _noop(batches):
        total = 0
        for b in batches:
            total += len(b)
        yield pd.DataFrame({"n": [total]})

    keys.limit(100000).mapInPandas(_noop, "n long").collect()

    t = {}
    for trial in range(3):
        # stage A: cache read + JVM hash only (count action keeps it JVM-side)
        t0 = time.time()
        hashed = with_hash(keys.select("key"), "key", "xxhash64").select(HASH_COL)
        hashed.agg(F.count(F.lit(1))).collect()
        t.setdefault("A_hash_only", []).append(time.time() - t0)

        # stage B: hash + arrow transfer into python + trivial consume
        t0 = time.time()
        hashed.mapInPandas(_noop, "n long").collect()
        t.setdefault("B_hash_arrow", []).append(time.time() - t0)

        # stage C: hash + combiner blobs (the mapInPandas unique stage)
        t0 = time.time()
        partials = hashed.mapInPandas(
            _local_shard_blobs(5, True),
            schema="shard long, hashes binary, counts binary",
        )
        partials.agg(F.count(F.lit(1))).collect()
        t.setdefault("C_combiner", []).append(time.time() - t0)

        # stage D: full build (adds shuffle + per-shard merge/build)
        t0 = time.time()
        shards = build_sharded_qf(
            keys, "key", shard_bits=5,
            config=QFConfig(counter_bits=32, hash_name="xxhash64"),
        )
        shards.agg(F.sum("entries")).collect()
        t.setdefault("D_full", []).append(time.time() - t0)

    out = {"cores": cores, "rows": n}
    for k, v in t.items():
        out[k] = round(min(v), 2)
        out[k + "_trials"] = [round(x, 2) for x in v]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]))
