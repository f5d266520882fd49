#!/usr/bin/env python3
"""Test JVM-side shard routing + collect_list fat-row transfer vs the
current mapInPandas combiner, as the full sharded-build job.

Usage: python scripts/profile_jvmroute.py <cores>
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SHARD_BITS = 5


def main(cores: int) -> None:
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from bench import _scaling_keys, _session
    from qfspark.build import _u64, with_hash, HASH_COL, build_sharded_qf
    from qfspark.kernel import QF
    from qfspark.sizing import QFConfig

    spark = _session(cores)
    keys = _scaling_keys(spark, SF_DIR, 40, cores).cache()
    n = keys.count()

    def _noop_pd(batches):
        total = 0
        for b in batches:
            total += len(b)
        yield pd.DataFrame({"n": [total]})

    keys.limit(100000).mapInPandas(_noop_pd, "n long").collect()

    hashed = with_hash(keys.select("key"), "key", "xxhash64").select(HASH_COL)
    sb = SHARD_BITS

    def _build_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        hv_lists = pdf["hv"]
        hv = np.concatenate([np.asarray(x, dtype=np.int64) for x in hv_lists]).view(np.uint64)
        uniq, counts = np.unique(hv, return_counts=True)
        qf = QF.from_hashes(uniq, counts.astype(np.uint64),
                            QFConfig(counter_bits=32, hash_name="xxhash64"),
                            assume_unique=True)
        return pd.DataFrame({"shard": [int(pdf["shard"].iloc[0])],
                             "entries": [len(qf)]})

    t = {}
    for trial in range(3):
        # variant 1: JVM route + collect_list fat rows -> python build
        t0 = time.time()
        routed = hashed.select(
            F.shiftrightunsigned(F.col(HASH_COL), 64 - sb).cast("long").alias("shard"),
            F.shiftleft(F.col(HASH_COL), sb).alias("lh"),
        )
        fat = routed.groupBy("shard").agg(F.collect_list("lh").alias("hv"))
        out = fat.groupBy("shard").applyInPandas(_build_shard, "shard long, entries long")
        out.agg(F.sum("entries")).collect()
        t.setdefault("jvm_collect_list", []).append(time.time() - t0)

        # variant 2: pure JVM shuffle cost probe — groupBy(hash).count
        t0 = time.time()
        hashed.groupBy(HASH_COL).count().agg(F.max("count")).collect()
        t.setdefault("jvm_groupby_hash", []).append(time.time() - t0)

        # variant 3: current full build (reference point)
        t0 = time.time()
        shards = build_sharded_qf(keys, "key", shard_bits=sb,
                                  config=QFConfig(counter_bits=32, hash_name="xxhash64"))
        shards.agg(F.sum("entries")).collect()
        t.setdefault("current_full", []).append(time.time() - t0)

    out = {"cores": cores, "rows": n}
    for k, v in t.items():
        out[k] = round(min(v), 2)
        out[k + "_trials"] = [round(x, 2) for x in v]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]))
