#!/usr/bin/env python3
"""Microbench Arrow JVM->Python transfer variants for the hash column.

Usage: python scripts/profile_arrow.py <cores> [batch_rows]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main(cores: int, batch_rows: int) -> None:
    import pandas as pd
    import pyarrow as pa
    from pyspark.sql import SparkSession, functions as F

    from bench import _scaling_keys
    from qfspark.build import with_hash, HASH_COL

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"arrowprof-{cores}")
        .config("spark.sql.shuffle.partitions", str(2 * cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_rows))
        .config("spark.sql.execution.arrow.pyspark.selfDestruct.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    keys = _scaling_keys(spark, SF_DIR, 40, cores).cache()
    n = keys.count()
    hashed = with_hash(keys.select("key"), "key", "xxhash64").select(HASH_COL)

    def _noop_pd(batches):
        total = 0
        for b in batches:
            total += len(b)
        yield pd.DataFrame({"n": [total]})

    def _noop_arrow(batches):
        total = 0
        for b in batches:
            total += b.num_rows
        yield pa.RecordBatch.from_pydict({"n": [total]})

    def _consume_np_arrow(batches):
        # realistic consume: zero-copy numpy view of each batch
        total = 0
        for b in batches:
            a = b.column(0).to_numpy(zero_copy_only=False)
            total += int(a[0] & 1) + len(a)
        yield pa.RecordBatch.from_pydict({"n": [total]})

    # warm python workers
    keys.limit(100000).mapInPandas(_noop_pd, "n long").collect()

    t = {}
    for trial in range(3):
        t0 = time.time()
        hashed.mapInPandas(_noop_pd, "n long").collect()
        t.setdefault("pandas", []).append(time.time() - t0)

        t0 = time.time()
        hashed.mapInArrow(_noop_arrow, "n long").collect()
        t.setdefault("arrow", []).append(time.time() - t0)

        t0 = time.time()
        hashed.mapInArrow(_consume_np_arrow, "n long").collect()
        t.setdefault("arrow_np", []).append(time.time() - t0)

    out = {"cores": cores, "rows": n, "batch_rows": batch_rows}
    for k, v in t.items():
        out[k] = round(min(v), 2)
        out[k + "_trials"] = [round(x, 2) for x in v]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]) if len(sys.argv) > 2 else 65536)
