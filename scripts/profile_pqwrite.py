#!/usr/bin/env python3
"""Tune the JVM parquet write of the routed hash table.

Usage: python scripts/profile_pqwrite.py <cores>
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SHARD_BITS = 5


def main(cores: int) -> None:
    import pandas as pd
    from pyspark.sql import functions as F

    from bench import _scaling_keys, _session
    from qfspark.build import with_hash, HASH_COL

    spark = _session(cores)
    keys = _scaling_keys(spark, SF_DIR, 40, cores).cache()
    n = keys.count()

    def _noop_pd(batches):
        total = 0
        for b in batches:
            total += len(b)
        yield pd.DataFrame({"n": [total]})

    keys.limit(100000).mapInPandas(_noop_pd, "n long").collect()

    sb = SHARD_BITS
    hashed = with_hash(keys.select("key"), "key", "xxhash64").select(HASH_COL)
    routed = hashed.select(
        F.shiftrightunsigned(F.col(HASH_COL), 64 - sb).cast("int").alias("shard"),
        F.shiftleft(F.col(HASH_COL), sb).alias("lh"),
    )
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None

    def w(writer_fn):
        tmp = tempfile.mkdtemp(prefix=f"pqw_{cores}_", dir=base)
        try:
            t0 = time.time()
            writer_fn(f"{tmp}/hx")
            return time.time() - t0
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    variants = {
        "baseline": lambda p: routed.write.partitionBy("shard")
            .parquet(p, compression="none"),
        "nodict": lambda p: routed.write.partitionBy("shard")
            .option("parquet.enable.dictionary", "false")
            .option("parquet.summary.metadata.level", "NONE")
            .parquet(p, compression="none"),
        "nodict_bigpage": lambda p: routed.write.partitionBy("shard")
            .option("parquet.enable.dictionary", "false")
            .option("parquet.summary.metadata.level", "NONE")
            .option("parquet.page.size", str(8 << 20))
            .option("parquet.block.size", str(256 << 20))
            .parquet(p, compression="none"),
        "nodict_nopartition": lambda p: routed.write
            .option("parquet.enable.dictionary", "false")
            .option("parquet.summary.metadata.level", "NONE")
            .parquet(p, compression="none"),
        "plain_hash_only": lambda p: hashed.write
            .option("parquet.enable.dictionary", "false")
            .option("parquet.summary.metadata.level", "NONE")
            .parquet(p, compression="none"),
    }

    t = {}
    for trial in range(3):
        for name, fn in variants.items():
            t.setdefault(name, []).append(w(fn))

    out = {"cores": cores, "rows": n}
    for k, v in t.items():
        out[k] = round(min(v), 2)
        out[k + "_trials"] = [round(x, 2) for x in v]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]))
