#!/usr/bin/env python3
"""Refine the JVM-routed build: applyInArrow + zero-copy flatten, with
sub-stage timings to find remaining non-scaling parts.

Usage: python scripts/profile_arrowroute.py <cores>
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
    import pyarrow as pa
    from pyspark.sql import functions as F

    from bench import _scaling_keys, _session
    from qfspark.build import with_hash, HASH_COL
    from qfspark.kernel import QF
    from qfspark.serde import qf_to_bytes
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

    def routed_fat():
        routed = hashed.select(
            F.shiftrightunsigned(F.col(HASH_COL), 64 - sb).cast("long").alias("shard"),
            F.shiftleft(F.col(HASH_COL), sb).alias("lh"),
        )
        return routed.groupBy("shard").agg(F.collect_list("lh").alias("hv"))

    def _build_arrow(tbl):
        shard = tbl.column("shard")[0].as_py() if tbl.num_rows else -1
        arrs = [c.flatten().to_numpy(zero_copy_only=False)
                for c in tbl.column("hv").chunks]
        hv = np.concatenate(arrs).astype(np.int64, copy=False).view(np.uint64)
        uniq, counts = np.unique(hv, return_counts=True)
        qf = QF.from_hashes(uniq, counts.astype(np.uint64),
                            QFConfig(counter_bits=32, hash_name="xxhash64"),
                            assume_unique=True)
        return pa.Table.from_pydict(
            {"shard": [shard], "entries": [len(qf)],
             "payload": [qf_to_bytes(qf)]})

    def _build_arrow_noser(tbl):
        shard = tbl.column("shard")[0].as_py() if tbl.num_rows else -1
        arrs = [c.flatten().to_numpy(zero_copy_only=False)
                for c in tbl.column("hv").chunks]
        hv = np.concatenate(arrs).astype(np.int64, copy=False).view(np.uint64)
        uniq, counts = np.unique(hv, return_counts=True)
        qf = QF.from_hashes(uniq, counts.astype(np.uint64),
                            QFConfig(counter_bits=32, hash_name="xxhash64"),
                            assume_unique=True)
        return pa.Table.from_pydict({"shard": [shard], "entries": [len(qf)]})

    def _consume_only(tbl):
        return pa.Table.from_pydict({"shard": [-1], "entries": [tbl.num_rows]})

    t = {}
    for trial in range(3):
        # (a) JVM only: route + collect_list, no python
        t0 = time.time()
        routed_fat().agg(F.count(F.lit(1))).collect()
        t.setdefault("a_jvm_only", []).append(time.time() - t0)

        # (b) + arrow transfer of fat rows, no compute
        t0 = time.time()
        routed_fat().groupBy("shard").applyInArrow(
            _consume_only, "shard long, entries long").agg(F.sum("entries")).collect()
        t.setdefault("b_fat_transfer", []).append(time.time() - t0)

        # (c) + unique + build, no payload serialization back
        t0 = time.time()
        routed_fat().groupBy("shard").applyInArrow(
            _build_arrow_noser, "shard long, entries long").agg(F.sum("entries")).collect()
        t.setdefault("c_build", []).append(time.time() - t0)

        # (d) full: + payload back
        t0 = time.time()
        routed_fat().groupBy("shard").applyInArrow(
            _build_arrow, "shard long, entries long, payload binary"
        ).agg(F.sum("entries")).collect()
        t.setdefault("d_full_payload", []).append(time.time() - t0)

    out = {"cores": cores, "rows": n}
    for k, v in t.items():
        out[k] = round(min(v), 2)
        out[k + "_trials"] = [round(x, 2) for x in v]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]))
