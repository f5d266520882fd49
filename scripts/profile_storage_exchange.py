#!/usr/bin/env python3
"""Prototype: sharded CQF build with a storage exchange instead of the
JVM<->Python Arrow channel for bulk bytes.

Stage 1 (JVM only): hash -> route -> write parquet partitioned by shard.
Stage 2: 32-row task list; each task reads its shard's parquet with
pyarrow directly, np.unique, QF build, writes payload sidecar.

Usage: python scripts/profile_storage_exchange.py <cores>
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
    import numpy as np
    import pandas as pd
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

    sb = SHARD_BITS
    n_shards = 1 << sb
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None

    def run_once(direct_write: bool) -> float:
        tmp = tempfile.mkdtemp(prefix=f"qfex_{cores}_", dir=base)
        try:
            t0 = time.time()
            hashed = with_hash(keys.select("key"), "key", "xxhash64").select(HASH_COL)
            routed = hashed.select(
                F.shiftrightunsigned(F.col(HASH_COL), 64 - sb).cast("int").alias("shard"),
                F.shiftleft(F.col(HASH_COL), sb).alias("lh"),
            )
            hx = f"{tmp}/hashes"
            w = routed if direct_write else routed.repartition(n_shards, "shard")
            w.write.partitionBy("shard").parquet(hx, compression="none")
            t1 = time.time()

            paydir = f"{tmp}/payloads"
            os.makedirs(paydir, exist_ok=True)
            shards_list = spark.createDataFrame(
                [(s,) for s in range(n_shards)], "shard int"
            ).repartition(n_shards)

            def _build(pdfs):
                import pyarrow.parquet as pq
                for pdf in pdfs:
                    for s in pdf["shard"].tolist():
                        d = f"{hx}/shard={s}"
                        if not os.path.isdir(d):
                            yield pd.DataFrame({"shard": [s], "entries": [0],
                                                "path": [""]})
                            continue
                        tbl = pq.read_table(d, columns=["lh"], use_threads=False)
                        hv = tbl.column("lh").to_numpy(
                            zero_copy_only=False).astype(np.int64, copy=False
                        ).view(np.uint64)
                        uniq, counts = np.unique(hv, return_counts=True)
                        qf = QF.from_hashes(
                            uniq, counts.astype(np.uint64),
                            QFConfig(counter_bits=32, hash_name="xxhash64"),
                            assume_unique=True)
                        p = f"{paydir}/shard_{s}.qf"
                        with open(p, "wb") as f:
                            f.write(qf_to_bytes(qf))
                        yield pd.DataFrame({"shard": [s], "entries": [len(qf)],
                                            "path": [p]})

            res = shards_list.mapInPandas(_build, "shard int, entries long, path string")
            total = res.agg(F.sum("entries")).collect()[0][0]
            t2 = time.time()
            assert total == 18274440, (total, n)  # distinct keys in this input
            return t1 - t0, t2 - t1, t2 - t0
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    t = {}
    for trial in range(3):
        w, b, full = run_once(direct_write=True)
        t.setdefault("direct_write", []).append(w)
        t.setdefault("direct_build", []).append(b)
        t.setdefault("direct_full", []).append(full)
        w, b, full = run_once(direct_write=False)
        t.setdefault("repart_write", []).append(w)
        t.setdefault("repart_build", []).append(b)
        t.setdefault("repart_full", []).append(full)

    out = {"cores": cores, "rows": n}
    for k, v in t.items():
        out[k] = round(min(v), 2)
        out[k + "_trials"] = [round(x, 2) for x in v]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]))
