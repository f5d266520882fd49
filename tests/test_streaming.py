"""Structured Streaming incremental build: after consuming N micro-batches
the shard-table state must equal a batch build over the union of the
batches (associativity of the merge, applied incrementally)."""

import shutil
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from qfspark.build import build_sharded_qf, load_sharded_qf
from qfspark.sizing import QFConfig
from qfspark.streaming import load_stream_state, stream_build_sharded

from .conftest import SF_DIR


def test_stream_matches_batch(spark):
    tmp = tempfile.mkdtemp(prefix="qfstream_")
    src = f"{tmp}/src"
    state = f"{tmp}/state"
    try:
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
            F.col("user_id").cast("string").alias("user")
        )
        # two "arrival" files -> two micro-batches (the file stream source
        # expects plain files, so write each half as a single parquet file)
        import os

        os.makedirs(src, exist_ok=True)
        ev.where("CAST(user AS BIGINT) % 2 = 0").toPandas().to_parquet(f"{src}/b0.parquet")
        ev.where("CAST(user AS BIGINT) % 2 = 1").toPandas().to_parquet(f"{src}/b1.parquet")

        stream = (
            spark.readStream.schema("user string")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        cfg = QFConfig(counter_bits=32, hash_name="xxhash64")
        q = stream_build_sharded(
            stream, "user", state, shard_bits=2, config=cfg,
            trigger={"availableNow": True},
        )
        q.awaitTermination(240)

        got = load_stream_state(spark, state)
        want = load_sharded_qf(
            build_sharded_qf(ev, "user", shard_bits=2, config=cfg)
        )
        assert got.entries == want.entries
        exact = {
            r.user: r.cnt
            for r in ev.groupBy("user").agg(F.count(F.lit(1)).alias("cnt")).collect()
        }
        for user, cnt in exact.items():
            assert got.lookup(user) == (True, cnt), user
        # shard payloads byte-identical to the batch build
        for s, qf in want.shards.items():
            assert got.shards[s].to_bytes() == qf.to_bytes(), f"shard {s}"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
