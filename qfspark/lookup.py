"""Broadcast-filter lookup: membership/count as DataFrame columns.

The relational role of ``Contains`` (reference qf.go:448-459) at DataFrame
level is a broadcast existence join of the probe column against the key
set; here it is a broadcast of the serialized filter plus a vectorized
Arrow pandas UDF probe — constant memory per executor, no shuffle of the
probed table, no join.

The deserialized filter (with its probe index) is cached per executor
process keyed by a content digest (LRU-bounded), so repeated lookups
against the same filter pay the deserialize + index cost once and the
Arrow batches pay only the numpy probe cost.
"""

from __future__ import annotations

import hashlib
from collections import OrderedDict

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

from .build import (
    DEFAULT_HASH,
    ShardedQF,
    _dtype_of,
    hash_column,
    shard_payload_bytes,
)
from .kernel import QF
from .serde import qf_from_bytes, qf_to_bytes

# per-executor-process cache: payload digest -> deserialized filter.
# Keyed by CONTENT (not per-call id) so repeated annotate() calls with the
# same filter reuse one deserialized copy, and bounded so long-running
# executors don't accumulate dead filters.
_FILTER_CACHE: "OrderedDict[str, object]" = OrderedDict()
_FILTER_CACHE_MAX = 4

# driver-side cache: (applicationId, payload digest) -> Broadcast. Without
# it every annotate() call re-broadcasts the serialized payload even when
# the executor-side _FILTER_CACHE would hit — at a ~1 GB filter that is a
# full re-distribution per query. applicationId in the key keeps entries
# from a stopped SparkContext from being handed out to a new one.
_BROADCAST_CACHE: "OrderedDict[tuple, object]" = OrderedDict()
_BROADCAST_CACHE_MAX = 4


def _broadcast_payload(spark, payload: tuple, digest: str):
    sc = spark.sparkContext
    key = (sc.applicationId, digest)
    bc = _BROADCAST_CACHE.get(key)
    if bc is None:
        bc = sc.broadcast(payload)
        _BROADCAST_CACHE[key] = bc
        while len(_BROADCAST_CACHE) > _BROADCAST_CACHE_MAX:
            _, old = _BROADCAST_CACHE.popitem(last=False)
            try:
                old.unpersist()
            except Exception:
                pass  # context already stopped; nothing to release
    else:
        _BROADCAST_CACHE.move_to_end(key)
    return bc


def _payload_digest(payload: tuple) -> str:
    h = hashlib.sha1()
    h.update(payload[0].encode())
    if payload[0] == "qf":
        h.update(payload[1])
    else:
        h.update(str(payload[1]).encode())
        for s in sorted(payload[2]):
            h.update(str(s).encode())
            h.update(payload[2][s])
    return h.hexdigest()


def _serialize_filter(qf) -> tuple:
    if isinstance(qf, QF):
        return ("qf", qf_to_bytes(qf))
    if isinstance(qf, ShardedQF):
        return (
            "sharded",
            qf.shard_bits,
            {s: qf_to_bytes(f) for s, f in qf.shards.items()},
        )
    raise TypeError(f"expected QF or ShardedQF, got {type(qf)!r}")


def _deserialize_filter(payload: tuple):
    if payload[0] == "qf":
        qf = qf_from_bytes(payload[1])
        qf.build_index()
        return qf
    _, shard_bits, blobs = payload
    shards = {}
    for s, b in blobs.items():
        f = qf_from_bytes(b)
        f.build_index()
        shards[s] = f
    return ShardedQF(shard_bits, shards)


def annotate(
    df: DataFrame,
    col: str,
    qf,
    seen_col: str = "qf_seen",
    count_col: str = "qf_count",
) -> DataFrame:
    """Add boolean membership and approximate-count columns for ``col``.

    ``df.withColumn('seen', ...).withColumn('cnt', ...)`` semantics:
    zero false negatives; a "seen" answer is wrong with probability
    <= 2^-r; counts are exact under the filter's counter width for true
    members."""
    spark = df.sparkSession
    hash_name = qf.config.hash_name if isinstance(qf, QF) else qf.hash_name
    payload = _serialize_filter(qf)
    digest = _payload_digest(payload)
    bc = _broadcast_payload(spark, payload, digest)

    @pandas_udf("struct<seen: boolean, cnt: long>")
    def _probe(h: pd.Series) -> pd.DataFrame:
        flt = _FILTER_CACHE.get(digest)
        if flt is None:
            flt = _deserialize_filter(bc.value)
            _FILTER_CACHE[digest] = flt
            while len(_FILTER_CACHE) > _FILTER_CACHE_MAX:
                _FILTER_CACHE.popitem(last=False)
        else:
            _FILTER_CACHE.move_to_end(digest)
        hv = h.to_numpy(dtype=np.int64).view(np.uint64)
        found, counts = flt.lookup_hashes(hv)
        return pd.DataFrame(
            {"seen": found, "cnt": counts.astype(np.int64)}
        )

    probe_struct = _probe(hash_column(col, hash_name, _dtype_of(df, col)))
    # NULL policy: a NULL key is never a member (builds drop NULLs; see
    # build.py module docstring) — mask instead of hashing NULL, which
    # Spark and byte-oriented engines hash differently
    is_null = F.col(col).isNull()
    return df.withColumn("_qf_probe", probe_struct).select(
        *df.columns,
        F.when(is_null, F.lit(False))
        .otherwise(F.col("_qf_probe.seen")).alias(seen_col),
        F.when(is_null, F.lit(0).cast("long"))
        .otherwise(F.col("_qf_probe.cnt")).alias(count_col),
    )


def annotate_via_shard_table(
    df: DataFrame,
    col: str,
    shards_df: DataFrame,
    seen_col: str = "qf_seen",
    count_col: str = "qf_count",
    probe_splits: int | None = None,
) -> DataFrame:
    """Membership/count lookup against a *checkpointed shard table*
    without broadcasting anything — the path for filters too large for
    executor memory (10^12-entry scale: the shard table is TBs; any one
    shard is ~1 GB).

    Probes route by the top ``shard_bits`` of their hash and cogroup with
    the one shard row that owns that hash range: each task deserializes
    exactly one shard and batch-probes its group of keys. The shuffle
    moves (key, hash) pairs grouped by shard — uniformly distributed,
    since top hash bits are uniform over distinct keys.

    ``probe_splits`` decouples probe parallelism from the shard count:
    each shard's probes are salted into that many sub-groups and the
    shard row is replicated once per salt, so a 16-shard table can still
    drive hundreds of probe tasks at 10^12-probe volume. Defaults to
    ceil(defaultParallelism / shard_count), so total probe tasks ~= the
    cluster's parallelism. Duplicate shard rows (appended re-builds) are
    resolved to the newest ``build_ts``.

    All input columns pass through (same contract as ``annotate``), and
    NULL keys report unseen (the build-side NULL policy's probe half).
    """
    first = shards_df.select("shard_bits", "hash_name").limit(1).collect()[0]
    sb, hash_name = int(first.shard_bits), first.hash_name
    spark = df.sparkSession
    if probe_splits is None:
        par = spark.sparkContext.defaultParallelism
        probe_splits = max(1, -(-par // max(1, 1 << sb)))

    passthrough = [c for c in df.columns
                   if c not in (seen_col, count_col)]
    hashed = df.select(
        *passthrough,
        hash_column(col, hash_name, _dtype_of(df, col)).alias("_qf_h"),
    ).withColumn(
        "_qf_shard",
        F.shiftrightunsigned(F.col("_qf_h"), 64 - sb) if sb
        else F.lit(0).cast("long"),
    ).withColumn(
        # salt on LOW hash bits (independent of the top routing bits):
        # uniform sub-split of each shard's probe stream
        "_qf_salt", F.pmod(F.col("_qf_h"), F.lit(probe_splits)).cast("long"),
    )

    from .build import latest_shards

    # one row per shard BEFORE replication: a polluted checkpoint with
    # k stale rows per shard would otherwise shuffle k x probe_splits
    # copies of every payload blob
    shard_cols = latest_shards(shards_df).select(
        F.col("shard").alias("_qf_shard"), "payload", "payload_path",
        "build_ts")
    replicated = shard_cols.withColumn(
        "_qf_salt",
        F.explode(F.sequence(F.lit(0).cast("long"),
                             F.lit(probe_splits - 1).cast("long"))),
    )
    def _probe_group(probes: pd.DataFrame, shard_rows: pd.DataFrame) -> pd.DataFrame:
        out = probes[passthrough].copy()
        if len(probes) == 0:
            out[seen_col] = pd.Series([], dtype=bool)
            out[count_col] = pd.Series([], dtype="int64")
            return out
        hv = probes["_qf_h"].to_numpy(dtype=np.int64).view(np.uint64)
        local = hv << np.uint64(sb)
        if len(shard_rows) == 0:
            found = np.zeros(len(probes), dtype=bool)
            counts = np.zeros(len(probes), dtype=np.int64)
        else:
            newest = shard_rows.loc[shard_rows["build_ts"].idxmax()]
            qf = qf_from_bytes(shard_payload_bytes(newest))
            f, c = qf.lookup_hashes(local)
            found, counts = f, c.astype(np.int64)
        # NULL policy: a NULL key is never a member (builds drop NULLs)
        isnull = probes[col].isna().to_numpy()
        found = np.where(isnull, False, found)
        counts = np.where(isnull, 0, counts)
        out[seen_col] = found
        out[count_col] = counts
        return out

    from pyspark.sql.types import BooleanType, LongType, StructField, StructType

    out_schema = StructType(
        [df.schema[c] for c in passthrough]
        + [StructField(seen_col, BooleanType(), False),
           StructField(count_col, LongType(), False)]
    )
    return (
        hashed.groupBy("_qf_shard", "_qf_salt")
        .cogroup(replicated.groupBy("_qf_shard", "_qf_salt"))
        .applyInPandas(_probe_group, schema=out_schema)
    )


def filter_unseen_via_shard_table(df: DataFrame, col: str,
                                  shards_df: DataFrame,
                                  probe_splits: int | None = None) -> DataFrame:
    """``filter_unseen`` against a checkpointed shard table, broadcasting
    nothing — the incremental-crawl anti-join at 10^12-entry filter scale
    (any one shard may be ~1 GB; no executor ever holds more than the one
    shard its task probes)."""
    out = annotate_via_shard_table(
        df, col, shards_df, seen_col="_qf_seen", count_col="_qf_cnt",
        probe_splits=probe_splits)
    return out.where(~F.col("_qf_seen")).drop("_qf_seen", "_qf_cnt")


def filter_unseen(df: DataFrame, col: str, qf) -> DataFrame:
    """Rows whose key is NOT in the filter — the incremental-crawl /
    training-data dedup primitive ("drop documents whose url/shingle was
    already seen"). Zero false negatives means nothing already-seen leaks
    through; a new row is wrongly dropped with probability <= 2^-r.

    Relational role: broadcast left-anti join against the key set,
    without shuffling the probed table."""
    annotated = annotate(df, col, qf, seen_col="_qf_seen", count_col="_qf_cnt")
    return annotated.where(~F.col("_qf_seen")).drop("_qf_seen", "_qf_cnt")


def filter_seen(df: DataFrame, col: str, qf) -> DataFrame:
    """Rows whose key IS (probably) in the filter — broadcast left-semi
    join analog; complement of filter_unseen."""
    annotated = annotate(df, col, qf, seen_col="_qf_seen", count_col="_qf_cnt")
    return annotated.where(F.col("_qf_seen")).drop("_qf_seen", "_qf_cnt")
