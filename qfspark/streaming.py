"""Structured Streaming: incremental CQF construction.

The reference is batch-only (no streaming anywhere in go-qfext); this
module is qfspark's forward extension, built on exactly the property the
batch pipeline proves: the filter is a distributive, associative
aggregate, so an incremental build is "merge each micro-batch's partial
into the running state".

``stream_build_sharded`` wires a streaming DataFrame into foreachBatch:
every micro-batch runs the same sharded build as the batch path and the
checkpointed shard table is *merged* shard-by-shard (QF.merge — lossless,
associative), so the shard table after N micro-batches is byte-identical
to a batch build over the union of the batches. Exactly-once batch-id
tracking makes re-delivered micro-batches idempotent.

State lives in the shard table, not in executor memory: the stream can
stop and resume from the checkpoint like any other qfspark build.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, functions as F

from .build import DEFAULT_HASH, build_sharded_qf, hash_column, load_sharded_qf
from .kernel import QF
from .serde import qf_from_bytes, qf_to_bytes
from .sizing import QFConfig


def _merge_shard_tables(spark, existing_path: str, new_df: DataFrame,
                        out_path: str) -> None:
    """Merge a new shard table into an existing one shard-by-shard
    (executor-side applyInPandas; both tables are tiny relative to the
    corpus — one row per shard)."""
    import pandas as pd

    existing = spark.read.parquet(existing_path)
    # allowMissingColumns: a state dir written by an older qfspark lacks
    # later lineage columns (e.g. build_secs, added in 0.3.0) — nulls
    # fill the gap and the merged row keeps the superset schema
    both = existing.unionByName(new_df, allowMissingColumns=True)

    def _merge(pdf: pd.DataFrame) -> pd.DataFrame:
        from .build import shard_payload_bytes

        filters = [qf_from_bytes(shard_payload_bytes(r))
                   for _, r in pdf.iterrows()]
        merged = QF.merge_many(filters) if len(filters) > 1 else filters[0]
        row = pdf.iloc[0].copy()
        row["payload"] = qf_to_bytes(merged)
        if "payload_path" in row.index:
            row["payload_path"] = ""  # merged state is stored inline
        row["entries"] = len(merged)
        row["q_bits"] = merged.q_bits
        row["n_rows"] = int(pdf["n_rows"].sum())
        if "build_secs" in row.index:
            # old-state rows contribute null after the permissive union
            row["build_secs"] = float(pdf["build_secs"].fillna(0.0).sum())
        return pd.DataFrame([row])

    # the permissive union's (superset) schema, not the old table's
    merged_df = both.groupBy("shard").applyInPandas(_merge, schema=both.schema)
    merged_df.write.mode("overwrite").parquet(out_path)


# -- shared micro-batch commit protocol -------------------------------------
#
# Processed batch ids live INSIDE the committed directory (underscore
# prefix: ignored by parquet readers, like _SUCCESS) and are written
# LAST into <name>_next, so the ids file doubles as the completeness
# marker. The swap is two renames (table -> <name>_old, next -> table);
# a crash between them leaves no table directory, which `_recover_table`
# repairs on the next call: a COMPLETE <name>_next (marker present) is
# the newer state and finishes the swap forward; otherwise <name>_old
# rolls back. Local-filesystem semantics; a lakehouse deployment gets
# the same atomicity from Iceberg transactional commits (sources.py).

_IDS = "_batch_ids.json"


def _recover_table(state_path: str, name: str) -> None:
    """Finish (or roll back) an interrupted two-rename swap of
    ``<state_path>/<name>``; afterwards clean any leftovers."""
    import shutil

    table = os.path.join(state_path, name)
    nxt = os.path.join(state_path, f"{name}_next")
    old = os.path.join(state_path, f"{name}_old")
    if not os.path.exists(table):
        if os.path.exists(os.path.join(nxt, _IDS)):
            os.rename(nxt, table)   # complete newer state: roll forward
        elif os.path.exists(old):
            os.rename(old, table)   # incomplete next: roll back
    shutil.rmtree(old, ignore_errors=True)


def _seen_ids(state_path: str, name: str) -> set:
    p = os.path.join(state_path, name, _IDS)
    if os.path.exists(p):
        with open(p) as f:
            return set(json.load(f))
    return set()


def _commit_table(state_path: str, name: str, seen: set) -> None:
    """Record ``seen`` into <name>_next (the completeness marker) and
    swap it into place."""
    import shutil

    table = os.path.join(state_path, name)
    nxt = os.path.join(state_path, f"{name}_next")
    old = os.path.join(state_path, f"{name}_old")
    with open(os.path.join(nxt, _IDS), "w") as f:
        json.dump(sorted(seen), f)
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(table):
        os.rename(table, old)
    os.rename(nxt, table)
    shutil.rmtree(old, ignore_errors=True)


def stream_build_sharded(
    stream_df: DataFrame,
    col: str,
    state_path: str,
    shard_bits: int = 4,
    config: QFConfig | None = None,
    trigger: dict | None = None,
):
    """Start a streaming query that maintains a sharded CQF at
    ``state_path/shards`` from a streaming source of keys.

    Returns the StreamingQuery. The shard table is replaced atomically
    per micro-batch (the shared commit protocol above), and processed
    batch ids are recorded for idempotent re-delivery."""
    config = config or QFConfig(hash_name=DEFAULT_HASH, counter_bits=32)
    spark = stream_df.sparkSession
    shards_path = os.path.join(state_path, "shards")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        import shutil

        _recover_table(state_path, "shards")
        seen = _seen_ids(state_path, "shards")
        if batch_id in seen:
            return  # re-delivered micro-batch: already merged
        new_shards = build_sharded_qf(
            batch_df, col, shard_bits=shard_bits, config=config,
            checkpoint_path=None,
        )
        next_path = os.path.join(state_path, "shards_next")
        shutil.rmtree(next_path, ignore_errors=True)
        if os.path.exists(shards_path):
            _merge_shard_tables(spark, shards_path, new_shards, next_path)
        else:
            new_shards.write.mode("overwrite").parquet(next_path)
        _commit_table(state_path, "shards", seen | {batch_id})

    writer = stream_df.writeStream.foreachBatch(_process).outputMode("update")
    writer = writer.option(
        "checkpointLocation", os.path.join(state_path, "_spark_checkpoint")
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def load_stream_state(spark, state_path: str):
    """Load the current streaming filter state as a ShardedQF
    (finishing any crash-interrupted commit first)."""
    _recover_table(state_path, "shards")
    return load_sharded_qf(spark.read.parquet(os.path.join(state_path, "shards")))


def stream_sketch(
    stream_df: DataFrame,
    col: str,
    state_path: str,
    kind: str = "hll",
    trigger: dict | None = None,
    **params,
):
    """Maintain a mergeable sketch table (sketches.py) from a streaming
    key source — the incremental form of the same distributive aggregate
    the CQF stream uses, for the rest of the sketch family:

    * ``kind='hll'`` (params: p) — running distinct-count registers
    * ``kind='countmin'`` (params: depth, width) — running frequencies
    * ``kind='bloom'`` (params: m_bits, k) — running membership bits
    * ``kind='bottomk'`` (params: value_col, k) — running uniform
      key-sample (quantiles/sampling over the stream so far)
    * ``kind='kmv'`` (params: k) — running theta sketch (distinct
      count + set algebra via ``sketches.kmv_set_ops``)
    * ``kind='hll_by'`` (params: by, p) — running PER-GROUP distinct
      counts (``sketches.hll_registers_by`` state; estimate with
      ``hll_estimate_by``)
    * ``kind='bottomk_by'`` (params: by, value_col, k) — running
      per-group key-sample (``bottomk_quantiles_by`` over the state)
    * ``kind='mg'`` (params: k, weight_col) — running Misra-Gries
      heavy hitters; state rows are the summary schema (item, est, err)
    * ``kind='mg_by'`` (params: by, k, weight_col) — running per-group
      heavy hitters
    * ``kind='priority'`` (params: weight_col, k) — running
      weight-sensitive sample with unbiased subset sums
      (``sketches.priority_estimates`` over the state)
    * ``kind='countmin_by'`` (params: by, depth, width) — running
      PER-GROUP frequency tables (``countmin_query_by`` over the
      state; cell-wise sum merge is exact, so state is row-identical
      to a batch build over the union)
    * ``kind='kll'`` / ``kind='kll_by'`` (params: value_col, k [, by])
      — running (per-group) quantile sketch: state is the compactor-
      row table, merged by union + compaction (union-then-compress IS
      the KLL merge), so state stays <= O(k log n) rows per group at
      any stream length. Quantiles over the union hold the MERGED
      sketch's rank bound, not row-identity (like MG, the compactor
      contents depend on the merge tree; the bound is what's tested).
      Read with ``load_stream_sketch`` + ``_kll_from_level_rows``.
    * ``kind='priority_by'`` (params: by, weight_col, k) — running
      per-group weight-sensitive sample (exact merge: per-group
      top-(k+1) of a union is the top-(k+1) of concatenated sketches)

    Per micro-batch: build the batch's partial sketch, merge it into the
    checkpointed table (max/sum/union — each merge == rebuild exactly,
    so after N batches the state is ROW-IDENTICAL to a batch build over
    the union of the batches; tested), commit by atomic directory rename
    with recorded batch ids for idempotent re-delivery. State lives in
    the table, not executor memory; stop/resume is a re-read.

    Misra-Gries is the one member whose state is not a pure function of
    the input multiset (like any MG run, it depends on arrival order):
    the streamed state satisfies the same guarantee as a batch build
    over the union — every key within ``est <= true <= est + err`` and
    ``err <= n/(k+1)`` — rather than row-identity; tested as such.

    Returns the StreamingQuery; read the state with
    ``load_stream_sketch`` and feed it to ``sketches.hll_estimate`` /
    ``countmin_query`` / ``bloom_contains``."""
    from . import sketches

    scheme = params.get("hash_scheme", "hash60")
    builders = {
        "hll": (
            lambda df: sketches.hll_registers(
                df, col, params.get("p", 12), hash_scheme=scheme),
            sketches.hll_merge,
        ),
        "countmin": (
            lambda df: sketches.countmin_table(
                df, col, params.get("depth", 4), params.get("width", 1024),
                hash_scheme=scheme),
            sketches.countmin_merge,
        ),
        "bloom": (
            lambda df: sketches.bloom_bits(
                df, col, params.get("m_bits", 1 << 16), params.get("k", 4),
                hash_scheme=scheme),
            sketches.bloom_merge,
        ),
        "bottomk": (
            lambda df: sketches.bottomk_sketch(
                df, col, params.get("value_col", col),
                params.get("k", 512), hash_scheme=scheme),
            lambda a, b: sketches.bottomk_merge(
                a, b, params.get("k", 512)),
        ),
        "kmv": (
            lambda df: sketches.kmv_sketch(
                df, col, params.get("k", 256), hash_scheme=scheme),
            lambda a, b: sketches.kmv_merge(
                a, b, params.get("k", 256)),
        ),
        "hll_by": (
            lambda df: sketches.hll_registers_by(
                df, col, params["by"], params.get("p", 12),
                hash_scheme=scheme),
            lambda a, b: sketches.hll_merge_by(params["by"], a, b),
        ),
        "bottomk_by": (
            lambda df: sketches.bottomk_sketch_by(
                df, col, params.get("value_col", col), params["by"],
                params.get("k", 512), hash_scheme=scheme),
            lambda a, b: sketches.bottomk_merge_by(
                a, b, params["by"], params.get("k", 512)),
        ),
        "mg": (
            lambda df: sketches.mg_summary(
                df, col, params.get("k", 256),
                weight_col=params.get("weight_col")),
            lambda a, b: sketches.mg_merge(a, b, params.get("k", 256)),
        ),
        "mg_by": (
            lambda df: sketches.mg_summary_by(
                df, col, params["by"], params.get("k", 256),
                weight_col=params.get("weight_col")),
            lambda a, b: sketches.mg_merge_by(
                a, b, params["by"], params.get("k", 256)),
        ),
        "priority": (
            lambda df: sketches.priority_sample(
                df, col, params["weight_col"], params.get("k", 256),
                hash_scheme=scheme),
            lambda a, b: sketches.priority_sample_merge(
                a, b, params.get("k", 256)),
        ),
        "countmin_by": (
            lambda df: sketches.countmin_table_by(
                df, col, params["by"], params.get("depth", 4),
                params.get("width", 1024), hash_scheme=scheme),
            lambda a, b: sketches.countmin_merge_by(params["by"], a, b),
        ),
        "kll": (
            lambda df: sketches.kll_partials(
                df, params.get("value_col", col), params.get("k", 256)),
            lambda a, b: sketches.kll_compact_partials(
                a.unionByName(b), params.get("k", 256)),
        ),
        "kll_by": (
            lambda df: sketches.kll_partials_by(
                df, params.get("value_col", col), params["by"],
                params.get("k", 256)),
            lambda a, b: sketches.kll_compact_partials_by(
                a.unionByName(b), params["by"], params.get("k", 256)),
        ),
        "priority_by": (
            lambda df: sketches.priority_sample_by(
                df, col, params["weight_col"], params["by"],
                params.get("k", 256), hash_scheme=scheme),
            lambda a, b: sketches.priority_sample_merge_by(
                a, b, params["by"], params.get("k", 256)),
        ),
    }
    if kind not in builders:
        raise ValueError(f"unknown sketch kind {kind!r}; "
                         f"expected one of {sorted(builders)}")
    if kind.endswith("_by") and "by" not in params:
        raise ValueError(
            f"kind={kind!r} requires params['by'] (group column list)")
    if kind in ("priority", "priority_by") and "weight_col" not in params:
        raise ValueError(f"kind={kind!r} requires params['weight_col']")
    build_fn, merge_fn = builders[kind]
    spark = stream_df.sparkSession
    table_path = os.path.join(state_path, "sketch")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        import shutil

        _recover_table(state_path, "sketch")
        seen = _seen_ids(state_path, "sketch")
        if batch_id in seen:
            return  # re-delivered micro-batch: already merged
        partial = build_fn(batch_df)
        next_path = os.path.join(state_path, "sketch_next")
        shutil.rmtree(next_path, ignore_errors=True)
        if os.path.exists(table_path):
            merged = merge_fn(spark.read.parquet(table_path), partial)
        else:
            merged = partial
        merged.write.mode("overwrite").parquet(next_path)
        _commit_table(state_path, "sketch", seen | {batch_id})

    writer = stream_df.writeStream.foreachBatch(_process).outputMode("update")
    writer = writer.option(
        "checkpointLocation", os.path.join(state_path, "_spark_checkpoint"))
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def load_stream_sketch(spark, state_path: str) -> DataFrame:
    """Read the current streaming sketch table (finishing any
    crash-interrupted commit first)."""
    _recover_table(state_path, "sketch")
    return spark.read.parquet(os.path.join(state_path, "sketch"))


def stateful_streaming_dedup(
    stream_df: DataFrame,
    key_col: str,
    n_groups: int = 64,
    counter_bits: int = 0,
    timeout: str = "NoTimeout",
):
    """Streaming first-occurrence dedup with *sketch state*: emit each key
    the first time it is ever seen on the stream, using a quotient filter
    per state group as the memory of the past (applyInPandasWithState).

    This is the custom-stateful-operator shape the north_star points at:
    state per group is a serialized CQF (bounded: ~9 bits/key at 2^-r
    error instead of storing the keys), keys route to groups by hash, and
    each micro-batch probes + inserts in one vectorized pass. Zero false
    negatives means a duplicate is never re-emitted; a brand-new key is
    wrongly suppressed with probability <= 2^-r.

    Returns a streaming DataFrame of (key) rows — first occurrences only.
    """
    import numpy as np

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from .kernel import QF
    from .sizing import QFConfig

    key_dtype = stream_df.schema[key_col].dataType.simpleString()
    hashed = stream_df.select(
        F.col(key_col).alias("key"),
        hash_column(
            key_col, DEFAULT_HASH, stream_df.schema[key_col].dataType.typeName()
        ).alias("h"),
    ).withColumn("grp", F.pmod(F.col("h"), F.lit(n_groups)))

    def _dedup(key, pdf_iter, state: GroupState):
        if state.exists:
            (blob,) = state.get
            qf = qf_from_bytes(bytes(blob))
        else:
            qf = QF(QFConfig(counter_bits=counter_bits, hash_name=DEFAULT_HASH))
        import pandas as pd

        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            hv = pdf["h"].to_numpy(np.int64).view(np.uint64)
            found, _ = qf.lookup_hashes(hv)
            # keep only the first occurrence within the batch as well
            cand = np.flatnonzero(~found)
            _, first = np.unique(hv[cand], return_index=True)
            fresh_rows = cand[np.sort(first)]
            if len(fresh_rows):
                new_hashes = hv[fresh_rows]
                if len(qf) == 0:
                    qf = QF.from_hashes(new_hashes, None, qf.config)
                elif len(new_hashes) * 16 < len(qf):
                    # steady state: per-batch cost stays O(batch), not
                    # O(state) — one batched ripple-insert pass into
                    # the existing filter (QF.insert_hashes: sorted
                    # order, per-insert Python overhead hoisted)
                    # instead of a decode+rebuild. value=1 matches what
                    # from_hashes stores for a first occurrence
                    # (counter parity across branches)
                    qf.insert_hashes(new_hashes, value=1)
                else:
                    # batch is large relative to state: one vectorized
                    # rebuild is cheaper than per-key inserts
                    qf = QF.merge_many(
                        [qf, QF.from_hashes(new_hashes, None, qf.config)]
                    )
                yield pd.DataFrame({"key": pdf["key"].iloc[fresh_rows]})
        state.update((qf_to_bytes(qf),))

    from pyspark.sql.functions import pandas_udf  # noqa: F401  (import check)

    return hashed.groupBy("grp").applyInPandasWithState(
        _dedup,
        outputStructType=f"key {key_dtype}",
        stateStructType="filter binary",
        outputMode="append",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )


def windowed_distinct_counts(
    stream_df: DataFrame,
    ts_col: str,
    key_col: str,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    p: int = 12,
    hash_scheme: str = "hash60",
) -> DataFrame:
    """Approximate DISTINCT keys per event-time window (e.g. distinct
    urls fetched per 10-minute window): HLL registers maintained as a
    native windowed streaming aggregation —
    groupBy(window, bucket).max(rho) with a watermark, so Spark's own
    state store holds at most 2^p register rows per open window and
    evicts closed windows. No custom state function: the register max
    IS a Catalyst aggregate, which keeps the whole operator JVM-side.

    Returns the streaming register table (window_start, window_end,
    bucket, rho_max) in append mode (rows emitted when the watermark
    closes a window); feed collected/stored rows to
    ``sketches.hll_estimate_by(regs, ["window_start", "window_end"], p)``
    for the per-window estimates. Closed-window rows are row-identical
    to a batch ``hll_registers_by`` over the same data (tested)."""
    from .sketches import HASH_BITS, sketch_hash

    if not (4 <= p <= 18):
        raise ValueError(f"p must be in [4, 18], got {p}")
    m = 1 << p
    w_bits = HASH_BITS - p
    h = sketch_hash(key_col, hash_scheme)
    return (
        stream_df.withWatermark(ts_col, watermark)
        .where(F.col(key_col).isNotNull())
        .select(
            F.window(F.col(ts_col), window).alias("w"),
            F.expr(h).alias("_h"),
        )
        .select(
            "w",
            F.expr(f"CAST(pmod(_h, {m}) AS INT)").alias("bucket"),
            F.expr(
                f"CAST(CASE WHEN shiftrightunsigned(_h, {p}) = 0 "
                f"THEN {w_bits + 1} "
                f"ELSE {w_bits} - length(bin(shiftrightunsigned(_h, {p})))"
                f" + 1 END AS INT)"
            ).alias("rho"),
        )
        .groupBy("w", "bucket")
        .agg(F.max("rho").alias("rho_max"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "bucket",
            "rho_max",
        )
    )


def windowed_quantiles(
    stream_df: DataFrame,
    ts_col: str,
    value_col: str,
    qs: list[float],
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    accuracy: int = 10_000,
) -> DataFrame:
    """Approximate quantiles per event-time window (e.g. per-10-minute
    fetch-latency p50/p99): Spark's own ``percentile_approx``
    aggregate under a watermark — a NATIVE windowed streaming
    aggregation, fully JVM-side (Catalyst's ApproximatePercentile
    sketch lives in the state store per open window; closed windows
    evict on watermark advance). Returns (window_start, window_end,
    q, est) rows in append mode. The guarantee on closed-window rows
    is the published rank-error bound: each estimate's rank is within
    n/``accuracy`` of the requested quantile's over the window's data
    (ApproximatePercentile's result can depend on the partial-merge
    tree, so exact identity with a batch ``percentile_approx`` over
    the same rows holds only when the merge order coincides — as it
    does in the single-trigger availableNow parity test — and is NOT
    guaranteed across arbitrary micro-batch/partition splits).
    ``accuracy`` trades state size for rank error. NULL values
    excluded.

    This is the third member of the native windowed family
    (``windowed_key_counts``, ``windowed_distinct_counts``); for
    per-GROUP rather than per-window quantiles over a stream, the
    ``kll``/``kll_by`` ``stream_sketch`` kinds hold the compactor
    state instead."""
    qs_arr = "array(" + ", ".join(
        f"CAST({float(q)!r} AS DOUBLE)" for q in qs) + ")"
    return (
        stream_df.withWatermark(ts_col, watermark)
        .where(F.col(value_col).isNotNull())
        .select(F.window(F.col(ts_col), window).alias("w"),
                F.col(value_col).cast("double").alias("_v"))
        .groupBy("w")
        .agg(F.expr(f"percentile_approx(_v, {qs_arr}, {accuracy})")
             .alias("_ests"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.explode(F.arrays_zip(
                F.expr(qs_arr).alias("q"),
                F.col("_ests").alias("est"))).alias("_z"),
        )
        .select("window_start", "window_end",
                F.col("_z.q").alias("q"), F.col("_z.est").alias("est"))
    )


def windowed_key_counts(
    stream_df: DataFrame,
    ts_col: str,
    key_col: str,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time windowed key counts with late-data handling: the
    standard watermark + tumbling-window aggregation a streaming
    ingestion pipeline runs ahead of the filter build (e.g. per-window
    url fetch counts). Rows later than ``watermark`` past the max seen
    event time are dropped and window state is evicted — bounded state
    regardless of stream length.

    Returns (window_start, window_end, key, cnt); pair with
    ``stream_build_sharded`` to maintain a CQF per completed window.
    """
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            F.col(key_col).alias("key"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "key",
            "cnt",
        )
    )


def windowed_heavy_hitters(
    stream_df: DataFrame,
    ts_col: str,
    key_col: str,
    k: int = 256,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    shards: int = 8,
    weight_col: str | None = None,
) -> DataFrame:
    """Approximate heavy hitters per event-time window (e.g. top domains
    per 10-minute ingestion window): a Misra-Gries summary per
    (window, item-hash shard) group maintained in
    ``applyInPandasWithState`` with event-time timeout eviction — the
    fourth member of the windowed family (``windowed_key_counts``,
    ``windowed_distinct_counts``, ``windowed_quantiles``), completing
    counts / distinct counts / quantiles / top-k.

    Exact per-window key counts need one state row per (window, key) —
    unbounded in distinct keys. This operator's state is
    ``shards * (k+1)`` counters per OPEN window, independent of the key
    universe, and closed windows are evicted by the timeout the moment
    the watermark passes their end.

    Sharding: items route to ``pmod(xxhash64(item), shards)``, so every
    occurrence of an item lands in ONE shard and the per-item guarantee
    is inherited from that shard's summary over its substream:
    ``est <= true_window_count <= est + err`` with
    ``err <= n_shard/(k+1) <= n_window/(k+1)``, and every item whose
    true window count exceeds ``n_window/(k+1)`` is guaranteed present
    (it certainly exceeds its own shard's ``n_shard/(k+1)``). Sharding
    also spreads a hot window across ``shards`` state-store partitions
    instead of funnelling the whole micro-batch through one group.

    Scale shape: the shuffle moving rows to their (window, shard) group
    carries two/three columns (window struct, item[, weight]); per-batch
    per-group work is one vectorized ``value_counts`` + an O(k log k)
    prune (classic streaming MG: prune after every batch, so the
    in-flight dict holds <= k + batch-distinct entries); <= k rows leave
    each group only when its window closes. Like any Misra-Gries run the
    surviving counter set depends on arrival order, so closed-window
    rows are gated on the bound above vs a batch count over the
    window's data, not on row-identity (tested).

    With ``weight_col`` (non-negative integer weights, e.g. bytes per
    page) counts become weight sums and n the total window weight.

    Returns a streaming DataFrame of
    (window_start, window_end, item, est, err) rows in append mode —
    rows are emitted only when a window's watermark-driven timeout
    fires, i.e. every emitted row belongs to a CLOSED window. ``err``
    is the emitting shard's accumulated decrement total (the item's
    under-count bound). Aggregate nothing downstream: the table is
    already <= shards*k rows per window."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")

    cols = [
        F.window(F.col(ts_col), window).alias("w"),
        F.col(key_col).cast("string").alias("item"),
    ]
    if weight_col is not None:
        cols.append(F.col(weight_col).cast("long").alias("wt"))
    # the watermark rides as metadata on the window-struct attribute:
    # keep `w` whole through the groupBy (projecting w.start/w.end
    # strips the delay tag and the event-time timeout is rejected)
    routed = (
        stream_df.withWatermark(ts_col, watermark)
        .where(F.col(key_col).isNotNull())
        .select(*cols)
        .select(
            "w",
            F.pmod(F.xxhash64("item"), F.lit(shards)).alias("shard"),
            *(["item"] if weight_col is None else ["item", "wt"]),
        )
    )

    def _mg(key, pdf_iter, state: GroupState):
        w, _shard = key
        window_start, window_end = (
            (w["start"], w["end"]) if isinstance(w, dict)
            else (w[0], w[1]))
        if state.hasTimedOut:
            # watermark passed window_end: emit the closed window's
            # summary rows and drop the state
            if state.exists:
                items, counts, err = state.get
                state.remove()
                if len(items):
                    yield pd.DataFrame({
                        "window_start": [window_start] * len(items),
                        "window_end": [window_end] * len(items),
                        "item": list(items),
                        "est": list(counts),
                        "err": [err] * len(items),
                    })
            return
        if state.exists:
            items, counts, err = state.get
            running = pd.Series(list(counts),
                                index=list(items), dtype="int64")
            err = int(err)
        else:
            running, err = None, 0
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            if weight_col is None:
                vc = pdf["item"].value_counts()
            else:
                sub = pdf.dropna(subset=["wt"])
                if (sub["wt"] < 0).any():
                    raise ValueError(
                        "windowed_heavy_hitters weights must be "
                        "non-negative")
                vc = sub.groupby("item")["wt"].sum()
            running = vc if running is None \
                else running.add(vc, fill_value=0)
            running = running.astype("int64")
            if len(running) > k:
                # subtract the (k+1)-th largest from every counter and
                # drop the non-positives — removes >= (k+1)*t of
                # counter mass, the accounting the n/(k+1) bound
                # rides on
                t = int(running.sort_values(ascending=False).iloc[k])
                running = running - t
                running = running[running > 0]
                err += t
        if running is not None:
            state.update((list(map(str, running.index)),
                          [int(c) for c in running.to_numpy()], err))
            # evict when the watermark passes the window end (strictly
            # later than the current watermark: every row reaching this
            # group has ts >= watermark and ts < window_end)
            state.setTimeoutTimestamp(
                int(window_end.timestamp() * 1000))

    return routed.groupBy("w", "shard").applyInPandasWithState(
        _mg,
        outputStructType=(
            "window_start timestamp, window_end timestamp, "
            "item string, est long, err long"),
        stateStructType="items array<string>, counts array<long>, err long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
