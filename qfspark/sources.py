"""Table sources/sinks with format negotiation.

The production input per BASELINE.json is an **Iceberg** table of
Common-Crawl-style web pages; this sandbox has no Iceberg runtime jars,
so the same code paths run against parquet (identical columnar layout,
pushdown, and partition-pruning semantics — the plan-audit script
verifies pruned ReadSchema/PushedFilters either way). All qfspark readers
and the shard-checkpoint sink go through here, so pointing at a real
lakehouse is a config change, not a code change.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.Schema")
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, location: str, fmt: str = "auto",
               merge_schema: bool = False) -> DataFrame:
    """Read a table by path or catalog identifier.

    fmt='iceberg'  — catalog identifier (e.g. ``warehouse.db.web_pages``)
    fmt='parquet'  — filesystem path
    fmt='auto'     — iceberg when the runtime is present and the location
                     looks like an identifier, else parquet

    ``merge_schema=True`` unions the footer schemas of a parquet
    directory whose files were written by different library versions
    (resumed checkpoints; Iceberg handles evolution natively).
    """
    if fmt == "auto":
        looks_ident = "/" not in location and not location.endswith(".parquet")
        fmt = "iceberg" if (looks_ident and iceberg_available(spark)) else "parquet"
    if fmt == "iceberg":
        if not iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime not on the classpath; add "
                "org.apache.iceberg:iceberg-spark-runtime and a catalog "
                "config, or use fmt='parquet'"
            )
        return spark.read.format("iceberg").load(location)
    if fmt == "parquet":
        reader = spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(location)
    raise ValueError(f"unknown format {fmt!r}")


def write_checkpoint(df: DataFrame, location: str, fmt: str = "auto",
                     mode: str = "append") -> None:
    """Write the shard-checkpoint table. Iceberg gives the production
    properties (atomic commits, snapshot isolation for concurrent
    resumers, time travel over build lineage); parquet is the sandbox
    equivalent.

    ``mode='append'`` is for resumed builds (only missing shards are in
    ``df``); ``mode='overwrite'`` replaces the table — a fresh build
    (resume=False) never appends near-duplicate shard rows, and readers
    additionally resolve any duplicates to the newest ``build_ts``
    (``build.latest_shards``)."""
    spark = df.sparkSession
    if fmt == "auto":
        fmt = "iceberg" if (iceberg_available(spark) and "/" not in location) else "parquet"
    if fmt == "iceberg":
        if mode == "overwrite":
            df.writeTo(location).createOrReplace()
        else:
            df.writeTo(location).append()
        return
    df.write.mode(mode).parquet(location)


def approx_row_count(df: DataFrame, sample_files: int = 64,
                     fallback_count: bool = True) -> int | None:
    """Best-effort row-count estimate WITHOUT scanning the data — for
    callers that size a data structure from the corpus size at log2
    granularity (LSH plane counts, rows-per-shard exchange guards),
    where a small constant-factor error is equivalent to the exact
    count.

    Strategy ladder:
      1. Catalyst optimized-plan statistics (exact under CBO / cached
         relations / local relations).
      2. Parquet FOOTER metadata of the scan's input files — reads
         ``min(sample_files, |files|)`` footers driver-side (metadata
         pages only, no data IO) and scales by the file count; exact
         when every footer is read. Pre-filter count: an upstream
         filter makes this an overestimate, which only over-sizes the
         derived structure (safe direction). SKIPPED when the
         optimized plan contains a row-EXPANDING node (Generate /
         explode, Join): footers count base-file rows, so an 80x
         shingle explode would make this an 80x UNDERESTIMATE — the
         unsafe direction for callers like the sharded-build exchange
         guard, whose arrow path has a hard per-shard row bound.
      3. ``df.count()`` — the explicit fallback for in-memory /
         exotic sources and for row-expanding plans; the one
         remaining driver action, on a column-pruned scan. With
         ``fallback_count=False`` this step is skipped and ``None`` is
         returned instead — the action-free mode for callers gating a
         fast path who would rather take the slow path than pay an
         extra full pass for the estimate.
    """
    try:
        rc = df._jdf.queryExecution().optimizedPlan().stats().rowCount()
        if rc.isDefined():
            return int(str(rc.get()))
    except Exception:
        pass
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    if files and _plan_expands_rows(df):
        files = []  # footer counts would under-estimate: drop to count()
    if files:
        try:
            import pyarrow.parquet as pq

            paths = sorted(f[len("file:"):] if f.startswith("file:")
                           else f for f in files
                           if not f.startswith(("hdfs:", "s3:", "s3a:")))
            if paths and len(paths) == len(files):
                step = max(1, len(paths) // sample_files)
                sampled = paths[::step][:sample_files]
                rows = sum(pq.ParquetFile(p).metadata.num_rows
                           for p in sampled)
                return max(1, int(rows / len(sampled) * len(paths)))
        except Exception:
            pass
    return df.count() if fallback_count else None


def _plan_expands_rows(df: DataFrame) -> bool:
    """True when the optimized logical plan contains a node that can
    emit MORE rows than its inputs — ``Generate`` (explode/posexplode/
    inline), any ``Join``, ``Expand`` (cube/rollup/grouping sets), or
    an arbitrary-arity Python stage (``MapInPandas`` /
    ``FlatMapGroupsInPandas`` / ``FlatMapCoGroupsInPandas``): leaf-file
    footer row counts are then a potentially unbounded UNDERESTIMATE
    of the result cardinality. Filters/limits (fewer rows) are fine —
    they make footers an overestimate, which callers already document
    as the safe direction. Unreadable plans report True (can't prove
    linearity → don't trust footers)."""
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:
        return True
    # the tree prefix before a node name is ANY mix of spaces, ':'
    # (branch continuation, e.g. a Generate inside a Union leg), '+',
    # '-' and '|' at ANY nesting depth — the previous one-level
    # '[+:]- ' prefix missed expanding nodes nested under branch
    # continuations and could wrongly bless footer counts
    return bool(re.search(
        r"^[\s:+|-]*(?:Generate |\w*Join\b|Expand\b"
        r"|MapInPandas|FlatMap\w*)",
        plan, re.MULTILINE))
