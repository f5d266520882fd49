"""Mergeable sketch / approximate-aggregation library.

The north-star role of this repo is a PySpark-native *sketch* engine: the
CQF (kernel.py/build.py) is the flagship, and this module supplies the
rest of the classic family over the same web-pages data model — each as
a mergeable aggregation whose partial results combine associatively, the
UDAF shape that makes 10^12-row builds shuffle-light:

* HyperLogLog        — distinct count (register table, max-merge)
* count-min          — frequency estimation (counter table, sum-merge)
* Bloom filter       — membership (bit-position table, union-merge)
* bottom-k           — uniform hash-sample for quantiles/sampling
                       (min-k-merge; the SQL-expressible quantile sketch)
* Misra-Gries        — frequent items / heavy hitters (counter
                       sum-merge + prune; guarantee-gated like the
                       quantile sketches)
* AMS F2             — second frequency moment (sign-sum rows,
                       row-wise sum-merge; estimate deterministic)
* HLL set algebra    — union via register merge, intersection via
                       inclusion-exclusion (deterministic estimates)
* KMV / theta        — distinct count + set algebra from the k
                       smallest distinct-key hashes (direct Jaccard;
                       min-k-merge == rebuild)
* t-digest           — streaming quantiles (centroid merge, Python
                       kernel over mapInPandas partials)
* KLL                — compactor-based quantiles (level merge, Python
                       kernel over mapInPandas partials), derandomized

Design rules shared with the CQF:

1. **Deterministic hashing** — every SQL-expressible sketch hashes with
   the md5-derived 60-bit hash (textops.spark_hash60), which DuckDB
   reproduces bit-for-bit (duckdb_hash60). The sketch contents and the
   ESTIMATES themselves are therefore oracle-checkable quantities, not
   trusted approximations. For production throughput each builder also
   takes ``hash_scheme='xxhash64'`` (top 60 bits of the codegen
   xxhash64, ~3-5x cheaper; see ``sketch_hash``) — same 60-bit range,
   same arithmetic, no cross-engine twin.
2. **Merge == rebuild, exactly.** HLL/count-min/Bloom/bottom-k are
   deterministic functions of the input multiset, so merging partial
   sketches built over ANY partition of the input yields *row-identical*
   results to building over the whole — associativity is tested as
   equality (tests/test_sketches.py), the strongest form of the merge
   property the north rule asks for.
3. **Scale shape** — every build is one explode (bounded fan-out: k hash
   functions / depth rows) + one groupBy with map-side partial
   aggregation; sketch tables are tiny (registers/counters/bits), so
   downstream joins against them broadcast. The only data-sized shuffle
   anywhere is the groupBy's partial-aggregate exchange. bottom-k's
   global min-k runs as TakeOrdered (per-partition top-k + driver merge
   of k-sized lists), never a full sort.
4. **Estimate determinism across engines** — floating-point summation
   order differs between Spark and DuckDB, so HLL's harmonic sum is kept
   in EXACT integer arithmetic (sum of ``1 << (K - rho)`` fits int64 by
   construction: p + K = 61) and converted to double once; the estimate
   is then a single literal-constant division, identical in IEEE terms
   on both engines. Quantile estimates use explicit lower-interpolation
   rank arithmetic instead of engine-specific percentile interpolation.

The Python-kernel sketches (t-digest, KLL) are not SQL-expressible; their
correctness gate is the published error bound itself: the entry queries
emit per-quantile ``ok`` booleans (rank error <= bound) whose oracle is
the constant TRUE — if the digest ever violates its bound, the gate goes
red (same pattern as the ANN recall gate in similarity.py).

Reference parity note: go-qfext is a quotient-filter library only; this
module is the "beyond the reference" half of the brief (sketch library
for web-scale training pipelines). No reference file corresponds to it.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from .textops import duckdb_hash60, spark_hash60

HASH_BITS = 60  # width of the sketch hash (both schemes below)


def sketch_hash(expr: str, scheme: str = "hash60") -> str:
    """Spark-SQL expression for the 60-bit sketch hash of ``expr``.

    * ``'hash60'`` (default) — md5-derived, reproduced bit-for-bit by
      DuckDB (``duckdb_hash60``): the scheme every oracle-checked entry
      query uses.
    * ``'xxhash64'`` — top 60 bits of Spark's codegen xxhash64:
      ~3-5x cheaper per key (measured: count-min over 6M urls 4.6 s ->
      0.9 s at 8 cores), same non-negative 60-bit range so every
      downstream bit-arithmetic path (HLL's exact-int64 harmonic sum,
      p + K = 61) is unchanged. No cross-engine twin — the production
      fast path, verified by the same accuracy/property tests.

    Both schemes yield uniform non-negative int64 values < 2^60; sketch
    tables built under different schemes must never be merged (the
    caller picks one per sketch lifetime)."""
    if scheme == "hash60":
        return spark_hash60(expr)
    if scheme == "xxhash64":
        return f"shiftrightunsigned(xxhash64({expr}), 4)"
    raise ValueError(
        f"unknown hash scheme {scheme!r}; expected 'hash60' or 'xxhash64'")


# ===========================================================================
# HyperLogLog
# ===========================================================================

def _hll_alpha(m: int) -> float:
    """Bias-correction constant (Flajolet et al. 2007, HyperLogLog)."""
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(df: DataFrame, col: str, p: int = 12,
                  hash_scheme: str = "hash60") -> DataFrame:
    """(bucket, rho_max) HLL register table over ``col``; 2^p registers.

    bucket = low p bits of hash60(key); rho = 1 + leading-zero count of
    the remaining 60-p bits (computed with integer/string ops —
    ``length(bin(w))`` is the bit length — so both engines agree
    exactly). Only NON-EMPTY buckets materialize; empty ones are implicit
    (the estimator accounts for them from the bucket count).

    Merge: union register tables and re-run ``hll_merge`` (groupBy max)
    — associative, and equal to building over the concatenated input.
    """
    if not (4 <= p <= 18):
        raise ValueError(f"p must be in [4, 18], got {p}")
    m = 1 << p
    w_bits = HASH_BITS - p
    h = sketch_hash(col, hash_scheme)
    return (
        df.where(F.col(col).isNotNull())
        .select(F.expr(h).alias("_h"))
        .select(
            F.expr(f"CAST(pmod(_h, {m}) AS INT)").alias("bucket"),
            F.expr(f"shiftrightunsigned(_h, {p})").alias("_w"),
        )
        .select(
            "bucket",
            F.expr(
                f"CAST(CASE WHEN _w = 0 THEN {w_bits + 1} "
                f"ELSE {w_bits} - length(bin(_w)) + 1 END AS INT)"
            ).alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho_max"))
    )


def hll_merge(*register_dfs: DataFrame) -> DataFrame:
    """Merge register tables: register-wise max. Associative and
    commutative; merging partials over any split of the input equals the
    registers of the whole input, row for row."""
    it = iter(register_dfs)
    out = next(it)
    for d in it:
        out = out.unionByName(d)
    return out.groupBy("bucket").agg(F.max("rho_max").alias("rho_max"))


def hll_merge_by(by, *register_dfs: DataFrame) -> DataFrame:
    """Merge grouped register tables (``hll_registers_by``): per-group
    register-wise max. Same merge == rebuild row-identity as
    ``hll_merge``, independently per group."""
    by = [by] if isinstance(by, str) else list(by)
    it = iter(register_dfs)
    out = next(it)
    for d in it:
        out = out.unionByName(d)
    return out.groupBy(*by, "bucket").agg(
        F.max("rho_max").alias("rho_max"))


def hll_estimate(register_df: DataFrame, p: int) -> DataFrame:
    """One-row cardinality estimate from a register table:
    (m, nonempty_buckets, zero_buckets, sum_scaled, estimate).

    ``sum_scaled`` is the harmonic sum in exact integer form:
    S = sum over all m buckets of 2^(K - rho) with K = (60-p)+1 and
    rho = 0 for empty buckets — max possible S is m * 2^K = 2^61, so it
    fits int64 exactly and is independent of summation order (the
    engine-portability trap a double sum would hit). The raw estimate is
    then alpha * m^2 * 2^K / S — one double division of exact integers —
    with the standard linear-counting correction for the small range."""
    m = 1 << p
    k_max = (HASH_BITS - p) + 1
    numer = _hll_alpha(m) * m * m * (2.0 ** k_max)
    agg = register_df.agg(
        F.count(F.lit(1)).cast("int").alias("nonempty_buckets"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {k_max} - rho_max)"))
        .cast("long").alias("_s_nonempty"),
    )
    return agg.select(
        F.lit(m).cast("int").alias("m"),
        F.coalesce("nonempty_buckets", F.lit(0)).alias("nonempty_buckets"),
        (F.lit(m) - F.coalesce("nonempty_buckets", F.lit(0)))
        .cast("int").alias("zero_buckets"),
        (F.coalesce("_s_nonempty", F.lit(0))
         + (F.lit(m) - F.coalesce("nonempty_buckets", F.lit(0)))
         * F.lit(1 << k_max)).cast("long").alias("sum_scaled"),
    ).select(
        "m", "nonempty_buckets", "zero_buckets", "sum_scaled",
        F.round(
            F.when(
                (F.lit(numer) / F.col("sum_scaled") <= 2.5 * m)
                & (F.col("zero_buckets") > 0),
                F.lit(float(m)) * F.log(F.lit(float(m))
                                        / F.col("zero_buckets")),
            ).otherwise(F.lit(numer) / F.col("sum_scaled")),
            1,
        ).alias("estimate"),
    )


def hll_cardinality(df: DataFrame, col: str, p: int = 12,
                    hash_scheme: str = "hash60") -> DataFrame:
    """Registers + estimate composed: the one-call distinct-count path."""
    return hll_estimate(hll_registers(df, col, p, hash_scheme), p)


def hll_registers_by(df: DataFrame, col: str, by: list[str],
                     p: int = 12,
                     hash_scheme: str = "hash60") -> DataFrame:
    """(by..., bucket, rho_max) grouped register tables: one HLL per
    distinct ``by`` combination in a single pass — the rollup shape
    (per-language / per-domain distinct counts) a 10^12-row pipeline
    wants instead of one job per group. Same single map-side-partial
    groupBy, now keyed (by..., bucket); merge is groupBy-max over the
    same keys."""
    if not by:
        raise ValueError("by must name at least one grouping column")
    m = 1 << p
    w_bits = HASH_BITS - p
    h = sketch_hash(col, hash_scheme)
    return (
        df.where(F.col(col).isNotNull())
        .select(*by, F.expr(h).alias("_h"))
        .select(
            *by,
            F.expr(f"CAST(pmod(_h, {m}) AS INT)").alias("bucket"),
            F.expr(f"shiftrightunsigned(_h, {p})").alias("_w"),
        )
        .select(
            *by, "bucket",
            F.expr(
                f"CAST(CASE WHEN _w = 0 THEN {w_bits + 1} "
                f"ELSE {w_bits} - length(bin(_w)) + 1 END AS INT)"
            ).alias("rho"),
        )
        .groupBy(*by, "bucket")
        .agg(F.max("rho").alias("rho_max"))
    )


def hll_estimate_by(register_df: DataFrame, by: list[str],
                    p: int) -> DataFrame:
    """(by..., estimate) per group — identical exact-int64 arithmetic
    to ``hll_estimate``, applied per grouping key."""
    m = 1 << p
    k_max = (HASH_BITS - p) + 1
    numer = _hll_alpha(m) * m * m * (2.0 ** k_max)
    agg = register_df.groupBy(*by).agg(
        F.count(F.lit(1)).cast("int").alias("_ne"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {k_max} - rho_max)"))
        .cast("long").alias("_s"),
    ).select(
        *by,
        F.col("_ne").alias("nonempty_buckets"),
        (F.lit(m) - F.col("_ne")).cast("int").alias("zero_buckets"),
        (F.col("_s") + (F.lit(m) - F.col("_ne")) * F.lit(1 << k_max))
        .cast("long").alias("sum_scaled"),
    )
    return agg.select(
        *by, "nonempty_buckets", "zero_buckets", "sum_scaled",
        F.round(
            F.when(
                (F.lit(numer) / F.col("sum_scaled") <= 2.5 * m)
                & (F.col("zero_buckets") > 0),
                F.lit(float(m)) * F.log(F.lit(float(m))
                                        / F.col("zero_buckets")),
            ).otherwise(F.lit(numer) / F.col("sum_scaled")),
            1,
        ).alias("estimate"),
    )


def hll_cardinality_by(df: DataFrame, col: str, by: list[str],
                       p: int = 12,
                       hash_scheme: str = "hash60") -> DataFrame:
    """Grouped distinct-count rollup in one pass."""
    return hll_estimate_by(
        hll_registers_by(df, col, by, p, hash_scheme), by, p)


def duckdb_hll_by_sql(col: str, by: list[str], p: int,
                      source: str) -> str:
    """Oracle twin of ``hll_cardinality_by``."""
    m = 1 << p
    w_bits = HASH_BITS - p
    k_max = w_bits + 1
    numer = repr(_hll_alpha(m) * m * m * (2.0 ** k_max))
    h = duckdb_hash60(col)
    bys = ", ".join(by)
    return f"""
        WITH hashed AS (
            SELECT {bys}, {h} AS h FROM {source}
            WHERE {col} IS NOT NULL
        ),
        rho AS (
            SELECT {bys}, CAST(h % {m} AS INT) AS bucket,
                   CAST(CASE WHEN (h >> {p}) = 0 THEN {w_bits + 1}
                        ELSE {w_bits} - length(bin(h >> {p})) + 1
                        END AS INT) AS rho
            FROM hashed
        ),
        regs AS (
            SELECT {bys}, bucket, MAX(rho) AS rho_max
            FROM rho GROUP BY {bys}, bucket
        ),
        agg AS (
            SELECT {bys},
                   CAST(COUNT(*) AS INT) AS nonempty_buckets,
                   CAST({m} - COUNT(*) AS INT) AS zero_buckets,
                   CAST(SUM(1::BIGINT << ({k_max} - rho_max))
                        + ({m} - COUNT(*)) * (1::BIGINT << {k_max})
                        AS BIGINT) AS sum_scaled
            FROM regs GROUP BY {bys}
        )
        SELECT {bys}, nonempty_buckets, zero_buckets, sum_scaled,
               round(CASE WHEN {numer} / sum_scaled <= {2.5 * m}
                          AND zero_buckets > 0
                     THEN {float(m)} * ln({float(m)} / zero_buckets)
                     ELSE {numer} / sum_scaled END, 1) AS estimate
        FROM agg
    """


def hll_set_ops(a_df: DataFrame, b_df: DataFrame, col: str,
                p: int = 12) -> DataFrame:
    """One row (est_a, est_b, est_union, est_intersection): distinct
    counts of two key sets, their union (register max-merge — HLL's
    native set operation), and their intersection by inclusion-exclusion
    over the three estimates. All four values are deterministic
    functions of the inputs (exact-integer harmonic sums, one rounded
    double each), so the DuckDB twin reproduces them bit-for-bit.

    Accuracy note: union inherits HLL's ~1.04/sqrt(m) relative error;
    the inclusion-exclusion intersection's ABSOLUTE error scales with
    the union size, so small intersections of large sets are noisy —
    the standard HLL limitation, stated rather than hidden."""
    ra = hll_registers(a_df, col, p)
    rb = hll_registers(b_df, col, p)
    ea = hll_estimate(ra, p).select(F.col("estimate").alias("est_a"))
    eb = hll_estimate(rb, p).select(F.col("estimate").alias("est_b"))
    eu = hll_estimate(hll_merge(ra, rb), p).select(
        F.col("estimate").alias("est_union"))
    return (
        ea.crossJoin(eb).crossJoin(eu)  # three one-row frames
        .select(
            "est_a", "est_b", "est_union",
            # clamp at 0: for near-disjoint sets the inclusion-exclusion
            # residual is pure estimator noise and can go negative
            F.round(
                F.greatest(
                    F.lit(0.0),
                    F.col("est_a") + F.col("est_b") - F.col("est_union")),
                1,
            ).alias("est_intersection"),
        )
    )


def duckdb_hll_set_ops_sql(col: str, p: int, source_a: str,
                           source_b: str) -> str:
    """Oracle twin of ``hll_set_ops``. ``source_a``/``source_b`` are
    table names or parenthesized subqueries; the union side rebuilds
    registers over the concatenated input, which equals the register
    merge exactly (merge == rebuild)."""
    union_src = (f"(SELECT {col} FROM {source_a} "
                 f"UNION ALL SELECT {col} FROM {source_b})")
    return f"""
        SELECT a.estimate AS est_a, b.estimate AS est_b,
               u.estimate AS est_union,
               round(greatest(0.0, a.estimate + b.estimate - u.estimate), 1)
                   AS est_intersection
        FROM ({duckdb_hll_sql(col, p, source_a)}) a,
             ({duckdb_hll_sql(col, p, source_b)}) b,
             ({duckdb_hll_sql(col, p, union_src)}) u
    """


def hll_error_bound(p: int, sigmas: float = 3.0) -> float:
    """Published relative standard error 1.04/sqrt(m), scaled."""
    return sigmas * 1.04 / math.sqrt(1 << p)


def duckdb_hll_sql(col: str, p: int, source: str) -> str:
    """DuckDB twin of ``hll_cardinality`` — identical registers (same
    md5-derived hash, same bit arithmetic) and the identical estimate
    (exact-integer harmonic sum, one double division, same linear-count
    correction), so the estimate VALUE is the oracle-checked quantity.
    ``source`` is a table name or a parenthesized subquery."""
    m = 1 << p
    w_bits = HASH_BITS - p
    k_max = w_bits + 1
    numer = repr(_hll_alpha(m) * m * m * (2.0 ** k_max))
    h = duckdb_hash60(col)
    return f"""
        WITH hashed AS (
            SELECT {h} AS h FROM {source} WHERE {col} IS NOT NULL
        ),
        rho AS (
            SELECT CAST(h % {m} AS INT) AS bucket,
                   CAST(CASE WHEN (h >> {p}) = 0 THEN {w_bits + 1}
                        ELSE {w_bits} - length(bin(h >> {p})) + 1
                        END AS INT) AS rho
            FROM hashed
        ),
        regs AS (
            SELECT bucket, MAX(rho) AS rho_max FROM rho GROUP BY bucket
        ),
        agg AS (
            SELECT CAST(COUNT(*) AS INT) AS nonempty_buckets,
                   CAST(COALESCE(SUM(1::BIGINT << ({k_max} - rho_max)), 0)
                        AS BIGINT) AS s_nonempty
            FROM regs
        ),
        ing AS (
            SELECT {m}::INT AS m, nonempty_buckets,
                   CAST({m} - nonempty_buckets AS INT) AS zero_buckets,
                   CAST(s_nonempty
                        + ({m} - nonempty_buckets) * (1::BIGINT << {k_max})
                        AS BIGINT) AS sum_scaled
            FROM agg
        )
        SELECT m, nonempty_buckets, zero_buckets, sum_scaled,
               round(CASE WHEN {numer} / sum_scaled <= {2.5 * m}
                          AND zero_buckets > 0
                     THEN {float(m)} * ln({float(m)} / zero_buckets)
                     ELSE {numer} / sum_scaled END, 1) AS estimate
        FROM ing
    """


# ===========================================================================
# count-min
# ===========================================================================

def countmin_table(df: DataFrame, col: str, depth: int = 4,
                   width: int = 1024,
                   hash_scheme: str = "hash60") -> DataFrame:
    """(row, col_idx, cnt) count-min counter table: row i counts key
    occurrences at column hash_i(key) = hash60(i || ':' || key) % width.
    One bounded explode (depth rows per input row) + one groupBy over at
    most depth*width cells — partial aggregation collapses everything
    map-side.

    Merge: union tables + ``countmin_merge`` (groupBy sum) — exact."""
    h = sketch_hash(f"concat(i, ':', {col})", hash_scheme)
    return (
        df.where(F.col(col).isNotNull())
        .select(
            F.col(col),
            F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("i"),
        )
        .select(
            F.col("i").cast("int").alias("row"),
            F.expr(f"CAST(pmod({h}, {width}) AS INT)").alias("col_idx"),
        )
        .groupBy("row", "col_idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_merge(*tables: DataFrame) -> DataFrame:
    """Merge counter tables: cell-wise sum. Exact-associative."""
    it = iter(tables)
    out = next(it)
    for d in it:
        out = out.unionByName(d)
    return out.groupBy("row", "col_idx").agg(F.sum("cnt").alias("cnt"))


def countmin_query(cm_df: DataFrame, probes: DataFrame, col: str,
                   depth: int = 4, width: int = 1024,
                   hash_scheme: str = "hash60") -> DataFrame:
    """Point-frequency estimates for ``probes[col]``: min over rows of
    the counter each hash lands on (missing cell = 0). The counter table
    is tiny (<= depth*width rows) so the join broadcasts. Guarantee:
    estimate >= true count always; overestimate by more than
    2N/width with probability <= (1/2)^depth (Cormode & Muthukrishnan
    2005)."""
    h = sketch_hash(f"concat(i, ':', {col})", hash_scheme)
    exploded = (
        probes.select(col).where(F.col(col).isNotNull()).distinct()
        .select(
            F.col(col),
            F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("i"),
        )
        .select(
            F.col(col),
            F.col("i").cast("int").alias("row"),
            F.expr(f"CAST(pmod({h}, {width}) AS INT)").alias("col_idx"),
        )
    )
    return (
        exploded.join(F.broadcast(cm_df), ["row", "col_idx"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cm_count"))
    )


def countmin_table_by(df: DataFrame, col: str, by, depth: int = 4,
                      width: int = 1024,
                      hash_scheme: str = "hash60") -> DataFrame:
    """Per-group count-min tables in one pass: (by..., row, col_idx,
    cnt) — an independent depth x width counter table per ``by``
    combination (per-language / per-domain key frequencies). Same
    bounded explode + partial-aggregating groupBy as the global table,
    keyed additionally by the group columns; <= groups * depth * width
    cells total. Group columns cast to string, NULL group keys
    excluded (grouped-sketch contract). Merge:
    ``countmin_merge_by`` — cell-wise sum per group, exact."""
    by = _norm_by(by)
    h = sketch_hash(f"concat(i, ':', {col})", hash_scheme)
    pred = F.col(col).isNotNull()
    for c in by:
        pred = pred & F.col(c).isNotNull()
    return (
        df.where(pred)
        .select(
            *[F.col(c).cast("string").alias(c) for c in by],
            F.col(col),
            F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("i"),
        )
        .select(
            *by,
            F.col("i").cast("int").alias("row"),
            F.expr(f"CAST(pmod({h}, {width}) AS INT)").alias("col_idx"),
        )
        .groupBy(*by, "row", "col_idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_merge_by(by, *tables: DataFrame) -> DataFrame:
    """Merge grouped counter tables: cell-wise sum per group. Exact-
    associative (same argument as ``countmin_merge``)."""
    by = _norm_by(by)
    it = iter(tables)
    out = next(it)
    for d in it:
        out = out.unionByName(d)
    return (out.groupBy(*by, "row", "col_idx")
            .agg(F.sum("cnt").alias("cnt")))


def countmin_query_by(cm_df: DataFrame, probes: DataFrame, col: str,
                      by, depth: int = 4, width: int = 1024,
                      hash_scheme: str = "hash60",
                      broadcast: bool = True) -> DataFrame:
    """Per-group point-frequency estimates: min over the group's own
    depth rows. ``probes`` carries the group columns; each (group,
    key) probe reads only that group's table, so the per-group
    guarantee is the standard one with N = the GROUP's total count —
    much tighter than a global table for skewed group sizes.

    ``broadcast=True`` (default) ships the counter tables to every
    probe task — right while groups x depth x width rows fit a
    broadcast (<= a few hundred groups at the default geometry). For
    thousands of groups pass ``broadcast=False``: the join shuffles
    on (group, row, col_idx) instead, and neither side is
    materialized whole anywhere."""
    by = _norm_by(by)
    h = sketch_hash(f"concat(i, ':', {col})", hash_scheme)
    pred = F.col(col).isNotNull()
    for c in by:
        pred = pred & F.col(c).isNotNull()
    exploded = (
        probes.select(*[F.col(c).cast("string").alias(c) for c in by],
                      col)
        .where(pred).distinct()
        .select(
            *by, F.col(col),
            F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("i"),
        )
        .select(
            *by, F.col(col),
            F.col("i").cast("int").alias("row"),
            F.expr(f"CAST(pmod({h}, {width}) AS INT)").alias("col_idx"),
        )
    )
    cm_side = F.broadcast(cm_df) if broadcast else cm_df
    return (
        exploded.join(cm_side, by + ["row", "col_idx"], "left")
        .groupBy(*by, col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cm_count"))
    )


def duckdb_countmin_by_sql(col: str, by, depth: int, width: int,
                           source: str,
                           probe_source: str | None = None) -> str:
    """DuckDB twin of countmin_table_by + countmin_query_by (probes
    default to the distinct (group, key) pairs of ``source``)."""
    by = _norm_by(by)
    h_build = duckdb_hash60(f"(i || ':' || {col})")
    probe_source = probe_source or source
    bys = ", ".join(f"CAST({c} AS VARCHAR) AS {c}" for c in by)
    bnames = ", ".join(by)
    notnull = " AND ".join([f"{col} IS NOT NULL"]
                           + [f"{c} IS NOT NULL" for c in by])
    return f"""
        WITH cm AS (
            SELECT {bys}, CAST(i AS INT) AS row,
                   CAST({h_build} % {width} AS INT) AS col_idx,
                   COUNT(*) AS cnt
            FROM {source}, unnest(range(0, {depth})) AS t(i)
            WHERE {notnull}
            GROUP BY ALL
        ),
        probes AS (
            SELECT DISTINCT {bys}, {col} FROM {probe_source}
            WHERE {notnull}
        ),
        expl AS (
            SELECT {bnames}, {col}, CAST(i AS INT) AS row,
                   CAST({h_build} % {width} AS INT) AS col_idx
            FROM probes, unnest(range(0, {depth})) AS t(i)
        )
        SELECT e.{bnames.replace(', ', ', e.')}, e.{col},
               MIN(COALESCE(cm.cnt, 0)) AS cm_count
        FROM expl e LEFT JOIN cm USING ({bnames}, row, col_idx)
        GROUP BY ALL
    """


def duckdb_countmin_sql(col: str, depth: int, width: int,
                        source: str, probe_source: str | None = None) -> str:
    """DuckDB twin of countmin_table + countmin_query over the same
    probes (defaults to the distinct keys of ``source``)."""
    h_build = duckdb_hash60(f"(i || ':' || {col})")
    probe_source = probe_source or source
    return f"""
        WITH cm AS (
            SELECT CAST(i AS INT) AS row,
                   CAST({h_build} % {width} AS INT) AS col_idx,
                   COUNT(*) AS cnt
            FROM {source}, unnest(range(0, {depth})) AS t(i)
            WHERE {col} IS NOT NULL
            GROUP BY 1, 2
        ),
        probes AS (
            SELECT DISTINCT {col} FROM {probe_source}
            WHERE {col} IS NOT NULL
        ),
        expl AS (
            SELECT {col}, CAST(i AS INT) AS row,
                   CAST({h_build} % {width} AS INT) AS col_idx
            FROM probes, unnest(range(0, {depth})) AS t(i)
        )
        SELECT e.{col}, MIN(COALESCE(cm.cnt, 0)) AS cm_count
        FROM expl e LEFT JOIN cm USING (row, col_idx)
        GROUP BY e.{col}
    """


# ===========================================================================
# AMS F2 (second frequency moment)
# ===========================================================================

def ams_f2_table(df: DataFrame, col: str, depth: int = 5,
                 width: int = 16,
                 hash_scheme: str = "hash60") -> DataFrame:
    """(row, j, s) AMS sketch of the second frequency moment
    F2 = sum over distinct keys of count^2 (Alon, Matias & Szegedy
    1996), median-of-means form: cell (g, j) holds
    S_gj = sum over input rows of sign_gj(key), with sign_gj(key) =
    +/-1 from the parity of hash60(i||':'||key), i = g*width + j.
    One bounded explode (depth*width rows per input row — CPU, not
    shuffle: partial aggregation collapses each partition to at most
    depth*width cells map-side) + one groupBy over those cells.

    Merge: union + ``ams_f2_merge`` (cell-wise sum) — exact-associative,
    row-identical to a rebuild. Each E[S_gj^2] = F2 with variance
    <= 2*F2^2; averaging width cells divides the variance by width and
    the median over an odd ``depth`` of group means gives the standard
    AMS concentration.

    Hashing cost: the depth*width cell signs come from disjoint BIT
    FIELDS of ceil(depth*width / 60) 60-bit hashes per input row
    (sign of cell i = bit i%60 of hash(i//60 || ':' || key)) — 2
    hashes instead of 80 at the defaults, a ~40x cut in the dominant
    per-row cost at scale (pre-0.4.0 hashed once per cell). The
    explode itself stays: map-side partial aggregation collapses each
    partition to <= depth*width cells before any shuffle, so it is
    bounded CPU, not shuffle volume."""
    if depth < 1 or depth % 2 == 0:
        raise ValueError(f"depth must be odd and >= 1, got {depth}")
    total = depth * width
    blocks = (total + 59) // 60
    h_b = sketch_hash(f"concat(b, ':', {col})", hash_scheme)
    hs = f"transform(sequence(0, {blocks - 1}), b -> {h_b})"
    bit = (f"shiftright(hs[CAST(i div 60 AS INT)], "
           f"CAST(pmod(i, 60) AS INT)) & 1")
    return (
        df.where(F.col(col).isNotNull())
        .select(
            F.expr(hs).alias("hs"),
            F.explode(F.expr(f"sequence(0, {total - 1})")).alias("i"),
        )
        .select(
            F.expr(f"CAST(i div {width} AS INT)").alias("row"),
            F.expr(f"CAST(pmod(i, {width}) AS INT)").alias("j"),
            F.expr(f"CAST(1 - 2 * ({bit}) AS BIGINT)").alias("sign"),
        )
        .groupBy("row", "j")
        .agg(F.sum("sign").alias("s"))
    )


def ams_f2_merge(*tables: DataFrame) -> DataFrame:
    """Merge sketch tables: cell-wise sum. Exact-associative."""
    it = iter(tables)
    out = next(it)
    for d in it:
        out = out.unionByName(d)
    return out.groupBy("row", "j").agg(F.sum("s").alias("s"))


def ams_f2_estimate(table: DataFrame, depth: int = 5,
                    width: int = 16) -> DataFrame:
    """One row (f2_estimate): median over groups of the group-mean of
    S^2. The per-group sum of squares stays integer; the single
    division by ``width`` happens once on the selected median, so both
    engines produce the identical double."""
    per_g = table.groupBy("row").agg(
        F.sum(F.expr("s * s")).cast("long").alias("ss"))
    return (
        per_g.agg(F.expr("sort_array(collect_list(ss))").alias("sq"))
        .select(
            F.round(
                F.expr(f"CAST(sq[{(depth - 1) // 2}] AS DOUBLE)")
                / F.lit(width), 1
            ).alias("f2_estimate"))
    )


def duckdb_ams_f2_sql(col: str, depth: int, width: int,
                      source: str) -> str:
    """Oracle twin of ams_f2_table + ams_f2_estimate (same per-block
    bit-field sign derivation, bit-exact)."""
    h = duckdb_hash60(f"((i // 60) || ':' || {col})")
    total = depth * width
    return f"""
        WITH t AS (
            SELECT CAST(i // {width} AS INT) AS row,
                   CAST(i % {width} AS INT) AS j,
                   CAST(SUM(1 - 2 * (({h} >> CAST(i % 60 AS INT)) & 1))
                        AS BIGINT) AS s
            FROM {source}, unnest(range(0, {total})) AS u(i)
            WHERE {col} IS NOT NULL
            GROUP BY 1, 2
        ),
        per_g AS (
            SELECT row, CAST(SUM(s * s) AS BIGINT) AS ss
            FROM t GROUP BY row
        ),
        sq AS (SELECT list_sort(list(ss)) AS sq FROM per_g)
        SELECT round(CAST(sq[{(depth - 1) // 2 + 1}] AS DOUBLE)
                     / {width}, 1) AS f2_estimate
        FROM sq
    """


# ===========================================================================
# Bloom filter
# ===========================================================================

def bloom_bits(df: DataFrame, col: str, m_bits: int = 1 << 16,
               k: int = 4, hash_scheme: str = "hash60") -> DataFrame:
    """(bit_pos) set-bit table of a Bloom filter: positions
    hash60(i || ':' || key) % m_bits for i in 0..k-1, distinct.

    Merge: union + distinct — the bit-OR of the filters; exact."""
    h = sketch_hash(f"concat(i, ':', {col})", hash_scheme)
    return (
        df.where(F.col(col).isNotNull())
        .select(
            F.col(col),
            F.explode(F.expr(f"sequence(0, {k - 1})")).alias("i"),
        )
        .select(F.expr(f"CAST(pmod({h}, {m_bits}) AS INT)").alias("bit_pos"))
        .distinct()
    )


def bloom_merge(*bit_dfs: DataFrame) -> DataFrame:
    """Bit-OR of Bloom filters: union of set positions."""
    it = iter(bit_dfs)
    out = next(it)
    for d in it:
        out = out.unionByName(d)
    return out.distinct()


def bloom_contains(bits_df: DataFrame, probes: DataFrame, col: str,
                   m_bits: int = 1 << 16, k: int = 4,
                   hash_scheme: str = "hash60") -> DataFrame:
    """(key, bloom_seen) membership: seen iff ALL k bit positions are
    set. Zero false negatives by construction; false-positive rate
    ~ (1 - e^(-k*n/m))^k (Bloom 1970). The bit table broadcasts."""
    h = sketch_hash(f"concat(i, ':', {col})", hash_scheme)
    exploded = (
        probes.select(col).where(F.col(col).isNotNull()).distinct()
        .select(
            F.col(col),
            F.explode(F.expr(f"sequence(0, {k - 1})")).alias("i"),
        )
        .select(F.col(col),
                F.expr(f"CAST(pmod({h}, {m_bits}) AS INT)").alias("bit_pos"))
    )
    hit = F.when(F.col("_set").isNotNull(), 1).otherwise(0)
    return (
        exploded.join(
            F.broadcast(bits_df.withColumn("_set", F.lit(1))),
            "bit_pos", "left")
        .groupBy(col)
        .agg((F.min(hit) == 1).alias("bloom_seen"))
    )


def bloom_fp_rate(m_bits: int, k: int, n: int) -> float:
    """Published false-positive rate for n inserted keys."""
    return (1.0 - math.exp(-k * n / m_bits)) ** k


def duckdb_bloom_sql(col: str, m_bits: int, k: int, source: str,
                     probe_source: str) -> str:
    h = duckdb_hash60(f"(i || ':' || {col})")
    return f"""
        WITH bits AS (
            SELECT DISTINCT CAST({h} % {m_bits} AS INT) AS bit_pos
            FROM {source}, unnest(range(0, {k})) AS t(i)
            WHERE {col} IS NOT NULL
        ),
        probes AS (
            SELECT DISTINCT {col} FROM {probe_source}
            WHERE {col} IS NOT NULL
        ),
        expl AS (
            SELECT {col}, CAST({h} % {m_bits} AS INT) AS bit_pos
            FROM probes, unnest(range(0, {k})) AS t(i)
        )
        SELECT e.{col},
               MIN(CASE WHEN b.bit_pos IS NOT NULL THEN 1 ELSE 0 END) = 1
                   AS bloom_seen
        FROM expl e LEFT JOIN bits b USING (bit_pos)
        GROUP BY e.{col}
    """


# ===========================================================================
# bottom-k (hash-ordered uniform sample: quantiles + distinct sampling)
# ===========================================================================

def bottomk_sketch(df: DataFrame, key_col: str, value_col: str,
                   k: int = 512,
                   hash_scheme: str = "hash60",
                   distinct: bool = False) -> DataFrame:
    """The k rows whose hash60(key) ranks smallest (Cohen & Kaplan's
    bottom-k sketch family). Returns (h, key, value) rows.

    Default semantics are PER-ROW: a key appearing r times occupies up
    to r of the k slots, i.e. a frequency-weighted sample of the row
    multiset — the right weighting for row-population quantiles. The
    sort key is the TOTAL order (h, key, value), so the selected rows
    are a pure function of the input multiset in every engine
    (pre-0.4.0 the order was (h, key), leaving ties on duplicated keys
    engine-dependent). ``distinct=True`` gives a uniform sample of
    DISTINCT keys instead (value = per-key minimum): one extra
    groupBy-min whose shuffle carries the distinct key set — use it
    when keys are duplicated AND per-key semantics are wanted; the
    default path stays a shuffle-free TakeOrdered (per-partition top-k
    + driver merge of k-sized lists).

    Mergeable: the bottom-k of a union is the bottom-k of the
    concatenated bottom-k's (``bottomk_merge``) — exactly, not
    approximately (for ``distinct=True``, merge inputs built with
    ``distinct=True`` on disjoint key sets, or re-dedup after)."""
    base = (
        df.where(F.col(key_col).isNotNull())
        .select(
            F.expr(sketch_hash(key_col, hash_scheme)).alias("h"),
            F.col(key_col).alias("key"),
            F.col(value_col).alias("value"),
        )
    )
    if distinct:
        base = base.groupBy("h", "key").agg(F.min("value").alias("value"))
    return base.orderBy("h", "key", "value").limit(k)


def bottomk_merge(a: DataFrame, b: DataFrame, k: int = 512) -> DataFrame:
    return a.unionByName(b).orderBy("h", "key", "value").limit(k)


def bottomk_quantiles(sketch_df: DataFrame, qs: list[float]) -> DataFrame:
    """(q, est_value) quantile estimates from the sample, with explicit
    LOWER interpolation — element at index floor(q * (n-1)) of the
    sorted sample values — so both engines compute the identical value
    (engine-native percentile functions interpolate differently).
    Rank error of a uniform k-sample: stddev sqrt(q(1-q)/k) <= 0.5/sqrt(k)
    (sampling theory), so |rank(est) - q| <= ~2/sqrt(k) at 4 sigma."""
    # CAST each literal: Spark parses bare decimal literals as DECIMAL,
    # not DOUBLE, which changes the output type (and the rank arithmetic)
    qlit = ", ".join(f"CAST({float(q)!r} AS DOUBLE)" for q in qs)
    return (
        sketch_df.agg(
            F.expr("sort_array(collect_list(CAST(value AS DOUBLE)))")
            .alias("vals"))
        .select(F.explode(F.expr(f"array({qlit})")).alias("q"), "vals")
        .select(
            "q",
            F.expr(
                "vals[CAST(floor(q * (size(vals) - 1)) AS INT)]"
            ).alias("est_value"),
        )
    )


def duckdb_bottomk_quantiles_sql(key_col: str, value_col: str, k: int,
                                 qs: list[float], source: str) -> str:
    h = duckdb_hash60(key_col)
    qlit = ", ".join(f"CAST({float(q)!r} AS DOUBLE)" for q in qs)
    return f"""
        WITH sk AS (
            SELECT {h} AS h, {key_col} AS key,
                   CAST({value_col} AS DOUBLE) AS value
            FROM {source} WHERE {key_col} IS NOT NULL
            ORDER BY h, key, value LIMIT {k}
        ),
        vals AS (SELECT list_sort(list(value)) AS vals FROM sk)
        SELECT q, vals[CAST(floor(q * (len(vals) - 1)) AS INT) + 1]
                   AS est_value
        FROM vals, unnest([{qlit}]) AS t(q)
    """


# ===========================================================================
# priority sampling (weighted sample + unbiased subset sums)
# ===========================================================================

def priority_sample(df: DataFrame, key_col: str, weight_col: str,
                    k: int = 256,
                    hash_scheme: str = "hash60") -> DataFrame:
    """(key, w, priority) sketch of k+1 rows: the k+1 largest
    priorities q(key) = w / u(key), with u(key) = (hash60(key)+1)/2^60
    a deterministic uniform in (0, 1] — Duffield, Lund & Thorup's
    priority sampling (JACM 2007). The k highest-priority keys form a
    weight-sensitive sample; the (k+1)-th priority is the threshold
    tau, and estimating every sampled key's weight as max(w, tau)
    makes any subset-sum estimate UNBIASED with near-optimal variance.
    Heavy items (w >= tau) are included with certainty — exactly the
    property a training-data pipeline wants when sampling documents by
    byte size: big documents always surveyed, small ones sampled
    proportional to weight.

    Deterministic (hash-derived u, total tie order priority desc /
    key), so DuckDB reproduces the sample and the estimates exactly.
    Executes as TakeOrdered (per-partition top-(k+1) + driver merge) —
    no shuffle of the data. Mergeable EXACTLY like bottom-k: the
    top-(k+1) of a union is the top-(k+1) of concatenated sketches
    (``priority_sample_merge``). Rows with NULL or non-positive weight
    are excluded (a zero-weight row can never be sampled). Semantics
    are PER-ROW (like ``bottomk_sketch``'s default): a key appearing r
    times contributes r rows, all sharing one u(key), so equal-weight
    duplicates are interchangeable and the selection stays a pure
    function of the input multiset. NOTE on the unbiasedness claim:
    Duffield-Lund-Thorup's proof assumes an independent uniform per
    ITEM, so the subset-sum guarantee above holds when keys are unique
    (the doc_id-weighted-by-bytes case) or when estimating over
    distinct keys; duplicated keys share a u and their priorities are
    perfectly correlated — the sample is still a deterministic
    weight-sensitive sample, but subset-sum estimates over such
    inputs carry no unbiasedness guarantee."""
    h = sketch_hash("key", hash_scheme)
    u = f"(CAST({h} AS DOUBLE) + 1.0) / {float(1 << HASH_BITS)!r}"
    return (
        df.where(F.col(key_col).isNotNull()
                 & F.col(weight_col).isNotNull()
                 & (F.col(weight_col) > 0))
        .select(F.col(key_col).cast("string").alias("key"),
                F.col(weight_col).cast("double").alias("w"))
        .withColumn("priority", F.expr(f"w / ({u})"))
        .orderBy(F.desc("priority"), "key")
        .limit(k + 1)
    )


def priority_sample_merge(a: DataFrame, b: DataFrame,
                          k: int = 256) -> DataFrame:
    """Merge two priority sketches built with the same k: exact (the
    global top-(k+1) lives in the union of per-part top-(k+1)s)."""
    return (a.unionByName(b)
            .orderBy(F.desc("priority"), "key").limit(k + 1))


def priority_estimates(sketch_df: DataFrame, k: int = 256) -> DataFrame:
    """(key, w, est_weight) for the k sampled keys: est_weight =
    max(w, tau) with tau the (k+1)-th priority (0 when the input had
    <= k keys — then every weight is exact). sum(est_weight) over the
    sampled keys matching ANY predicate is an unbiased estimate of
    that subset's true weight sum."""
    # materialize the tiny (k+1)-row sketch once: the sample and tau
    # subtrees would otherwise each re-run its TakeOrdered lineage
    # over the corpus (kmv_set_ops pattern)
    sketch_df = sketch_df.localCheckpoint(eager=True)
    ranked = sketch_df.orderBy(F.desc("priority"), "key")
    tau = (ranked.offset(k).limit(1)
           .agg(F.coalesce(F.max("priority"), F.lit(0.0)).alias("_tau")))
    return (
        ranked.limit(k).crossJoin(tau)
        .select(
            "key", "w",
            F.round(F.greatest(F.col("w"), F.col("_tau")), 6)
            .alias("est_weight"),
        )
    )


def priority_sample_by(df: DataFrame, key_col: str, weight_col: str,
                       by, k: int = 256,
                       hash_scheme: str = "hash60") -> DataFrame:
    """Per-group priority sample: the k+1 highest-priority rows of
    EVERY ``by`` combination in one pass (window row_number per group —
    the grouped analogue of ``priority_sample``'s TakeOrdered; one
    shuffle keyed by the group columns). Group columns are cast to
    string; NULL group keys excluded (same contract as the other
    grouped sketches). Merge: union + re-apply
    (``priority_sample_merge_by``) — exact."""
    from pyspark.sql import Window

    by = _norm_by(by)
    if not by:
        raise ValueError("by must name at least one grouping column")
    h = sketch_hash("key", hash_scheme)
    u = f"(CAST({h} AS DOUBLE) + 1.0) / {float(1 << HASH_BITS)!r}"
    pred = (F.col(key_col).isNotNull() & F.col(weight_col).isNotNull()
            & (F.col(weight_col) > 0))
    for c in by:
        pred = pred & F.col(c).isNotNull()
    w = Window.partitionBy(*by).orderBy(F.desc("priority"), "key")
    return (
        df.where(pred)
        .select(*[F.col(c).cast("string").alias(c) for c in by],
                F.col(key_col).cast("string").alias("key"),
                F.col(weight_col).cast("double").alias("w"))
        .withColumn("priority", F.expr(f"w / ({u})"))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k + 1)
        .drop("_rn")
    )


def priority_sample_merge_by(a: DataFrame, b: DataFrame, by,
                             k: int = 256) -> DataFrame:
    """Merge grouped priority sketches: exact, per group."""
    from pyspark.sql import Window

    by = _norm_by(by)
    w = Window.partitionBy(*by).orderBy(F.desc("priority"), "key")
    return (a.unionByName(b)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= k + 1)
            .drop("_rn"))


def priority_estimates_by(sketch_df: DataFrame, by,
                          k: int = 256) -> DataFrame:
    """(by..., key, w, est_weight) per group: per-group tau = the
    group's (k+1)-th priority (0 when the group had <= k rows)."""
    from pyspark.sql import Window

    by = _norm_by(by)
    # one evaluation of the windowed-sample lineage (see
    # priority_estimates)
    sketch_df = sketch_df.localCheckpoint(eager=True)
    w = Window.partitionBy(*by).orderBy(F.desc("priority"), "key")
    ranked = sketch_df.withColumn("_rn", F.row_number().over(w))
    tau = (ranked.where(F.col("_rn") == k + 1)
           .select(*by, F.col("priority").alias("_tau")))
    return (
        ranked.where(F.col("_rn") <= k)
        .join(tau, by, "left")
        .select(
            *by, "key", "w",
            F.round(F.greatest(
                F.col("w"), F.coalesce(F.col("_tau"), F.lit(0.0))), 6)
            .alias("est_weight"),
        )
    )


def duckdb_priority_sample_sql(key_col: str, weight_col: str, k: int,
                               source: str) -> str:
    """Oracle twin of priority_sample + priority_estimates: the
    identical sample and estimates, value-exact."""
    h = duckdb_hash60("key")
    u = f"(CAST({h} AS DOUBLE) + 1.0) / {float(1 << HASH_BITS)!r}"
    return f"""
        WITH scored AS (
            SELECT key, w, w / ({u}) AS priority FROM (
                SELECT CAST({key_col} AS VARCHAR) AS key,
                       CAST({weight_col} AS DOUBLE) AS w
                FROM {source}
                WHERE {key_col} IS NOT NULL AND {weight_col} IS NOT NULL
                  AND {weight_col} > 0
            )
        ),
        sk AS (
            SELECT * FROM scored ORDER BY priority DESC, key
            LIMIT {k + 1}
        ),
        tau AS (
            SELECT COALESCE(MAX(priority), 0.0) AS tau FROM (
                SELECT priority FROM sk ORDER BY priority DESC, key
                OFFSET {k} LIMIT 1
            )
        )
        SELECT key, w, round(GREATEST(w, tau), 6) AS est_weight
        FROM (SELECT * FROM sk ORDER BY priority DESC, key LIMIT {k}),
             tau
    """


def duckdb_priority_sample_by_sql(key_col: str, weight_col: str, by,
                                  k: int, source: str) -> str:
    """Oracle twin of priority_sample_by + priority_estimates_by."""
    by = _norm_by(by)
    h = duckdb_hash60("key")
    u = f"(CAST({h} AS DOUBLE) + 1.0) / {float(1 << HASH_BITS)!r}"
    bys = ", ".join(f"CAST({c} AS VARCHAR) AS {c}" for c in by)
    bnames = ", ".join(by)
    notnull = " AND ".join(
        [f"{key_col} IS NOT NULL", f"{weight_col} IS NOT NULL",
         f"{weight_col} > 0"] + [f"{c} IS NOT NULL" for c in by])
    return f"""
        WITH scored AS (
            SELECT {bnames}, key, w, w / ({u}) AS priority FROM (
                SELECT {bys}, CAST({key_col} AS VARCHAR) AS key,
                       CAST({weight_col} AS DOUBLE) AS w
                FROM {source} WHERE {notnull}
            )
        ),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY {bnames}
                ORDER BY priority DESC, key) AS rn
            FROM scored
        ),
        tau AS (
            SELECT {bnames}, priority AS tau FROM ranked
            WHERE rn = {k + 1}
        )
        SELECT r.{', r.'.join(by)}, r.key, r.w,
               round(GREATEST(r.w, COALESCE(t.tau, 0.0)), 6)
                   AS est_weight
        FROM ranked r LEFT JOIN tau t USING ({bnames})
        WHERE r.rn <= {k}
    """


# ===========================================================================
# t-digest (Python kernel; merging variant, Dunning & Ertl 2019)
# ===========================================================================

class TDigest:
    """Merging t-digest with the k1 (arcsine) scale function. Centroids
    are (mean, weight) pairs sorted by mean; a compression pass bounds
    each centroid's k-size to 1, which concentrates resolution at the
    tails — rank error ~ q(1-q), the property the published bound rides
    on. Deterministic: inputs are sorted before clustering and merges
    concatenate sorted centroid streams, so no RNG anywhere."""

    __slots__ = ("compression", "means", "weights")

    def __init__(self, compression: int = 100):
        self.compression = int(compression)
        self.means: list[float] = []
        self.weights: list[float] = []

    # -- scale function ----------------------------------------------------
    def _k(self, q: float) -> float:
        q = min(max(q, 0.0), 1.0)
        return self.compression / (2.0 * math.pi) * math.asin(2.0 * q - 1.0)

    # -- construction ------------------------------------------------------
    @classmethod
    def from_values(cls, values, compression: int = 100) -> "TDigest":
        """Build from raw values — fully vectorized: one numpy sort +
        cumsum, then a greedy cut loop that iterates over CENTROIDS
        (O(compression) iterations, each a searchsorted), never over
        values. Same greedy k-size rule as the pair-stream compressor,
        so the rank-error bound is identical; deterministic (no RNG)."""
        import numpy as np

        d = cls(compression)
        arr = (values.astype("float64", copy=False)
               if isinstance(values, np.ndarray)
               else np.fromiter((float(v) for v in values),
                                dtype="float64"))
        if arr.size:
            d._set_sorted_units(np.sort(arr))
        return d

    def _set_sorted_units(self, sv) -> None:
        """Compress a SORTED unit-weight value array into centroids.
        Equivalent to ``_set_compressed`` on [(v, 1.0)] pairs: the
        greedy inclusion condition k(cum_end/n) - k(q0) <= 1 depends
        only on the cumulative count, so each centroid's end index is
        one searchsorted into the precomputed k(q) curve."""
        import numpy as np

        n = int(sv.size)
        self.means, self.weights = [], []
        if n == 0:
            return
        c = float(self.compression)
        q = np.arange(1, n + 1, dtype="float64") / n
        kq = c / (2.0 * math.pi) * np.arcsin(
            np.clip(2.0 * q - 1.0, -1.0, 1.0))
        cv = np.concatenate(([0.0], np.cumsum(sv)))
        start = 0
        k0 = self._k(0.0)
        while start < n:
            end = int(np.searchsorted(kq, k0 + 1.0, side="right"))
            end = max(end, start + 1)
            self.means.append(float((cv[end] - cv[start]) / (end - start)))
            self.weights.append(float(end - start))
            start = end
            k0 = float(kq[end - 1])

    def _set_compressed(self, pairs) -> None:
        """Compress a mean-sorted (mean, weight) stream into centroids
        obeying the k-size bound."""
        total = sum(w for _, w in pairs)
        self.means, self.weights = [], []
        if total == 0:
            return
        q0 = 0.0
        cur_m, cur_w = pairs[0]
        for m, w in pairs[1:]:
            if self._k((q0 * total + cur_w + w) / total) - self._k(q0) <= 1.0:
                cur_m = (cur_m * cur_w + m * w) / (cur_w + w)
                cur_w += w
            else:
                self.means.append(cur_m)
                self.weights.append(cur_w)
                q0 += cur_w / total
                cur_m, cur_w = m, w
        self.means.append(cur_m)
        self.weights.append(cur_w)

    def merge(self, other: "TDigest") -> "TDigest":
        out = TDigest(max(self.compression, other.compression))
        pairs = sorted(
            list(zip(self.means, self.weights))
            + list(zip(other.means, other.weights))
        )
        if pairs:
            out._set_compressed(pairs)
        return out

    @property
    def total_weight(self) -> float:
        return sum(self.weights)

    # -- queries -------------------------------------------------------
    def quantile(self, q: float) -> float:
        if not self.means:
            raise ValueError("empty digest")
        total = self.total_weight
        target = q * total
        cum = 0.0
        for i, w in enumerate(self.weights):
            if cum + w >= target:
                return self.means[i]
            cum += w
        return self.means[-1]

    # -- DataFrame transport -------------------------------------------
    def to_rows(self) -> list[tuple]:
        return list(zip(self.means, self.weights))

    @classmethod
    def from_rows(cls, rows, compression: int = 100) -> "TDigest":
        d = cls(compression)
        pairs = sorted((float(m), float(w)) for m, w in rows)
        if pairs:
            d._set_compressed(pairs)
        return d


def tdigest_build(df: DataFrame, value_col: str,
                  compression: int = 100, fan: int = 64) -> TDigest:
    """Distributed t-digest: one partial digest per partition
    (mapInPandas — each partition's values never leave the executor;
    only ~compression centroid rows do), tree-merged. When the input
    has more than ``fan`` partitions, an intermediate applyInPandas
    stage merges the partial centroid streams in groups keyed by
    ``spark_partition_id % fan`` (a shuffle of the TINY partial table
    only), so the driver collects at most fan * O(compression) centroid
    rows and folds once — driver work is bounded by ``fan`` regardless
    of partition count (at 10^12 rows / 10^5 partitions the pre-merge
    keeps ~10^7 centroid rows off the driver). Merging is the digest's
    own associative merge, so every tree shape honours the k-size
    invariant the rank bound rides on (merge-tree independence is
    pinned in tests/test_sketches.py)."""
    import pandas as pd

    comp = compression

    def _partial(batches):
        import numpy as np

        # numpy chunk concatenation (8 B/value, one contiguous buffer)
        # feeding the batch from_values — no per-value Python list
        chunks = []
        for b in batches:
            a = b[value_col].dropna().to_numpy(dtype="float64")
            if a.size:
                chunks.append(a)
        if chunks:
            d = TDigest.from_values(np.concatenate(chunks), comp)
            yield pd.DataFrame({"mean": d.means, "weight": d.weights})

    partials = df.select(value_col).mapInPandas(
        _partial, "mean double, weight double")
    if df.rdd.getNumPartitions() > fan:
        def _merge_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
            d = TDigest.from_rows(
                zip(pdf["mean"], pdf["weight"]), comp)
            return pd.DataFrame({"mean": d.means, "weight": d.weights})

        partials = (
            partials.withColumn("_g", F.spark_partition_id() % fan)
            .groupBy("_g")
            .applyInPandas(_merge_group, "mean double, weight double")
        )
    rows = partials.collect()
    return TDigest.from_rows([(r["mean"], r["weight"]) for r in rows],
                             comp)


# ===========================================================================
# KLL (compactor-based quantiles; derandomized)
# ===========================================================================

class KLLSketch:
    """KLL-style compactor sketch (Karnin, Lang, Liberty 2016) with a
    DETERMINISTIC compaction coin: each level alternates keeping odd and
    even positions on successive compactions instead of flipping a
    random coin. This trades the randomized guarantee for run-to-run
    reproducibility (the property every other sketch here has); the
    deterministic alternation keeps the compaction unbiased over pairs
    of compactions, and the achieved rank error is property-tested
    against the published-order bound in tests/test_sketches.py.

    Level h holds items each representing 2^h inputs; compacting level h
    sorts it and promotes every other item to level h+1."""

    __slots__ = ("k", "levels", "parities", "n")

    def __init__(self, k: int = 256):
        self.k = int(k)
        self.levels: list[list[float]] = [[]]
        self.parities: list[int] = [0]
        self.n = 0

    def _capacity(self, h: int) -> int:
        # geometrically shrinking lower-level capacities (c = 2/3)
        top = len(self.levels) - 1
        return max(2, int(math.ceil(self.k * (2.0 / 3.0) ** (top - h))))

    def update(self, value: float) -> None:
        self.extend([value])

    def extend(self, values) -> None:
        import numpy as np

        # ndarray fast path: astype+tolist is a C-speed conversion —
        # the previous per-value float() genexpr was the last
        # row-at-a-time Python on the sketch ingestion path
        if isinstance(values, np.ndarray):
            vals = values.astype("float64", copy=False).tolist()
        else:
            vals = [float(v) for v in values]
        self.levels[0].extend(vals)
        self.n += len(vals)
        self._compress()

    def _compress(self) -> None:
        h = 0
        while h < len(self.levels):
            if len(self.levels[h]) > self._capacity(h):
                buf = sorted(self.levels[h])
                off = self.parities[h] & 1
                self.parities[h] += 1
                promoted = buf[off::2]
                self.levels[h] = []
                if h + 1 == len(self.levels):
                    self.levels.append([])
                    self.parities.append(0)
                self.levels[h + 1].extend(promoted)
            h += 1

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        out = KLLSketch(max(self.k, other.k))
        depth = max(len(self.levels), len(other.levels))
        out.levels = [[] for _ in range(depth)]
        out.parities = [0] * depth
        for src in (self, other):
            for h, buf in enumerate(src.levels):
                out.levels[h].extend(buf)
        out.n = self.n + other.n
        out._compress()
        return out

    def _weighted(self):
        items = []
        for h, buf in enumerate(self.levels):
            w = 1 << h
            items.extend((v, w) for v in buf)
        items.sort()
        return items

    def rank(self, value: float) -> float:
        """Estimated fraction of inputs <= value."""
        if self.n == 0:
            raise ValueError("empty sketch")
        total = 0
        below = 0
        for v, w in self._weighted():
            total += w
            if v <= value:
                below += w
        return below / total

    def quantile(self, q: float) -> float:
        if self.n == 0:
            raise ValueError("empty sketch")
        items = self._weighted()
        total = sum(w for _, w in items)
        target = q * total
        cum = 0
        for v, w in items:
            cum += w
            if cum >= target:
                return v
        return items[-1][0]


def kll_partials(df: DataFrame, value_col: str, k: int = 256) -> DataFrame:
    """Per-partition KLL compactor rows (level, value) — the mergeable
    partial-state form (union of partial tables IS the KLL merge; a
    compaction pass restores the size bound). NULL values excluded."""
    import pandas as pd

    kk = k

    def _partial(batches):
        sk = KLLSketch(kk)
        for b in batches:
            sk.extend(b[value_col].dropna().to_numpy(dtype="float64"))
        rows = [(h, v) for h, buf in enumerate(sk.levels) for v in buf]
        if rows:
            yield pd.DataFrame(
                {"level": [r[0] for r in rows],
                 "value": [r[1] for r in rows]})

    return df.select(value_col).mapInPandas(
        _partial, "level int, value double")


def kll_compact_partials(df: DataFrame, k: int = 256) -> DataFrame:
    """Compact a compactor-row table back to <= O(k log n) rows: one
    rebuild-and-re-emit (union-then-compress IS the KLL merge). The
    streaming maintenance path runs this per micro-batch so state
    stays bounded regardless of stream length."""
    import pandas as pd

    kk = k

    def _compact(pdf: "pd.DataFrame") -> "pd.DataFrame":
        sk = _kll_from_level_rows(pdf["level"], pdf["value"], kk)
        rows = [(h, v) for h, buf in enumerate(sk.levels) for v in buf]
        return pd.DataFrame({"level": [r[0] for r in rows],
                             "value": [r[1] for r in rows]})

    return (df.withColumn("_g", F.lit(1)).groupBy("_g")
            .applyInPandas(_compact, "level int, value double"))


def kll_build(df: DataFrame, value_col: str, k: int = 256,
              fan: int = 64) -> KLLSketch:
    """Distributed KLL: per-partition sketches via mapInPandas, tree-
    merged. The exchange is O(partitions * k * log) level rows; when
    the input has more than ``fan`` partitions an intermediate
    applyInPandas stage (keyed by ``spark_partition_id % fan``) merges
    the compactor rows in groups — KLL merge IS union-then-compress,
    so each group merge is the sketch's own associative merge — and
    the driver collects at most fan * O(k log) rows regardless of
    partition count. Merge-tree independence within the documented
    merged bound is pinned in tests/test_sketches.py."""
    import pandas as pd

    kk = k
    partials = kll_partials(df, value_col, k)
    if df.rdd.getNumPartitions() > fan:
        def _merge_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
            sk = _kll_from_level_rows(pdf["level"], pdf["value"], kk)
            rows = [(h, v) for h, buf in enumerate(sk.levels)
                    for v in buf]
            return pd.DataFrame({"level": [r[0] for r in rows],
                                 "value": [r[1] for r in rows]})

        partials = (
            partials.withColumn("_g", F.spark_partition_id() % fan)
            .groupBy("_g")
            .applyInPandas(_merge_group, "level int, value double")
        )
    rows = partials.collect()
    return _kll_from_level_rows([r["level"] for r in rows],
                                [r["value"] for r in rows], k)


# ---------------------------------------------------------------------------
# grouped KLL (per-group quantiles with the O(1/k) guarantee in one pass)
# ---------------------------------------------------------------------------
#
# Same compactor contract as kll_build, independently PER GROUP — the
# quantile analogue of mg_partials_by/hll_registers_by. Scale shape: one
# mapInPandas pass maintaining a KLLSketch per group present in the
# partition (state O(groups-in-partition * k * log(n/k))), emitting
# (by..., level, value) compactor rows — <= O(k log(n_g/k)) rows per
# group per partition; the per-group merge then runs as applyInPandas
# over that TINY partial table (one shuffle keyed by the group columns),
# so the driver never sees a single data value. This gives per-group
# rank error O(1/k) — vs the ~1/sqrt(k) of quantiles read off a
# grouped bottom-k sample of k keys.


def _kll_from_level_rows(level_arr, value_arr, k: int) -> KLLSketch:
    """Rebuild a KLLSketch from (level, value) compactor rows — the
    shared merge step of ``kll_build`` (driver) and the grouped
    applyInPandas merge (executor): dump every row into its level, then
    one compress pass restores the capacity invariants."""
    out = KLLSketch(k)
    levels = [int(h) for h in level_arr]
    if not levels:
        return out
    depth = max(levels) + 1
    out.levels = [[] for _ in range(depth)]
    out.parities = [0] * depth
    for h, v in zip(levels, value_arr):
        out.levels[h].append(float(v))
    out.n = sum(len(buf) << h for h, buf in enumerate(out.levels))
    out._compress()
    return out


def kll_partials_by(df: DataFrame, value_col: str, by,
                    k: int = 256) -> DataFrame:
    """Per-partition grouped KLL compactor rows (by..., level, value):
    each partition maintains an independent KLLSketch per group it
    sees. Group columns are cast to string; rows with a NULL group key
    or NULL value are excluded (same contract as the other grouped
    sketches)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    by = _norm_by(by)

    import pandas as pd

    kk = k

    def _partial(batches):
        sks: dict[tuple, KLLSketch] = {}
        for b in batches:
            for key, grp in b.groupby(by, sort=False):
                kt = key if isinstance(key, tuple) else (key,)
                sk = sks.get(kt)
                if sk is None:
                    sks[kt] = sk = KLLSketch(kk)
                sk.extend(grp["_v"].to_numpy(dtype="float64"))
        for kt, sk in sks.items():
            rows = [(h, v) for h, buf in enumerate(sk.levels)
                    for v in buf]
            if not rows:
                continue
            out = pd.DataFrame({"level": [r[0] for r in rows],
                                "value": [r[1] for r in rows]})
            for c, kv in zip(by, kt):
                out[c] = kv
            yield out[by + ["level", "value"]]

    schema = ", ".join(f"`{c}` string" for c in by) \
        + ", level int, value double"
    pred = F.col(value_col).isNotNull()
    for c in by:
        pred = pred & F.col(c).isNotNull()
    sel = [F.col(c).cast("string").alias(c) for c in by]
    sel.append(F.col(value_col).cast("double").alias("_v"))
    return df.where(pred).select(*sel).mapInPandas(_partial, schema)


def kll_build_by(df: DataFrame, value_col: str, by,
                 k: int = 256) -> dict[tuple, KLLSketch]:
    """Driver-side dict {group-tuple: KLLSketch} — the grouped twin of
    ``kll_build`` for callers that want the sketch OBJECTS (ad-hoc
    ranks, serialization). Driver work/memory is O(groups * k * log);
    for the common read-off-the-quantiles path use the fully
    distributed ``kll_quantiles_by``, whose merge runs on executors."""
    by = _norm_by(by)
    rows = kll_partials_by(df, value_col, by, k).collect()
    acc: dict[tuple, tuple[list, list]] = {}
    for r in rows:
        g = tuple(r[c] for c in by)
        lv = acc.setdefault(g, ([], []))
        lv[0].append(r["level"])
        lv[1].append(r["value"])
    return {g: _kll_from_level_rows(ls, vs, k)
            for g, (ls, vs) in acc.items()}


def kll_quantiles_by(df: DataFrame, value_col: str, by, qs: list[float],
                     k: int = 256) -> DataFrame:
    """(by..., q, est) per-group KLL quantile estimates, fully
    distributed: one data pass for the partials, one group-keyed
    shuffle of the tiny partial table, per-group merge + read-off
    inside applyInPandas. Rank error O(1/k) per group."""
    by = _norm_by(by)
    qs_l = [float(q) for q in qs]
    kk = k

    import pandas as pd

    partials = kll_partials_by(df, value_col, by, k)

    def _merge(pdf: "pd.DataFrame") -> "pd.DataFrame":
        sk = _kll_from_level_rows(pdf["level"], pdf["value"], kk)
        out = pd.DataFrame({"q": qs_l,
                            "est": [sk.quantile(q) for q in qs_l]})
        for c in by:
            out[c] = pdf[c].iloc[0]
        return out[by + ["q", "est"]]

    schema = ", ".join(f"`{c}` string" for c in by) \
        + ", q double, est double"
    return partials.groupBy(*by).applyInPandas(_merge, schema)


def kll_merge_partials_by(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two grouped partial tables built with the same (by, k):
    plain union — compactor rows at the same level combine by
    concatenation, and the next per-group merge's compress restores
    the invariants (KLL merge IS union-then-compress)."""
    return a.unionByName(b)


def kll_compact_partials_by(df: DataFrame, by, k: int = 256) -> DataFrame:
    """Per-group compaction of a grouped compactor-row table back to
    <= O(k log n_g) rows per group (the grouped twin of
    ``kll_compact_partials``; the streaming ``kll_by`` kind's state
    bound)."""
    import pandas as pd

    by = _norm_by(by)
    kk = k

    def _compact(pdf: "pd.DataFrame") -> "pd.DataFrame":
        sk = _kll_from_level_rows(pdf["level"], pdf["value"], kk)
        rows = [(h, v) for h, buf in enumerate(sk.levels) for v in buf]
        out = pd.DataFrame({"level": [r[0] for r in rows],
                            "value": [r[1] for r in rows]})
        for c in by:
            out[c] = pdf[c].iloc[0]
        return out[by + ["level", "value"]]

    schema = ", ".join(f"`{c}` string" for c in by) \
        + ", level int, value double"
    return df.groupBy(*by).applyInPandas(_compact, schema)


# ---------------------------------------------------------------------------
# grouped t-digest (per-group quantiles, k1-scale tail resolution)
# ---------------------------------------------------------------------------
#
# The t-digest twin of the grouped-KLL family: same two-stage shape —
# one mapInPandas data pass emitting (by..., mean, weight) centroid
# rows (<= O(compression) rows per group per partition), then a
# group-keyed applyInPandas merge over that TINY partial table. Per
# partition, each group's values accumulate as numpy chunks and flush
# into a running digest every _TD_FLUSH values, so partial-state memory
# is O(groups-in-partition * (compression + _TD_FLUSH)) regardless of
# partition size. No data value ever reaches the driver.

_TD_FLUSH = 1 << 18  # values buffered per group before folding into
#                      the running digest (256k * 8 B = 2 MB per group)


def tdigest_partials_by(df: DataFrame, value_col: str, by,
                        compression: int = 100) -> DataFrame:
    """Per-partition grouped t-digest centroid rows (by..., mean,
    weight). Group columns are cast to string; rows with a NULL group
    key or NULL value are excluded (same contract as the other grouped
    sketches)."""
    by = _norm_by(by)

    import pandas as pd

    comp = compression

    def _partial(batches):
        import numpy as np

        digs: dict[tuple, TDigest | None] = {}
        bufs: dict[tuple, list] = {}
        sizes: dict[tuple, int] = {}

        def _flush(kt):
            arrs = bufs.get(kt)
            if not arrs:
                return
            d = TDigest.from_values(np.concatenate(arrs), comp)
            prev = digs.get(kt)
            digs[kt] = d if prev is None else prev.merge(d)
            bufs[kt] = []
            sizes[kt] = 0

        for b in batches:
            for key, grp in b.groupby(by, sort=False):
                kt = key if isinstance(key, tuple) else (key,)
                a = grp["_v"].to_numpy(dtype="float64")
                if not a.size:
                    continue
                bufs.setdefault(kt, []).append(a)
                sizes[kt] = sizes.get(kt, 0) + a.size
                digs.setdefault(kt, None)
                if sizes[kt] >= _TD_FLUSH:
                    _flush(kt)
        for kt in list(digs):
            _flush(kt)
            d = digs[kt]
            if d is None or not d.means:
                continue
            out = pd.DataFrame({"mean": d.means, "weight": d.weights})
            for c, kv in zip(by, kt):
                out[c] = kv
            yield out[by + ["mean", "weight"]]

    schema = ", ".join(f"`{c}` string" for c in by) \
        + ", mean double, weight double"
    pred = F.col(value_col).isNotNull()
    for c in by:
        pred = pred & F.col(c).isNotNull()
    sel = [F.col(c).cast("string").alias(c) for c in by]
    sel.append(F.col(value_col).cast("double").alias("_v"))
    return df.where(pred).select(*sel).mapInPandas(_partial, schema)


def tdigest_build_by(df: DataFrame, value_col: str, by,
                     compression: int = 100) -> dict[tuple, TDigest]:
    """Driver-side dict {group-tuple: TDigest} — the grouped twin of
    ``tdigest_build`` for callers that want the digest OBJECTS. Driver
    work/memory is O(groups * compression); for the read-off-the-
    quantiles path use the fully distributed ``tdigest_quantiles_by``,
    whose merge runs on executors."""
    by = _norm_by(by)
    rows = tdigest_partials_by(df, value_col, by, compression).collect()
    acc: dict[tuple, list] = {}
    for r in rows:
        acc.setdefault(tuple(r[c] for c in by), []).append(
            (r["mean"], r["weight"]))
    return {g: TDigest.from_rows(pairs, compression)
            for g, pairs in acc.items()}


def tdigest_quantiles_by(df: DataFrame, value_col: str, by,
                         qs: list[float],
                         compression: int = 100) -> DataFrame:
    """(by..., q, est) per-group t-digest quantile estimates, fully
    distributed: one data pass for the centroid partials, one
    group-keyed shuffle of the tiny partial table, per-group merge +
    read-off inside applyInPandas (mirror of ``kll_quantiles_by``)."""
    by = _norm_by(by)
    qs_l = [float(q) for q in qs]
    comp = compression

    import pandas as pd

    partials = tdigest_partials_by(df, value_col, by, compression)

    def _merge(pdf: "pd.DataFrame") -> "pd.DataFrame":
        d = TDigest.from_rows(zip(pdf["mean"], pdf["weight"]), comp)
        out = pd.DataFrame({"q": qs_l,
                            "est": [d.quantile(q) for q in qs_l]})
        for c in by:
            out[c] = pdf[c].iloc[0]
        return out[by + ["q", "est"]]

    schema = ", ".join(f"`{c}` string" for c in by) \
        + ", q double, est double"
    return partials.groupBy(*by).applyInPandas(_merge, schema)


def tdigest_merge_partials_by(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two grouped centroid-row tables built with the same
    (by, compression): plain union — centroid streams concatenate, and
    the next per-group merge's compression pass restores the k-size
    invariant (t-digest merge IS concat-then-compress)."""
    return a.unionByName(b)


def tdigest_compact_partials_by(df: DataFrame, by,
                                compression: int = 100) -> DataFrame:
    """Per-group compaction of a grouped centroid-row table back to
    <= O(compression) rows per group (the grouped twin of the merge
    step; bounds state if partials accumulate across batches)."""
    import pandas as pd

    by = _norm_by(by)
    comp = compression

    def _compact(pdf: "pd.DataFrame") -> "pd.DataFrame":
        d = TDigest.from_rows(zip(pdf["mean"], pdf["weight"]), comp)
        out = pd.DataFrame({"mean": d.means, "weight": d.weights})
        for c in by:
            out[c] = pdf[c].iloc[0]
        return out[by + ["mean", "weight"]]

    schema = ", ".join(f"`{c}` string" for c in by) \
        + ", mean double, weight double"
    return df.groupBy(*by).applyInPandas(_compact, schema)


# ===========================================================================
# bound-check queries (the oracle for the Python-kernel sketches)
# ===========================================================================

def quantile_bound_check(df: DataFrame, value_col: str,
                         qs: list[float], kind: str = "tdigest",
                         compression: int = 100, k: int = 256,
                         bound: float | None = None) -> DataFrame:
    """(q, ok) rows: does the sketch's quantile estimate sit within the
    documented rank-error bound of the exact quantile? This is the
    correctness gate for the non-SQL-expressible sketches: the DuckDB
    oracle for this query is the constant TRUE per q — any bound
    violation turns the gate red (same pattern as the ANN recall gate).

    Rank error is measured in rank space (fraction of values between the
    estimate and the exact quantile), the metric both papers bound:
    t-digest ~ eps proportional to q(1-q)/compression; KLL ~ O(1/k)."""
    spark = df.sparkSession
    if kind == "tdigest":
        sk = tdigest_build(df, value_col, compression)
        est = {q: sk.quantile(q) for q in qs}
        if bound is None:
            # conservative engineering bound for the k1 merging digest:
            # observed max rank error is well under 6/compression at the
            # median and shrinks toward the tails
            bound = 6.0 / compression
    elif kind == "kll":
        sk = kll_build(df, value_col, k)
        est = {q: sk.quantile(q) for q in qs}
        if bound is None:
            # published order: eps = O(1/k) up to log factors; the
            # constant below is property-tested in tests/test_sketches.py
            bound = 12.0 / k
    else:
        raise ValueError(f"unknown sketch kind {kind!r}")

    # Exact rank interval of each estimate, computed DISTRIBUTIVELY: per
    # q, two conditional counts (value < est == bisect_left rank;
    # value <= est == bisect_right rank) in ONE aggregate pass — O(|qs|)
    # values ever reach the driver. A tied value occupies a rank
    # INTERVAL [left, right]; the error is the distance from q to that
    # interval (a heavy tie at the true quantile would otherwise read as
    # a huge false error). The pre-0.4.0 checker collected the whole
    # value column to the driver, a scale trap at 10^12 rows.
    vdf = df.select(F.col(value_col).alias("_v")).dropna()
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, q in enumerate(qs):
        e = F.lit(float(est[q]))
        aggs.append(F.sum((F.col("_v") < e).cast("long")).alias(f"_lt{i}"))
        aggs.append(F.sum((F.col("_v") <= e).cast("long")).alias(f"_le{i}"))
    r = vdf.agg(*aggs).collect()[0]
    n = r["_n"]
    rows = []
    for i, q in enumerate(qs):
        lo = r[f"_lt{i}"] / n
        hi = r[f"_le{i}"] / n
        err = max(0.0, lo - q, q - hi)
        rows.append((float(q), bool(err <= bound)))
    return spark.createDataFrame(rows, "q double, ok boolean")


def duckdb_quantile_bound_sql(qs: list[float]) -> str:
    """The oracle twin of ``quantile_bound_check``: TRUE per q."""
    qlit = ", ".join(f"CAST({float(q)!r} AS DOUBLE)" for q in qs)
    return f"SELECT q, TRUE AS ok FROM unnest([{qlit}]) AS t(q)"


def quantile_bound_check_by(df: DataFrame, value_col: str, by,
                            qs: list[float], k: int = 256,
                            bound: float | None = None,
                            kind: str = "kll",
                            compression: int = 100) -> DataFrame:
    """(by..., q, ok) — the grouped twin of ``quantile_bound_check``:
    per group, is the sketch's quantile estimate within its documented
    rank-error bound of that GROUP's exact quantile? ``kind`` selects
    the quantile kernel: "kll" (O(1/k) per-group rank error) or
    "tdigest" (k1-scale merging digest; default bound 8/compression —
    the merged-path constant pinned by
    tests/test_sketches.py::test_tdigest_merge_preserves_bound, since
    the per-group estimate merges per-partition partial digests).
    Oracle: ``duckdb_quantile_bound_by_sql`` — constant TRUE per
    (group, q).

    Fully distributed: the per-(group, q) estimates (a tiny
    groups x |qs| table) broadcast-join back to the data, and the
    exact tie-aware rank interval of each estimate comes out of ONE
    grouped conditional aggregate — rank_lt = |v < est| (bisect_left),
    rank_le = |v <= est| (bisect_right); the error is the distance
    from q to [rank_lt, rank_le]/n_g. No per-group sort, no value ever
    reaches the driver (same scale argument as the global checker)."""
    by = _norm_by(by)
    if kind == "kll":
        if bound is None:
            bound = 12.0 / k  # same property-tested constant as the
            #                   global KLL gate (quantile_bound_check)
        est = kll_quantiles_by(df, value_col, by, qs, k)
    elif kind == "tdigest":
        if bound is None:
            bound = 8.0 / compression
        est = tdigest_quantiles_by(df, value_col, by, qs, compression)
    else:
        raise ValueError(f"unknown sketch kind {kind!r}")
    pred = F.col(value_col).isNotNull()
    for c in by:
        pred = pred & F.col(c).isNotNull()
    vals = df.where(pred).select(
        *[F.col(c).cast("string").alias(c) for c in by],
        F.col(value_col).cast("double").alias("_v"))
    fan = vals.join(F.broadcast(est), by)  # x|qs| row fan-out, map-side
    agg = fan.groupBy(*by, "q").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum((F.col("_v") < F.col("est")).cast("long")).alias("_lt"),
        F.sum((F.col("_v") <= F.col("est")).cast("long")).alias("_le"),
    )
    return agg.select(
        *by, "q",
        (F.greatest(
            F.lit(0.0),
            F.col("_lt") / F.col("_n") - F.col("q"),
            F.col("q") - F.col("_le") / F.col("_n"),
        ) <= F.lit(float(bound))).alias("ok"),
    )


def duckdb_quantile_bound_by_sql(by, qs: list[float], source: str,
                                 value_col: str) -> str:
    """Oracle twin of ``quantile_bound_check_by``: every group present
    in ``source`` (non-null group keys and value) x every q, TRUE."""
    by = _norm_by(by)
    bys = ", ".join(f"CAST({c} AS VARCHAR) AS {c}" for c in by)
    qlit = ", ".join(f"CAST({float(q)!r} AS DOUBLE)" for q in qs)
    notnull = " AND ".join([f"{value_col} IS NOT NULL"]
                           + [f"{c} IS NOT NULL" for c in by])
    return f"""
        SELECT g.*, t.q, TRUE AS ok
        FROM (SELECT DISTINCT {bys} FROM {source} WHERE {notnull}) g
        CROSS JOIN (SELECT q FROM unnest([{qlit}]) AS u(q)) t
    """


# ===========================================================================
# Misra-Gries frequent items (heavy hitters)
# ===========================================================================
#
# Summary representation: a DataFrame with schema
#   (item string, est long, err long)
# holding at most k data rows (item NOT NULL, err = 0) plus exactly one
# sentinel row (item NULL, est = 0) whose ``err`` is the summary's total
# error budget. Guarantee for every key x with true count c(x):
#   est(x) <= c(x) <= est(x) + err        (est(x) = 0 if x absent)
# and err <= n/(k+1) for n total rows — the classic Misra-Gries bound,
# which survives merging because every prune that subtracts t from the
# counters removes >= (k+1)*t of counter mass, and only n mass ever
# enters (Agarwal et al. 2012, "Mergeable Summaries").
#
# Scale shape: the only data-sized pass is one mapInPandas emitting
# <= k+1 rows per partition (pandas value_counts — vectorized, no
# per-row Python); everything after operates on <= k*partitions + 1
# rows, and the final threshold select is an order-limit (TakeOrdered),
# never a full sort. Unlike the other SQL-expressible sketches the
# result is NOT a pure function of the input multiset (it depends on the
# partitioning, like any Misra-Gries run depends on arrival order), so
# its correctness gate is the guarantee itself: ``mg_bound_check`` emits
# per-heavy-item ok booleans whose oracle is constant TRUE (the
# t-digest/KLL/ANN-recall pattern).


def _mg_finalize(unioned: DataFrame, k: int) -> DataFrame:
    """Sum per-item estimates, prune to the k largest by subtracting the
    (k+1)-th largest count, and fold that subtraction into the sentinel
    row's error budget. ``unioned`` rows follow the summary schema."""
    summed = (
        unioned.where(F.col("item").isNotNull())
        .groupBy("item").agg(F.sum("est").cast("long").alias("est"))
    )
    base_err = unioned.agg(
        F.coalesce(F.sum("err"), F.lit(0)).cast("long").alias("_e"))
    # (k+1)-th largest summed estimate (0 when <= k distinct items):
    # order-limit over the tiny summed table, not a global sort
    t_val = (
        summed.orderBy(F.desc("est"), "item").offset(k).limit(1)
        .agg(F.coalesce(F.max("est"), F.lit(0)).cast("long").alias("_t"))
    )
    kept = (
        summed.crossJoin(t_val)  # one-row broadcast
        .where(F.col("est") > F.col("_t"))
        .select(
            "item",
            (F.col("est") - F.col("_t")).cast("long").alias("est"),
            F.lit(0).cast("long").alias("err"),
        )
    )
    sentinel = base_err.crossJoin(t_val).select(
        F.lit(None).cast("string").alias("item"),
        F.lit(0).cast("long").alias("est"),
        (F.col("_e") + F.col("_t")).cast("long").alias("err"),
    )
    return kept.unionByName(sentinel)


def mg_partials(df: DataFrame, col: str, k: int = 256,
                weight_col: str | None = None) -> DataFrame:
    """The data-sized half of ``mg_summary``: per-partition Misra-Gries
    summaries via one vectorized mapInPandas pass, <= k+1 rows emitted
    per partition. Exposed separately so the plan (MapInPandas, no
    row-Python) stays auditable — ``mg_summary`` checkpoints this
    result, which hides the pass from its final plan."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    import pandas as pd

    def _prune(counts: "pd.Series") -> tuple["pd.Series", int]:
        """Subtract the (k+1)-th largest from every counter and drop
        the non-positives; returns (pruned, t). Removes >= (k+1)*t of
        counter mass — the accounting the n/(k+1) bound rides on."""
        if len(counts) <= k:
            return counts, 0
        t = int(counts.sort_values(ascending=False).iloc[k])
        counts = counts - t
        return counts[counts > 0], t

    def _partial(batches):
        # prune after EVERY Arrow batch, not once at the end: the
        # running state stays O(k + batch-distinct) — a partition with
        # 10^8 distinct keys must never materialize them all (the
        # documented <= k+1 rows-leave-each-partition scale shape)
        counts = None
        t_total = 0
        for b in batches:
            if weight_col is None:
                vc = b["item"].dropna().value_counts()
            else:
                # drop null weights too: a null weight would become NaN
                # in the groupby sum and fail the int64 cast opaquely
                sub = b.dropna(subset=["item", "w"])
                if (sub["w"] < 0).any():
                    raise ValueError(
                        "mg_summary weights must be non-negative")
                vc = sub.groupby("item")["w"].sum()
            counts = vc if counts is None else counts.add(vc, fill_value=0)
            counts, t = _prune(counts.astype("int64"))
            t_total += t
        if counts is None or (counts.empty and t_total == 0):
            return
        out = pd.DataFrame({
            "item": counts.index.astype(str),
            "est": counts.to_numpy(),
        })
        out["err"] = 0
        yield pd.concat([
            out,
            pd.DataFrame({"item": [None], "est": [0], "err": [t_total]}),
        ])

    cols = [F.col(col).cast("string").alias("item")]
    if weight_col is not None:
        cols.append(F.col(weight_col).cast("long").alias("w"))
    return (
        df.where(F.col(col).isNotNull())
        .select(*cols)
        .mapInPandas(_partial, "item string, est long, err long")
    )


def mg_summary(df: DataFrame, col: str, k: int = 256,
               weight_col: str | None = None) -> DataFrame:
    """Misra-Gries frequent-items summary of ``col`` with k counters.

    Every key whose true count exceeds n/(k+1) is guaranteed present;
    estimates under-count by at most the summary's ``err`` (sentinel
    row), itself <= n/(k+1).

    With ``weight_col`` (non-negative integer weights — e.g. bytes per
    page), counts become weight sums: the guarantee is the weighted
    form, every key with total weight > W/(k+1) present, err <=
    W/(k+1) for W total weight. The prune accounting is identical —
    subtracting t from >= k+1 weighted counters removes >= (k+1)*t of
    the W mass that entered."""
    # materialize the tiny partial table exactly once: _mg_finalize
    # references it from several subtrees, and est/err must come from
    # the SAME Misra-Gries run (partitioning or task retry could
    # otherwise produce different prune amounts per subtree)
    partials = mg_partials(df, col, k, weight_col).localCheckpoint(
        eager=True)
    return _mg_finalize(partials, k)


def mg_merge(a: DataFrame, b: DataFrame, k: int = 256) -> DataFrame:
    """Merge two summaries built with the same k: sum common counters,
    prune back to k. Error budgets add (then gain the prune's
    subtraction), and the combined summary still satisfies
    err <= (n_a + n_b)/(k+1)."""
    return _mg_finalize(a.unionByName(b), k)


def mg_estimates(summary: DataFrame) -> DataFrame:
    """The (item, est) data rows of a summary (sentinel dropped)."""
    return summary.where(F.col("item").isNotNull()).select("item", "est")


def mg_error(summary: DataFrame) -> DataFrame:
    """One row (err): the summary's total undercount budget."""
    return summary.agg(F.coalesce(F.sum("err"), F.lit(0))
                       .cast("long").alias("err"))


def mg_bound_check(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """(item, ok) per TRUE heavy hitter (true count * (k+1) > n): is the
    item present in the summary with its guarantee intact —
    est <= true <= est + err, and err within the published n/(k+1)
    bound? The DuckDB oracle (``duckdb_mg_heavy_sql``) recomputes the
    heavy set exactly and emits constant TRUE, so any guarantee
    violation turns the gate red."""
    sk = mg_summary(df, col, k)
    exact = (
        df.where(F.col(col).isNotNull())
        .select(F.col(col).cast("string").alias("item"))
        .groupBy("item").agg(F.count(F.lit(1)).alias("true_cnt"))
    )
    n_df = exact.agg(F.sum("true_cnt").cast("long").alias("_n"))
    heavy = (
        exact.crossJoin(n_df)
        .where(F.col("true_cnt") * (k + 1) > F.col("_n"))
    )
    return (
        heavy.join(F.broadcast(mg_estimates(sk)), "item", "left")
        .crossJoin(mg_error(sk))
        .select(
            "item",
            (
                F.col("est").isNotNull()
                & (F.col("est") <= F.col("true_cnt"))
                & (F.col("true_cnt") <= F.col("est") + F.col("err"))
                & (F.col("err") * (k + 1) <= F.col("_n"))
            ).alias("ok"),
        )
    )


def duckdb_mg_heavy_sql(col: str, k: int, source: str) -> str:
    """Oracle twin of ``mg_bound_check``: the exact heavy set with
    constant TRUE."""
    return f"""
        WITH e AS (
            SELECT CAST({col} AS VARCHAR) AS item, COUNT(*) AS c
            FROM {source} WHERE {col} IS NOT NULL GROUP BY 1
        ),
        n AS (SELECT SUM(c) AS n FROM e)
        SELECT item, TRUE AS ok FROM e, n WHERE c * {k + 1} > n
    """


# ---------------------------------------------------------------------------
# grouped Misra-Gries (per-group heavy hitters in one pass)
# ---------------------------------------------------------------------------
#
# Same summary contract as mg_summary, independently PER GROUP: for each
# group g, every key with count > n_g/(k+1) is present, estimates
# under-count by at most the group's err sentinel, err_g <= n_g/(k+1).
# Scale shape: one mapInPandas pass emitting <= (k+1) rows per group per
# partition (state is O(groups-in-partition * k), pruned per Arrow
# batch); the finalize works on that tiny table with a per-group
# window rank — per-language / per-domain top items without a second
# scan of the corpus.


def _norm_by(by) -> list[str]:
    return [by] if isinstance(by, str) else list(by)


def mg_partials_by(df: DataFrame, col: str, by, k: int = 256,
                   weight_col: str | None = None) -> DataFrame:
    """Per-partition grouped Misra-Gries summaries: <= k data rows plus
    one err-sentinel row per group per partition. Group columns are
    cast to string (same convention as the item column); rows with a
    NULL group key are excluded — a NULL key cannot round-trip through
    the finalize's equi-joins in either engine, so exclusion is part of
    the operator contract (mirrored in ``duckdb_mg_heavy_by_sql``)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    by = _norm_by(by)

    import pandas as pd

    glev = list(range(len(by)))  # group levels of the (by..., item) index

    def _prune_by(counts: "pd.Series"):
        """Per group: subtract the (k+1)-th largest count from every
        counter in that group, drop non-positives. Returns (pruned,
        t_per_group) — the per-group subtraction amounts the error
        accounting rides on (each removes >= (k+1)*t_g of that group's
        counter mass)."""
        s = counts.sort_values(ascending=False)
        rank = s.groupby(level=glev).cumcount()
        t = s[rank == k]
        if t.empty:
            return counts, t.droplevel(-1)
        t = t.droplevel(-1)
        tvals = t.reindex(counts.index.droplevel(-1)).fillna(0).to_numpy()
        pruned = counts - tvals.astype("int64")
        return pruned[pruned > 0], t

    def _partial(batches):
        counts = None
        t_tot = None
        for b in batches:
            if weight_col is None:
                sub = b.dropna(subset=["item"])
                vc = sub.groupby(by + ["item"]).size()
            else:
                sub = b.dropna(subset=["item", "w"])
                if (sub["w"] < 0).any():
                    raise ValueError(
                        "mg_summary weights must be non-negative")
                vc = sub.groupby(by + ["item"])["w"].sum()
            counts = vc if counts is None else counts.add(vc, fill_value=0)
            counts, t = _prune_by(counts.astype("int64"))
            t_tot = t if t_tot is None else t_tot.add(t, fill_value=0)
        if counts is None:
            return
        out = counts.reset_index()
        out.columns = by + ["item", "est"]
        out["err"] = 0
        grp = counts.index.droplevel(-1).unique()
        if t_tot is not None and len(t_tot):
            grp = grp.union(t_tot.index.unique())
        sent = pd.Series(0, index=grp, dtype="int64") if t_tot is None \
            else t_tot.reindex(grp).fillna(0).astype("int64")
        sent = sent.reset_index()
        sent.columns = by + ["err"]
        sent["item"] = None
        sent["est"] = 0
        if len(out) or len(sent):
            yield pd.concat([out, sent[by + ["item", "est", "err"]]])

    schema = ", ".join(f"`{c}` string" for c in by) \
        + ", item string, est long, err long"
    sel = [F.col(c).cast("string").alias(c) for c in by]
    sel.append(F.col(col).cast("string").alias("item"))
    if weight_col is not None:
        sel.append(F.col(weight_col).cast("long").alias("w"))
    pred = F.col(col).isNotNull()
    for c in by:
        pred = pred & F.col(c).isNotNull()
    return df.where(pred).select(*sel).mapInPandas(_partial, schema)


def _mg_finalize_by(unioned: DataFrame, by: list[str],
                    k: int) -> DataFrame:
    """Grouped twin of ``_mg_finalize``: per-group sum, per-group
    (k+1)-th-largest subtraction (window rank over the tiny partial
    table), per-group sentinel."""
    from pyspark.sql import Window

    summed = (
        unioned.where(F.col("item").isNotNull())
        .groupBy(*by, "item").agg(F.sum("est").cast("long").alias("est"))
    )
    errs = unioned.groupBy(*by).agg(
        F.coalesce(F.sum("err"), F.lit(0)).cast("long").alias("_e"))
    w = Window.partitionBy(*by).orderBy(F.desc("est"), "item")
    t_val = (
        summed.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == k + 1)
        .select(*by, F.col("est").alias("_t"))
    )
    kept = (
        summed.join(t_val, by, "left")
        .withColumn("_t", F.coalesce(F.col("_t"), F.lit(0)))
        .where(F.col("est") > F.col("_t"))
        .select(
            *by, "item",
            (F.col("est") - F.col("_t")).cast("long").alias("est"),
            F.lit(0).cast("long").alias("err"),
        )
    )
    sentinel = (
        errs.join(t_val, by, "left")
        .select(
            *by, F.lit(None).cast("string").alias("item"),
            F.lit(0).cast("long").alias("est"),
            (F.col("_e") + F.coalesce(F.col("_t"), F.lit(0)))
            .cast("long").alias("err"),
        )
    )
    return kept.unionByName(sentinel)


def mg_summary_by(df: DataFrame, col: str, by, k: int = 256,
                  weight_col: str | None = None) -> DataFrame:
    """Per-group Misra-Gries frequent-items summary (k counters per
    group): the most common production slicing of the heavy-hitters
    sketch (top users per language, top shingles per domain) in ONE
    pass over the data — schema (by..., item, est, err) with one NULL-
    item err sentinel per group."""
    partials = mg_partials_by(df, col, by, k, weight_col).localCheckpoint(
        eager=True)
    return _mg_finalize_by(partials, _norm_by(by), k)


def mg_merge_by(a: DataFrame, b: DataFrame, by, k: int = 256) -> DataFrame:
    """Merge two grouped summaries built with the same (by, k)."""
    return _mg_finalize_by(a.unionByName(b), _norm_by(by), k)


def mg_bound_check_by(df: DataFrame, col: str, by,
                      k: int = 256) -> DataFrame:
    """(by..., item, ok) per TRUE per-group heavy hitter: present in the
    group's summary with est <= true <= est + err_g and err_g within the
    per-group n_g/(k+1) bound. Oracle: ``duckdb_mg_heavy_by_sql`` —
    the exact per-group heavy set with constant TRUE."""
    by = _norm_by(by)
    sk = mg_summary_by(df, col, by, k)
    pred = F.col(col).isNotNull()
    for c in by:
        pred = pred & F.col(c).isNotNull()
    exact = (
        df.where(pred)
        .select(*[F.col(c).cast("string").alias(c) for c in by],
                F.col(col).cast("string").alias("item"))
        .groupBy(*by, "item").agg(F.count(F.lit(1)).alias("true_cnt"))
    )
    n_df = exact.groupBy(*by).agg(
        F.sum("true_cnt").cast("long").alias("_n"))
    heavy = (
        exact.join(n_df, by)
        .where(F.col("true_cnt") * (k + 1) > F.col("_n"))
    )
    ests = sk.where(F.col("item").isNotNull()).select(*by, "item", "est")
    errs = sk.groupBy(*by).agg(
        F.coalesce(F.sum("err"), F.lit(0)).cast("long").alias("_err"))
    return (
        heavy.join(F.broadcast(ests), by + ["item"], "left")
        .join(F.broadcast(errs), by, "left")
        .select(
            *by, "item",
            (
                F.col("est").isNotNull()
                & (F.col("est") <= F.col("true_cnt"))
                & (F.col("true_cnt") <= F.col("est") + F.col("_err"))
                & (F.col("_err") * (k + 1) <= F.col("_n"))
            ).alias("ok"),
        )
    )


def duckdb_mg_heavy_by_sql(col: str, by, k: int, source: str) -> str:
    """Oracle twin of ``mg_bound_check_by``: the exact per-group heavy
    set with constant TRUE."""
    by = _norm_by(by)
    bys = ", ".join(f"CAST({c} AS VARCHAR) AS {c}" for c in by)
    bnames = ", ".join(by)
    notnull = " AND ".join([f"{col} IS NOT NULL"]
                           + [f"{c} IS NOT NULL" for c in by])
    return f"""
        WITH e AS (
            SELECT {bys}, CAST({col} AS VARCHAR) AS item,
                   COUNT(*) AS c
            FROM {source} WHERE {notnull} GROUP BY ALL
        ),
        n AS (SELECT {bnames}, SUM(c) AS n FROM e GROUP BY ALL)
        SELECT e.{', e.'.join(by)}, e.item, TRUE AS ok
        FROM e JOIN n USING ({bnames}) WHERE e.c * {k + 1} > n.n
    """


# ===========================================================================
# checkpointing (lineage-carrying sketch tables)
# ===========================================================================

_MANIFEST = "_versions.json"


def checkpoint_sketch(df: DataFrame, path: str, kind: str,
                      snapshot: bool = False) -> int:
    """Write a sketch table (registers/counters/bits/sample) as parquet
    with lineage columns (sketch kind, build timestamp, code version) —
    the same resumability contract the CQF shard table has: a downstream
    job reads the checkpoint instead of rebuilding, and stale mixes are
    detectable by build_ts.

    ``snapshot=True`` versions the checkpoint instead of overwriting:
    each call writes ``path/v=<n>`` and appends to an atomically-swapped
    manifest, giving parquet checkpoints the time-travel-over-build-
    lineage property an Iceberg deployment gets natively (sources.py) —
    ``read_sketch(..., version=...)`` reads any retained snapshot.
    Returns the version written (0 for a plain overwrite)."""
    import os
    import time as _time

    from . import __version__
    from .sources import write_checkpoint

    stamped = (
        df.withColumn("sketch_kind", F.lit(kind))
        .withColumn("build_ts", F.lit(_time.time()))
        .withColumn("code_version", F.lit(__version__))
    )
    if not snapshot:
        write_checkpoint(stamped, path)
        return 0
    import json as _json

    versions = sketch_versions(path)
    v = (max(e["version"] for e in versions) + 1) if versions else 1
    stamped.write.mode("overwrite").parquet(os.path.join(path, f"v={v}"))
    versions.append({"version": v, "kind": kind,
                     "build_ts": _time.time(),
                     "code_version": __version__})
    tmp = os.path.join(path, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        _json.dump(versions, f)
    os.replace(tmp, os.path.join(path, _MANIFEST))
    return v


def sketch_versions(path: str) -> list[dict]:
    """The snapshot manifest (empty for unversioned checkpoints)."""
    import json as _json
    import os

    p = os.path.join(path, _MANIFEST)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return _json.load(f)


def read_sketch(spark, path: str, version: int | None = None) -> DataFrame:
    """Read a sketch checkpoint; for snapshot checkpoints, the latest
    version by default or any retained ``version`` (time travel)."""
    import os

    from .sources import read_table

    versions = sketch_versions(path)
    if versions:
        v = version if version is not None else \
            max(e["version"] for e in versions)
        if v not in {e["version"] for e in versions}:
            raise ValueError(
                f"no snapshot v={v} at {path}; have "
                f"{sorted(e['version'] for e in versions)}")
        path = os.path.join(path, f"v={v}")
    elif version is not None:
        raise ValueError(f"{path} is not a snapshot checkpoint")
    return read_table(spark, path).drop(
        "sketch_kind", "build_ts", "code_version")


# ===========================================================================
# KMV / theta-style set operations (bottom-k of distinct-key hashes)
# ===========================================================================

#: 2^HASH_BITS as an exact double literal shared by both engines
_KMV_RANGE = float(1 << HASH_BITS)


def kmv_sketch(df: DataFrame, col: str, k: int = 256,
               hash_scheme: str = "hash60") -> DataFrame:
    """(h) rows: the k smallest 60-bit hashes of the DISTINCT keys —
    the KMV / theta sketch (Bar-Yossef et al. 2002; the estimator
    behind the theta-sketch family). Executes as distinct + TakeOrdered
    (per-partition top-k, k-sized driver merge, no full sort).

    Merge = bottom-k of the union of sketches — exact, so merge ==
    rebuild row-identically like the other SQL-expressible sketches."""
    h = sketch_hash(col, hash_scheme)
    return (
        df.where(F.col(col).isNotNull())
        .select(F.expr(h).alias("h")).distinct()
        .orderBy("h").limit(k)
    )


def kmv_merge(a: DataFrame, b: DataFrame, k: int = 256) -> DataFrame:
    return a.unionByName(b).distinct().orderBy("h").limit(k)


def _kmv_est(sketch: DataFrame, k: int, out: str) -> DataFrame:
    """One row (<out>): (k-1)/h_k scaled to the hash range, or the
    exact distinct count when the sketch holds fewer than k hashes."""
    return sketch.agg(
        F.count(F.lit(1)).alias("_n"), F.max("h").alias("_hk")
    ).select(
        F.round(
            F.when(F.col("_n") < k, F.col("_n").cast("double"))
            .otherwise(F.lit(float(k - 1)) * F.lit(_KMV_RANGE)
                       / F.col("_hk")),
            1,
        ).alias(out)
    )


#: registry of KMV set-ops sketch materializations. Strong references
#: on purpose (a persist lives in the JVM CacheManager until an
#: explicit unpersist; GC of the Python wrapper does NOT free it).
#: BOUNDED: past ``_SKETCH_CACHE_CAP`` entries the oldest is
#: auto-unpersisted (FIFO), so a long-lived session unaware of
#: ``release_sketch_caches()`` cannot accumulate blocks without bound
#: — the same contract as dedup's pair-cache registry. Eviction is
#: SAFE here because KMV sketches are deterministic (hash-derived
#: bottom-k): an evicted cache recomputes from lineage to the
#: identical rows, it just pays the sketch pass again. (Misra-Gries
#: partials deliberately do NOT use this registry: their result
#: depends on the physical run, so they localCheckpoint — est/err
#: must come from the SAME run.) Raise the cap for batch callers
#: holding many concurrent set-ops results.
_SKETCH_CACHES: list = []
_SKETCH_CACHE_CAP = 24


def _materialize_sketch(df: DataFrame) -> DataFrame:
    """Eagerly persist + materialize a tiny sketch table and track it
    in the bounded FIFO registry. 3 entries per kmv_set_ops[_by] call,
    so the default cap keeps the last ~8 calls warm."""
    df = df.persist()
    df.count()
    _SKETCH_CACHES.append(df)
    while len(_SKETCH_CACHES) > _SKETCH_CACHE_CAP:
        old = _SKETCH_CACHES.pop(0)
        try:
            old.unpersist(blocking=False)
        except Exception:
            pass
    return df


def release_sketch_caches() -> int:
    """Unpersist every KMV set-ops sketch cache created since the last
    release — deterministic lifetime for long-lived sessions. Always
    safe: an unpersisted sketch recomputes from lineage to identical
    rows. Returns the number of caches released."""
    n = 0
    for df in _SKETCH_CACHES:
        try:
            df.unpersist(blocking=False)
            n += 1
        except Exception:
            pass
    _SKETCH_CACHES.clear()
    return n


def kmv_set_ops(a_df: DataFrame, b_df: DataFrame, col: str,
                k: int = 256, hash_scheme: str = "hash60") -> DataFrame:
    """One row (est_a, est_b, est_union, jaccard, est_intersection,
    est_a_minus_b, est_b_minus_a): KMV distinct counts plus
    theta-sketch-style set algebra — the Jaccard is estimated DIRECTLY
    (fraction of the union's k smallest hashes present in both input
    sketches), so the intersection estimate degrades with the true
    Jaccard rather than with the union size (the weakness of HLL
    inclusion-exclusion, ``hll_set_ops``); the set DIFFERENCES use the
    same device (fraction of the union sample in exactly one side —
    the theta-sketch A-not-B estimator). All seven values
    deterministic; DuckDB reproduces them bit-for-bit."""
    # materialize each k-row sketch once: every sketch feeds 3-4 plan
    # subtrees (estimate, merge, semi-joins) and must not re-run its
    # full-data distinct + top-k per consumer. Registry-tracked eager
    # persists (not localCheckpoints): bounded lifetime, and eviction
    # recomputes deterministically from lineage instead of killing the
    # plan
    sa = _materialize_sketch(kmv_sketch(a_df, col, k, hash_scheme))
    sb = _materialize_sketch(kmv_sketch(b_df, col, k, hash_scheme))
    # membership flags + ONE aggregate over the union sample replace the
    # old four separate semi/anti-join branches (match / a_only / b_only
    # / msize were four jobs over the same k rows) — and `merged` now
    # has a single consumer, so its eager materialization goes too
    merged = kmv_merge(sa, sb, k)
    flags = (
        merged
        .join(sa.withColumn("_ina", F.lit(1)), "h", "left")
        .join(sb.withColumn("_inb", F.lit(1)), "h", "left")
    )
    ina = F.col("_ina").isNotNull()
    inb = F.col("_inb").isNotNull()
    stats = flags.agg(
        F.count(F.lit(1)).alias("_ms"),
        F.max("h").alias("_hk"),
        F.coalesce(F.sum((ina & inb).cast("long")), F.lit(0)).alias("_m"),
        F.coalesce(F.sum((ina & ~inb).cast("long")), F.lit(0)).alias("_ao"),
        F.coalesce(F.sum((~ina & inb).cast("long")), F.lit(0)).alias("_bo"),
    ).withColumn(
        "est_union",
        F.round(
            F.when(F.col("_ms") < k, F.col("_ms").cast("double"))
            .otherwise(F.lit(float(k - 1)) * F.lit(_KMV_RANGE)
                       / F.col("_hk")),
            1,
        ),
    )

    def _frac_est(cnt: str, out: str):
        return F.round(
            F.round(F.col(cnt) / F.col("_ms"), 6) * F.col("est_union"), 1
        ).alias(out)

    return (
        _kmv_est(sa, k, "est_a")
        .crossJoin(_kmv_est(sb, k, "est_b"))
        .crossJoin(stats)
        .select(
            "est_a", "est_b", "est_union",
            F.round(F.col("_m") / F.col("_ms"), 6).alias("jaccard"),
            _frac_est("_m", "est_intersection"),
            _frac_est("_ao", "est_a_minus_b"),
            _frac_est("_bo", "est_b_minus_a"),
        )
    )


def duckdb_kmv_set_ops_sql(col: str, k: int, source_a: str,
                           source_b: str) -> str:
    """Oracle twin of ``kmv_set_ops``."""
    h = duckdb_hash60(col)
    rng = repr(_KMV_RANGE)

    def est(cte: str, out: str) -> str:
        return f"""(
            SELECT round(CASE WHEN COUNT(*) < {k}
                         THEN CAST(COUNT(*) AS DOUBLE)
                         ELSE {float(k - 1)!r} * {rng} / MAX(h) END, 1)
                       AS {out}
            FROM {cte})"""

    return f"""
        WITH sa AS (
            SELECT DISTINCT {h} AS h FROM {source_a}
            WHERE {col} IS NOT NULL ORDER BY h LIMIT {k}
        ),
        sb AS (
            SELECT DISTINCT {h} AS h FROM {source_b}
            WHERE {col} IS NOT NULL ORDER BY h LIMIT {k}
        ),
        merged AS (
            SELECT h FROM (SELECT h FROM sa UNION SELECT h FROM sb)
            ORDER BY h LIMIT {k}
        ),
        mstats AS (
            SELECT COUNT(*) AS ms,
                   SUM(CASE WHEN h IN (SELECT h FROM sa)
                            AND h IN (SELECT h FROM sb)
                       THEN 1 ELSE 0 END) AS m,
                   SUM(CASE WHEN h IN (SELECT h FROM sa)
                            AND h NOT IN (SELECT h FROM sb)
                       THEN 1 ELSE 0 END) AS ao,
                   SUM(CASE WHEN h IN (SELECT h FROM sb)
                            AND h NOT IN (SELECT h FROM sa)
                       THEN 1 ELSE 0 END) AS bo
            FROM merged
        )
        SELECT ea.est_a, eb.est_b, eu.est_union,
               round(m / CAST(ms AS DOUBLE), 6) AS jaccard,
               round(round(m / CAST(ms AS DOUBLE), 6) * eu.est_union, 1)
                   AS est_intersection,
               round(round(ao / CAST(ms AS DOUBLE), 6) * eu.est_union, 1)
                   AS est_a_minus_b,
               round(round(bo / CAST(ms AS DOUBLE), 6) * eu.est_union, 1)
                   AS est_b_minus_a
        FROM {est('sa', 'est_a')} ea,
             {est('sb', 'est_b')} eb,
             {est('merged', 'est_union')} eu,
             mstats
    """


# ===========================================================================
# grouped bottom-k rollup (per-group samples / quantiles)
# ===========================================================================

def bottomk_sketch_by(df: DataFrame, key_col: str, value_col: str,
                      by: list[str], k: int = 512,
                      hash_scheme: str = "hash60") -> DataFrame:
    """(by..., h, key, value) per-group bottom-k sample: the k
    hash-smallest keys of EVERY ``by`` combination in one pass (window
    row_number per group — one shuffle keyed by the group columns; the
    grouped analogue of ``bottomk_sketch``'s TakeOrdered). Merge:
    union + re-apply (min-k per group, exact)."""
    from pyspark.sql import Window

    if not by:
        raise ValueError("by must name at least one grouping column")
    # total order (h, key, value): same tie rule as bottomk_sketch
    w = Window.partitionBy(*by).orderBy("h", "key", "value")
    return (
        df.where(F.col(key_col).isNotNull())
        .select(
            *by,
            F.expr(sketch_hash(key_col, hash_scheme)).alias("h"),
            F.col(key_col).alias("key"),
            F.col(value_col).alias("value"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def bottomk_merge_by(a: DataFrame, b: DataFrame, by: list[str],
                     k: int = 512) -> DataFrame:
    """Merge grouped bottom-k sketches: union + re-apply the per-group
    min-k (exact, like ``bottomk_merge``)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*by).orderBy("h", "key", "value")
    return (
        a.unionByName(b)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def bottomk_quantiles_by(sketch_df: DataFrame, by: list[str],
                         qs: list[float]) -> DataFrame:
    """(by..., q, est_value) per-group quantile estimates with the same
    explicit lower-interpolation rank arithmetic as
    ``bottomk_quantiles``."""
    qlit = ", ".join(f"CAST({float(q)!r} AS DOUBLE)" for q in qs)
    return (
        sketch_df.groupBy(*by)
        .agg(F.expr("sort_array(collect_list(CAST(value AS DOUBLE)))")
             .alias("vals"))
        .select(*by, F.explode(F.expr(f"array({qlit})")).alias("q"),
                "vals")
        .select(
            *by, "q",
            F.expr("vals[CAST(floor(q * (size(vals) - 1)) AS INT)]")
            .alias("est_value"),
        )
    )


def duckdb_bottomk_quantiles_by_sql(key_col: str, value_col: str,
                                    by: list[str], k: int,
                                    qs: list[float], source: str) -> str:
    h = duckdb_hash60(key_col)
    bys = ", ".join(by)
    qlit = ", ".join(f"CAST({float(q)!r} AS DOUBLE)" for q in qs)
    return f"""
        WITH ranked AS (
            SELECT {bys}, {h} AS h, {key_col} AS key,
                   CAST({value_col} AS DOUBLE) AS value,
                   row_number() OVER (PARTITION BY {bys}
                                      ORDER BY {h}, {key_col},
                                               CAST({value_col} AS DOUBLE))
                       AS rn
            FROM {source} WHERE {key_col} IS NOT NULL
        ),
        sk AS (SELECT * FROM ranked WHERE rn <= {k}),
        vals AS (
            SELECT {bys}, list_sort(list(value)) AS vals
            FROM sk GROUP BY {bys}
        )
        SELECT {bys}, q,
               vals[CAST(floor(q * (len(vals) - 1)) AS INT) + 1]
                   AS est_value
        FROM vals, unnest([{qlit}]) AS t(q)
    """


# ===========================================================================
# grouped KMV set operations (per-group Jaccard / intersection / A-not-B)
# ===========================================================================

def kmv_sketch_by(df: DataFrame, col: str, by, k: int = 256,
                  hash_scheme: str = "hash60") -> DataFrame:
    """(by..., h) per-group KMV sketch: the k smallest 60-bit hashes of
    each group's DISTINCT keys in one pass (distinct + window rank per
    group — one shuffle keyed by the group columns). Group columns cast
    to string, NULL group keys excluded (grouped-sketch contract).
    Merge: ``kmv_merge_by`` — per-group bottom-k of the union, exact."""
    from pyspark.sql import Window

    by = _norm_by(by)
    if not by:
        raise ValueError("by must name at least one grouping column")
    h = sketch_hash(col, hash_scheme)
    pred = F.col(col).isNotNull()
    for c in by:
        pred = pred & F.col(c).isNotNull()
    w = Window.partitionBy(*by).orderBy("h")
    return (
        df.where(pred)
        .select(*[F.col(c).cast("string").alias(c) for c in by],
                F.expr(h).alias("h"))
        .distinct()
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_merge_by(a: DataFrame, b: DataFrame, by, k: int = 256) -> DataFrame:
    """Merge grouped KMV sketches built with the same (by, k): per-group
    bottom-k of the distinct union — exact (merge == rebuild)."""
    from pyspark.sql import Window

    by = _norm_by(by)
    w = Window.partitionBy(*by).orderBy("h")
    return (
        a.unionByName(b).distinct()
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def _kmv_est_by(sketch: DataFrame, by: list[str], k: int,
                out: str) -> DataFrame:
    """(by..., <out>): per-group (k-1)/h_k estimate, exact count when
    the group's sketch holds fewer than k hashes."""
    return (
        sketch.groupBy(*by)
        .agg(F.count(F.lit(1)).alias("_n"), F.max("h").alias("_hk"))
        .select(
            *by,
            F.round(
                F.when(F.col("_n") < k, F.col("_n").cast("double"))
                .otherwise(F.lit(float(k - 1)) * F.lit(_KMV_RANGE)
                           / F.col("_hk")),
                1,
            ).alias(out),
        )
    )


def kmv_set_ops_by(a_df: DataFrame, b_df: DataFrame, col: str, by,
                   k: int = 256,
                   hash_scheme: str = "hash60") -> DataFrame:
    """Per-group theta-sketch set algebra: one row per group present in
    EITHER side with (by..., est_a, est_b, est_union, jaccard,
    est_intersection, est_a_minus_b, est_b_minus_a) — the per-language
    crawl-overlap-between-snapshots query in one pass per side. Same
    estimators as ``kmv_set_ops`` (union-sample Jaccard and A-not-B;
    the intersection error degrades with the true Jaccard, not the
    union size), computed per group; a group absent from one side
    reports that side's estimate as 0. Deterministic — DuckDB
    reproduces every value bit-for-bit (``duckdb_kmv_set_ops_by_sql``).

    Scale shape: each grouped sketch is one shuffle of (group, h)
    DISTINCT pairs; the set algebra then runs entirely on the tiny
    (groups * k)-row sketch tables (ids-only joins keyed by
    (group, h))."""
    by = _norm_by(by)
    # materialize each (groups * k)-row sketch once: each feeds 3-4
    # plan subtrees and must not re-run its distinct + rank per
    # consumer. Registry-tracked eager persists — bounded lifetime,
    # eviction recomputes deterministically from lineage
    sa = _materialize_sketch(kmv_sketch_by(a_df, col, by, k, hash_scheme))
    sb = _materialize_sketch(kmv_sketch_by(b_df, col, by, k, hash_scheme))
    # membership flags + ONE grouped aggregate over the union sample
    # replace the old four semi/anti-join branches (match / a_only /
    # b_only / msize) and the separate est_union aggregate; `merged`
    # then has one consumer, so its eager materialization goes too
    merged = kmv_merge_by(sa, sb, by, k)
    key = by + ["h"]
    flags = (
        merged
        .join(sa.withColumn("_ina", F.lit(1)), key, "left")
        .join(sb.withColumn("_inb", F.lit(1)), key, "left")
    )
    ina = F.col("_ina").isNotNull()
    inb = F.col("_inb").isNotNull()
    stats = flags.groupBy(*by).agg(
        F.count(F.lit(1)).alias("_ms"),
        F.max("h").alias("_hk"),
        F.coalesce(F.sum((ina & inb).cast("long")), F.lit(0)).alias("_m"),
        F.coalesce(F.sum((ina & ~inb).cast("long")), F.lit(0)).alias("_ao"),
        F.coalesce(F.sum((~ina & inb).cast("long")), F.lit(0)).alias("_bo"),
    ).withColumn(
        "est_union",
        F.round(
            F.when(F.col("_ms") < k, F.col("_ms").cast("double"))
            .otherwise(F.lit(float(k - 1)) * F.lit(_KMV_RANGE)
                       / F.col("_hk")),
            1,
        ),
    )

    def _frac_est(cnt: str, out: str):
        return F.round(
            F.round(F.coalesce(F.col(cnt), F.lit(0)) / F.col("_ms"), 6)
            * F.col("est_union"), 1
        ).alias(out)

    return (
        stats
        .join(_kmv_est_by(sa, by, k, "est_a"), by, "left")
        .join(_kmv_est_by(sb, by, k, "est_b"), by, "left")
        .select(
            *by,
            F.coalesce(F.col("est_a"), F.lit(0.0)).alias("est_a"),
            F.coalesce(F.col("est_b"), F.lit(0.0)).alias("est_b"),
            "est_union",
            F.round(F.coalesce(F.col("_m"), F.lit(0)) / F.col("_ms"), 6)
            .alias("jaccard"),
            _frac_est("_m", "est_intersection"),
            _frac_est("_ao", "est_a_minus_b"),
            _frac_est("_bo", "est_b_minus_a"),
        )
    )


def duckdb_kmv_set_ops_by_sql(col: str, by, k: int, source_a: str,
                              source_b: str) -> str:
    """Oracle twin of ``kmv_set_ops_by``."""
    by = _norm_by(by)
    h = duckdb_hash60(col)
    rng = repr(_KMV_RANGE)
    bys_cast = ", ".join(f"CAST({c} AS VARCHAR) AS {c}" for c in by)
    bnames = ", ".join(by)
    notnull = " AND ".join([f"{col} IS NOT NULL"]
                           + [f"{c} IS NOT NULL" for c in by])

    def sk(src: str, name: str) -> str:
        return f"""{name} AS (
            SELECT {bnames}, h FROM (
                SELECT {bnames}, h,
                       row_number() OVER (PARTITION BY {bnames}
                                          ORDER BY h) AS rn
                FROM (SELECT DISTINCT {bys_cast}, {h} AS h
                      FROM {src} WHERE {notnull})
            ) WHERE rn <= {k}
        )"""

    def est(cte: str, name: str, out: str) -> str:
        return f"""{name} AS (
            SELECT {bnames},
                   round(CASE WHEN COUNT(*) < {k}
                         THEN CAST(COUNT(*) AS DOUBLE)
                         ELSE {float(k - 1)!r} * {rng} / MAX(h) END, 1)
                       AS {out}
            FROM {cte} GROUP BY {bnames}
        )"""

    def frac(cnt: str, out: str) -> str:
        return (f"round(round(COALESCE({cnt}, 0) / CAST(ms AS DOUBLE), 6)"
                f" * eu.est_union, 1) AS {out}")

    on = " AND ".join(f"x.{c} = m.{c}" for c in by)
    return f"""
        WITH {sk(source_a, 'sa')},
        {sk(source_b, 'sb')},
        merged AS (
            SELECT {bnames}, h FROM (
                SELECT {bnames}, h,
                       row_number() OVER (PARTITION BY {bnames}
                                          ORDER BY h) AS rn
                FROM (SELECT {bnames}, h FROM sa
                      UNION SELECT {bnames}, h FROM sb)
            ) WHERE rn <= {k}
        ),
        {est('sa', 'ea', 'est_a')},
        {est('sb', 'eb', 'est_b')},
        {est('merged', 'eu', 'est_union')},
        mstats AS (
            SELECT m.{', m.'.join(by)}, COUNT(*) AS ms,
                   SUM(CASE WHEN EXISTS (SELECT 1 FROM sa x
                                         WHERE {on} AND x.h = m.h)
                            AND EXISTS (SELECT 1 FROM sb x
                                        WHERE {on} AND x.h = m.h)
                       THEN 1 ELSE 0 END) AS mm,
                   SUM(CASE WHEN EXISTS (SELECT 1 FROM sa x
                                         WHERE {on} AND x.h = m.h)
                            AND NOT EXISTS (SELECT 1 FROM sb x
                                            WHERE {on} AND x.h = m.h)
                       THEN 1 ELSE 0 END) AS ao,
                   SUM(CASE WHEN EXISTS (SELECT 1 FROM sb x
                                         WHERE {on} AND x.h = m.h)
                            AND NOT EXISTS (SELECT 1 FROM sa x
                                            WHERE {on} AND x.h = m.h)
                       THEN 1 ELSE 0 END) AS bo
            FROM merged m GROUP BY ALL
        )
        SELECT mst.{', mst.'.join(by)},
               COALESCE(ea.est_a, 0.0) AS est_a,
               COALESCE(eb.est_b, 0.0) AS est_b,
               eu.est_union,
               round(COALESCE(mm, 0) / CAST(ms AS DOUBLE), 6) AS jaccard,
               {frac('mm', 'est_intersection')},
               {frac('ao', 'est_a_minus_b')},
               {frac('bo', 'est_b_minus_a')}
        FROM mstats mst
        JOIN eu USING ({bnames})
        LEFT JOIN ea USING ({bnames})
        LEFT JOIN eb USING ({bnames})
    """


# ===========================================================================
# deterministic rate sampling (uniform + stratified-by-group)
# ===========================================================================

def rate_sample(df: DataFrame, key_col: str, rate: float,
                hash_scheme: str = "hash60") -> DataFrame:
    """Keep rows whose key's deterministic uniform u(key) =
    hash60(key)/2^60 falls below ``rate`` — a consistent uniform
    sample: stable across runs/hosts, NESTED (the rate-p sample is a
    subset of every rate-p' >= p sample — the property that lets a
    pipeline dial a corpus down without resampling churn), and exactly
    reproducible in DuckDB. Pure codegen filter: pushes to the scan,
    no shuffle, no RNG. All columns pass through; NULL keys excluded."""
    if not (0.0 <= rate <= 1.0):
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    h = sketch_hash(key_col, hash_scheme)
    cut = int(rate * (1 << HASH_BITS))
    return df.where(F.col(key_col).isNotNull() & (F.expr(h) < F.lit(cut)))


def rate_sample_by(df: DataFrame, key_col: str, by, rates,
                   default_rate: float = 0.0,
                   hash_scheme: str = "hash60") -> DataFrame:
    """Stratified deterministic sampling: per-group keep rates — the
    corpus-rebalancing op (downsample dominant languages, keep the
    tail whole). ``rates`` maps a group value (single ``by`` column)
    or a chr(31)-joined group-value string (multi-column ``by``) to a
    rate; unlisted groups get ``default_rate``. The same consistent-
    hash u(key) serves every group, so per-group samples stay nested
    under rate changes. NULL group keys excluded.

    Two physical shapes, same semantics:
    * dict ``rates`` — pure codegen (CASE over the group columns +
      one hash compare); right for the usual dozens of strata.
    * DataFrame ``rates`` (columns: the ``by`` columns as strings +
      ``rate`` double) — broadcast join + hash compare; predicate
      size constant however many strata (thousands of domains), and
      the rate table can itself be computed in-pipeline (e.g. target
      counts / observed counts)."""
    by = _norm_by(by)
    if not by:
        raise ValueError("by must name at least one grouping column")
    if not (0.0 <= default_rate <= 1.0):
        raise ValueError(f"rate must be in [0, 1], got {default_rate}")
    if isinstance(rates, DataFrame):
        if "rate" not in rates.columns:
            raise ValueError("rates DataFrame needs a 'rate' column")
        h = sketch_hash(key_col, hash_scheme)
        pred = F.col(key_col).isNotNull()
        for c in by:
            pred = pred & F.col(c).isNotNull()
        # collision-proof temp names: the caller's frame may already
        # carry columns named _cut/_rate
        cutc, ratec = "_cut", "_rate"
        while cutc in df.columns or ratec in df.columns:
            cutc, ratec = "_" + cutc, "_" + ratec
        # rate values are DATA here (not validated at call time like
        # the dict path's): clamp into [0, 1] so an out-of-range row
        # degrades to keep-none/keep-all instead of corrupting the
        # hash compare; dedupe on the group key (max rate wins — a
        # deterministic reduction; a plain dropDuplicates would pick
        # an arbitrary survivor and duplicate group rows in the rates
        # table would otherwise duplicate DATA rows through the join)
        rt = (rates.select(
                  *[F.col(c).cast("string").alias(c) for c in by],
                  F.least(F.greatest(F.col("rate").cast("double"),
                                     F.lit(0.0)),
                          F.lit(1.0)).alias(ratec))
              .groupBy(*by).agg(F.max(ratec).alias(ratec)))
        joined = (
            df.where(pred)
            .withColumn(cutc, F.expr(h))
            .join(F.broadcast(rt), by, "left")
            .withColumn(ratec, F.coalesce(
                F.col(ratec), F.lit(float(default_rate))))
        )
        out = joined.where(
            F.col(cutc) < (F.col(ratec)
                           * F.lit(float(1 << HASH_BITS)))
            .cast("bigint")).drop(cutc, ratec)
        return out
    for r in list(rates.values()) + [default_rate]:
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate must be in [0, 1], got {r}")
    h = sketch_hash(key_col, hash_scheme)

    def esc(v) -> str:
        return "'" + str(v).replace("'", "''") + "'"

    key_expr = (f"CAST({by[0]} AS STRING)" if len(by) == 1 else
                "concat_ws(chr(31), " +
                ", ".join(f"CAST({c} AS STRING)" for c in by) + ")")
    whens = " ".join(
        f"WHEN {esc(g)} THEN CAST({int(r * (1 << HASH_BITS))} AS BIGINT)"
        for g, r in sorted(rates.items(), key=lambda kv: str(kv[0])))
    cut = (f"CASE {key_expr} {whens} ELSE "
           f"CAST({int(default_rate * (1 << HASH_BITS))} AS BIGINT) END")
    pred = F.col(key_col).isNotNull()
    for c in by:
        pred = pred & F.col(c).isNotNull()
    return df.where(pred & (F.expr(h) < F.expr(cut)))


def duckdb_rate_sample_by_sql(key_col: str, by, rates: dict,
                              default_rate: float, source: str,
                              select: str = "*") -> str:
    """Oracle twin of ``rate_sample_by`` (single-column ``by``)."""
    from .textops import duckdb_hash60

    by = _norm_by(by)
    h = duckdb_hash60(key_col)
    whens = " ".join(
        f"WHEN '{g}' THEN CAST({int(r * (1 << HASH_BITS))} AS BIGINT)"
        for g, r in sorted(rates.items(), key=lambda kv: str(kv[0])))
    cut = (f"CASE CAST({by[0]} AS VARCHAR) {whens} ELSE "
           f"CAST({int(default_rate * (1 << HASH_BITS))} AS BIGINT) END")
    notnull = " AND ".join([f"{key_col} IS NOT NULL"]
                           + [f"{c} IS NOT NULL" for c in by])
    return (f"SELECT {select} FROM {source} "
            f"WHERE {notnull} AND {h} < {cut}")
