"""Round-6 regression tests for the items closed this round:

1. ``TDigest.from_values`` is vectorized (one sort + cumsum + an
   O(compression) centroid-cut loop) — must produce the IDENTICAL
   centroid stream as the generic pair-stream compressor on
   unit-weight pairs (the pre-round-6 path), so every published bound
   carries over unchanged.
2. ``KLLSketch.extend`` takes ndarray input on a C-speed path — must
   match the per-value Python path element-for-element.
3. Grouped t-digest (``tdigest_partials_by`` / ``tdigest_quantiles_by``
   / ``tdigest_build_by`` + merge/compact) — the t-digest twin of the
   grouped-KLL family, same two-stage partial/merge shape, per-group
   rank-error gate.
4. The KMV set-ops sketch-cache registry is BOUNDED (FIFO cap, same
   contract as dedup's pair-cache registry) and evicted caches
   recompute deterministically from lineage.
5. ``_plan_expands_rows`` detects expanding nodes under branch-
   continuation tree prefixes (e.g. a Generate inside a Union leg) —
   the round-5 ADVICE medium.
"""
from __future__ import annotations

import bisect
import math
import random

import numpy as np
import pyspark.sql.functions as F
import pytest

import qfspark.sketches as sketches
from qfspark.sketches import KLLSketch, TDigest


def _rank_err(values_sorted, est, q):
    n = len(values_sorted)
    lo = bisect.bisect_left(values_sorted, est) / n
    hi = bisect.bisect_right(values_sorted, est) / n
    return max(0.0, lo - q, q - hi)


# ---------------------------------------------------------------------------
# 1. vectorized TDigest.from_values == pair-stream compressor
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dist", ["uniform", "normal", "lognormal",
                                  "ties", "sorted"])
@pytest.mark.parametrize("n", [0, 1, 2, 7, 100, 5003, 50000])
def test_tdigest_from_values_matches_pair_compressor(dist, n):
    """The round-6 sorted-unit-array cut loop must reproduce the
    generic pair compressor's centroids exactly (same greedy k-size
    rule, so same cuts; means via cumsum differ only in float
    round-off)."""
    rng = random.Random(1)
    if dist == "uniform":
        vals = [rng.random() for _ in range(n)]
    elif dist == "normal":
        vals = [rng.gauss(0, 1) for _ in range(n)]
    elif dist == "lognormal":
        vals = [math.exp(rng.gauss(0, 2)) for _ in range(n)]
    elif dist == "ties":
        vals = [float(rng.randrange(5)) for _ in range(n)]
    else:
        vals = sorted(rng.random() for _ in range(n))
    fast = TDigest.from_values(np.array(vals, dtype="float64"), 100)
    ref = TDigest(100)
    pairs = sorted((float(v), 1.0) for v in vals)
    if pairs:
        ref._set_compressed(pairs)
    assert len(fast.means) == len(ref.means), (dist, n)
    assert np.allclose(fast.means, ref.means, rtol=1e-9, atol=1e-12)
    assert np.allclose(fast.weights, ref.weights)
    assert fast.total_weight == pytest.approx(n)


def test_tdigest_from_values_accepts_iterables_and_ndarray():
    gen = TDigest.from_values(iter([3.0, 1.0, 2.0]), 50)
    arr = TDigest.from_values(np.array([3.0, 1.0, 2.0]), 50)
    assert gen.means == arr.means and gen.weights == arr.weights


# ---------------------------------------------------------------------------
# 2. KLLSketch.extend ndarray fast path
# ---------------------------------------------------------------------------

def test_kll_extend_ndarray_matches_list_path():
    rng = random.Random(9)
    vals = [rng.gauss(0, 10) for _ in range(20000)]
    a, b = KLLSketch(128), KLLSketch(128)
    # identical chunking so the compaction schedule is identical
    for i in range(0, len(vals), 1000):
        chunk = vals[i:i + 1000]
        a.extend(chunk)
        b.extend(np.array(chunk, dtype="float64"))
    assert a.n == b.n
    assert a.levels == b.levels


# ---------------------------------------------------------------------------
# 3. grouped t-digest
# ---------------------------------------------------------------------------

def _grouped_vals(spark, n=30000):
    return spark.range(n).selectExpr(
        "CASE WHEN pmod(id, 100) = 0 THEN 'tiny' "
        "     WHEN pmod(id, 3) = 0 THEN 'a' "
        "     WHEN pmod(id, 3) = 1 THEN 'b' ELSE 'c' END AS g",
        "CAST(pmod(id * 2654435761, 99991) AS DOUBLE) * "
        "CASE WHEN pmod(id, 3) = 1 THEN 0.001 ELSE 1.0 END AS v",
    ).repartition(8)


def test_tdigest_quantiles_by_rank_error_per_group(spark):
    """Fully distributed per-group estimates stay within the
    merged-path bound (8/compression — the per-group estimate merges
    per-partition partial digests, same constant as
    test_tdigest_merge_preserves_bound)."""
    df = _grouped_vals(spark)
    est = {(r.g, r.q): r.est
           for r in sketches.tdigest_quantiles_by(
               df, "v", ["g"], [0.1, 0.5, 0.9], compression=100).collect()}
    exact = {}
    for r in df.collect():
        exact.setdefault(r.g, []).append(r.v)
    assert len(est) == 4 * 3
    for (g, q), e in est.items():
        assert _rank_err(sorted(exact[g]), e, q) <= 8.0 / 100, (g, q)


def test_tdigest_build_by_objects_match_distributed_bound(spark):
    df = _grouped_vals(spark)
    digs = sketches.tdigest_build_by(df, "v", ["g"], compression=100)
    exact = {}
    for r in df.collect():
        exact.setdefault(r.g, []).append(r.v)
    assert set(digs) == {("a",), ("b",), ("c",), ("tiny",)}
    for (g,), d in digs.items():
        vals = sorted(exact[g])
        assert d.total_weight == pytest.approx(len(vals))
        for q in (0.1, 0.5, 0.9):
            assert _rank_err(vals, d.quantile(q), q) <= 8.0 / 100, (g, q)


def test_tdigest_partials_by_merge_is_union_then_compact(spark):
    """Merging grouped centroid tables is plain union (concat-then-
    compress IS the t-digest merge); per-group compaction bounds the
    rows while staying within the merged bound."""
    df_a = _grouped_vals(spark, 15000)
    df_b = spark.range(15000, 30000).selectExpr(
        "CASE WHEN pmod(id, 3) = 0 THEN 'a' "
        "     WHEN pmod(id, 3) = 1 THEN 'b' ELSE 'c' END AS g",
        "CAST(pmod(id * 48271, 65537) AS DOUBLE) AS v").repartition(4)
    pa = sketches.tdigest_partials_by(df_a, "v", ["g"], 100)
    pb = sketches.tdigest_partials_by(df_b, "v", ["g"], 100)
    merged = sketches.tdigest_merge_partials_by(pa, pb)
    compact = sketches.tdigest_compact_partials_by(merged, ["g"], 100)
    rows = compact.collect()
    per_group: dict = {}
    for r in rows:
        per_group.setdefault(r.g, []).append((r.mean, r.weight))
    exact = {}
    for src in (df_a, df_b):
        for r in src.collect():
            exact.setdefault(r.g, []).append(r.v)
    for g, pairs in per_group.items():
        assert len(pairs) <= 200  # bounded after compaction
        d = TDigest.from_rows(pairs, 100)
        vals = sorted(exact[g])
        assert d.total_weight == pytest.approx(len(vals))
        for q in (0.1, 0.5, 0.9):
            assert _rank_err(vals, d.quantile(q), q) <= 8.0 / 100, (g, q)


def test_tdigest_partials_by_state_is_bounded(spark):
    """<= O(compression) centroid rows per group per partition — the
    partial table is tiny regardless of data size."""
    df = _grouped_vals(spark, 60000)
    rows = sketches.tdigest_partials_by(df, "v", ["g"], 100).collect()
    # 4 groups x 8 partitions x <= ~2*compression centroids
    assert len(rows) <= 4 * 8 * 200


def test_quantile_bound_check_by_tdigest_kind(spark):
    df = _grouped_vals(spark)
    out = sketches.quantile_bound_check_by(
        df, "v", ["g"], [0.1, 0.5, 0.9], kind="tdigest",
        compression=100).collect()
    assert len(out) == 4 * 3
    assert all(r.ok for r in out)


def test_quantile_bound_check_by_unknown_kind_raises(spark):
    df = _grouped_vals(spark, 100)
    with pytest.raises(ValueError, match="unknown sketch kind"):
        sketches.quantile_bound_check_by(df, "v", ["g"], [0.5],
                                         kind="nope")


# ---------------------------------------------------------------------------
# 4. KMV sketch-cache registry
# ---------------------------------------------------------------------------

def test_kmv_sketch_cache_registry_bounded(spark):
    """Each kmv_set_ops call tracks 3 sketch caches; past the FIFO cap
    the oldest are auto-unpersisted, and release_sketch_caches() frees
    the rest. Eviction never changes results (deterministic lineage)."""
    sketches.release_sketch_caches()
    a = spark.range(500).selectExpr("CAST(id AS STRING) AS u")
    b = spark.range(250, 750).selectExpr("CAST(id AS STRING) AS u")
    first = sketches.kmv_set_ops(a, b, "u", k=64).collect()[0]
    calls = sketches._SKETCH_CACHE_CAP // 3 + 2
    for _ in range(calls):
        sketches.kmv_set_ops(a, b, "u", k=64).count()
    assert len(sketches._SKETCH_CACHES) <= sketches._SKETCH_CACHE_CAP
    again = sketches.kmv_set_ops(a, b, "u", k=64).collect()[0]
    assert first == again
    released = sketches.release_sketch_caches()
    assert released > 0
    assert not sketches._SKETCH_CACHES


def test_kmv_set_ops_by_uses_registry(spark):
    sketches.release_sketch_caches()
    a = spark.range(600).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 'en' ELSE 'de' END AS g",
        "CAST(id AS STRING) AS u")
    b = spark.range(300, 900).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 'en' ELSE 'de' END AS g",
        "CAST(id AS STRING) AS u")
    out = sketches.kmv_set_ops_by(a, b, "u", ["g"], k=64)
    assert out.count() == 2
    assert len(sketches._SKETCH_CACHES) == 3
    assert sketches.release_sketch_caches() == 3


# ---------------------------------------------------------------------------
# 5. plan-expansion detector under branch-continuation prefixes
# ---------------------------------------------------------------------------

def test_plan_expansion_detected_inside_union_leg(spark, tmp_path):
    """A Generate nested under a Union leg renders with a ':  +-'
    branch-continuation prefix; the detector must still flag it (the
    round-5 regex only matched one prefix level)."""
    from qfspark.sources import _plan_expands_rows, approx_row_count

    p = str(tmp_path / "u.parquet")
    (spark.range(1000)
     .select("id", F.array(*[F.lit(i) for i in range(8)]).alias("arr"))
     .write.parquet(p))
    df = spark.read.parquet(p)
    plain = df.select("id")
    exploded = df.select(F.explode("arr").alias("id"))
    u = plain.unionByName(exploded)
    assert _plan_expands_rows(u)
    # footer rung must be skipped: 1000 + 8000 rows, not 2x footer
    assert approx_row_count(u) == 9000
