"""Similarity search over an embedding column (array<float>).

* ``cosine_pairs``   — threshold query: all pairs with cosine >= t
                       (oracle-checkable; exact, brute-force block join)
* ``cosine_topk``    — brute-force top-k neighbors per query vector (the
                       exactness baseline)
* ``lsh_cosine_topk``— random-hyperplane LSH-bucketed approximate top-k:
                       the scale path. Candidates come from an equality
                       join on sign-bucket keys, so the shuffle is
                       bounded by bucket size, not n^2.

Determinism: embeddings are float32 in parquet; both engines cast
elementwise to double (exact) and the dot product folds left-to-right in
array order, so Spark ``aggregate(zip_with(...))`` and the DuckDB
``list_dot_product`` agree bit-for-bit. Hyperplanes derive from
md5-based 60-bit hashes (textops.spark_hash60) — no RNG, identical
across engines and runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .textops import duckdb_hash60, spark_hash60


def _dot(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _norm(a: str) -> str:
    return f"sqrt({_dot(a, a)})"


def with_unit_norm(df: DataFrame, col: str = "embedding",
                   out: str = "unit") -> DataFrame:
    """Pre-normalize embeddings so cosine becomes a plain dot product."""
    return df.withColumn(
        out,
        F.expr(
            f"transform({col}, x -> CAST(x AS DOUBLE) / {_norm(col)})"
        ),
    )


def cosine_pairs(df: DataFrame, id_col: str = "vec_id",
                 col: str = "embedding", threshold: float = 0.8) -> DataFrame:
    """All pairs (a < b) with cosine similarity >= threshold; exact.

    Brute force (block-nested join) — the correctness baseline the LSH
    path is judged against. Returns (id_a, id_b, cos) with cos rounded
    to 6 decimals."""
    cos = (
        f"{_dot('a.emb', 'b.emb')} / "
        f"(sqrt({_dot('a.emb', 'a.emb')}) * sqrt({_dot('b.emb', 'b.emb')}))"
    )
    base = df.select(F.col(id_col).alias("id"), F.col(col).alias("emb"))
    return (
        base.alias("a")
        .join(base.alias("b"), F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.expr(f"round({cos}, 6)").alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )


def duckdb_cosine_pairs_sql(id_col: str = "vec_id", col: str = "embedding",
                            threshold: float = 0.8) -> str:
    dot = "list_dot_product(a.emb, b.emb)"
    na = "sqrt(list_dot_product(a.emb, a.emb))"
    nb = "sqrt(list_dot_product(b.emb, b.emb))"
    return f"""
        WITH base AS (
            SELECT {id_col} AS id, {col}::DOUBLE[] AS emb FROM embeddings
        )
        SELECT a.id AS id_a, b.id AS id_b,
               round({dot} / ({na} * {nb}), 6) AS cos
        FROM base a JOIN base b ON a.id < b.id
        WHERE round({dot} / ({na} * {nb}), 6) >= {threshold}
    """


def cosine_topk(df: DataFrame, queries: DataFrame | None = None,
                id_col: str = "vec_id", col: str = "embedding",
                k: int = 10) -> DataFrame:
    """Exact top-k nearest neighbors (cosine) for each query vector
    (defaults to self-join: every vector queries the corpus). Ordering is
    deterministic: (-cos rounded to 6, neighbor id)."""
    from pyspark.sql.window import Window

    base = df.select(F.col(id_col).alias("id"), F.col(col).alias("emb"))
    q = base if queries is None else queries.select(
        F.col(id_col).alias("id"), F.col(col).alias("emb")
    )
    cos = (
        f"{_dot('q.emb', 'c.emb')} / "
        f"(sqrt({_dot('q.emb', 'q.emb')}) * sqrt({_dot('c.emb', 'c.emb')}))"
    )
    scored = (
        q.alias("q")
        .join(base.alias("c"), F.col("q.id") != F.col("c.id"))
        .select(
            F.col("q.id").alias("query_id"),
            F.col("c.id").alias("neighbor_id"),
            F.expr(f"round({cos}, 6)").alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


# scan-free row-count estimate for defaulted LSH plane counts;
# canonical implementation lives with the table utilities
from .sources import approx_row_count  # noqa: E402,F401  (re-export)


def planes_for(n: int, target_bucket: int = 64,
               lo: int = 4, hi: int = 24) -> int:
    """Hyperplane count scaled to corpus size: 2^planes buckets per hash
    table, sized so the expected bucket population stays ~``target_bucket``
    regardless of n. A FIXED plane count (round-1 defect) means bucket
    population grows linearly with the corpus and the candidate join
    quietly degrades toward n^2; recall is then re-bought with ``tables``,
    which multiplies candidates linearly instead."""
    import math

    if n <= 1:
        return lo
    return max(lo, min(hi, math.ceil(math.log2(max(2.0, n / target_bucket)))))


def _hash60_py(s: str) -> int:
    """Python twin of textops.spark_hash60 / duckdb_hash60 for
    CONSTANT inputs: top 60 bits of md5 as an integer."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def lsh_bucket_expr(col: str, planes: int = 8, dim: int = 64,
                    table: int = 0) -> str:
    """Sign-bucket key for hash table ``table``: bit b of the key is the
    sign of the dot product with pseudo-random hyperplane (table, b),
    whose components are deterministic md5-derived values in [-0.5, 0.5):
    plane(t, b, j) = (hash60(t || '_' || b || '_' || j) % 1000) / 1000 - 0.5.

    The plane components depend only on (table, b, j), so they are
    computed HERE, once, and inlined as a literal double array per
    plane — the previous form re-derived every component per row with
    planes x dim md5 calls inside the fold lambdas. ``repr``
    round-trips doubles exactly and the zip_with fold keeps the old
    left-to-right add order, so every bucket key is bit-identical
    (oracle-checked). (A fully-unrolled flat sum expression was ~2x
    worse end to end: 24 x 64 inline terms blow up codegen.)"""
    terms = []
    for b in range(planes):
        arr = ", ".join(
            repr((_hash60_py(f"{table}_{b}_{j}") % 1000) / 1000.0 - 0.5)
            for j in range(dim))
        dot_b = (
            f"aggregate(zip_with({col}, array({arr}), "
            f"(x, p) -> CAST(x AS DOUBLE) * p), CAST(0.0 AS DOUBLE), "
            f"(acc, v) -> acc + v)")
        terms.append(
            f"(CASE WHEN {dot_b} >= 0 THEN CAST({1 << b} AS BIGINT) "
            f"ELSE CAST(0 AS BIGINT) END)")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def lsh_bucketed(df: DataFrame, id_col: str = "vec_id",
                 col: str = "embedding", planes: int = 8, dim: int = 64,
                 tables: int = 4) -> DataFrame:
    """(id, t, bucket) rows: every vector exploded into its sign bucket
    in each of ``tables`` hash tables — the shared candidate substrate
    for lsh_cosine_topk and embedding_near_dup (one definition, so the
    deterministic-oracle constraints hold for both).

    Deliberately carries IDS ONLY: the bucket keys are computed map-side
    from the embedding, but the embedding itself never enters the
    (t, bucket) shuffle — replicating a 10^9 x 64-float column ``tables``
    times through the candidate join would be the dominant shuffle
    payload at scale (round-2 defect). Consumers re-attach embeddings to
    the *surviving candidate pairs* with two equality joins on the id."""
    bucket_arr = "array({})".format(
        ", ".join(
            f"named_struct('t', {t}, 'bucket', {lsh_bucket_expr(col, planes, dim, t)})"
            for t in range(tables)
        )
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(F.expr(bucket_arr)).alias("tb"),
    ).select(
        "id", F.col("tb.t").alias("t"), F.col("tb.bucket").alias("bucket")
    )


def lsh_cosine_topk(df: DataFrame, id_col: str = "vec_id",
                    col: str = "embedding", k: int = 10,
                    planes: int | None = None, dim: int = 64,
                    tables: int = 4,
                    approx_count: int | None = None) -> DataFrame:
    """Approximate top-k: candidates share a sign-bucket in at least one
    of ``tables`` independent hash tables (equality join on (table,
    bucket) — shuffle bounded by bucket population, never n^2), then
    exact cosine + window top-k within candidates. The 10^12-scale ANN
    shape: ``planes=None`` derives the bucket count from the corpus size
    (``planes_for``) so bucket population stays bounded as the corpus
    grows; more tables raise recall at linear candidate cost. Measure
    the recall dial with ``ann_recall_df`` against ``cosine_topk``.

    With ``planes=None`` the corpus size comes from ``approx_count``
    when given, else ``approx_row_count`` — plan statistics / parquet
    footers, no extra scan of the corpus for the common
    parquet-backed case (pre-0.4.0 this was an unconditional
    ``df.count()``, one full driver action per defaulted call)."""
    from pyspark.sql.window import Window

    if planes is None:
        planes = planes_for(approx_count if approx_count is not None
                            else approx_row_count(df))

    # candidate generation over (id, t, bucket) only — embeddings do not
    # ride the bucket shuffle (see lsh_bucketed); they re-attach to the
    # deduped candidate pairs via two id-keyed joins below
    buckets = lsh_bucketed(df, id_col, col, planes, dim, tables)
    cand = (
        buckets.alias("q")
        .join(buckets.alias("c"), ["t", "bucket"])
        .where(F.col("q.id") != F.col("c.id"))
        .select(
            F.col("q.id").alias("query_id"),
            F.col("c.id").alias("neighbor_id"),
        )
        .distinct()
    )
    base = df.select(F.col(id_col).alias("id"), F.col(col).alias("emb"))
    cos = (
        f"{_dot('q_emb', 'c_emb')} / "
        f"(sqrt({_dot('q_emb', 'q_emb')}) * sqrt({_dot('c_emb', 'c_emb')}))"
    )
    scored = (
        cand
        .join(base.select(F.col("id").alias("query_id"),
                          F.col("emb").alias("q_emb")), "query_id")
        .join(base.select(F.col("id").alias("neighbor_id"),
                          F.col("emb").alias("c_emb")), "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.expr(f"round({cos}, 6)").alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def ivf_centroids(df: DataFrame, id_col: str = "vec_id",
                  col: str = "embedding", n_centroids: int = 16) -> DataFrame:
    """Deterministic coarse quantizer for IVF: the ``n_centroids``
    vectors whose id-hash ranks smallest (a hash-ordered bottom-k sample
    — distributed like the data, no k-means iterations, no RNG). Returns
    (cent_id, cent_emb) with cent_id = 0..n-1 in hash order.

    At 10^12 scale this is one TakeOrdered (k rows per partition to the
    driver) — the cheapest seeding that still tracks the data
    distribution; callers needing tighter cells can pass more centroids
    and probe more of them (n_probe)."""
    from pyspark.sql.window import Window

    # hash the id's string rendering: Spark md5 takes BINARY/STRING only,
    # and the string form is what DuckDB's twin hashes too
    h = spark_hash60(f"CAST({id_col} AS STRING)")
    sample = (
        df.select(F.expr(h).alias("h"),
                  F.col(id_col).alias("cid"),
                  F.col(col).alias("cent_emb"))
        .orderBy("h", "cid")
        .limit(n_centroids)
    )
    w = Window.orderBy("h", "cid")
    return sample.select(
        (F.row_number().over(w) - 1).alias("cent_id"), "cent_emb")


def ivf_assign(df: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id", col: str = "embedding",
               n_probe: int = 1) -> DataFrame:
    """(id, cent_id, probe_rank) — each vector's ``n_probe`` nearest
    centroids by cosine (probe_rank 1 = its home cell). The centroid
    table is tiny and broadcast; assignment is map-side (no shuffle of
    the vectors). Ties break on cent_id, so assignment is total and
    deterministic."""
    from pyspark.sql.window import Window

    cos = (
        f"{_dot('emb', 'cent_emb')} / "
        f"(sqrt({_dot('emb', 'emb')}) * sqrt({_dot('cent_emb', 'cent_emb')}))"
    )
    scored = (
        df.select(F.col(id_col).alias("id"), F.col(col).alias("emb"))
        .crossJoin(F.broadcast(centroids))
        .select("id", "cent_id",
                F.expr(f"round({cos}, 6)").alias("_c"))
    )
    w = Window.partitionBy("id").orderBy(
        F.col("_c").desc(), F.col("cent_id").asc())
    return (
        scored.withColumn("probe_rank", F.row_number().over(w))
        .where(F.col("probe_rank") <= n_probe)
        .select("id", "cent_id", "probe_rank")
    )


def ivf_topk(df: DataFrame, id_col: str = "vec_id",
             col: str = "embedding", k: int = 10,
             n_centroids: int = 16, n_probe: int = 2) -> DataFrame:
    """IVF approximate top-k: candidates share one of the query's
    ``n_probe`` nearest cells with the neighbor's HOME cell (probe_rank
    1). The candidate join is an equality join on cent_id — shuffle
    bounded by cell population (~n/n_centroids), the inverted-file
    analog of the LSH bucket join; embeddings re-attach to surviving
    candidate pairs by id, never riding the cell shuffle. Recall dial:
    n_probe (and n_centroids for cell size). Same output contract as
    cosine_topk/lsh_cosine_topk; measure with ann_recall_df."""
    from pyspark.sql.window import Window

    cents = ivf_centroids(df, id_col, col, n_centroids)
    probes = ivf_assign(df, cents, id_col, col, n_probe)
    home = probes.where(F.col("probe_rank") == 1).select(
        F.col("id").alias("neighbor_id"), "cent_id")
    cand = (
        probes.select(F.col("id").alias("query_id"), "cent_id")
        .join(home, "cent_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    base = df.select(F.col(id_col).alias("id"), F.col(col).alias("emb"))
    cos = (
        f"{_dot('q_emb', 'c_emb')} / "
        f"(sqrt({_dot('q_emb', 'q_emb')}) * sqrt({_dot('c_emb', 'c_emb')}))"
    )
    scored = (
        cand
        .join(base.select(F.col("id").alias("query_id"),
                          F.col("emb").alias("q_emb")), "query_id")
        .join(base.select(F.col("id").alias("neighbor_id"),
                          F.col("emb").alias("c_emb")), "neighbor_id")
        .select("query_id", "neighbor_id",
                F.expr(f"round({cos}, 6)").alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def duckdb_ivf_topk_sql(id_col: str = "vec_id", col: str = "embedding",
                        k: int = 10, n_centroids: int = 16,
                        n_probe: int = 2) -> str:
    """DuckDB twin of ``ivf_topk`` — same deterministic centroids (hash-
    ordered bottom-k), same tie-broken assignments, same candidate join
    and ranking; the approximate result is bit-for-bit reproducible."""
    h = duckdb_hash60("CAST(id AS VARCHAR)")
    dot_qc = "list_dot_product(v.emb, c.cent_emb)"
    nv = "sqrt(list_dot_product(v.emb, v.emb))"
    ncc = "sqrt(list_dot_product(c.cent_emb, c.cent_emb))"
    dot = "list_dot_product(q.emb, n.emb)"
    nq = "sqrt(list_dot_product(q.emb, q.emb))"
    nn = "sqrt(list_dot_product(n.emb, n.emb))"
    return f"""
        WITH base AS (
            SELECT {id_col} AS id, {col}::DOUBLE[] AS emb FROM embeddings
        ),
        cents AS (
            SELECT row_number() OVER (ORDER BY {h}, id) - 1 AS cent_id,
                   emb AS cent_emb
            FROM base ORDER BY {h}, id LIMIT {n_centroids}
        ),
        assigned AS (
            SELECT v.id, c.cent_id,
                   row_number() OVER (
                       PARTITION BY v.id
                       ORDER BY round({dot_qc} / ({nv} * {ncc}), 6) DESC,
                                c.cent_id ASC
                   ) AS probe_rank
            FROM base v, cents c
        ),
        probes AS (
            SELECT id, cent_id FROM assigned WHERE probe_rank <= {n_probe}
        ),
        home AS (
            SELECT id AS neighbor_id, cent_id FROM assigned
            WHERE probe_rank = 1
        ),
        cand AS (
            SELECT DISTINCT p.id AS query_id, h.neighbor_id
            FROM probes p JOIN home h USING (cent_id)
            WHERE p.id != h.neighbor_id
        ),
        scored AS (
            SELECT c.query_id, c.neighbor_id,
                   round({dot} / ({nq} * {nn}), 6) AS cos
            FROM cand c
            JOIN base q ON q.id = c.query_id
            JOIN base n ON n.id = c.neighbor_id
        ),
        ranked AS (
            SELECT query_id, neighbor_id, cos,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY cos DESC, neighbor_id ASC
                   ) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, cos, rank FROM ranked
        WHERE rank <= {k}
    """


def ann_recall(exact_topk: DataFrame, approx_topk: DataFrame,
               k: int | None = None) -> dict:
    """Recall metrics of an approximate top-k result against the exact
    one: recall@k (fraction of exact neighbors recovered) and recall@1.
    The quality dial for lsh_cosine_topk: more tables/planes -> higher
    recall at higher candidate cost."""
    e = exact_topk.select("query_id", "neighbor_id", "rank")
    a = approx_topk.select("query_id", "neighbor_id")
    if k is not None:
        e = e.where(F.col("rank") <= k)
    hits = e.join(a, ["query_id", "neighbor_id"]).count()
    total = e.count()
    e1 = e.where("rank = 1")
    hits1 = e1.join(a, ["query_id", "neighbor_id"]).count()
    total1 = e1.count()
    return {
        "recall_at_k": round(hits / total, 4) if total else None,
        "recall_at_1": round(hits1 / total1, 4) if total1 else None,
        "exact_pairs": total,
        "recovered": hits,
    }


def ann_recall_df(exact_topk: DataFrame, approx_topk: DataFrame,
                  k: int | None = None) -> DataFrame:
    """``ann_recall`` as a one-row DataFrame (lazy; oracle-checkable):
    (recall_at_k, recall_at_1, exact_pairs, recovered). Everything is
    deterministic — md5-derived hyperplanes, fixed fold order — so the
    recall VALUE itself is reproducible and gate-checkable, which is what
    makes the approximate operator verified rather than trusted."""
    e = exact_topk.select("query_id", "neighbor_id", "rank")
    if k is not None:
        e = e.where(F.col("rank") <= k)
    a = approx_topk.select("query_id", "neighbor_id").distinct()
    j = e.join(a.withColumn("_hit", F.lit(1)),
               ["query_id", "neighbor_id"], "left").withColumn(
        "hit", F.coalesce(F.col("_hit"), F.lit(0)))
    top1 = F.when(F.col("rank") == 1, F.col("hit"))
    return j.agg(
        F.round(F.sum("hit") / F.count(F.lit(1)), 4).alias("recall_at_k"),
        F.round(F.sum(top1) / F.count(top1), 4).alias("recall_at_1"),
        F.count(F.lit(1)).alias("exact_pairs"),
        F.sum("hit").cast("long").alias("recovered"),
    )


def duckdb_lsh_bucket_expr(col: str, planes: int, dim: int,
                           table) -> str:
    """DuckDB twin of ``lsh_bucket_expr`` — bit-for-bit identical buckets
    (md5-derived plane components; list_dot_product matches Spark's
    left-to-right aggregate/zip_with fold). ``table`` may be an int or a
    SQL column name."""
    h60 = (f"(('0x' || substr(md5({table} || '_' || b || '_' || j), 1, 15))"
           f"::BIGINT)")
    plane = f"(({h60} % 1000) / 1000.0 - 0.5)"
    planes_list = f"list_transform(range(0, {dim}), j -> {plane})"
    dot_b = f"list_dot_product({col}, {planes_list})"
    return (f"list_sum(list_transform(range(0, {planes}), b -> "
            f"CASE WHEN {dot_b} >= 0 THEN (1::BIGINT << b) "
            f"ELSE 0::BIGINT END))")


def duckdb_lsh_cosine_topk_sql(id_col: str = "vec_id",
                               col: str = "embedding", k: int = 10,
                               planes: int = 8, dim: int = 64,
                               tables: int = 4) -> str:
    """DuckDB twin of ``lsh_cosine_topk`` (same buckets, same candidate
    join, same ranking) — the oracle for the approximate path itself."""
    bucket = duckdb_lsh_bucket_expr("emb", planes, dim, "t")
    dot = "list_dot_product(q.emb, c.emb)"
    nq = "sqrt(list_dot_product(q.emb, q.emb))"
    nc = "sqrt(list_dot_product(c.emb, c.emb))"
    return f"""
        WITH base AS (
            SELECT {id_col} AS id, {col}::DOUBLE[] AS emb FROM embeddings
        ),
        bt AS (
            SELECT id, emb, r.t AS t, {bucket} AS bucket
            FROM base, (SELECT unnest(range(0, {tables})) AS t) r
        ),
        scored AS (
            SELECT DISTINCT q.id AS query_id, c.id AS neighbor_id,
                   round({dot} / ({nq} * {nc}), 6) AS cos
            FROM bt q JOIN bt c ON q.t = c.t AND q.bucket = c.bucket
            WHERE q.id != c.id
        ),
        ranked AS (
            SELECT query_id, neighbor_id, cos,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY cos DESC, neighbor_id ASC
                   ) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= {k}
    """


def duckdb_lsh_ann_recall_sql(id_col: str = "vec_id",
                              col: str = "embedding", k: int = 10,
                              planes: int = 8, dim: int = 64,
                              tables: int = 4) -> str:
    """DuckDB twin of ``ann_recall_df(cosine_topk, lsh_cosine_topk)``:
    the recall value of the deterministic LSH path, computed end-to-end
    in SQL. This is the correctness gate for the ANN operator — the
    recall itself is the oracle-checked quantity."""
    exact = duckdb_cosine_topk_sql(id_col, col, k)
    approx = duckdb_lsh_cosine_topk_sql(id_col, col, k, planes, dim, tables)
    return _duckdb_recall_sql(exact, approx)


def duckdb_ivf_ann_recall_sql(id_col: str = "vec_id",
                              col: str = "embedding", k: int = 10,
                              n_centroids: int = 16,
                              n_probe: int = 2) -> str:
    """DuckDB twin of ``ann_recall_df(cosine_topk, ivf_topk)`` — the IVF
    path's recall value as the oracle-checked quantity."""
    exact = duckdb_cosine_topk_sql(id_col, col, k)
    approx = duckdb_ivf_topk_sql(id_col, col, k, n_centroids, n_probe)
    return _duckdb_recall_sql(exact, approx)


def _duckdb_recall_sql(exact: str, approx: str) -> str:
    return f"""
        WITH exact_topk AS ({exact}),
        approx_topk AS ({approx}),
        hits AS (
            SELECT e.rank,
                   CASE WHEN a.query_id IS NOT NULL THEN 1 ELSE 0 END AS hit
            FROM exact_topk e
            LEFT JOIN (SELECT DISTINCT query_id, neighbor_id
                       FROM approx_topk) a
            ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
        )
        SELECT round(sum(hit) / count(*), 4) AS recall_at_k,
               round(sum(CASE WHEN rank = 1 THEN hit END)
                     / count(CASE WHEN rank = 1 THEN 1 END), 4) AS recall_at_1,
               count(*)::BIGINT AS exact_pairs,
               sum(hit)::BIGINT AS recovered
        FROM hits
    """


def duckdb_cosine_topk_sql(id_col: str = "vec_id", col: str = "embedding",
                           k: int = 10) -> str:
    dot = "list_dot_product(q.emb, c.emb)"
    nq = "sqrt(list_dot_product(q.emb, q.emb))"
    nc = "sqrt(list_dot_product(c.emb, c.emb))"
    return f"""
        WITH base AS (
            SELECT {id_col} AS id, {col}::DOUBLE[] AS emb FROM embeddings
        ),
        scored AS (
            SELECT q.id AS query_id, c.id AS neighbor_id,
                   round({dot} / ({nq} * {nc}), 6) AS cos
            FROM base q JOIN base c ON q.id != c.id
        ),
        ranked AS (
            SELECT query_id, neighbor_id, cos,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY cos DESC, neighbor_id ASC
                   ) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= {k}
    """
