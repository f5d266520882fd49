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


def lsh_bucket_expr(col: str, planes: int = 8, dim: int = 64,
                    table: int = 0) -> str:
    """Sign-bucket key for hash table ``table``: bit b of the key is the
    sign of the dot product with pseudo-random hyperplane (table, b),
    whose components are deterministic md5-derived values in [-0.5, 0.5):
    plane(t, b, j) = (hash60(t || '_' || b || '_' || j) % 1000) / 1000 - 0.5."""
    h60 = spark_hash60(f"concat({table}, '_', b, '_', j)")
    plane = f"(pmod({h60}, 1000) / 1000.0 - 0.5)"
    dot_b = (
        f"aggregate(zip_with({col}, sequence(0, {dim - 1}), "
        f"(x, j) -> CAST(x AS DOUBLE) * {plane}), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    return (
        f"aggregate(transform(sequence(0, {planes - 1}), "
        f"b -> CASE WHEN {dot_b} >= 0 THEN CAST(pow(2, b) AS BIGINT) ELSE CAST(0 AS BIGINT) END), "
        f"CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )


def lsh_cosine_topk(df: DataFrame, id_col: str = "vec_id",
                    col: str = "embedding", k: int = 10,
                    planes: int = 8, dim: int = 64,
                    tables: int = 4) -> DataFrame:
    """Approximate top-k: candidates share a sign-bucket in at least one
    of ``tables`` independent hash tables (equality join on (table,
    bucket) — shuffle bounded by bucket population, never n^2), then
    exact cosine + window top-k within candidates. The 10^12-scale ANN
    shape: 2^planes buckets per table scale with corpus size; more
    tables raise recall at linear candidate cost."""
    from pyspark.sql.window import Window

    bucket_arr = "array({})".format(
        ", ".join(
            f"named_struct('t', {t}, 'bucket', {lsh_bucket_expr(col, planes, dim, t)})"
            for t in range(tables)
        )
    )
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(col).alias("emb"),
        F.explode(F.expr(bucket_arr)).alias("tb"),
    ).select(
        "id", "emb", F.col("tb.t").alias("t"), F.col("tb.bucket").alias("bucket")
    )
    cos = (
        f"{_dot('q.emb', 'c.emb')} / "
        f"(sqrt({_dot('q.emb', 'q.emb')}) * sqrt({_dot('c.emb', 'c.emb')}))"
    )
    scored = (
        base.alias("q")
        .join(base.alias("c"), ["t", "bucket"])
        .where(F.col("q.id") != F.col("c.id"))
        .select(
            F.col("q.id").alias("query_id"),
            F.col("c.id").alias("neighbor_id"),
            F.expr(f"round({cos}, 6)").alias("cos"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


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
