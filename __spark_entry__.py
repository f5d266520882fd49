"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry runs the qfspark pipeline on Spark and has a
DuckDB ``oracle_sql()`` twin producing the same rows. The CQF queries are
oracle-checkable because the filter guarantees zero false negatives and
exact counts (32-bit counters), and at sf<=0.1 scales the false-positive
probability per probe is <= 2^-45 — the exact-SQL answer and the sketch
answer coincide with overwhelming probability.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from qfspark import dedup, multimodal, similarity, textops
from qfspark.build import build_qf
from qfspark.lookup import annotate, filter_unseen
from qfspark.shingle import duckdb_shingle_sql, shingle_expr
from qfspark.sizing import QFConfig
from qfspark.webpages import (
    DUCKDB_WEB_PAGES_SQL,
    duckdb_crawl_sql,
    synthesize,
    synthesize_crawl,
)

_CFG = dict(counter_bits=32, hash_name="xxhash64")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build a CQF over web_pages.url at sf0.001, probe with
    members + absent urls, return membership/count columns."""
    return _q_url_membership(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_web_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    wp = synthesize(spark, sf_dir)
    return wp.select(
        "url", "text", "lang", F.length("text").alias("text_len")
    )


def _q_url_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    wp = synthesize(spark, sf_dir)
    qf = build_qf(wp, "url", config=QFConfig(**_CFG))
    probes = wp.select("url").union(
        wp.select(F.concat(F.col("url"), F.lit("#absent")).alias("url"))
    )
    return annotate(probes, "url", qf, seen_col="seen", count_col="cnt")


def _q_url_count_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counting over a crawl with deterministic re-fetches: urls appear
    1-3 times; the CQF counter must report the exact fetch count."""
    crawl = synthesize_crawl(spark, sf_dir)
    qf = build_qf(crawl, "url", config=QFConfig(**_CFG))
    return annotate(
        crawl.select("url").distinct(), "url", qf,
        seen_col="seen", count_col="cnt",
    )


def _q_user_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("string").alias("user")
    )
    qf = build_qf(ev, "user", config=QFConfig(**_CFG))
    users = ev.distinct()
    probes = users.union(
        users.select(F.concat(F.col("user"), F.lit("-absent")).alias("user"))
    )
    return annotate(probes, "user", qf, seen_col="seen", count_col="cnt")


def _q_shingle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh = doc.select(
        F.explode(F.expr(shingle_expr("text", 3))).alias("shingle")
    )
    qf = build_qf(sh, "shingle", config=QFConfig(**_CFG))
    return annotate(sh.distinct(), "shingle", qf, seen_col="seen", count_col="cnt")


def _q_crawl_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-crawl dedup: a filter built over the odd-source half of
    the crawl; the frontier (all urls + fresh candidates) is filtered to
    urls NOT yet seen. The training-data primitive: drop already-crawled
    pages before fetching/processing."""
    wp = synthesize(spark, sf_dir)
    seen_half = wp.where(F.col("url").like("%src1%") | F.col("url").like("%src3%"))
    qf = build_qf(seen_half, "url", config=QFConfig(**_CFG))
    frontier = wp.select("url").union(
        wp.select(F.concat(F.col("url"), F.lit("?new=1")).alias("url"))
    )
    return filter_unseen(frontier, "url", qf)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # CQF sketch queries (the engine core)
        "web_pages_synth": _q_web_pages,
        "cqf_url_membership": _q_url_membership,
        "cqf_url_count_dup": _q_url_count_dup,
        "cqf_user_count": _q_user_count,
        "cqf_shingle_count": _q_shingle_count,
        "cqf_crawl_frontier": _q_crawl_frontier,
        # training-data pipeline operators
        "text_stats": lambda s, d: textops.text_stats(_docs(s, d)),
        "lang_id": lambda s, d: textops.lang_id(_docs(s, d)),
        "fingerprint": lambda s, d: textops.fingerprint(_docs(s, d)),
        "token_counts": lambda s, d: textops.token_counts(_docs(s, d)),
        "rolling_fingerprint": lambda s, d: textops.rolling_fingerprint(
            _docs(s, d)
        ),
        "exact_dedup": lambda s, d: dedup.exact_dedup(_docs(s, d)),
        # signature returned as a joined string so the array hashes
        # identically regardless of the comparator's list representation
        "minhash_signatures": lambda s, d: dedup.minhash_signatures(
            _docs(s, d), num_hashes=16
        ).select("doc_id", F.array_join("sig", ",").alias("sig")),
        "minhash_lsh_pairs": lambda s, d: dedup.minhash_lsh_pairs(
            _docs(s, d), threshold=0.2
        ),
        "ngram_jaccard": lambda s, d: dedup.ngram_jaccard(_docs(s, d), None).where(
            "jaccard >= 0.05"
        ),
        "simhash": lambda s, d: dedup.simhash(_docs(s, d)),
        "simhash_pairs": lambda s, d: dedup.simhash_pairs(_docs(s, d), max_hamming=2),
        "embedding_near_dup": lambda s, d: dedup.embedding_near_dup(
            _emb(s, d), threshold=0.35
        ),
        # composed cleaning pipeline: quality -> exact dedup -> near-dup
        "clean_corpus": lambda s, d: dedup.clean_corpus(
            _docs(s, d), near_dup_jaccard=0.3
        ),
        "quality_filter": lambda s, d: textops.quality_filter(
            _docs(s, d), min_tokens=30
        ).select("doc_id", "lang", "source"),
        # media feature extraction over synthesized html binaries:
        # Pandas-UDF plumbing with the deterministic stand-in featurizer;
        # projected metadata (id, byte length, kind) is oracle-checked
        "media_features": lambda s, d: multimodal.extract_media_features(
            synthesize(s, d), "url", "html"
        ).select("media_id", "n_bytes", "kind"),
        "cosine_pairs": lambda s, d: similarity.cosine_pairs(
            _emb(s, d), threshold=0.2
        ),
        "cosine_topk": lambda s, d: similarity.cosine_topk(_emb(s, d), k=5),
        # approximate ANN, fully oracle-checked: the hyperplanes are
        # md5-derived and the fold order fixed, so DuckDB reproduces the
        # exact candidate sets (duckdb_lsh_cosine_topk_sql) AND the
        # measured recall value (duckdb_lsh_ann_recall_sql)
        "lsh_cosine_topk": lambda s, d: similarity.lsh_cosine_topk(
            _emb(s, d), k=5, planes=6, tables=4
        ),
        "lsh_ann_recall": lambda s, d: similarity.ann_recall_df(
            similarity.cosine_topk(_emb(s, d), k=5),
            similarity.lsh_cosine_topk(_emb(s, d), k=5, planes=6, tables=4),
            k=5,
        ),
    }


# ---------------------------------------------------------------------------
# oracles (DuckDB SQL over the same parquet views)
# ---------------------------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    wp = DUCKDB_WEB_PAGES_SQL.strip().rstrip(";")
    shingle_list = duckdb_shingle_sql("text", 3)
    return {
        "web_pages_synth": f"""
            SELECT url, text, lang, length(text) AS text_len
            FROM ({wp})
        """,
        "cqf_url_membership": f"""
            WITH wp AS ({wp}),
            probes AS (
                SELECT url FROM wp
                UNION ALL
                SELECT url || '#absent' AS url FROM wp
            ),
            exact AS (SELECT url, COUNT(*) AS n FROM wp GROUP BY url)
            SELECT p.url AS url,
                   (e.n IS NOT NULL) AS seen,
                   COALESCE(e.n, 0) AS cnt
            FROM probes p LEFT JOIN exact e ON p.url = e.url
        """,
        "cqf_url_count_dup": f"""
            WITH crawl AS ({duckdb_crawl_sql()})
            SELECT url, TRUE AS seen, COUNT(*) AS cnt
            FROM crawl GROUP BY url
        """,
        "cqf_crawl_frontier": f"""
            WITH wp AS ({wp}),
            seen AS (
                SELECT url FROM wp
                WHERE url LIKE '%src1%' OR url LIKE '%src3%'
            ),
            frontier AS (
                SELECT url FROM wp
                UNION ALL
                SELECT url || '?new=1' AS url FROM wp
            )
            SELECT f.url FROM frontier f
            WHERE f.url NOT IN (SELECT url FROM seen)
        """,
        "cqf_user_count": """
            WITH ev AS (SELECT CAST(user_id AS VARCHAR) AS "user" FROM events),
            users AS (SELECT DISTINCT "user" FROM ev),
            probes AS (
                SELECT "user" FROM users
                UNION ALL
                SELECT "user" || '-absent' AS "user" FROM users
            ),
            exact AS (SELECT "user", COUNT(*) AS n FROM ev GROUP BY "user")
            SELECT p."user" AS "user",
                   (e.n IS NOT NULL) AS seen,
                   COALESCE(e.n, 0) AS cnt
            FROM probes p LEFT JOIN exact e ON p."user" = e."user"
        """,
        "cqf_shingle_count": f"""
            WITH sh AS (
                SELECT unnest({shingle_list}) AS shingle FROM documents
            ),
            exact AS (SELECT shingle, COUNT(*) AS n FROM sh GROUP BY shingle)
            SELECT shingle, TRUE AS seen, n AS cnt FROM exact
        """,
        "text_stats": textops.duckdb_text_stats_sql(),
        "lang_id": textops.duckdb_lang_id_sql(),
        "fingerprint": textops.duckdb_fingerprint_sql(),
        "token_counts": textops.duckdb_token_counts_sql(),
        "rolling_fingerprint": textops.duckdb_rolling_fingerprint_sql(),
        "exact_dedup": dedup.DUCKDB_EXACT_DEDUP_SQL,
        "minhash_signatures": (
            "SELECT doc_id, array_to_string(sig, ',') AS sig FROM ("
            + dedup.duckdb_minhash_sql(num_hashes=16)
            + ")"
        ),
        "minhash_lsh_pairs": dedup.duckdb_minhash_lsh_pairs_sql(threshold=0.2),
        "ngram_jaccard": dedup.duckdb_ngram_jaccard_sql(min_jaccard=0.05),
        "simhash": dedup.duckdb_simhash_sql(),
        "simhash_pairs": dedup.duckdb_simhash_pairs_sql(max_hamming=2),
        "embedding_near_dup": dedup.duckdb_embedding_near_dup_sql(threshold=0.35),
        "media_features": f"""
            SELECT url AS media_id, octet_length(html) AS n_bytes,
                   'image' AS kind
            FROM ({wp})
        """,
        "clean_corpus": dedup.duckdb_clean_corpus_sql(near_dup_jaccard=0.3),
        "quality_filter": f"""
            WITH stats AS ({textops.duckdb_text_stats_sql()})
            SELECT d.doc_id, d.lang, d.source
            FROM documents d JOIN stats s ON d.doc_id = s.doc_id
            WHERE s.n_tokens >= 30 AND s.n_tokens <= 100000
              AND s.stopword_ratio >= 0.0
        """,
        "cosine_pairs": similarity.duckdb_cosine_pairs_sql(threshold=0.2),
        "cosine_topk": similarity.duckdb_cosine_topk_sql(k=5),
        "lsh_cosine_topk": similarity.duckdb_lsh_cosine_topk_sql(
            k=5, planes=6, tables=4),
        "lsh_ann_recall": similarity.duckdb_lsh_ann_recall_sql(
            k=5, planes=6, tables=4),
    }
