"""Deterministic synthesis of the Common-Crawl-style ``web_pages`` table.

BASELINE.json's input_hint specifies the input shape:
``web_pages(url:string, warc_ts:timestamp, html:binary, text:string,
lang:string)``. No such table exists in the driver testdata, so we derive
it *deterministically* from the ``documents`` parquet table (doc_id, text,
lang, source, n_chars) — pure column expressions, no randomness, no
external data — identically expressible in Spark and DuckDB SQL so every
downstream query stays oracle-checkable.

Mapping (doc_id-keyed, bijective):
  url     = 'https://' || source || '.example.com/doc/' || doc_id
  warc_ts = epoch 2024-01-01T00:00:00Z + doc_id seconds
  html    = utf-8 bytes of '<html><head><title>doc-<id></title></head>
            <body><p>' || text || '</p></body></html>'
  text    = documents.text (and extract_text(html) == text byte-identically
            — the per-row invariant; see shingle.extract_text)
  lang    = documents.lang
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

#: epoch seconds of 2024-01-01T00:00:00Z
_EPOCH0 = 1704067200

_HTML_PREFIX = "<html><head><title>doc-"
_HTML_MID = "</title></head><body><p>"
_HTML_SUFFIX = "</p></body></html>"


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources import read_table

    return read_table(spark, f"{sf_dir}/documents.parquet")


def synthesize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """web_pages DataFrame derived from documents — built-in column
    expressions only (whole-stage codegen; parquet scan prunes to the
    used columns)."""
    doc = load_documents(spark, sf_dir)
    doc_id_s = F.col("doc_id").cast("string")
    html_str = F.concat(
        F.lit(_HTML_PREFIX), doc_id_s, F.lit(_HTML_MID),
        F.col("text"), F.lit(_HTML_SUFFIX),
    )
    return doc.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"), doc_id_s
        ).alias("url"),
        F.timestamp_seconds(F.lit(_EPOCH0) + F.col("doc_id")).alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def synthesize_crawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """web_pages with deterministic re-fetches: page doc_id appears
    ``1 + (doc_id % 3)`` times (FIXTURES.md asks for duplicate urls to
    exercise counting and hot-key handling; re-fetch factor is a pure
    function of doc_id so both engines agree)."""
    wp = synthesize(spark, sf_dir)
    return wp.withColumn(
        "_fetch",
        F.explode(
            F.expr(
                "sequence(0, pmod(CAST(regexp_extract(url, '([0-9]+)$', 1) AS BIGINT), 3))"
            )
        ),
    ).drop("_fetch")


#: DuckDB fragment for the same crawl duplication
def duckdb_crawl_sql() -> str:
    return f"""
        SELECT w.* FROM ({DUCKDB_WEB_PAGES_SQL.strip()}) w,
        unnest(range(0, 1 + (CAST(regexp_extract(w.url, '([0-9]+)$', 1) AS BIGINT) % 3))) AS t(i)
    """


#: DuckDB SQL producing the identical table from the pre-registered
#: ``documents`` view (oracle side of the correctness gate).
DUCKDB_WEB_PAGES_SQL = f"""
SELECT
  'https://' || source || '.example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
  to_timestamp({_EPOCH0} + doc_id) AS warc_ts,
  encode('{_HTML_PREFIX}' || CAST(doc_id AS VARCHAR) || '{_HTML_MID}'
         || text || '{_HTML_SUFFIX}') AS html,
  text,
  lang
FROM documents
"""
