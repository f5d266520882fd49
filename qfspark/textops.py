"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality scoring, language-ID heuristic, fingerprinting.

Everything here is Spark built-in expressions (whole-stage codegen; no
Python in the hot path) with an exact DuckDB SQL twin so each operator is
oracle-checkable. Cross-engine determinism rules:

* tokenization is ``split(text, ' ')`` (documents.text is space-joined),
* 64-bit integer hashes derive from md5 hex prefixes (identical in both
  engines): ``conv(substr(md5(x),1,15),16,10)`` == DuckDB
  ``('0x'||substr(md5(x),1,15))::BIGINT`` (60 bits, never negative),
* ratios are rounded to 6 decimals before comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# fixed stopword sets for the language-ID heuristic (deterministic,
# versioned — order matters for tie-breaking)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it", "for", "on"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "se", "no"),
    "de": ("der", "die", "und", "das", "von", "zu", "mit", "ist", "ein", "nicht"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "est", "pas"),
}

_TOKS = "split({col}, ' ')"


def _sql_quote_list(words) -> str:
    return ", ".join(f"'{w}'" for w in words)


# ---------------------------------------------------------------------------
# token stats / quality
# ---------------------------------------------------------------------------

def text_stats(df: DataFrame, col: str = "text") -> DataFrame:
    """Per-document token/char counts and a simple quality profile:
    n_tokens, n_chars, avg token length, stopword ratio — the standard
    cheap quality signals for webtext filtering."""
    toks = _TOKS.format(col=col)
    stop = _sql_quote_list(LANG_STOPWORDS["en"])
    return df.select(
        "doc_id",
        F.expr(f"size({toks})").alias("n_tokens"),
        F.length(col).alias("n_chars"),
        F.expr(
            f"round(length({col}) / size({toks}), 6)"
        ).alias("avg_token_len"),
        F.expr(
            f"round(size(filter({toks}, t -> t IN ({stop}))) / size({toks}), 6)"
        ).alias("stopword_ratio"),
    )


def duckdb_text_stats_sql(col: str = "text") -> str:
    toks = f"string_split({col}, ' ')"
    stop = _sql_quote_list(LANG_STOPWORDS["en"])
    return f"""
        SELECT doc_id,
               len({toks}) AS n_tokens,
               length({col}) AS n_chars,
               round(length({col}) / len({toks}), 6) AS avg_token_len,
               round(len(list_filter({toks}, t -> t IN ({stop})))
                     / len({toks}), 6) AS stopword_ratio
        FROM documents
    """


def quality_filter(df: DataFrame, col: str = "text",
                   min_tokens: int = 20, max_tokens: int = 100_000,
                   min_stopword_ratio: float = 0.0) -> DataFrame:
    """Keep documents passing the quality gates (the filtering operator a
    training-data pipeline runs before dedup)."""
    stats = text_stats(df, col)
    return (
        df.join(stats.select("doc_id", "n_tokens", "stopword_ratio"), "doc_id")
        .where(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("n_tokens") <= max_tokens)
            & (F.col("stopword_ratio") >= min_stopword_ratio)
        )
        .drop("n_tokens", "stopword_ratio")
    )


# ---------------------------------------------------------------------------
# language identification (stopword-overlap heuristic)
# ---------------------------------------------------------------------------

def lang_id(df: DataFrame, col: str = "text") -> DataFrame:
    """Predict language by stopword-set overlap, deterministic tie-break
    by LANG_STOPWORDS declaration order. Returns (doc_id, lang_pred,
    lang_score = matches of the winning set)."""
    toks = _TOKS.format(col=col)
    scores = {
        lang: f"size(filter({toks}, t -> t IN ({_sql_quote_list(words)})))"
        for lang, words in LANG_STOPWORDS.items()
    }
    langs = list(scores)
    # ordered CASE: first language with maximal score wins
    when = " ".join(
        f"WHEN {scores[lang]} >= greatest({', '.join(scores[o] for o in langs if o != lang)}) THEN '{lang}'"
        for lang in langs[:-1]
    )
    case = f"CASE {when} ELSE '{langs[-1]}' END"
    best = f"greatest({', '.join(scores.values())})"
    return df.select(
        "doc_id",
        F.expr(case).alias("lang_pred"),
        F.expr(best).cast("long").alias("lang_score"),
    )


def duckdb_lang_id_sql(col: str = "text") -> str:
    toks = f"string_split({col}, ' ')"
    scores = {
        lang: f"len(list_filter({toks}, t -> t IN ({_sql_quote_list(words)})))"
        for lang, words in LANG_STOPWORDS.items()
    }
    langs = list(scores)
    when = " ".join(
        f"WHEN {scores[lang]} >= greatest({', '.join(scores[o] for o in langs if o != lang)}) THEN '{lang}'"
        for lang in langs[:-1]
    )
    case = f"CASE {when} ELSE '{langs[-1]}' END"
    best = f"greatest({', '.join(scores.values())})"
    return f"""
        SELECT doc_id, {case} AS lang_pred, CAST({best} AS BIGINT) AS lang_score
        FROM documents
    """


# ---------------------------------------------------------------------------
# fingerprinting
# ---------------------------------------------------------------------------

#: Spark SQL fragment: 60-bit integer hash of an arbitrary string expr,
#: identical in DuckDB (see duckdb_hash60).
def spark_hash60(expr: str) -> str:
    return f"CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def duckdb_hash60(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def fingerprint(df: DataFrame, col: str = "text") -> DataFrame:
    """Document fingerprints: full md5 plus a 60-bit integer fingerprint
    (for joins / sketch insertion)."""
    return df.select(
        "doc_id",
        F.md5(F.col(col)).alias("fp_md5"),
        F.expr(spark_hash60(col)).alias("fp60"),
    )


def duckdb_fingerprint_sql(col: str = "text") -> str:
    return f"""
        SELECT doc_id, md5({col}) AS fp_md5, {duckdb_hash60(col)} AS fp60
        FROM documents
    """
