"""URL canonicalization for crawl pipelines: normalize, host, registered
domain, sorted query parameters.

The crawl-dedup precursor every webtext pipeline needs — the same URL
fetched as ``HTTPS://HOST:443/x?b=2&a=1#frag`` and
``https://host/x?a=1&b=2`` must collapse to one key before any
counting/dedup sketch sees it (otherwise the CQF counts one page twice).

Everything is Spark built-in expressions (regexp_extract /
array_sort / higher-order filter — whole-stage codegen, no Python) with
an exact DuckDB twin (``duckdb_url_normalize_sql``) so the normalized
values themselves are oracle-checked. Cross-engine determinism rules:

* regexes use only RE2-and-Java-compatible syntax, and ``[?]``
  character classes instead of backslash escapes (string-literal
  escaping differs between the engines);
* query parameters sort with plain binary string sort (``array_sort``
  == DuckDB ``list_sort``) — stable for ASCII parameter names;
* normalization spec: lowercase scheme and host, strip fragment, strip
  default port (http:80 / https:443), empty path -> '/', query
  parameters sorted with empty fragments dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: default ports stripped during normalization
DEFAULT_PORTS = {"http": "80", "https": "443"}


def _stages(col: str) -> dict[str, str]:
    """The shared decomposition, as Spark-SQL expression strings over
    ``col``. Each stage is referenced by name by the next (callers
    materialize them as sequential projections; Catalyst collapses the
    chain into one codegen stage)."""
    return {
        "_nf": f"regexp_replace({col}, '#.*$', '')",
        "_scheme": "lower(regexp_extract(_nf, '^([^:/?#]+)://', 1))",
        "_hostport": "regexp_extract(_nf, '^[^:/?#]+://([^/?#]*)', 1)",
        "_host": "lower(regexp_replace(_hostport, ':[0-9]*$', ''))",
        "_port": "regexp_extract(_hostport, ':([0-9]+)$', 1)",
        "_path0": "regexp_extract(_nf, '^[^:/?#]+://[^/?#]*([^?#]*)', 1)",
        "_path": "CASE WHEN _path0 = '' THEN '/' ELSE _path0 END",
        "_q": "regexp_extract(_nf, '[?]([^#]*)', 1)",
        "_nq": ("array_join(array_sort(filter(split(_q, '&'), "
                "x -> x != '')), '&')"),
    }


def _keep_port_sql() -> str:
    cases = " OR ".join(
        f"(_scheme = '{s}' AND _port = '{p}')"
        for s, p in DEFAULT_PORTS.items())
    return f"_port != '' AND NOT ({cases})"


def url_normalize(df: DataFrame, col: str = "url",
                  keep_parts: bool = False) -> DataFrame:
    """Adds ``url_norm``, ``url_host``, ``url_domain`` (last two host
    labels), ``url_path``, ``url_query`` columns. ``keep_parts=False``
    drops the intermediate stage columns."""
    out = df
    for name, expr in _stages(col).items():
        out = out.withColumn(name, F.expr(expr))
    out = out.select(
        "*",
        F.expr(
            "concat(_scheme, '://', _host, "
            f"CASE WHEN {_keep_port_sql()} THEN concat(':', _port) "
            "ELSE '' END, _path, "
            "CASE WHEN _nq != '' THEN concat('?', _nq) ELSE '' END)"
        ).alias("url_norm"),
        F.col("_host").alias("url_host"),
        F.expr("regexp_extract(_host, '([^.]+[.][^.]+)$', 1)")
        .alias("url_domain"),
        F.col("_path").alias("url_path"),
        F.col("_nq").alias("url_query"),
    )
    if not keep_parts:
        out = out.drop(*_stages(col).keys())
    return out


def duckdb_url_normalize_sql(col: str, source: str) -> str:
    """DuckDB twin of ``url_normalize``: SELECT source.*, url_norm,
    url_host, url_domain, url_path, url_query FROM ``source``."""
    cases = " OR ".join(
        f"(_scheme = '{s}' AND _port = '{p}')"
        for s, p in DEFAULT_PORTS.items())
    return f"""
        WITH _u0 AS (
            SELECT *, regexp_replace({col}, '#.*$', '') AS _nf
            FROM {source}
        ),
        _u1 AS (
            SELECT *,
              lower(COALESCE(regexp_extract(_nf, '^([^:/?#]+)://', 1), '')) AS _scheme,
              COALESCE(regexp_extract(_nf, '^[^:/?#]+://([^/?#]*)', 1), '') AS _hostport
            FROM _u0
        ),
        _u2 AS (
            SELECT *,
              lower(regexp_replace(_hostport, ':[0-9]*$', '')) AS _host,
              COALESCE(regexp_extract(_hostport, ':([0-9]+)$', 1), '') AS _port,
              COALESCE(regexp_extract(_nf, '^[^:/?#]+://[^/?#]*([^?#]*)', 1), '')
                  AS _path0,
              COALESCE(regexp_extract(_nf, '[?]([^#]*)', 1), '') AS _q
            FROM _u1
        ),
        _u3 AS (
            SELECT *,
              CASE WHEN _path0 = '' THEN '/' ELSE _path0 END AS _path,
              COALESCE(array_to_string(list_sort(list_filter(
                  string_split(_q, '&'), x -> x != '')), '&'), '')
                  AS _nq
            FROM _u2
        )
        SELECT * EXCLUDE (_nf, _scheme, _hostport, _host, _port,
                          _path0, _q, _path, _nq),
               _scheme || '://' || _host
                 || CASE WHEN _port != '' AND NOT ({cases})
                         THEN ':' || _port ELSE '' END
                 || _path
                 || CASE WHEN _nq != '' THEN '?' || _nq ELSE '' END
                   AS url_norm,
               _host AS url_host,
               COALESCE(regexp_extract(_host, '([^.]+[.][^.]+)$', 1), '') AS url_domain,
               _path AS url_path,
               _nq AS url_query
        FROM _u3
    """
