"""URL canonicalization: spec cases, cross-engine parity, idempotence,
and the no-Python-in-plan property."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from qfspark import urls

CASES = [
    # (input, expected normalized)
    ("https://src1.example.com/doc/42", "https://src1.example.com/doc/42"),
    ("HTTPS://SRC1.EXAMPLE.COM:443/doc/42",
     "https://src1.example.com/doc/42"),
    ("https://src1.example.com/doc/42#frag",
     "https://src1.example.com/doc/42"),
    ("http://Host.Example.COM:80/a/b?b=2&a=1",
     "http://host.example.com/a/b?a=1&b=2"),
    ("http://host.example.com:8080/a/b?a=1&b=2#x",
     "http://host.example.com:8080/a/b?a=1&b=2"),
    ("https://example.com", "https://example.com/"),
    ("https://example.com?z=1&", "https://example.com/?z=1"),
    ("ftp://Files.example.org:21/pub", "ftp://files.example.org:21/pub"),
    ("https://localhost/x", "https://localhost/x"),
]


def test_url_normalize_spec(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = {r.url: r.url_norm
           for r in urls.url_normalize(df, "url").collect()}
    for u, want in CASES:
        assert got[u] == want, (u, got[u], want)


def test_url_normalize_matches_duckdb(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = urls.url_normalize(df, "url").toPandas()
    con = duckdb.connect()
    con.register("src", pd.DataFrame({"url": [u for u, _ in CASES]}))
    want = con.sql(urls.duckdb_url_normalize_sql("url", "src")).df()
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    assert g.equals(w)


def test_url_normalize_idempotent(spark):
    """Normalizing an already-normalized url is the identity."""
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    once = urls.url_normalize(df, "url").select(
        "url_norm").withColumnRenamed("url_norm", "url")
    twice = urls.url_normalize(once, "url")
    bad = twice.where("url_norm != url").collect()
    assert not bad, bad


def test_url_normalize_stays_in_codegen(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    plan = urls.url_normalize(df, "url")._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_url_normalize_random_corpus(spark):
    """300 seeded-random URLs assembled from edge-case parts: normalize
    must be idempotent and bit-identical to the DuckDB twin on all of
    them."""
    import random

    rng = random.Random(20260817)
    schemes = ["http", "HTTP", "https", "HTTPS", "ftp"]
    hosts = ["Example.COM", "sub.domain.example.org", "localhost",
             "a.b", "X-Y.example.net"]
    ports = ["", ":80", ":443", ":8080", ":21"]
    paths = ["", "/", "/a", "/a/b.html", "/a%20b", "/trailing/"]
    queries = ["", "?", "?a=1", "?b=2&a=1", "?z=&a=1", "?dup=1&dup=0",
               "?a=1&b=2&c=3"]
    frags = ["", "#x", "#frag/with/slash", "#?q=1"]
    urls_list = [
        rng.choice(schemes) + "://" + rng.choice(hosts)
        + rng.choice(ports) + rng.choice(paths) + rng.choice(queries)
        + rng.choice(frags)
        for _ in range(300)
    ]
    df = spark.createDataFrame([(u,) for u in urls_list], "url string")
    got = urls.url_normalize(df, "url").toPandas()

    con = duckdb.connect()
    con.register("src", pd.DataFrame({"url": urls_list}))
    want = con.sql(urls.duckdb_url_normalize_sql("url", "src")).df()
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    assert g.equals(w)

    # idempotence over the whole corpus
    once = urls.url_normalize(df, "url").select(
        F.col("url_norm").alias("url"))
    bad = urls.url_normalize(once, "url").where(
        "url_norm != url").collect()
    assert not bad, bad[:5]
