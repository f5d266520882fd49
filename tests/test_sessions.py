"""Sessionization: native session_window batch + streaming vs the
gaps-and-islands DuckDB oracle, including the exact-gap boundary
(Spark MERGES an event at exactly last_ts + gap into the running
session — the oracle's break condition must be strictly `> gap` to
agree)."""

import datetime as dt
import os
import shutil
import tempfile

import duckdb
import pytest
from pyspark.sql import functions as F

from qfspark.sessions import (
    duckdb_sessionize_sql,
    session_stats,
    sessionize,
    streaming_sessions,
)

from .conftest import SF_DIR


def _ts(minute, second=0):
    return dt.datetime(2026, 1, 1, 12, minute, second)


def test_sessionize_semantics(spark):
    """Gap boundary semantics pinned: events <= gap apart MERGE (an
    event landing exactly on the session's end extends it — observed
    Spark behavior the oracle must copy), an event > gap after the
    last starts a new session, and session_end is last event + gap."""
    rows = [
        ("a", _ts(0)), ("a", _ts(4)), ("a", _ts(8)),   # one session...
        ("a", _ts(13)),   # exactly 5 min after 8 -> MERGES (inclusive)
        ("a", _ts(18, 1)),        # 5:01 after 13 -> NEW session
        ("b", _ts(0)), ("b", _ts(30)),                 # two sessions
        ("c", _ts(1)),                                 # singleton
        (None, _ts(2)),                                # dropped
    ]
    df = spark.createDataFrame(rows, "user string, ts timestamp")
    got = {(r.key, r.session_start, r.session_end, r.n_events)
           for r in sessionize(df, "ts", "user", "5 minutes").collect()}
    gap = dt.timedelta(minutes=5)
    want = {
        ("a", _ts(0), _ts(13) + gap, 4),
        ("a", _ts(18, 1), _ts(18, 1) + gap, 1),
        ("b", _ts(0), _ts(0) + gap, 1),
        ("b", _ts(30), _ts(30) + gap, 1),
        ("c", _ts(1), _ts(1) + gap, 1),
    }
    assert got == want


def test_sessionize_matches_duckdb(spark):
    """Value-exact parity on the events table: every (key, start, end,
    n_events) row identical between session_window and the
    gaps-and-islands oracle."""
    path = f"{SF_DIR}/events.parquet"
    ev = spark.read.parquet(path)
    got = sorted(
        (r.key, r.session_start, r.session_end, r.n_events)
        for r in sessionize(ev, "ts", "user_id", "30 minutes").collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}')")
    want = sorted(
        (str(k), s, e, int(n))
        for k, s, e, n in con.sql(
            duckdb_sessionize_sql("ts", "user_id", 30, "events"))
        .fetchall())
    assert len(got) == len(want) and got, len(got)
    assert got == want


def test_session_stats(spark):
    df = spark.createDataFrame(
        [("a", _ts(0)), ("a", _ts(1)), ("a", _ts(20)), ("b", _ts(0))],
        "user string, ts timestamp")
    rows = {r.key: r for r in session_stats(
        df, "ts", "user", "5 minutes").collect()}
    assert rows["a"].n_sessions == 2
    assert rows["a"].n_events == 3
    assert rows["a"].max_session_events == 2
    # session secs: (1min span + 5min gap) + (0 span + 5min gap)
    assert rows["a"].total_session_secs == 6 * 60 + 5 * 60
    assert rows["b"].n_sessions == 1


def test_streaming_sessions_match_batch(spark):
    """Closed streaming sessions are ROW-IDENTICAL to the batch
    sessionize over the same data (session merging is
    order-independent); only still-open sessions are withheld."""
    tmp = tempfile.mkdtemp(prefix="qfsess_")
    src = f"{tmp}/src"
    try:
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
            "ts", F.col("user_id").cast("string").alias("user"))
        os.makedirs(src, exist_ok=True)
        pdf = ev.toPandas().sort_values("ts").reset_index(drop=True)
        for i, part in enumerate(
                (pdf.iloc[: len(pdf) // 2], pdf.iloc[len(pdf) // 2:])):
            part.to_parquet(
                f"{src}/part{i}.parquet", coerce_timestamps="us",
                allow_truncated_timestamps=True)
        stream = (spark.readStream
                  .schema("ts timestamp, user string")
                  .option("maxFilesPerTrigger", 1).parquet(src))
        sess = streaming_sessions(stream, "ts", "user",
                                  gap="30 minutes", watermark="1 minute")
        q = (sess.writeStream.format("memory").queryName("sess")
             .outputMode("append")
             .option("checkpointLocation", f"{tmp}/ckpt")
             .trigger(availableNow=True).start())
        q.awaitTermination(240)
        got = {(r.key, r.session_start, r.session_end, r.n_events)
               for r in spark.sql("SELECT * FROM sess").collect()}
        assert got, "no closed sessions emitted"
        want = {(r.key, r.session_start, r.session_end, r.n_events)
                for r in sessionize(ev, "ts", "user",
                                    "30 minutes").collect()}
        assert got <= want
        # everything withheld is still-open at the final watermark:
        # its session end extends past (or to within the watermark
        # delay of) the max event time
        horizon = pdf["ts"].max().to_pydatetime() - dt.timedelta(minutes=1)
        for k, s, e, n in want - got:
            assert e >= horizon, (k, s, e, n)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
