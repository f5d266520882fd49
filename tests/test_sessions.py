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
    assign_sessions,
    cap_sessions,
    duckdb_assign_sessions_sql,
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


def test_session_stats_on_ntz_events(spark):
    """Regression: the events table's ts is TIMESTAMP_NTZ, which cannot
    cast to bigint in Spark 4 — session_stats must still compute
    durations (timestamp_diff path)."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    row = session_stats(ev, "ts", "user_id", "30 minutes").first()
    assert row.total_session_secs >= 30 * 60 * row.n_sessions


def test_assign_sessions_agrees_with_sessionize(spark):
    """Per-event labels aggregate to exactly sessionize's rows —
    boundary semantics included (same strictly-> break)."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    lab = assign_sessions(ev, "ts", "user_id", "30 minutes")
    agg = {(str(r.user_id), r.session_start, r.n_events)
           for r in lab.groupBy("user_id", "session_id")
           .agg(F.min("ts").alias("session_start"),
                F.count(F.lit(1)).alias("n_events")).collect()}
    want = {(r.key, r.session_start, r.n_events)
            for r in sessionize(ev, "ts", "user_id",
                                "30 minutes").collect()}
    assert agg == want and agg


def test_assign_sessions_matches_duckdb(spark):
    path = f"{SF_DIR}/events.parquet"
    ev = spark.read.parquet(path)
    got = sorted(
        (str(r.user_id), r.ts, int(r.session_id))
        for r in assign_sessions(ev, "ts", "user_id", "30 minutes")
        .select("user_id", "ts", "session_id").collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}')")
    want = sorted(
        (k, t, int(s)) for k, t, s in con.sql(
            duckdb_assign_sessions_sql("ts", "user_id", 30, "events"))
        .fetchall())
    assert got == want and got


def test_cap_sessions(spark):
    """Cap keeps the EARLIEST max_events of each session, with a
    deterministic tiebreak, and never invents rows."""
    rows = [("a", _ts(0), 1), ("a", _ts(1), 2), ("a", _ts(2), 3),
            ("a", _ts(2), 4),            # ts tie -> event id breaks it
            ("a", _ts(30), 5),           # new session
            ("b", _ts(0), 6)]
    df = spark.createDataFrame(rows, "user string, ts timestamp, eid int")
    kept = cap_sessions(df, "ts", "user", "5 minutes", max_events=3,
                        tiebreak_cols=["eid"])
    assert set(kept.columns) == {"user", "ts", "eid"}
    got = sorted(r.eid for r in kept.collect())
    # session 1 of 'a' keeps eids 1,2,3 (eid 4 ties on ts but loses);
    # session 2 of 'a' and b's singleton are under the cap
    assert got == [1, 2, 3, 5, 6]
    per_sess = (assign_sessions(df, "ts", "user", "5 minutes")
                .groupBy("user", "session_id").count().collect())
    assert max(r["count"] for r in per_sess) == 4  # uncapped view


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
