"""Sessionization: gap-based event-time sessions, batch and streaming.

A webtext training pipeline groups raw event streams (page fetches,
user actions) into SESSIONS — maximal runs of per-key events where
consecutive events are less than a gap apart — before any user-level
quality scoring, dedup, or rate capping. The reference (go-qfext) has
no analogue; this module is the forward extension the events table
asks for, and it is deliberately ALL-native:

* Batch: ``F.session_window`` — a Catalyst aggregate with map-side
  partial session merging, so the only shuffle is keyed by the session
  key and carries partially-merged (start, end, count) triples, not
  raw events. At 10^12 events this behaves like any groupBy: skewed
  keys (one bot user) concentrate one key's partials on one task —
  still bounded, since partials collapse to O(sessions), not events.
* Streaming: the same ``session_window`` under a watermark — Spark's
  state store holds open sessions per key and merges/evicts natively
  (no Python state function anywhere).

The DuckDB oracle is the classic gaps-and-islands rewrite (LAG + a
running sum of session-start flags), value-exact: a new session starts
when an event is STRICTLY MORE than ``gap`` after the previous event
of the same key — Spark merges an event landing exactly on the current
session's end (= last_ts + gap) into that session, pinned by
test_sessionize_semantics — and the session end is last event + gap,
matching ``session_window.end``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """Per-key gap-based sessions over an event table: one row per
    session — (key, session_start, session_end, n_events), where
    ``session_end`` is last event + ``gap`` (Spark's session-window
    contract). NULL keys/timestamps excluded.

    Pure native plan: partial session merging happens map-side inside
    the SessionWindow aggregate; the shuffle carries merged partials
    keyed by ``key_col``."""
    return (
        df.where(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("s"),
            F.col(key_col).cast("string").alias("key"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "key",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )


def session_stats(df: DataFrame, ts_col: str, key_col: str,
                  gap: str = "30 minutes") -> DataFrame:
    """Per-key session rollup — (key, n_sessions, n_events,
    max_session_events, total_session_secs): the user-level activity
    profile a rate-capping / bot-filtering pass consumes. One extra
    tiny aggregation over ``sessionize``'s output (O(sessions) rows,
    never events)."""
    s = sessionize(df, ts_col, key_col, gap)
    return (
        s.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max("n_events").alias("max_session_events"),
            # timestamp_diff, not a long cast: TIMESTAMP_NTZ (the
            # events table's type) cannot cast to bigint in Spark 4
            F.sum(
                F.timestamp_diff("SECOND", F.col("session_start"),
                                 F.col("session_end"))
            ).alias("total_session_secs"),
        )
    )


def assign_sessions(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    gap: str = "30 minutes",
    session_col: str = "session_id",
) -> DataFrame:
    """Tag every EVENT row with its session ordinal (1-based per key) —
    the row-level complement of ``sessionize``'s aggregate view, for
    pipelines that need per-event session labels (session-scoped
    features, per-session caps). Same pinned boundary: an event exactly
    ``gap`` after the previous one MERGES (the break test is strictly
    ``>``), so labels agree with ``session_window``'s grouping.

    Plan: two native window functions (LAG + running SUM) over ONE
    shuffle keyed by ``key_col`` with a per-key sort — no Python. At
    10^12 events this is the same shape as any per-user window pass;
    a single bot user's events concentrate on one task (the sort is
    spillable), and upstream rate capping bounds that key."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    new_s = F.when(
        prev.isNull()
        | ((F.col(ts_col) - prev) > F.expr(f"INTERVAL {gap}")),
        1,
    ).otherwise(0)
    return (
        df.where(F.col(ts_col).isNotNull() & F.col(key_col).isNotNull())
        .withColumn(
            session_col,
            F.sum(new_s).over(
                w.rowsBetween(Window.unboundedPreceding,
                              Window.currentRow)),
        )
    )


def cap_sessions(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    gap: str = "30 minutes",
    max_events: int = 100,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Keep at most ``max_events`` events per (key, session) — the
    per-session dominance cap a training-data pipeline applies so one
    bot user / crawler burst cannot flood the corpus. Earliest events
    win; ``tiebreak_cols`` (e.g. an event id) make the kept set
    deterministic when timestamps collide. One more window function on
    top of ``assign_sessions`` — same single shuffle, no Python."""
    s = assign_sessions(df, ts_col, key_col, gap)
    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(key_col, "session_id").orderBy(*order)
    return (
        s.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= max_events)
        .drop("_rn", "session_id")
    )


def duckdb_assign_sessions_sql(ts_col: str, key_col: str,
                               gap_minutes: int, source: str) -> str:
    """Gaps-and-islands twin of ``assign_sessions``: per-event
    (key, ts, session_id) with the same strictly-``> gap`` break."""
    return f"""
        SELECT CAST({key_col} AS VARCHAR) AS key, {ts_col} AS ts,
               SUM(new_s) OVER (PARTITION BY {key_col} ORDER BY {ts_col}
                                ROWS UNBOUNDED PRECEDING) AS session_id
        FROM (
            SELECT {key_col}, {ts_col},
                   CASE WHEN LAG({ts_col}) OVER w IS NULL
                             OR {ts_col} - LAG({ts_col}) OVER w
                                > INTERVAL '{gap_minutes} minutes'
                        THEN 1 ELSE 0 END AS new_s
            FROM {source}
            WHERE {key_col} IS NOT NULL AND {ts_col} IS NOT NULL
            WINDOW w AS (PARTITION BY {key_col} ORDER BY {ts_col})
        )
    """


def duckdb_sessionize_sql(ts_col: str, key_col: str, gap_minutes: int,
                          source: str) -> str:
    """Gaps-and-islands oracle twin of ``sessionize`` (value-exact):
    a session breaks when the gap to the previous same-key event is
    STRICTLY greater than ``gap_minutes`` (Spark merges the
    exactly-on-the-boundary event — see module docstring), and the
    session end is last event + gap."""
    return f"""
        WITH ev AS (
            SELECT CAST({key_col} AS VARCHAR) AS key, {ts_col} AS ts
            FROM {source}
            WHERE {key_col} IS NOT NULL AND {ts_col} IS NOT NULL
        ),
        marked AS (
            SELECT key, ts,
                   CASE WHEN LAG(ts) OVER w IS NULL
                             OR ts - LAG(ts) OVER w
                                > INTERVAL '{gap_minutes} minutes'
                        THEN 1 ELSE 0 END AS new_s
            FROM ev
            WINDOW w AS (PARTITION BY key ORDER BY ts)
        ),
        islands AS (
            SELECT key, ts,
                   SUM(new_s) OVER (PARTITION BY key ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM marked
        )
        SELECT key,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL '{gap_minutes} minutes'
                   AS session_end,
               COUNT(*) AS n_events
        FROM islands
        GROUP BY key, sid
    """


def streaming_sessions(
    stream_df: DataFrame,
    ts_col: str,
    key_col: str,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming sessionization: ``session_window`` under a watermark —
    fully native (Spark's state store holds each key's open sessions,
    merges on arrival, emits+evicts when the watermark passes a
    session's end). Append mode: every emitted row is a CLOSED
    session, row-identical to ``sessionize`` over the same data
    (session merging is order-independent, unlike Misra-Gries — so
    identity, not just a bound, is the tested contract).

    Fifth member of the windowed family (counts, distinct counts,
    quantiles, heavy hitters, sessions)."""
    return (
        stream_df.withWatermark(ts_col, watermark)
        .where(F.col(key_col).isNotNull())
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("s"),
            F.col(key_col).cast("string").alias("key"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "key",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
        )
    )
