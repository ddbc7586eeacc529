"""Sessionization over the events stream shape.

* ``sessionize`` (batch): classic gap-based sessions with a window
  lag + running sum — pure Spark SQL, exact DuckDB oracle twin.
* ``stream_sessionize`` (streaming): the same semantics as a custom
  stateful operator via ``applyInPandasWithState`` — per-user state
  carries (start, last_ts, n_events); a session closes when the gap
  exceeds the threshold or the state times out. This is the
  Structured-Streaming-native form a 100 TB event firehose needs
  (state store sharded by user, no global shuffle beyond the key).
"""

from __future__ import annotations

import datetime

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.window import Window

DEFAULT_GAP_MIN = 30


def _epoch(col):
    # parquet timestamps may arrive as TIMESTAMP_NTZ; cast through
    # TIMESTAMP (session tz = UTC) to get epoch seconds
    return col.cast("timestamp").cast("long")


def sessionize(events_df: DataFrame, gap_minutes: int = DEFAULT_GAP_MIN) -> DataFrame:
    """Batch gap sessionization: one row per (user, session) with
    start/end/event count. session boundary = gap > gap_minutes."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap_s = gap_minutes * 60
    marked = events_df.withColumn(
        "_new",
        F.when(
            _epoch(F.col("ts")) - F.lag(_epoch(F.col("ts"))).over(w) > gap_s, 1
        ).otherwise(0),
    ).withColumn("session_seq", F.sum("_new").over(w))
    return (
        marked.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select(
            "user_id",
            F.col("session_seq").cast("int").alias("session_seq"),
            "n_events",
            F.col("session_start").cast("string").alias("session_start"),
            F.col("session_end").cast("string").alias("session_end"),
        )
    )


SESSIONIZE_ORACLE_SQL = """
WITH marked AS (
  SELECT user_id, ts, event_id,
    -- CAST(floor(epoch(..))) mirrors Spark's cast(ts as long), which
    -- TRUNCATES sub-second components; DuckDB's epoch() returns
    -- fractional seconds, so without the floor the two engines could
    -- split sessions differently when a gap lands within 1s of the
    -- threshold.
    CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > {gap_s} THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), seq AS (
  SELECT user_id, ts,
    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                     ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM marked
)
SELECT user_id, CAST(session_seq AS INTEGER) AS session_seq,
  COUNT(*) AS n_events,
  CAST(MIN(ts) AS VARCHAR) AS session_start,
  CAST(MAX(ts) AS VARCHAR) AS session_end
FROM seq GROUP BY user_id, session_seq
"""


_SESSION_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)
_SESSION_STATE = T.StructType(
    [
        T.StructField("start_s", T.LongType()),
        T.StructField("last_s", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def stream_sessionize(
    events_stream: DataFrame,
    gap_minutes: int = DEFAULT_GAP_MIN,
    idle_timeout_ms: int = 3_600_000,
) -> DataFrame:
    """Custom stateful streaming operator: closed sessions are emitted
    as they are detected; an idle processing-time timeout flushes the
    open session per user."""
    gap_s = gap_minutes * 60

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start_s, last_s, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [datetime.datetime.utcfromtimestamp(start_s)],
                    "session_end": [datetime.datetime.utcfromtimestamp(last_s)],
                    "n_events": [n],
                }
            )
            return

        ts_list = []
        for pdf in pdfs:
            ts_list.extend(int(t.timestamp()) for t in pdf["ts"])
        ts_list.sort()
        if state.exists:
            start_s, last_s, n = state.get
        else:
            start_s, last_s, n = ts_list[0], ts_list[0], 0
        closed = []
        for t in ts_list:
            if t - last_s > gap_s:
                closed.append((start_s, last_s, n))
                start_s, n = t, 0
            last_s = max(last_s, t)
            n += 1
        state.update((start_s, last_s, n))
        state.setTimeoutDuration(idle_timeout_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [datetime.datetime.utcfromtimestamp(c[0]) for c in closed],
                    "session_end": [datetime.datetime.utcfromtimestamp(c[1]) for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    return events_stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=_SESSION_OUT,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
