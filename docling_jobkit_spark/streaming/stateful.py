"""Custom stateful streaming operator: gap-based sessionization.

The build brief calls for ``applyInPandasWithState`` where built-ins
can't express the semantics. Session windows with inactivity gap are the
canonical case: state = the open session per user, closed either by a
gap-exceeding event or by event-time timeout.

Batch twin: ``batch_sessions`` computes identical sessions with window
functions (lag → gap flag → running session id) — used by the test to
pin streaming == batch equivalence on a full drain.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events int, total_value double"
)
_STATE_SCHEMA = "start long, end long, n int, total double"

GAP_SECONDS = 30 * 60


def _sessionize(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        start, end, n, total = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start, unit="us")],
                "session_end": [pd.Timestamp(end, unit="us")],
                "n_events": [n],
                "total_value": [total],
            }
        )
        return

    events = pd.concat(list(pdfs)).sort_values("ts")
    closed: list[tuple] = []
    if state.exists:
        start, end, n, total = state.get
    else:
        start = end = None  # type: ignore[assignment]
        n, total = 0, 0.0

    # column zip, not iterrows (the repo idiom — iterrows builds a Series
    # per row and is the slowest pandas iteration, in the one per-event
    # Python loop of the streaming path)
    for ts, value in zip(events["ts"], events["value"]):
        ts_us = int(ts.value // 1000)  # ns → µs
        if start is None:
            start, end, n, total = ts_us, ts_us, 1, float(value)
        # gap measured in WHOLE seconds (matches the batch twin's
        # second-quantized lag comparison exactly)
        elif ts_us // 1_000_000 - end // 1_000_000 > GAP_SECONDS:
            closed.append((start, end, n, total))
            start, end, n, total = ts_us, ts_us, 1, float(value)
        else:
            end = max(end, ts_us)
            n += 1
            total += float(value)

    state.update((start, end, n, total))
    # close the open session if no event arrives within the gap
    state.setTimeoutTimestamp(end // 1000 + GAP_SECONDS * 1000)

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="us") for s, *_ in closed],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, *_ in closed],
                "n_events": [c[2] for c in closed],
                "total_value": [c[3] for c in closed],
            }
        )


def stream_sessions(
    spark: SparkSession,
    input_dir: str,
    schema_ddl: str = "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    watermark: str = "1 hour",
) -> DataFrame:
    events = spark.readStream.schema(schema_ddl).format("parquet").load(input_dir)
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def batch_sessions(events: DataFrame, gap_seconds: int = GAP_SECONDS) -> DataFrame:
    """Batch twin: identical session semantics via window functions."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts")
    # ts may arrive as TIMESTAMP_NTZ (parquet) — normalize before epoch cast
    ts_sec = F.col("ts").cast("timestamp").cast("long")
    gapped = events.withColumn(
        "new_session",
        (
            ts_sec - F.lag(ts_sec, 1, 0).over(w) > gap_seconds
        ).cast("int"),
    ).withColumn(
        "session_id",
        F.sum(
            F.when(F.row_number().over(w) == 1, 1).otherwise(F.col("new_session"))
        ).over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return gapped.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").cast("int").alias("n_events"),
        # decimal-exact accumulation (repo cross-engine rule): the DuckDB
        # oracle sums cast(value as decimal(18,6)); a float64 sum here can
        # flip the 3rd decimal at a rounding boundary, order-dependently
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
    )
