"""Sessionization: split each user's event stream into sessions at
inactivity gaps > ``gap``.

Two implementations with identical output semantics:

- ``sessionize`` (batch): lag + running-sum window per user — one
  shuffle on user_id, no state. Gap math is integer microseconds
  (``unix_micros``), so the session boundaries are exact and
  oracle-checkable against DuckDB's ``epoch_us``.
- ``sessionize_stream`` (streaming): applyInPandasWithState keyed by
  user_id with an event-time timeout — emits a session row when the
  watermark passes start-of-gap. State per key is one open session
  (constant size), the streaming-scale shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP_MINUTES = 30


def sessionize(
    events: DataFrame,
    gap_minutes: int = DEFAULT_GAP_MINUTES,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """One row per (user, session): bounds, event count, value sum."""
    gap_us = gap_minutes * 60 * 1_000_000
    with_idx = _with_session_idx(events, gap_us, user_col, ts_col)
    return (
        with_idx.groupBy(user_col, "session_idx")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
            # exact, order-independent decimal sum, emitted as double so
            # the pandas dtype matches the oracle (see streaming/events.py)
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .withColumn("session_idx", F.col("session_idx").cast("long"))
    )


def _with_session_idx(
    events: DataFrame, gap_us: int, user_col: str, ts_col: str
) -> DataFrame:
    """Gap-based session assignment: running count of session breaks
    (first event, or gap > gap_us) per user — shared by sessionize and
    session_paths so the assignment cannot drift between them."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    us = F.unix_micros(F.col(ts_col))
    new_session = (
        F.when(F.lag(ts_col).over(w).isNull(), 1)
        .when(us - F.unix_micros(F.lag(ts_col).over(w)) > gap_us, 1)
        .otherwise(0)
    )
    return events.withColumn(
        "session_idx",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_paths(
    events: DataFrame,
    gap_minutes: int = DEFAULT_GAP_MINUTES,
    max_len: int = 5,
    top_k: int = 10,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Top-k SESSION PATHS — the sequence-mining staple over gap-based
    sessions: each session's first ``max_len`` event types in time
    order (ties broken by event id — a total order, so the path string
    is partitioning-independent), joined with ' > ', counted, ranked
    ``(rank, path, n_sessions)``. The funnel query answers "how many
    reach step 3"; this answers "what do sessions actually DO" —
    navigation-pattern discovery.

    Scale shape: the same per-user session window as sessionize, one
    per-session top-``max_len`` row-number (bounded output per
    session), a map-side-combined path count, then a global
    ``orderBy().limit(k)`` — a TakeOrdered, never a full sort — with
    the rank window applied AFTER the limit so the partition-less
    window's input is LocalLimit-bounded (the plan-audit structural
    whitelist class). Exact strings and integers throughout.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    with_idx = _with_session_idx(events, gap_us, user_col, ts_col)
    we = Window.partitionBy(user_col, "session_idx").orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    seq = with_idx.withColumn("__rn", F.row_number().over(we)).filter(
        F.col("__rn") <= max_len
    )
    per_session = seq.groupBy(user_col, "session_idx").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("__rn").alias("r"), F.col(type_col).alias("t")
                        )
                    )
                ),
                lambda s: s["t"],
            ),
            " > ",
        ).alias("path")
    )
    counts = per_session.groupBy("path").agg(
        F.count("*").cast("long").alias("n_sessions")
    )
    top = counts.orderBy(F.desc("n_sessions"), F.asc("path")).limit(top_k)
    wr = Window.orderBy(F.desc("n_sessions"), F.asc("path"))
    return top.withColumn("rank", F.row_number().over(wr).cast("int")).select(
        "rank", "path", "n_sessions"
    )


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = DEFAULT_GAP_MINUTES,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization via per-user state with event-time timeout.

    Emits each session once it is CLOSED (gap elapsed past the
    watermark). Output schema matches ``sessionize`` minus the
    open-session tail rows that batch mode can see.
    """
    from typing import Any, Iterable, Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType,
        Row,
        StructField,
        StructType,
        TimestampType,
        DoubleType,
    )

    gap_us = gap_minutes * 60 * 1_000_000
    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("session_idx", LongType()),
            StructField("session_start", TimestampType()),
            StructField("session_end", TimestampType()),
            StructField("n_events", LongType()),
            StructField("sum_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("session_idx", LongType()),
            StructField("start_us", LongType()),
            StructField("end_us", LongType()),
            StructField("n", LongType()),
            # exact integer cents, NOT a float accumulator: mirrors the
            # batch twin's cast(value AS decimal(18,2)) → exact sum →
            # double, so stream and batch sums are bit-identical even on
            # drift-adversarial value sets (VERDICT r2 #7)
            StructField("total_cents", LongType()),
        ]
    )

    def update(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        from decimal import ROUND_HALF_UP, Decimal

        cent = Decimal("0.01")

        def to_cents(v) -> int:
            # Spark's double→decimal(18,2) cast goes through the
            # shortest decimal repr (BigDecimal.valueOf) then HALF_UP —
            # Python's repr() is the same shortest round-trip string
            return int(
                Decimal(repr(float(v))).quantize(cent, rounding=ROUND_HALF_UP).scaleb(2)
            )

        (user_id,) = key
        closed: list[tuple] = []

        if state.hasTimedOut:
            if state.exists:
                idx, start_us, end_us, n, total = state.get
                closed.append((user_id, idx, start_us, end_us, n, total))
            state.remove()
        else:
            rows = pd.concat(list(pdfs)).sort_values("ts")
            idx, start_us, end_us, n, total = (
                state.get if state.exists else (0, None, None, 0, 0)
            )
            for ts, value in zip(rows["ts"], rows["value"]):
                t_us = int(pd.Timestamp(ts).value // 1000)
                if start_us is None:
                    idx, start_us, end_us, n, total = idx + 1, t_us, t_us, 1, to_cents(value)
                elif t_us - end_us > gap_us:
                    closed.append((user_id, idx, start_us, end_us, n, total))
                    idx, start_us, end_us, n, total = idx + 1, t_us, t_us, 1, to_cents(value)
                else:
                    end_us, n, total = max(end_us, t_us), n + 1, total + to_cents(value)
            state.update((idx, start_us, end_us, n, total))
            # close the open session once event time passes end + gap;
            # clamp above the current watermark (a timeout in the past
            # is invalid — such sessions just close on the next trigger)
            state.setTimeoutTimestamp(
                max(
                    end_us // 1000 + gap_us // 1000,
                    state.getCurrentWatermarkMs() + 1,
                )
            )

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_idx": [c[1] for c in closed],
                    "session_start": [pd.Timestamp(c[2], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[3], unit="us") for c in closed],
                    "n_events": [c[4] for c in closed],
                    # cents/100.0 is the correctly-rounded double of the
                    # exact decimal sum — identical to the batch twin's
                    # final .cast("double")
                    "sum_value": [c[5] / 100.0 for c in closed],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
