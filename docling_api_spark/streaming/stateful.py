"""Custom stateful streaming operator: per-user sessionization with
``applyInPandasWithState`` (SURVEY.md Table B "Streaming" row — the
reference has no streaming at all; this is the Spark-native capability a
training-data pipeline needs for clickstream-style inputs).

Semantics match :func:`..operators.relational.sessionize_events`
(30-minute inactivity gap) — the batch gap-and-islands query is the
ground truth the test compares against.

State per user = the currently-open session ``(start, end, n_events,
idx)``. Each trigger merges the new (sorted) events: sessions that closed
emit final rows (``open=false``); the still-open tail emits a provisional
row (``open=true``) and stays in state. Provisional rows are superseded
by later emissions for the same **(user_id, session_idx)** — the idx is
assigned once and never changes, while session_start may move *earlier*
when a late event within the gap arrives in a later batch; consumers keep
the row with the largest n_events (sessions only grow).

Disorder bound: cross-batch lateness is handled up to the session gap
(events later than ``gap`` behind the open session's span would need
state for closed sessions — a production job bounds that with
``withWatermark`` upstream, same as any stateful operator).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.relational import SESSION_GAP_MINUTES

OUTPUT_DDL = ("user_id bigint, session_idx bigint, session_start timestamp, "
              "session_end timestamp, n_events bigint, open boolean")

STATE_DDL = ("start long, end long, n long, idx long")

#: pandas Timestamp.value is in nanoseconds
_GAP_NS = SESSION_GAP_MINUTES * 60 * 1_000_000_000


def _sessionize_group(key: Tuple[Any],
                      pdfs: Iterator[pd.DataFrame],
                      state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    ts_us: list[int] = []
    for pdf in pdfs:
        ts_us.extend(int(t.value) for t in pd.to_datetime(pdf["ts"]))
    ts_us.sort()

    if state.exists:
        start, end, n, idx = state.get
    else:
        start = end = n = 0
        idx = 0

    out_rows = []
    for t in ts_us:
        if n == 0:                      # no open session
            idx += 1
            start, end, n = t, t, 1
        elif t - end > _GAP_NS:         # gap -> close, open new
            out_rows.append((user_id, idx, start, end, n, False))
            idx += 1
            start, end, n = t, t, 1
        else:
            # cross-batch disorder: a late event within the gap can
            # precede the stored session start — extend backwards too
            # (consumers supersede by (user_id, session_idx), which is
            # stable; session_start may move earlier across emissions)
            start = min(start, t)
            end = max(end, t)
            n += 1
    if n:
        out_rows.append((user_id, idx, start, end, n, True))
        state.update((start, end, n, idx))

    if out_rows:
        df = pd.DataFrame(out_rows, columns=[
            "user_id", "session_idx", "session_start", "session_end",
            "n_events", "open"])
        df["session_start"] = pd.to_datetime(df["session_start"])
        df["session_end"] = pd.to_datetime(df["session_end"])
        yield df


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events readStream -> per-user session rows (update mode).

    At scale: state is hash-partitioned on user_id by the state store;
    each micro-batch shuffles only its own events. The event-time sort is
    per (group, batch) — arbitrarily-late data within a batch is handled,
    across batches a production job adds ``withWatermark``."""
    return (events
            .groupBy("user_id")
            .applyInPandasWithState(
                _sessionize_group, OUTPUT_DDL, STATE_DDL,
                "update", GroupStateTimeout.NoTimeout))
