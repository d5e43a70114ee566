"""T7 — CUSTOM stateful streaming operator via ``applyInPandasWithState``
(the driver brief's named mechanism for stateful ops Spark's built-ins
can't express; the native-primitive twins live in jobs.py T1-T5).

The operator is a per-key sessionizer with hand-rolled state: for each
``user_id`` it carries ONE open session ``(s_start, s_end, n, sum_value)``
across micro-batches and emits a session row the moment an event for the
same key arrives ``gap`` or more after the open session's end (the same
half-open boundary as ``F.session_window``: a gap of EXACTLY ``gap``
starts a new session).

Two closure modes:

- ``timeout=False`` (default): sessions close ONLY when a later event
  for the key proves the gap — i.e. the emitted set is exactly "every
  session except each key's LAST one", a deterministic, micro-batch-
  split-invariant contract that a SQL oracle can state (islands
  sessionization minus the per-key max-sid row; see
  plans/queries.py::stream_stateful_sessionize). This is what makes a
  CUSTOM stateful operator hash-checkable against DuckDB at all.
- ``timeout=True``: additionally registers an EVENT-TIME timeout at
  ``s_end + gap`` so idle sessions flush once the watermark passes them
  — the production shape (state is bounded by the watermark, nothing
  waits forever for a closing event).

Scale notes:
- State per key is O(1) (four scalars) — 10^9 users is ~tens of GB of
  state across the cluster, the canonical keyed-state budget.
- The per-batch group input is sorted in-UDF, so intra-batch disorder is
  handled; cross-batch disorder is governed by the watermark exactly as
  for the native ``session_window``.
- Arrow-batched pandas transfer (``applyInPandasWithState``), never
  row-at-a-time Python.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, s_start timestamp, s_end timestamp, "
    "n bigint, sum_value double"
)
#: open-session state: timestamps as int64 MICROSECONDS (avoids any
#: pandas/Arrow datetime-unit coercion inside the state tuple)
STATE_SCHEMA = "s_start bigint, s_end bigint, n bigint, sum_value double"

_US_PER_MIN = 60_000_000


def _ts_us(col: pd.Series) -> pd.Series:
    """datetime64[any unit] -> int64 microseconds since epoch."""
    return col.astype("datetime64[us]").astype("int64")


def _emit(rows: list) -> pd.DataFrame:
    out = pd.DataFrame(
        rows, columns=["user_id", "s_start", "s_end", "n", "sum_value"]
    )
    out["s_start"] = pd.to_datetime(out["s_start"], unit="us")
    out["s_end"] = pd.to_datetime(out["s_end"], unit="us")
    return out


def _make_sessionizer(gap_us: int, use_timeout: bool):
    def sessionize(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        uid = key[0]
        if state.hasTimedOut:
            # watermark passed s_end + gap with no new event: flush the
            # idle open session and drop the key's state entirely
            s_start, s_end, n, sv = state.get
            state.remove()
            yield _emit([(uid, s_start, s_end, n, sv)])
            return

        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values("ts", kind="stable")
        ts = _ts_us(batch["ts"]).to_numpy()
        vals = batch["value"].to_numpy()

        if state.exists:
            s_start, s_end, n, sv = state.get
        else:
            s_start = None
        closed: list = []
        for t, v in zip(ts, vals):
            t = int(t)
            if s_start is None:
                s_start, s_end, n, sv = t, t, 1, float(v)
            elif t - s_end >= gap_us:  # half-open: == gap starts NEW
                closed.append((uid, s_start, s_end, n, sv))
                s_start, s_end, n, sv = t, t, 1, float(v)
            else:
                s_end = max(s_end, t)
                n += 1
                sv += float(v)
        state.update((s_start, s_end, n, sv))
        if use_timeout:
            # fire once the event-time watermark passes the session's
            # close boundary; Spark requires the timeout to sit beyond
            # the current watermark, so clamp up if the session is
            # already expired (it then fires on the next batch)
            wm_ms = state.getCurrentWatermarkMs()
            timeout_ms = max((s_end + gap_us) // 1000, wm_ms + 1)
            state.setTimeoutTimestamp(timeout_ms)
        if closed:
            yield _emit(closed)

    return sessionize


def sessionize_stateful(
    events: DataFrame,
    gap_minutes: int = 30,
    timeout: bool = False,
    watermark: str = "2 hours",
) -> DataFrame:
    """Custom keyed-state sessionizer (see module docstring). ``events``
    must be a STREAMING DataFrame with ``ts timestamp, user_id bigint,
    value double`` columns."""
    df = events.withColumn("ts", F.col("ts").cast("timestamp"))
    conf = GroupStateTimeout.NoTimeout
    if timeout:
        # event-time timeouts are driven by the watermark clock
        df = df.withWatermark("ts", watermark)
        conf = GroupStateTimeout.EventTimeTimeout
    return (
        df.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_sessionizer(gap_minutes * _US_PER_MIN, timeout),
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            conf,
        )
    )
