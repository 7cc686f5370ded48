"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.9 'State' — the escape hatch for semantics the built-in
windows can't express).

``running_user_totals``: per-user running counters (events seen, value
accumulated) that emit an updated snapshot row every micro-batch the
user appears in, and a final row when the user goes idle past the
timeout. This is the canonical "profile accumulator" shape for
training-data pipelines (per-source document counters, per-domain
quotas) — state lives in the state store, sized by #active keys, not
by event volume.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("final", T.BooleanType()),
    ]
)


def _make_update(timeout_ms: int):
    def _update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            n, total = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, n, total, True)],
                columns=["user_id", "n_events", "total_value", "final"],
            )
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        state.setTimeoutDuration(timeout_ms)  # emit a final row when idle
        yield pd.DataFrame(
            [(user_id, n, total, False)],
            columns=["user_id", "n_events", "total_value", "final"],
        )

    return _update


def running_user_totals(events: DataFrame, timeout_ms: int = 3_600_000) -> DataFrame:
    """events(user_id, value, …) stream → running per-user snapshots.

    Grouped state keyed by user_id; Arrow batches in/out; processing-
    time timeout turns idle users into final rows after ``timeout_ms``.
    """
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_update(timeout_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
