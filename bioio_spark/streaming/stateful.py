"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY §2.10 — the arbitrary-state surface the built-in windows can't
express).

Scale: state lives in the state store partitioned by the grouping key across
executors; each micro-batch touches only the keys present in that batch.
Arrow batches carry the rows, so the Python worker cost is per-batch, not
per-row. Timeouts (processing- or event-time) bound state growth for keys
that go quiet — the streaming analog of watermark eviction.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

USER_TOTALS_SCHEMA = "user_id long, n_events long, total_value double"
_STATE_SCHEMA = "n long, total double"


def _user_totals_fn(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]})


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) maintained incrementally across
    micro-batches — the canonical custom stateful aggregate. Each trigger
    emits the updated running totals for the users seen in that batch
    (update output mode); the final emission per user equals the batch
    groupBy aggregate, which is what the test pins."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _user_totals_fn,
            outputStructType=USER_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


from pyspark.sql.streaming import StatefulProcessor  # noqa: E402


class UserTotalsProcessor(StatefulProcessor):
    """StatefulProcessor for transformWithStateInPandas — the Spark 4
    arbitrary-state API (typed state variables managed by the handle,
    replacing applyInPandasWithState's single state tuple). Same semantics
    as _user_totals_fn: per-user running (count, sum), one emission per
    (user, micro-batch) in update mode."""

    def init(self, handle) -> None:
        from pyspark.sql.types import (DoubleType, LongType, StructField,
                                       StructType)

        self._state = handle.getValueState(
            "totals",
            StructType([StructField("n", LongType()),
                        StructField("total", DoubleType())]))

    def handleInputRows(self, key, rows, timerValues):
        n, total = (self._state.get() if self._state.exists()
                    else (0, 0.0))
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        self._state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]})

    def close(self) -> None:
        pass


def stateful_user_totals_tws(events: DataFrame) -> DataFrame:
    """transformWithStateInPandas twin of stateful_user_totals: identical
    output contract, new-API state management (value state + timers +
    TTL available through the handle).

    Requires protobuf at runtime (the API's state-server protocol);
    environments without it should use stateful_user_totals."""
    return (
        events.groupBy("user_id")
        .transformWithStateInPandas(
            UserTotalsProcessor(),
            outputStructType=USER_TOTALS_SCHEMA,
            outputMode="update",
            timeMode="None",
        )
    )
