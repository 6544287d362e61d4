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
