"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no custom state machine — its only cross-run state is the
S3 listing itself (SURVEY.md §3.1). This module supplies the engine's
arbitrary-stateful primitive for operators that windows can't express: a
per-key running accumulator (events seen + value sum per user) that
survives across micro-batches via the state store.

Arrow-batched (applyInPandasWithState), not row-at-a-time — state transfer
is one pandas frame per key-group per batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def running_totals_per_user(events: DataFrame) -> DataFrame:
    """Per-user running (n_events, total_value) maintained in the state
    store across micro-batches; emits the updated totals for keys seen in
    each batch.

    The update function is a nested closure on purpose: cloudpickle ships
    closures BY VALUE, so Python workers never need this package on their
    import path — a module-level function is pickled by reference and
    breaks under any driver whose workers can't import
    canvas_data_aws_spark (e.g. stock session from a foreign cwd)."""

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
