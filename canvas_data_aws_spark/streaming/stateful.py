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
    TimestampType,
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


USER_PROFILE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("first_ts", TimestampType()),
    ]
)


def user_profile_transform_with_state(events: DataFrame) -> DataFrame:
    """Per-user running profile (count, value sum, first-seen timestamp)
    via ``transformWithStateInPandas`` — Spark 4's successor to
    applyInPandasWithState: state is named TYPED variables fetched from a
    handle (ValueState here; ListState/MapState and timers exist for
    richer machines) instead of one opaque tuple, and the processor is an
    object with an explicit lifecycle (init/handleInputRows/close).

    Scale shape is identical to the old API: one groupBy exchange, state
    store partitioned by key, Arrow-batched transfer. The processor class
    is defined inside this factory so cloudpickle ships it BY VALUE —
    a module-level class pickles by reference and breaks on workers that
    can't import this package (same reasoning as running_totals_per_user).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Profile(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "profile", "n BIGINT, total DOUBLE, first_us BIGINT"
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            if self._state.exists():
                n, total, first_us = self._state.get()
            else:
                n, total, first_us = 0, 0.0, None
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                batch_first = int(pdf["ts"].min().value // 1_000)
                first_us = batch_first if first_us is None else min(first_us, batch_first)
            self._state.update((n, total, first_us))
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                    "first_ts": [pd.Timestamp(first_us * 1_000)],
                }
            )

        def close(self) -> None:
            """API-mandated teardown hook: this processor holds no resources
            outside the handle-managed state store, so shutdown only logs.
            Anything raised here would fail the task visibly — nothing is
            swallowed."""
            import logging

            logging.getLogger(__name__).debug("user_profile processor closed")

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_Profile(),
        outputStructType=USER_PROFILE_SCHEMA,
        outputMode="update",
        timeMode="none",
    )


def _tws_runtime_available() -> bool:
    """transformWithStateInPandas drives its state protocol over protobuf;
    without the google.protobuf package the streaming Python runner dies at
    init (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE). Same gate
    pattern as the optional PIL decode in operators/multimodal.py."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def user_profile_stateful(events: DataFrame) -> DataFrame:
    """Per-user running (count, value-sum, first-seen ts): the Spark 4
    typed-state API (:func:`user_profile_transform_with_state`) when its
    protobuf runtime exists, else a semantically identical
    applyInPandasWithState fallback — callers get the same output schema
    and values either way."""
    if _tws_runtime_available():
        return user_profile_transform_with_state(events)

    def _update(key, pdfs, state):
        (user_id,) = key
        n, total, first_us = state.get if state.exists else (0, 0.0, None)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_first = int(pdf["ts"].min().value // 1_000)
            first_us = batch_first if first_us is None else min(first_us, batch_first)
        state.update((n, total, first_us))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [round(total, 2)],
                "first_ts": [pd.Timestamp(first_us * 1_000)],
            }
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=USER_PROFILE_SCHEMA,
        stateStructType="n BIGINT, total DOUBLE, first_us BIGINT",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
