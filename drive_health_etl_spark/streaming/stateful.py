"""Custom stateful streaming operator: per-key running aggregates via
``applyInPandasWithState`` (SURVEY.md §2.8 / guide's stateful pattern).

The reference keeps its only cross-request state in a module-global batch
queue (``src/batchProcessor.js:13-15``); the generalization a real tenant
pipeline needs is per-tenant running counters that survive micro-batches —
exactly Spark's arbitrary-stateful-processing surface. State is (count, sum,
max_ts) per key; each micro-batch emits the updated snapshot rows
('update'-style output through the append channel).

Scale notes: state lives in the state store partitioned by key (RocksDB
provider on a real cluster); one shuffle per batch on the grouping key; the
pandas function sees each key's batch rows as one DataFrame — Arrow-batched,
not per-row.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, last_ts timestamp"
STATE_SCHEMA = "n long, total double, last_ts timestamp"


def _update_user_state(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, last_ts = state.get
    else:
        n, total, last_ts = 0, 0.0, None
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
    state.update((n, total, last_ts))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total], "last_ts": [last_ts]}
    )


def stateful_user_counters(events_stream: DataFrame) -> DataFrame:
    """Streaming DataFrame (user_id, ts, value, ...) -> per-user running
    (count, sum, last_ts) snapshots, one row per key per micro-batch."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- transformWithState variant (Spark 4.x successor API) -------------------
# Same per-user counters through the typed-state processor surface: named
# state variables (ValueState here; List/MapState and timers are the API's
# other primitives), explicit lifecycle (init/handleInputRows/close), and
# RocksDB-backed state. This is the API new stateful operators should target;
# applyInPandasWithState above is kept as the stable/legacy twin.
#
# GATED: the transformWithState Python worker talks to the JVM state server
# over a protobuf channel, so running it requires the `google.protobuf`
# package (absent from this container — tests skip, and the operator is not
# in the query registry). On a cluster with protobuf installed,
# tws_user_counters is a drop-in replacement for stateful_user_counters.


class UserCounterProcessor:
    """StatefulProcessor: per-user (count, sum, last_ts) in a ValueState."""

    def init(self, handle) -> None:
        self._counters = handle.getValueState("counters", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        (user_id,) = key
        if self._counters.exists():
            n, total, last_ts = self._counters.get()
        else:
            n, total, last_ts = 0, 0.0, None
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_max = pdf["ts"].max()
            last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
        self._counters.update((n, total, last_ts))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "total_value": [total], "last_ts": [last_ts]}
        )

    def handleInitialState(self, key, initialState, timerValues) -> None:  # pragma: no cover
        pass

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):  # pragma: no cover
        yield from ()

    def close(self) -> None:
        pass


def tws_user_counters(events_stream: DataFrame) -> DataFrame:
    """transformWithStateInPandas twin of :func:`stateful_user_counters`.
    Requires the RocksDB state-store provider (the caller sets
    ``spark.sql.streaming.stateStore.providerClass``)."""
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    # Subclass at call time so importing this module never hard-depends on
    # the Spark 4 streaming API surface.
    # concrete methods must precede the ABC in the MRO or the class stays
    # abstract (abstractness resolves from the first definition found)
    proc = type("_Proc", (UserCounterProcessor, StatefulProcessor), {})()
    return events_stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
