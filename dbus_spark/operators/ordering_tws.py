"""Per-conversation ordering/dedup on the transformWithState API.

The forward-path twin of ``ordering.ordered_turns_stream``: Spark 4's
``transformWithStateInPandas`` gives typed per-key state cells
(ValueState/ListState in the state store, not one opaque blob) and
real per-key event-time timers, so the operator is written in its
natural per-CONVERSATION form — no bucket coarsening, no pickled
bucket blob, no force-flush cap: the store rewrites only the cells of
keys touched in a batch, which is exactly the write-amplification
property the bucketed op's sizing rules exist to approximate.

Semantics are identical to the bucketed operator (equivalence-tested):
emit each conversation's turns in contiguous ``turn_idx`` order,
dedup redeliveries, and when the watermark passes the conversation's
flush deadline (last activity + grace) emit the buffered out-of-order
suffix in index order and forget the key.

Trade-off vs the bucketed op: per-key machinery (one python call +
state round-trip per conversation per batch) costs more per active
conversation; the bucketed op amortizes it and stays the hot path for
extreme key counts per batch, while this form has strictly better
state-store write behavior (only touched keys rewrite) and simpler
code.

ENVIRONMENT GATE: transformWithState's python state protocol needs
``google.protobuf``, which this sandbox lacks (and installs are
forbidden) — ``ordered_turns_tws`` raises a clear ImportError here
and runs on any standard cluster (protobuf ships with every
requirements-complete Spark 4 deployment). The processor's state
transition logic itself is fully unit-tested against fake state
handles (tests/test_ordering_tws.py); only the wire protocol is
environment-gated, exactly like the Kafka connector.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from dbus_spark.operators.ordering import OUT_SCHEMA

_PENDING_SCHEMA = (
    "turn_idx int, role string, text string, tool string, ts timestamp"
)
_META_SCHEMA = "next_idx int, deadline long"
_COLS = ["turn_idx", "role", "text", "tool", "ts"]


class _OrderedTurnsProcessor(StatefulProcessor):
    def __init__(self, flush_after_ms: int):
        self._flush_after_ms = flush_after_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._meta = handle.getValueState("meta", _META_SCHEMA)
        self._pending = handle.getListState("pending", _PENDING_SCHEMA)

    def _emit(self, conv_id, frame: pd.DataFrame):
        out = frame[_COLS].copy()
        out.insert(0, "conv_id", conv_id)
        return out

    def handleInputRows(self, key, rows, timerValues):
        conv_id = key[0]
        wm = timerValues.getCurrentWatermarkInMs()
        new = pd.concat(list(rows), ignore_index=True)

        prev = self._meta.get()
        next_idx = int(prev[0]) if prev else 0
        old_deadline = int(prev[1]) if prev else None

        pend_rows = list(self._pending.get())
        if pend_rows:
            pend = pd.DataFrame(pend_rows, columns=_COLS)
            allp = pd.concat([pend, new[_COLS]], ignore_index=True)
        else:
            allp = new[_COLS]
        allp = allp.sort_values("turn_idx", kind="stable").drop_duplicates(
            "turn_idx"
        )
        allp = allp[allp["turn_idx"] >= next_idx]

        # contiguous-prefix emission from the frontier
        idx = allp["turn_idx"].to_numpy()
        n_emit = 0
        while n_emit < len(idx) and idx[n_emit] == next_idx + n_emit:
            n_emit += 1
        emit, rest = allp.iloc[:n_emit], allp.iloc[n_emit:]

        deadline = wm + self._flush_after_ms
        self._meta.update((next_idx + n_emit, deadline))
        if len(rest):
            self._pending.put(
                [tuple(r) for r in rest[_COLS].itertuples(index=False)]
            )
        else:
            # Spark's ListState.put rejects empty lists
            # (ILLEGAL_STATE_STORE_VALUE.EMPTY_LIST_VALUE) — clear is
            # the empty-buffer form (review finding; the fake handle in
            # tests now mirrors the rejection so this can't regress)
            self._pending.clear()
        if old_deadline is not None and old_deadline != deadline:
            self._handle.deleteTimer(old_deadline)
        self._handle.registerTimer(deadline)
        if n_emit:
            yield self._emit(conv_id, emit)

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        conv_id = key[0]
        pend_rows = list(self._pending.get())
        self._pending.clear()
        self._meta.clear()
        if pend_rows:
            pend = pd.DataFrame(pend_rows, columns=_COLS).sort_values(
                "turn_idx", kind="stable"
            )
            yield self._emit(conv_id, pend)

    def close(self) -> None:
        pass


def ordered_turns_tws(
    df: DataFrame,
    watermark: str = "10 minutes",
    flush_after_ms: int = 60_000,
) -> DataFrame:
    """Streaming ordered+deduped turn stream on transformWithState —
    identical output contract to ``ordered_turns_stream`` (see module
    docstring for the trade-off and the protobuf environment gate)."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas requires the protobuf package "
            "(Spark's python state-server protocol); not present in "
            "this environment — use ordering.ordered_turns_stream, or "
            "run on a cluster with protobuf installed"
        ) from e
    return (
        df.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .transformWithStateInPandas(
            _OrderedTurnsProcessor(flush_after_ms),
            outputStructType=OUT_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )
