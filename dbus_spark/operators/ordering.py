"""Per-conversation ordering + dedup — the engine's keyed state machine.

Re-creates, in event-stream terms, what the reference achieves with its
transaction-boundary commit gate (only checkpoint at safe replay
points — reference: pkg/myslave/myslave.go:118-150) and its declared-
but-empty dedup store (pkg/idempotent/repository.go:1-5): downstream
consumers see each conversation's turns exactly once, in ``turn_idx``
order, regardless of arrival order or redelivery.

Batch path: window-function dedup (pure Catalyst, no Python).
Streaming path: ``applyInPandasWithState`` keyed on ``conv_id`` with
event-time timeout. The state machine body is vectorized pandas/numpy
(mask + sort + contiguous-prefix detection) — no per-row Python loop,
per the input_hint mandate. State per key is O(pending): the contiguous
emission frontier plus only the out-of-order buffer, never the turn
history (SURVEY.md §7.4 risk 2), so state stays bounded by the
out-of-order horizon even on 10^12-turn inputs.
"""

from __future__ import annotations

import io
from typing import Iterable

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

OUT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)
_STATE_SCHEMA = "next_idx int, pending string"
_COLS = ["turn_idx", "role", "text", "tool", "ts"]


def restore_order_batch(
    df: DataFrame, key: str = "conv_id", order: str = "turn_idx"
) -> DataFrame:
    """Dedup redelivered turns and restore per-key order (batch).

    One row per (key, order): redeliveries are byte-identical copies in
    the fixture, so keeping the earliest-arriving copy is sufficient.
    Catalyst plans this as a single shuffle on the grouping key; at
    scale, pre-bucketing the table by ``conv_id`` removes even that.
    """
    w = Window.partitionBy(key, order).orderBy(F.col("ts"))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def dedup_within_watermark(
    df: DataFrame,
    keys: list[str] | None = None,
    ts: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming dedup bounded by the watermark horizon — implements
    what the reference only declared (idempotent.Repository)."""
    return df.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(
        keys or ["conv_id", "turn_idx"]
    )


# --- vectorized pending-buffer (de)serialization ----------------------


def _ser(pending: pd.DataFrame) -> str:
    """Pending buffer → JSON string for the state store. Timestamps go
    as int64 micros (exact round trip)."""
    if pending.empty:
        return ""
    out = pending[_COLS].copy()
    out["ts"] = out["ts"].astype("datetime64[us]").astype("int64")
    return out.to_json(orient="split", index=False)


def _deser(blob: str) -> pd.DataFrame:
    if not blob:
        return pd.DataFrame(columns=_COLS)
    pdf = pd.read_json(io.StringIO(blob), orient="split")
    pdf.columns = _COLS
    pdf["ts"] = pdf["ts"].astype("int64").astype("datetime64[us]")
    return pdf


def _advance(
    next_idx: int, pending: pd.DataFrame, new: pd.DataFrame | None
) -> tuple[int, pd.DataFrame, pd.DataFrame]:
    """Core state transition, fully vectorized: merge the buffer with
    new rows, drop duplicates/already-emitted turns, emit the
    contiguous run starting at next_idx. Returns (next_idx', emit,
    pending')."""
    frames = [pending] if not pending.empty else []
    if new is not None and len(new):
        frames.append(new[_COLS])
    if not frames:
        return next_idx, pending.iloc[0:0], pending
    allp = pd.concat(frames, ignore_index=True)
    allp = allp[allp["turn_idx"] >= next_idx]
    allp = allp.drop_duplicates("turn_idx").sort_values("turn_idx")
    idxs = allp["turn_idx"].to_numpy()
    contiguous = idxs == (next_idx + np.arange(len(idxs)))
    k = int(contiguous.argmin()) if not contiguous.all() else len(idxs)
    emit = allp.iloc[:k]
    rest = allp.iloc[k:]
    new_next = int(idxs[k - 1]) + 1 if k > 0 else next_idx
    return new_next, emit, rest


def _make_state_fn(timeout_ms: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state
    ) -> Iterable[pd.DataFrame]:
        (conv_id,) = key
        if state.hasTimedOut:
            # the watermark passed this key's horizon: late gaps are
            # not coming — flush the buffer in index order
            next_idx, blob = state.get
            pending = _deser(blob).sort_values("turn_idx")
            state.remove()
            if len(pending):
                yield pending.assign(conv_id=conv_id)[
                    ["conv_id", *_COLS]
                ]
            return

        if state.exists:
            next_idx, blob = state.get
            pending = _deser(blob)
        else:
            next_idx, pending = 0, pd.DataFrame(columns=_COLS)

        chunks = [p for p in pdfs if len(p)]
        new = (
            pd.concat(chunks, ignore_index=True) if chunks else None
        )
        next_idx, emit, pending = _advance(next_idx, pending, new)
        state.update((next_idx, _ser(pending)))
        # evict the key when the event-time watermark passes its horizon
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + timeout_ms)
        if len(emit):
            yield emit.assign(conv_id=conv_id)[["conv_id", *_COLS]]

    return fn


def ordered_turns_stream(
    df: DataFrame,
    watermark: str = "10 minutes",
    flush_after_ms: int = 60_000,
) -> DataFrame:
    """Streaming ordered+deduped turn stream (per-turn text equality).

    Emits each conversation's turns in contiguous ``turn_idx`` order as
    they become complete; on event-time timeout (watermark + grace) any
    still-buffered out-of-order suffix is flushed in index order.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        df.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _make_state_fn(flush_after_ms),
            outputStructType=OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
