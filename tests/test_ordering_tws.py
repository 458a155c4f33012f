"""Unit tests for the transformWithState ordering processor: the wire
protocol is environment-gated (no protobuf in this sandbox — see the
module docstring), but the state TRANSITION logic runs fine against
fake in-memory state handles, so ordering/dedup/timer semantics are
pinned here; an integration test skips visibly like the Kafka one."""

import pandas as pd
import pytest

from dbus_spark.operators.ordering_tws import (
    _COLS,
    _OrderedTurnsProcessor,
    ordered_turns_tws,
)


class FakeValueState:
    def __init__(self):
        self._v = None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None


class FakeListState:
    def __init__(self):
        self._rows = []

    def get(self):
        return iter(list(self._rows))

    def put(self, rows):
        rows = list(rows)
        if not rows:
            # mirror Spark's ListStateImpl: put([]) throws
            # ILLEGAL_STATE_STORE_VALUE.EMPTY_LIST_VALUE — the fake
            # must reject it too or the unit tests cannot catch the
            # crash a real cluster would hit (review finding)
            raise ValueError("empty list value is not allowed")
        self._rows = rows

    def clear(self):
        self._rows = []


class FakeHandle:
    def __init__(self):
        self.states = {}
        self.timers = set()

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, FakeValueState())

    def getListState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, FakeListState())

    def registerTimer(self, ts):
        self.timers.add(ts)

    def deleteTimer(self, ts):
        self.timers.discard(ts)


class FakeTimerValues:
    def __init__(self, wm):
        self._wm = wm

    def getCurrentWatermarkInMs(self):
        return self._wm


class FakeExpiredTimerInfo:
    def __init__(self, ts):
        self._ts = ts

    def getExpiryTimeInMs(self):
        return self._ts


def _rows(idxs):
    return pd.DataFrame(
        {
            "conv_id": "c1",
            "turn_idx": pd.array(idxs, dtype="int32"),
            "role": "user",
            "text": [f"t{i}" for i in idxs],
            "tool": None,
            "ts": pd.Timestamp("2026-01-01"),
        }
    )


def _mk():
    p = _OrderedTurnsProcessor(flush_after_ms=1_000)
    h = FakeHandle()
    p.init(h)
    return p, h


def _feed(p, idxs, wm=0):
    out = list(p.handleInputRows(("c1",), iter([_rows(idxs)]), FakeTimerValues(wm)))
    # typed empty frame: a dtype-less placeholder in a later concat
    # hits pandas' changing empty/all-NA concat semantics (the same
    # guard production code carries in ordering._advance_bucket)
    return (
        pd.concat(out, ignore_index=True)
        if out
        else _rows([]).iloc[0:0][["conv_id", *_COLS]]
    )


def test_contiguous_emission_and_buffering():
    p, h = _mk()
    got = _feed(p, [0, 2, 1, 4])
    assert list(got["turn_idx"]) == [0, 1, 2]  # contiguous prefix only
    got = _feed(p, [3], wm=500)
    assert list(got["turn_idx"]) == [3, 4]  # gap closed, buffer drains
    # the wm advanced, so the new deadline differs and the old timer
    # must have been DELETED, not leaked (a stale timer would fire
    # early and clear live state on a real cluster)
    assert h.timers == {1_500}


def test_redelivery_is_filtered():
    p, h = _mk()
    _feed(p, [0, 1])
    got = _feed(p, [1, 0, 2])  # redeliveries + one new
    assert list(got["turn_idx"]) == [2]


def test_timer_flushes_suffix_in_order_and_forgets():
    p, h = _mk()
    _feed(p, [0, 3, 5, 4])
    out = list(
        p.handleExpiredTimer(("c1",), FakeTimerValues(10_000), FakeExpiredTimerInfo(1_000))
    )
    flushed = pd.concat(out, ignore_index=True)
    assert list(flushed["turn_idx"]) == [3, 4, 5]  # suffix in index order
    assert h.states["meta"].get() is None  # key forgotten
    assert list(h.states["pending"].get()) == []


def test_equivalence_with_bucketed_core_on_random_sequences():
    """The TWS processor and the bucketed _advance_bucket/_flush_expired
    core must emit identical row sets for the same arrival sequence."""
    from dbus_spark.operators.ordering import (
        _advance_bucket,
        _empty_meta,
        _empty_pending,
        _flush_expired,
    )

    import numpy as np

    rng = np.random.default_rng(5)
    seq = list(rng.permutation(12))
    batches = [seq[:4], seq[4:9], seq[9:]]

    p, h = _mk()
    tws_rows = []
    for b in batches:
        got = _feed(p, b)
        if len(got):
            tws_rows.append(got)
    out = list(
        p.handleExpiredTimer(("c1",), FakeTimerValues(10_000), FakeExpiredTimerInfo(1_000))
    )
    tws_rows += out
    tws = pd.concat(tws_rows, ignore_index=True)

    meta, pending = _empty_meta(), _empty_pending()
    bk_rows = []
    for b in batches:
        new = _rows(b)
        emit, meta, pending = _advance_bucket(meta, pending, new, 60_000)
        if len(emit):
            bk_rows.append(emit)
    flushed, meta, pending = _flush_expired(meta, pending, 120_000)
    if len(flushed):
        bk_rows.append(flushed)
    bk = pd.concat(bk_rows, ignore_index=True)

    t = tws.sort_values("turn_idx")["turn_idx"].tolist()
    k = bk.sort_values("turn_idx")["turn_idx"].tolist()
    assert t == k == sorted(seq)


def test_tws_operator_gated_without_protobuf(spark):
    """Integration is environment-gated exactly like Kafka: without
    protobuf the operator raises a clear ImportError naming the
    dependency; on a protobuf-equipped cluster this test would instead
    exercise the streaming query end to end."""
    try:
        import google.protobuf  # noqa: F401

        pytest.skip("protobuf present: run the full integration instead")
    except ImportError:
        pass
    df = spark.createDataFrame(
        [], "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp"
    )
    with pytest.raises(ImportError, match="protobuf"):
        ordered_turns_tws(df)
