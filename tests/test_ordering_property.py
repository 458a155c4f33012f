"""Property-based test of the ordering state machine's vectorized core
(`_advance_bucket` / `_flush_expired`) — pure pandas, no Spark.

The reference's behavioral queue tests (pkg/batcher/disruptor_test.go)
pin put/succeed/fail/rewind sequences; the analog invariant here: for
ANY arrival order, duplication pattern and micro-batch split of a set
of conversations, the bucket state machine emits every turn exactly
once, in contiguous turn_idx order per conversation, with the
out-of-order suffix flushed (in order) when the deadline passes.
"""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from dbus_spark.operators.ordering import (
    _advance_bucket,
    _empty_meta,
    _empty_pending,
    _flush_expired,
)


def _mk_rows(conv: str, idxs: list[int]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "conv_id": conv,
            "turn_idx": pd.array(idxs, dtype="int64"),
            "role": "user",
            "text": [f"{conv}-t{i}" for i in idxs],
            "tool": None,
            "ts": pd.Timestamp("2026-01-01"),
        }
    )


convs_strategy = st.dictionaries(
    keys=st.text(
        alphabet="abcdefgh", min_size=1, max_size=3
    ),
    values=st.integers(min_value=1, max_value=12),  # n_turns per conv
    min_size=1,
    max_size=5,
)


@settings(max_examples=60, deadline=None)
@given(
    convs=convs_strategy,
    data=st.data(),
)
def test_any_arrival_order_emits_exactly_once_in_order(convs, data):
    # one global multiset of rows: every turn once, plus some dups
    rows = []
    for conv, n in convs.items():
        order = data.draw(
            st.permutations(list(range(n))), label=f"order-{conv}"
        )
        rows.extend((conv, i) for i in order)
        dup_count = data.draw(
            st.integers(0, min(3, n)), label=f"dups-{conv}"
        )
        for d in range(dup_count):
            rows.append((conv, order[d % n]))
    arrival = data.draw(st.permutations(rows), label="arrival")

    # split the arrival sequence into 1-5 micro-batches
    n_batches = data.draw(st.integers(1, 5), label="n_batches")
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(0, len(arrival)),
                min_size=n_batches - 1,
                max_size=n_batches - 1,
            ),
            label="cuts",
        )
    )
    batches, prev = [], 0
    for c in [*cuts, len(arrival)]:
        batches.append(arrival[prev:c])
        prev = c

    meta, pending = _empty_meta(), _empty_pending()
    emitted = []
    wm = 0
    for batch in batches:
        if not batch:
            continue
        new = pd.concat(
            [_mk_rows(c, [i]) for (c, i) in batch], ignore_index=True
        )
        emit, meta, pending = _advance_bucket(meta, pending, new, wm + 60_000)
        if len(emit):
            emitted.append(emit)
        flushed, meta, pending = _flush_expired(meta, pending, wm)
        if len(flushed):
            emitted.append(flushed)
    # end of stream: watermark passes every deadline
    flushed, meta, pending = _flush_expired(meta, pending, wm + 120_000)
    if len(flushed):
        emitted.append(flushed)

    got = (
        pd.concat(emitted, ignore_index=True)
        if emitted
        else _empty_pending()
    )
    assert len(meta) == 0 and len(pending) == 0  # nothing left behind
    # exactly once
    assert got.duplicated(["conv_id", "turn_idx"]).sum() == 0
    assert len(got) == sum(convs.values())
    for conv, n in convs.items():
        g = got[got["conv_id"] == conv]
        # in contiguous order within each conversation's emissions
        assert list(g["turn_idx"]) == sorted(g["turn_idx"])
        assert sorted(g["turn_idx"]) == list(range(n))
        # per-turn text equality
        assert (g["text"] == g["turn_idx"].map(lambda i: f"{conv}-t{i}")).all()


# --- bounded bucket state (_force_flush) --------------------------------

from dbus_spark.operators.ordering import _force_flush  # noqa: E402


def test_force_flush_noop_under_cap():
    meta, pending = _empty_meta(), _empty_pending()
    new = _mk_rows("a", [5, 6])  # gap at 0 -> all pending
    _, meta, pending = _advance_bucket(meta, pending, new, 60_000)
    emit, meta2, pending2 = _force_flush(meta, pending, cap=10)
    assert len(emit) == 0
    pd.testing.assert_frame_equal(pending, pending2)


def test_force_flush_evicts_oldest_deadline_first():
    meta, pending = _empty_meta(), _empty_pending()
    # conv a: old deadline, 3 buffered; conv b: newer deadline, 4 buffered
    _, meta, pending = _advance_bucket(
        meta, pending, _mk_rows("a", [2, 3, 4]), 1_000
    )
    _, meta, pending = _advance_bucket(
        meta, pending, _mk_rows("b", [5, 6, 7, 8]), 9_000
    )
    assert len(pending) == 7
    # need to shed 2 rows -> oldest (a, 3 rows) is the minimal prefix
    emit, meta, pending = _force_flush(meta, pending, cap=5)
    assert list(emit["conv_id"].unique()) == ["a"]
    assert list(emit["turn_idx"]) == [2, 3, 4]  # suffix in index order
    # meta KEPT, frontier advanced past the flushed suffix: redelivered
    # already-emitted turns stay filtered (exactly-once survives)
    assert meta.loc["a", "next_idx"] == 5 and len(pending) == 4


def test_force_flush_single_hot_conversation_bounded():
    """A single conversation flooding rows behind a never-closing gap
    cannot grow the blob past the cap: the whole conversation flushes."""
    meta, pending = _empty_meta(), _empty_pending()
    _, meta, pending = _advance_bucket(
        meta, pending, _mk_rows("hot", list(range(1, 1001))), 60_000
    )
    assert len(pending) == 1000
    emit, meta, pending = _force_flush(meta, pending, cap=100)
    assert len(emit) == 1000 and len(pending) == 0
    assert list(emit["turn_idx"]) == list(range(1, 1001))
    assert meta.loc["hot", "next_idx"] == 1001


@settings(max_examples=40, deadline=None)
@given(convs=convs_strategy, data=st.data(), cap=st.integers(1, 8))
def test_capped_stream_never_duplicates_and_bounds_buffer(convs, data, cap):
    """With the pending cap enforced after every batch: NO (conv, turn)
    ever emits twice (the hard guarantee), the buffer never exceeds the
    cap, and conversations that were never force-flushed still emit
    every turn. Force-flushed conversations may drop gap turns that
    straggle in after their flush (documented at-most-once degradation
    for floods) — never duplicate."""
    rows = []
    for conv, n in convs.items():
        order = data.draw(st.permutations(list(range(n))), label=f"o-{conv}")
        rows.extend((conv, i) for i in order)
    arrival = data.draw(st.permutations(rows), label="arrival")
    n_batches = data.draw(st.integers(1, 4), label="n_batches")
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(0, len(arrival)),
                min_size=n_batches - 1,
                max_size=n_batches - 1,
            ),
            label="cuts",
        )
    )
    batches, prev = [], 0
    for c in [*cuts, len(arrival)]:
        batches.append(arrival[prev:c])
        prev = c

    meta, pending = _empty_meta(), _empty_pending()
    emitted = []
    force_flushed_convs = set()
    for batch in batches:
        if not batch:
            continue
        new = pd.concat(
            [_mk_rows(c, [i]) for (c, i) in batch], ignore_index=True
        )
        emit, meta, pending = _advance_bucket(meta, pending, new, 60_000)
        if len(emit):
            emitted.append(emit)
        forced, meta, pending = _force_flush(meta, pending, cap)
        if len(forced):
            emitted.append(forced)
            force_flushed_convs.update(forced["conv_id"].unique())
        assert len(pending) <= cap  # the blob bound
    flushed, meta, pending = _flush_expired(meta, pending, 120_000)
    if len(flushed):
        emitted.append(flushed)

    got = (
        pd.concat(emitted, ignore_index=True) if emitted else _empty_pending()
    )
    assert got.duplicated(["conv_id", "turn_idx"]).sum() == 0  # NEVER dups
    for conv, n in convs.items():
        g = sorted(got[got["conv_id"] == conv]["turn_idx"])
        if conv not in force_flushed_convs:
            assert g == list(range(n))  # untouched convs: complete
        else:
            assert set(g) <= set(range(n))  # flooded: subset, no dups


def test_force_flush_keeps_frontier_so_redelivery_stays_filtered():
    """The exactly-once hole a review found: force-flush must NOT drop
    the conversation's frontier while the watermark is still behind —
    a redelivered already-emitted turn would re-enter at next_idx=0 and
    emit twice. The frontier survives the flush and filters it."""
    meta, pending = _empty_meta(), _empty_pending()
    _, meta, pending = _advance_bucket(
        meta, pending, _mk_rows("x", list(range(1, 11))), 60_000
    )
    emit, meta, pending = _force_flush(meta, pending, cap=5)
    assert list(emit["turn_idx"]) == list(range(1, 11))
    # redelivery of already-emitted turns 3 and 4 (watermark still 0)
    emit2, meta, pending = _advance_bucket(
        meta, pending, _mk_rows("x", [3, 4]), 60_000
    )
    assert len(emit2) == 0 and len(pending) == 0  # filtered, not re-emitted
    # a genuinely new later turn still flows (in-order from the frontier)
    emit3, meta, pending = _advance_bucket(
        meta, pending, _mk_rows("x", [11]), 60_000
    )
    assert list(emit3["turn_idx"]) == [11]
