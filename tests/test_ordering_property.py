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
