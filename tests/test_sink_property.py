"""Property-based test of the idempotent sink's exactly-once claim.

The reference documents that its batcher REWINDS whole batches on
failure and redelivers (pkg/batcher/disruptor.go:110-142), i.e. any
interleaving of first-deliveries, same-epoch replays and cross-epoch
re-emissions can reach the sink. Invariant: whatever the sequence,
the sink ends with every delivered key exactly once.
"""

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dbus_spark.sinks import IdempotentKeyedSink

# an "op" is (epoch, keys-in-that-delivery); epochs may repeat
# (same-epoch replay) and keys may reappear in later epochs
# (cross-epoch redelivery)
ops_strategy = st.lists(
    st.tuples(
        st.integers(0, 3),  # epoch id
        st.lists(st.integers(0, 9), min_size=1, max_size=5),  # keys
    ),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=ops_strategy)
def test_any_delivery_sequence_lands_exactly_once(
    spark, tmp_path_factory, ops
):
    root = tmp_path_factory.mktemp("sinkprop")
    sink = IdempotentKeyedSink(
        str(root / "out"), keys=["conv_id", "turn_idx"]
    )
    delivered: set[tuple[str, int]] = set()
    first_epoch_payload: dict[int, list] = {}
    for epoch, keys in ops:
        rows = [("c%d" % (k % 3), k, f"text-{k}") for k in keys]
        if epoch in first_epoch_payload:
            # the disruptor rewind: a replayed epoch redelivers its
            # ORIGINAL batch (same bytes), not new data
            rows = first_epoch_payload[epoch]
        else:
            first_epoch_payload[epoch] = rows
        df = spark.createDataFrame(
            rows, ["conv_id", "turn_idx", "text"]
        )
        sink.write_batch(df, epoch)
        delivered.update((r[0], r[1]) for r in rows)
    got = sink.read(spark).toPandas()
    assert got.duplicated(["conv_id", "turn_idx"]).sum() == 0
    got_keys = set(zip(got["conv_id"], got["turn_idx"]))
    assert got_keys == delivered
