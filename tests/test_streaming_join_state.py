"""Streaming-mode coverage for the stream-stream interval join and
checkpoint recovery of the per-conversation ordering state."""

import os
import time

import pandas as pd

from dbus_spark.datagen import (
    TranscriptKnobs,
    generate_transcripts,
    write_stream_batches,
)
from dbus_spark.operators import correlate_user_tool, ordered_turns_stream
from dbus_spark.sources import transcript_file_stream
from tests import oracle_pd


def test_stream_stream_interval_join(spark, tmp_path):
    """user turns ⋈ tool turns on a stream, watermarks on both sides.

    The final result must equal the batch join on the full input —
    every pair completes because tool_ts is within the horizon of its
    user turn and both sides see all data before the query drains.
    """
    knobs = TranscriptKnobs(late_frac=0.0, dup_frac=0.0)
    pdf = generate_transcripts(n_convs=25, seed=21, knobs=knobs)
    write_stream_batches(pdf, str(tmp_path / "in"), n_files=3)
    src = transcript_file_stream(spark, str(tmp_path / "in"), 1)
    joined = correlate_user_tool(
        src, horizon="2 minutes", watermark="10 minutes"
    )
    collected = []
    q = (
        joined.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .foreachBatch(lambda df, bid: collected.append(df.toPandas()))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)
    got = pd.concat(collected, ignore_index=True)
    exp = oracle_pd.expected_joined(
        pdf.drop(columns=["_arrival"]), horizon_s=120
    )
    # stream-stream inner join in append mode emits a pair once both
    # sides arrived; with no late data all pairs must appear exactly once
    key = ["conv_id", "user_turn_idx", "tool_turn_idx"]
    assert got.duplicated(key).sum() == 0
    g = got[key].sort_values(key).reset_index(drop=True)
    e = exp[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        g, e, check_dtype=False
    )


def test_ordered_state_survives_kill_resume(spark, tmp_path):
    """Kill the stateful ordering query mid-stream; resume must restore
    per-conversation state from the checkpoint and still emit every
    turn exactly once in order (positional checkpoint parity —
    reference: pkg/checkpoint/store/zk/checkpoint_test.go:28-47)."""
    knobs = TranscriptKnobs(late_frac=0.0, dup_frac=0.02)
    pdf = generate_transcripts(n_convs=20, seed=31, knobs=knobs)
    in_dir = tmp_path / "in"
    write_stream_batches(pdf, str(in_dir), n_files=4)
    far = pdf["ts"].max() + pd.Timedelta(hours=2)
    from tests.test_streaming import _sentinel

    _sentinel(far).to_parquet(in_dir / "batch-90000.parquet", index=False)
    _sentinel(far + pd.Timedelta(minutes=1)).to_parquet(
        in_dir / "batch-90001.parquet", index=False
    )

    out_dir = tmp_path / "out"

    def start():
        src = transcript_file_stream(spark, str(in_dir), 1)
        ordered = ordered_turns_stream(
            src, watermark="10 minutes", flush_after_ms=1_000
        )
        return (
            ordered.writeStream.outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .format("parquet")
            .option("path", str(out_dir))
            .start()
        )

    q = start()
    # kill after at least one batch committed
    while not os.path.isdir(tmp_path / "ck" / "commits") or not [
        f
        for f in os.listdir(tmp_path / "ck" / "commits")
        if f.isdigit()
    ]:
        time.sleep(0.2)
    q.stop()
    q.awaitTermination(60)

    q = start()
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)

    got = (
        spark.read.parquet(str(out_dir))
        .filter("conv_id <> 'zzz_sentinel'")
        .toPandas()
    )
    exp = oracle_pd.expected_ordered(pdf.drop(columns=["_arrival"]))
    assert got.duplicated(["conv_id", "turn_idx"]).sum() == 0
    assert len(got) == len(exp)
    g = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_series_equal(
        g["text"], exp["text"], check_names=False
    )
