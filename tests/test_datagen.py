import numpy as np
import pandas as pd

from dbus_spark.datagen import (
    TranscriptKnobs,
    generate_rows_events,
    generate_transcripts,
)


def test_determinism():
    a = generate_transcripts(n_convs=30, seed=7)
    b = generate_transcripts(n_convs=30, seed=7)
    pd.testing.assert_frame_equal(a, b)


def test_schema_and_invariants(transcripts_pd):
    df = transcripts_pd
    assert list(df.columns) == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts", "_arrival",
    ]
    uniq = df.drop_duplicates(["conv_id", "turn_idx"])
    # every conversation starts with a user turn and has contiguous idx
    first = uniq[uniq["turn_idx"] == 0]
    assert (first["role"] == "user").all()
    per_conv = uniq.groupby("conv_id")["turn_idx"]
    assert (per_conv.max() + 1 == per_conv.size()).all()
    # tool set only on tool turns
    assert (uniq["tool"].notna() == (uniq["role"] == "tool")).all()


def test_skew_and_duplicates(transcripts_pd):
    df = transcripts_pd
    uniq = df.drop_duplicates(["conv_id", "turn_idx"])
    hot_share = (uniq["conv_id"] == "conv00000000").mean()
    assert hot_share > 0.03  # hot-key fixture present
    n_dups = len(df) - len(uniq)
    assert 0 < n_dups <= int(0.02 * len(df))  # ~1% duplicate fixture


def test_arrival_out_of_order(transcripts_pd):
    df = transcripts_pd
    # arrival order differs from event-time order (the ooo fixture) ...
    assert not df["ts"].is_monotonic_increasing
    # ... and _arrival is sorted (stream replay order)
    assert (np.diff(df["_arrival"].to_numpy()) >= 0).all()


def test_no_late_knob():
    knobs = TranscriptKnobs(late_frac=0.0, dup_frac=0.0)
    df = generate_transcripts(n_convs=20, seed=3, knobs=knobs)
    assert len(df) == len(df.drop_duplicates(["conv_id", "turn_idx"]))


def test_rows_events_golden_row():
    df = generate_rows_events(n_events=50, seed=42)
    g = df.iloc[0]
    assert g["log"] == "mysql-bin.0001"
    assert g["pos"] == 498876
    assert g["db"] == "mydabase"
    assert g["dml"] == "I"
    assert g["rows"] == [["user", "15", "hello world"]]
    # update events carry [before, after] pairs
    ups = df[df["dml"] == "U"]
    assert all(len(r) == 2 for r in ups["rows"])
