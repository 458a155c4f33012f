import pandas as pd

from dbus_spark.operators import (
    correlate_user_tool,
    restore_order_batch,
    sessionize,
)
from tests import oracle_pd
from tests.conftest import assert_pdf_equal


def test_sessions_vs_oracle(spark, transcripts_df, transcripts_pd):
    deduped = restore_order_batch(transcripts_df)
    got = sessionize(deduped, gap="30 minutes").toPandas()
    exp = oracle_pd.expected_sessions(
        transcripts_pd.drop(columns=["_arrival"]), gap_s=1800
    )
    assert_pdf_equal(got, exp, ["conv_id", "session_start"])


def test_restore_order_per_turn_text_equality(
    spark, transcripts_df, transcripts_pd
):
    """The BASELINE.json invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering, duplicates removed."""
    got = (
        restore_order_batch(transcripts_df)
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    exp = oracle_pd.expected_ordered(
        transcripts_pd.drop(columns=["_arrival"])
    )
    pd.testing.assert_series_equal(
        got["text"].reset_index(drop=True),
        exp["text"].reset_index(drop=True),
    )
    assert_pdf_equal(got, exp, ["conv_id", "turn_idx"])


def test_join_vs_oracle(spark, transcripts_df, transcripts_pd):
    deduped = restore_order_batch(transcripts_df)
    got = correlate_user_tool(deduped, horizon="2 minutes").toPandas()
    exp = oracle_pd.expected_joined(
        transcripts_pd.drop(columns=["_arrival"]), horizon_s=120
    )
    assert_pdf_equal(
        got, exp, ["conv_id", "user_turn_idx", "tool_turn_idx"]
    )
