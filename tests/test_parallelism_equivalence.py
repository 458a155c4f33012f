"""SURVEY.md §5 item 4: the same input must give identical sorted
output at different parallelism levels (the analog of the reference's
rebalance-correctness checks). We vary partitioning aggressively
within one session — results must come from data, never from partition
count or iteration order (SURVEY.md §7.4 risk 1)."""

import pandas as pd
from pyspark.sql import functions as F

from dbus_spark.operators import (
    correlate_user_tool,
    restore_order_batch,
    salted_windowed_agg,
    sessionize,
    windowed_agg,
)
from tests.conftest import assert_pdf_equal


def _variants(df):
    return [
        df.coalesce(1),
        df.repartition(3),
        df.repartition(16, "conv_id"),
        df.repartition(7, "turn_idx"),
    ]


def test_windowed_agg_partitioning_invariant(spark, transcripts_df):
    results = [
        windowed_agg(
            v, "1 minute",
            aggs={"n": F.count("*"), "mx": F.max("turn_idx")},
            keys=["conv_id"],
        ).toPandas()
        for v in _variants(transcripts_df)
    ]
    for r in results[1:]:
        assert_pdf_equal(results[0], r, ["conv_id", "window_start"])


def test_salted_agg_partitioning_and_salt_invariant(spark, transcripts_df):
    results = [
        salted_windowed_agg(
            v, "1 minute",
            aggs={"n": ("count", "turn_idx"), "mx": ("max", "turn_idx")},
            keys=["conv_id"], n_salts=s, salt_source="turn_idx",
        ).toPandas()
        for v, s in zip(_variants(transcripts_df), [1, 4, 16, 64])
    ]
    for r in results[1:]:
        assert_pdf_equal(results[0], r, ["conv_id", "window_start"])


def test_ordering_sessions_join_invariant(spark, transcripts_df):
    base = None
    for v in _variants(transcripts_df):
        ordered = restore_order_batch(v)
        sess = sessionize(ordered).toPandas()
        joined = correlate_user_tool(ordered).toPandas()
        ot = ordered.toPandas()
        if base is None:
            base = (sess, joined, ot)
        else:
            assert_pdf_equal(base[0], sess, ["conv_id", "session_start"])
            assert_pdf_equal(
                base[1], joined,
                ["conv_id", "user_turn_idx", "tool_turn_idx"],
            )
            assert_pdf_equal(base[2], ot, ["conv_id", "turn_idx"])
