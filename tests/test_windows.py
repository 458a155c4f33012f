import pandas as pd

from pyspark.sql import functions as F

from dbus_spark.operators import windowed_agg, salted_windowed_agg
from tests import oracle_pd
from tests.conftest import assert_pdf_equal


def test_tumbling_vs_oracle(spark, transcripts_df, transcripts_pd):
    got = windowed_agg(
        transcripts_df,
        "1 minute",
        aggs={
            "n_turns": F.count("*"),
            "max_turn": F.max("turn_idx"),
        },
        keys=["conv_id"],
    ).toPandas()
    exp = oracle_pd.expected_tumbling(
        transcripts_pd.drop(columns=["_arrival"]), window_s=60
    )
    assert_pdf_equal(got, exp, ["conv_id", "window_start"])


def test_sliding_vs_oracle(spark, transcripts_df, transcripts_pd):
    got = windowed_agg(
        transcripts_df,
        "10 minutes",
        slide="5 minutes",
        aggs={"n_turns": F.count("*")},
        keys=["conv_id"],
    ).drop("window_end").toPandas()
    exp = oracle_pd.expected_sliding(
        transcripts_pd.drop(columns=["_arrival"]), window_s=600, slide_s=300
    )
    assert_pdf_equal(got, exp, ["conv_id", "window_start"])


def test_salted_equals_unsalted_on_skewed_data(
    spark, transcripts_df
):
    """The two-phase salted aggregation must be plan-different but
    result-identical (SURVEY.md §4 skew row)."""
    plain = windowed_agg(
        transcripts_df,
        "1 minute",
        aggs={
            "n_turns": F.count("*"),
            "tok_sum": F.sum(F.length("text")),
            "max_turn": F.max("turn_idx"),
        },
        keys=["conv_id"],
    ).toPandas()
    # tok_sum needs a precomputed column for the tuple API
    salted = salted_windowed_agg(
        transcripts_df.withColumn("_toklen", F.length("text")),
        "1 minute",
        aggs={
            "n_turns": ("count", "turn_idx"),
            "tok_sum": ("sum", "_toklen"),
            "max_turn": ("max", "turn_idx"),
        },
        keys=["conv_id"],
        n_salts=8,
        salt_source="turn_idx",
    ).toPandas()
    assert_pdf_equal(plain, salted, ["conv_id", "window_start"])


def test_salted_rejects_non_decomposable(transcripts_df):
    import pytest

    with pytest.raises(ValueError, match="not decomposable"):
        salted_windowed_agg(
            transcripts_df, "1 minute",
            aggs={"m": ("median", "turn_idx")}, keys=["conv_id"],
        )
