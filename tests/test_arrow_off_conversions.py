"""Arrow-config divergence guard (r6 verdict #2).

The driver's correctness gate runs the registry under a VANILLA
session (Arrow conversions OFF), while the repo session enables Arrow —
which is how the ``asof_stream_replica`` crash stayed local-green for a
round: the non-Arrow ``createDataFrame`` path degrades pandas
``Int64``/``pd.NA`` to float ``nan`` and LongType verification throws.

These tests pin the conversion contract for ``__spark_entry__``:
every pandas→Spark rebuild must go through object-dtype/None for
nullable integer columns (``nullable_long_object``) and must succeed
with ``spark.sql.execution.arrow.pyspark.enabled=false``.
"""

import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod


@pytest.fixture()
def arrow_off(spark):
    old = spark.conf.get("spark.sql.execution.arrow.pyspark.enabled")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
    yield spark
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", old)


@pytest.mark.parametrize(
    "src",
    [
        pd.Series([1, None, 3], dtype="Int64"),
        # the REAL replica input under a vanilla driver session:
        # Arrow-off toPandas of a nullable long yields float64 — a
        # bare astype(object) keeps float OBJECTS (213.0) which
        # LongType verification rejects exactly like pd.NA (r7
        # vanilla-sweep finding; the r6 fix only handled the NA half)
        pd.Series([1.0, np.nan, 3.0], dtype="float64"),
        pd.Series([1, None, 3], dtype=object),
    ],
    ids=["Int64-extension", "float64-nan", "object"],
)
def test_nullable_long_object_survives_arrow_off(arrow_off, src):
    """The exact asof-replica conversion: a nullable column with NA
    (purchase with no prior click) rebuilt as a LongType field, from
    every dtype the drain can hand over."""
    out = pd.DataFrame(
        {
            "user_id": np.array([10, 11, 12], dtype=np.int64),
            "click_id": entrymod.nullable_long_object(src),
        }
    )
    df = arrow_off.createDataFrame(out, "user_id bigint, click_id bigint")
    rows = sorted(df.collect(), key=lambda r: r["user_id"])
    assert [r["click_id"] for r in rows] == [1, None, 3]


def test_raw_int64_extension_dtype_is_rejected_arrow_off(arrow_off):
    """Documents the failure class the helper exists for: feeding the
    pandas extension dtype straight in crashes under the driver's
    Arrow-off session (if pyspark ever starts accepting it, this test
    flags that the guard can be retired)."""
    out = pd.DataFrame(
        {
            "user_id": np.array([10, 11], dtype=np.int64),
            "click_id": pd.Series([1, None], dtype="Int64"),
        }
    )
    with pytest.raises(Exception):
        arrow_off.createDataFrame(
            out, "user_id bigint, click_id bigint"
        ).collect()


def test_entry_has_no_extension_dtype_createdataframe():
    """Static guard: no ``astype("Int64")`` (or Float64/boolean
    extension dtypes) may feed a createDataFrame rebuild in
    ``__spark_entry__`` — nullable integers go through
    ``nullable_long_object``. The one allowed Int64 use is the parquet
    fixture writer (parquet needs the extension dtype to emit INT64
    instead of DOUBLE for a nullable column)."""
    import inspect

    src = inspect.getsource(entrymod)
    # fixture-writer use: `pdf["click_id"].astype("Int64")` before
    # to_parquet — strip lines that assign back into the fixture frame
    suspicious = [
        ln
        for ln in src.splitlines()
        if 'astype("Int64")' in ln and "to_parquet" not in ln
        and "pdf[" not in ln
    ]
    assert suspicious == [], suspicious
