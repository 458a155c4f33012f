"""Property-based test of asof_join against pandas.merge_asof — for ANY
key/timestamp/value layout (duplicate timestamps, empty sides, keys on
one side only), the union-and-carry plan must agree with the reference
implementation's backward inexact match with <= semantics."""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dbus_spark.operators.join import asof_join

keys = st.sampled_from(["a", "b", "c"])
rows_strategy = st.lists(
    st.tuples(keys, st.integers(0, 20)), min_size=0, max_size=15
)


@settings(max_examples=25, deadline=None)
@given(lrows=rows_strategy, rrows=rows_strategy)
def test_asof_join_matches_pandas_merge_asof(spark, lrows, rrows):
    left = pd.DataFrame(
        [(k, t, f"L{i}") for i, (k, t) in enumerate(lrows)],
        columns=["k", "t", "lbl"],
    )
    right = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(rrows)],
        columns=["k", "t", "val"],
    )
    if len(left) == 0:
        return  # nothing to join onto

    sdf_l = spark.createDataFrame(left.astype({"t": "int64"}))
    if len(right):
        sdf_r = spark.createDataFrame(right.astype({"t": "int64", "val": "int64"}))
    else:
        sdf_r = spark.createDataFrame([], "k string, t long, val long")
    got = (
        asof_join(sdf_l, sdf_r, by="k", ts="t", right_cols=["val"],
                  order_col="val")
        .toPandas()
        .sort_values("lbl")
        .reset_index(drop=True)[["lbl", "val"]]
    )

    # reference: merge_asof picks the positionally-last right row among
    # equal (k, t) — sorting right by (t, val) makes that the max val,
    # matching asof_join's order_col tie-break
    ls = left.sort_values("t", kind="stable").reset_index(drop=True)
    rs = right.sort_values(["t", "val"], kind="stable").reset_index(drop=True)
    if len(rs):
        exp = pd.merge_asof(
            ls, rs, on="t", by="k", direction="backward",
            allow_exact_matches=True,
        )
    else:
        exp = ls.assign(val=pd.array([None] * len(ls), dtype="Int64"))
    exp = exp.sort_values("lbl").reset_index(drop=True)[["lbl", "val"]]

    got["val"] = got["val"].astype("Int64")
    exp["val"] = exp["val"].astype("Int64")
    pd.testing.assert_frame_equal(got, exp)
