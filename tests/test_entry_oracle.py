"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same sf0.01 parquet, compare row count + column names + values
(order-insensitive, exact)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = out[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(out[c]):
            # + 0.0 maps IEEE -0.0 -> +0.0; detection of sign-of-zero
            # divergence happens on the RAW frames via
            # _assert_no_negzero (VERDICT r5, doc_dsir_weight)
            out[c] = out[c].round(6) + 0.0
        elif out[c].dtype == object:
            pass
        else:
            out[c] = out[c].astype("int64", errors="ignore")
    out = out[sorted(out.columns)]
    return out.sort_values(list(out.columns), kind="stable").reset_index(
        drop=True
    )


def _dtype_kind(s: pd.Series) -> str:
    """Coarse dtype class used to mirror the driver's value hash: the
    driver hashes materialized values, so an int64 column on one side
    and a float64 (e.g. DuckDB HUGEINT -> float64) on the other hash
    differently even when every value is numerically equal.  Width
    differences (int32 vs int64) do NOT change the hash; sign/kind
    does."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    return "object"


def _assert_no_negzero(name: str, side: str, pdf: pd.DataFrame) -> None:
    """Fail if any float column carries an IEEE -0.0.  -0.0 == +0.0 is
    true, so pd.testing value compares pass where the driver's
    byte-level value hash fails (VERDICT r5: doc_dsir_weight emitted
    -0.0 from DuckDB's ROUND, +0.0 from Spark's F.round — values exact,
    hash red).  Every float-producing query must normalize (x + 0.0)
    in BOTH engines so this class can't recur."""
    for c in pdf.columns:
        if pd.api.types.is_float_dtype(pdf[c]):
            v = pdf[c].to_numpy()
            bad = np.signbit(v) & (v == 0.0)
            assert not bad.any(), (
                f"{name}[{side}].{c}: {int(bad.sum())} IEEE -0.0 value(s)"
                " — wrap the final expression with + 0.0 in both the"
                " Spark query and the oracle SQL"
            )


ORACLE_QUERIES = sorted(entrymod.oracle_sql().keys())
ROWS_ONLY = sorted(set(entrymod.queries()) - set(ORACLE_QUERIES))


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    got_raw = entrymod.queries()[name](spark, SF_DIR).toPandas()
    exp_raw = duck.sql(entrymod.oracle_sql()[name]).df()
    _assert_no_negzero(name, "spark", got_raw)
    _assert_no_negzero(name, "oracle", exp_raw)
    got = _normalize(got_raw)
    exp = _normalize(exp_raw)
    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns {list(got.columns)} != {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: {len(got)} vs {len(exp)} rows"
    # The driver's hash is dtype-class sensitive (int vs float vs str):
    # a DuckDB HUGEINT sum materializing as float64 fails the driver
    # even when values match, so fail here too (VERDICT r3 item #2).
    kinds_got = {c: _dtype_kind(got[c]) for c in got.columns}
    kinds_exp = {c: _dtype_kind(exp[c]) for c in exp.columns}
    assert kinds_got == kinds_exp, (
        f"{name}: dtype-class divergence (driver hash would fail): "
        f"{ {c: (kinds_got[c], kinds_exp[c]) for c in kinds_got if kinds_got[c] != kinds_exp[c]} }"
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_duckdb_hugeint_sum_materializes_float(duck):
    """Regression pin for VERDICT r3 'what's wrong #1': DuckDB's
    SUM(BIGINT) returns HUGEINT, which pandas materializes as float64
    (662.0) while Spark emits bigint (662) — a driver value-hash fail
    that rows/schema checks cannot see.  Every integer SUM in
    oracle_sql() must therefore be cast ::BIGINT; this test keeps the
    underlying DuckDB behavior (and the gate's sensitivity to it)
    visible."""
    uncast = duck.sql("SELECT SUM(n_chars) AS s FROM documents").df()
    cast = duck.sql("SELECT SUM(n_chars)::BIGINT AS s FROM documents").df()
    assert _dtype_kind(uncast["s"]) == "float"  # the trap
    assert _dtype_kind(cast["s"]) == "int"  # the fix
    assert _dtype_kind(uncast["s"]) != _dtype_kind(cast["s"])


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0 and len(df.columns) > 0
