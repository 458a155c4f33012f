"""r7 optimization parity pins: the Arrow/numpy execution paths must
reproduce their Catalyst forms byte-for-byte (same rows, same values).

Every operator rewritten this round keeps its oracle check in
test_entry_oracle.py (value-exact vs DuckDB on the fixtures); these
tests pin the HOSTILE-INPUT corners the fixtures don't exercise —
Java-vs-Python whitespace classes, empty/null texts, trailing
separators, ties — against the still-present Catalyst reference
implementations."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from dbus_spark.operators import dedup as D
from dbus_spark.operators import similarity as S

HOSTILE = [
    (0, "plain token salad words here"),
    (1, ""),
    (2, " "),
    (3, "\tleading tab"),
    (4, "trailing tab\t"),
    (5, "a nbsp words"),  # NBSP is NOT Java \s
    (6, "multi   space   runs"),
    (7, "\t\t"),
    (8, "mixed \t\n\x0b\f\r separators"),
    (9, None),
    (10, "UPPER Case MiXeD"),
    (11, "x"),  # shorter than any k-gram
    (12, "exactly8"),  # == k for winnowing
    (13, "abcdefghijk"),  # a few k-grams, fewer than w windows
    (14, "repeat repeat repeat repeat repeat repeat repeat"),
]


@pytest.fixture(scope="module")
def hostile_df(spark):
    return spark.createDataFrame(HOSTILE, "doc_id long, text string")


def _rows(df, cols):
    return sorted(
        tuple(r[c] for c in cols) for r in df.collect()
    )


def test_simhash_arrow_matches_catalyst_md5(spark, hostile_df):
    got = _rows(D.simhash(hostile_df), ["doc_id", "simhash"])
    ref = _rows(
        D._simhash_catalyst(hostile_df, "doc_id", "text", 32, "md5"),
        ["doc_id", "simhash"],
    )
    assert got == ref


def test_simhash_arrow_matches_catalyst_md5_wide(spark, hostile_df):
    got = _rows(D.simhash(hostile_df, n_bits=60), ["doc_id", "simhash"])
    ref = _rows(
        D._simhash_catalyst(hostile_df, "doc_id", "text", 60, "md5"),
        ["doc_id", "simhash"],
    )
    assert got == ref


def test_winnow_arrow_matches_catalyst_md5(spark, hostile_df):
    got = _rows(D.winnow_fingerprints(hostile_df), ["doc_id", "fp"])
    ref = _rows(
        D._winnow_fingerprints_catalyst(hostile_df, "doc_id", "text"),
        ["doc_id", "fp"],
    )
    assert got == ref


def test_java_split_tokens_matches_spark_split(spark, hostile_df):
    """The Python tokenizer replica vs F.split(F.trim(c), r"\\s+") —
    the exact expression operators.text.tokens builds."""
    ref = {
        r["doc_id"]: r["toks"]
        for r in hostile_df.select(
            "doc_id",
            F.split(F.trim(F.col("text")), r"\s+").alias("toks"),
        ).collect()
    }
    texts = [t for _, t in HOSTILE]
    got = D._java_split_tokens(texts)
    for (i, _), g in zip(HOSTILE, got):
        assert g == ref[i], f"doc {i}: {g!r} != {ref[i]!r}"


def _brute_pairs_pd(ids, V, threshold):
    """Independent numpy brute force with the documented fold-exact
    association + decimal-free rounding via Spark itself is overkill
    here; this reference only checks SET equality of (id_a, id_b)."""
    V = V.astype(np.float64)
    n = np.sqrt((V * V).sum(axis=1))
    sims = (V @ V.T) / np.outer(n, n)
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if round(sims[i, j], 4) > threshold:
                a, b = ids[i], ids[j]
                out.add((min(a, b), max(a, b)))
    return out


def test_blocked_bruteforce_matches_reference(spark):
    rng = np.random.default_rng(3)
    V = rng.standard_normal((300, 16)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    # plant near-dups
    V[50] = V[10] + 0.01 * rng.standard_normal(16).astype(np.float32)
    V[51] = V[10] + 0.01 * rng.standard_normal(16).astype(np.float32)
    ids = np.arange(300)
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": ids, "embedding": list(V)}),
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in S.neardup_pairs(df, threshold=0.8).collect()
    }
    ref = _brute_pairs_pd(ids, V, 0.8)
    # the reference's BLAS dot may wobble the 4th decimal at the exact
    # threshold; tolerate only pairs whose rounded sim sits exactly at
    # the boundary
    sym = got.symmetric_difference(ref)
    for a, b in sym:
        va, vb = V[a].astype(np.float64), V[b].astype(np.float64)
        s = (va @ vb) / (np.linalg.norm(va) * np.linalg.norm(vb))
        assert abs(round(s, 4) - 0.8) <= 1e-4, (a, b, s)


def test_blocked_bruteforce_no_cartesian(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": np.arange(10),
                "embedding": list(
                    np.eye(10, 8, dtype=np.float32)
                ),
            }
        ),
        "vec_id long, embedding array<float>",
    )
    plan = S.neardup_pairs(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_semdedup_keep_rule_ties(spark):
    """Tie handling in the group-side drop rule: equal cent_sim
    resolves to the smaller id as keeper (the join form's
    (cs, id) strict order)."""
    # two identical vectors → same cell, same cent_sim, cosine 1.0
    v = np.array([1.0, 0.0, 0.0, 0.0], dtype=np.float32)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": [7, 3],
                "embedding": [v, v.copy()],
            }
        ),
        "vec_id long, embedding array<float>",
    )
    kept = S.semdedup(df, threshold=0.9, dim=4, n_centroids=4).collect()
    assert {r["vec_id"] for r in kept} == {3}
