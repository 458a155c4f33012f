"""Benchmark decontamination: n-gram overlap report + drop filter.

Contract under test: a doc is flagged iff it shares >=1 distinct word
n-gram with the benchmark set; contam_frac counts DISTINCT doc n-grams
(duplicates inside a doc count once); sub-n-token docs produce no row;
and the scale shape is broadcast-join (plan-asserted), never a
corpus x benchmark shuffle join.
"""

import io
from contextlib import redirect_stdout

import pytest

from dbus_spark.operators.decontam import decontaminate, ngram_contamination


def _docs(spark):
    rows = [
        # fully contaminated: IS the benchmark item
        (1, "the quick brown fox jumps over the lazy dog today"),
        # partial: shares one 3-gram window with doc 1's text
        (2, "start pad quick brown fox ends here now clean tail"),
        # clean: no shared 3-gram
        (3, "completely unrelated words in this document body here"),
        # too short for a 3-gram: no output row at all
        (4, "two tokens"),
        # repeated contaminated 3-gram must count ONCE (distinct)
        (5, "lazy dog today lazy dog today lazy dog today"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bench(spark):
    return spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    )


def test_contamination_report(spark):
    got = {
        r["doc_id"]: (r["n_ngrams"], r["n_hit"], r["contam_frac"])
        for r in ngram_contamination(
            _docs(spark), _bench(spark), n=3
        ).collect()
    }
    # doc 1: 8 distinct 3-grams, all in the benchmark
    assert got[1] == (8, 8, 1.0)
    # doc 2: 8 distinct 3-grams, exactly one ("quick brown fox") hits
    assert got[2] == (8, 1, 0.125)
    assert got[3][1] == 0 and got[3][2] == 0.0
    assert 4 not in got  # < n tokens -> no n-grams -> no row
    # doc 5: "lazy dog today" repeats 3x but is ONE distinct shingle;
    # the bridging shingles ("dog today lazy", "today lazy dog") are
    # not benchmark n-grams
    assert got[5] == (3, 1, 0.3333)


def test_decontaminate_drops_flagged(spark):
    kept = {
        r["doc_id"]
        for r in decontaminate(_docs(spark), _bench(spark), n=3).collect()
    }
    # any-overlap policy: 1, 2, 5 dropped; 3 clean; 4 unshingleable
    # (nothing to match -> kept, the conservative call for short docs)
    assert kept == {3, 4}
    loose = {
        r["doc_id"]
        for r in decontaminate(
            _docs(spark), _bench(spark), n=3, max_frac=0.5
        ).collect()
    }
    assert loose == {2, 3, 4, 5}  # only the fully-contaminated doc out


def test_benchmark_side_broadcasts(spark):
    """100 TB shape: the benchmark n-gram set must broadcast — a
    shuffle join here would move the whole corpus's shingles."""
    plan_df = ngram_contamination(_docs(spark), _bench(spark), n=3)
    buf = io.StringIO()
    with redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
