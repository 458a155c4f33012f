"""Fused vertical (enrich → near-dup → ordering → sink) — the bus-hop
composition of the two flagship stateful operators (VERDICT r4 #6).

Invariant design: mutated redeliveries share their original's
(conv_id, turn_idx), so EVERY near-dup drop is of a redelivery —
originals always survive — and any redelivery the similarity filter
misses (short text) is caught by the ordering frontier. Hence the
final output must equal the unique turn set exactly: 0 dup keys,
0 gaps, per-conv contiguity."""

import os

import numpy as np
import pandas as pd
import pytest

from dbus_spark.datagen import (
    TranscriptKnobs,
    generate_transcripts,
    write_stream_batches,
)
from dbus_spark.pipeline.fused import (
    drain_fused,
    stage_a_neardup,
    stage_b_ordered,
)

KNOBS = TranscriptKnobs(
    late_frac=0.0, dup_frac=0.05, mutated_dup_frac=0.05
)


@pytest.fixture(scope="module")
def corpus():
    pdf = generate_transcripts(n_convs=60, seed=17, knobs=KNOBS)
    # null-text turns must survive the vertical (enrich yields NULL
    # quality; near-dup gives them sentinel sigs) — not create gaps
    pdf = pdf.reset_index(drop=True)
    single = ~pdf.duplicated(["conv_id", "turn_idx"], keep=False)
    pdf.loc[pdf.index[single][:2], "text"] = None
    n_delivered = len(pdf)
    uniq = pdf.drop_duplicates(["conv_id", "turn_idx"])
    assert uniq["text"].isna().sum() == 2
    assert n_delivered > len(uniq)  # fixture really carries redeliveries
    return pdf, uniq


def _run(spark, corpus_pdf, tmp_path, n_files, kill_stage=None):
    in_dir = str(tmp_path / "in")
    write_stream_batches(corpus_pdf, in_dir, n_files=n_files)
    bus, out = str(tmp_path / "bus"), str(tmp_path / "out")
    cka, ckb = str(tmp_path / "cka"), str(tmp_path / "ckb")

    qa, bus_sink = stage_a_neardup(spark, in_dir, bus, cka)
    qb, out_sink = stage_b_ordered(spark, bus, out, ckb)

    if kill_stage is not None:
        import time as _t

        # kill mid-run once the chosen stage has ≥2 committed epochs,
        # then restart both from their checkpoints
        sink = bus_sink if kill_stage == "a" else out_sink
        for _ in range(600):
            if len(os.listdir(sink.meta_path)) >= 2:
                break
            _t.sleep(0.2)
        qa.stop()
        qb.stop()
        qa.awaitTermination(60)
        qb.awaitTermination(60)
        qa, bus_sink = stage_a_neardup(spark, in_dir, bus, cka)
        qb, out_sink = stage_b_ordered(spark, bus, out, ckb)

    drain_fused(qa, qb)
    got = out_sink.read(spark).toPandas()
    n_bus = bus_sink.read(spark).count()
    return got, n_bus


def _check(got, uniq):
    assert len(got) == len(uniq), (len(got), len(uniq))
    assert not got.duplicated(["conv_id", "turn_idx"]).any()
    per = got.groupby("conv_id")["turn_idx"].agg(["min", "max", "size"])
    assert (per["min"] == 0).all()
    assert (per["max"] == per["size"] - 1).all()  # 0 gaps
    # per-turn text equality vs the unique originals (north-rule
    # invariant): a mutated redelivery must never replace the original
    key = ["conv_id", "turn_idx"]
    merged = got.merge(uniq[key + ["text"]], on=key, suffixes=("", "_exp"))
    same = (merged["text"] == merged["text_exp"]) | (
        merged["text"].isna() & merged["text_exp"].isna()
    )
    assert same.all()


def test_fused_end_to_end(spark, corpus, tmp_path):
    pdf, uniq = corpus
    got, n_bus = _run(spark, pdf, tmp_path, n_files=6)
    _check(got, uniq)
    # the near-dup stage must drop MOST redeliveries before the bus
    # (the ordering frontier only backstops the short-text residue)
    n_redelivered = len(pdf) - len(uniq)
    dropped_at_a = len(pdf) - n_bus
    assert dropped_at_a >= 0.7 * n_redelivered, (dropped_at_a, n_redelivered)


def test_fused_split_equivalence(spark, corpus, tmp_path):
    """Different micro-batch split ⇒ identical final output (the
    per-operator replica contracts must survive composition)."""
    pdf, uniq = corpus
    got, _ = _run(spark, pdf, tmp_path, n_files=3)
    _check(got, uniq)


def test_fused_kill_resume_stage_a(spark, corpus, tmp_path):
    pdf, uniq = corpus
    got, _ = _run(spark, pdf, tmp_path, n_files=6, kill_stage="a")
    _check(got, uniq)


def test_fused_kill_resume_stage_b(spark, corpus, tmp_path):
    pdf, uniq = corpus
    got, _ = _run(spark, pdf, tmp_path, n_files=6, kill_stage="b")
    _check(got, uniq)


def _run3(spark, corpus_pdf, tmp_path, n_files, kill_c=False):
    """Three-stage run: enrich → near-dup → ordering → CEP matches."""
    from dbus_spark.pipeline.fused import stage_c_cep

    in_dir = str(tmp_path / "in")
    write_stream_batches(corpus_pdf, in_dir, n_files=n_files)
    bus, out, mat = (
        str(tmp_path / "bus"), str(tmp_path / "out"), str(tmp_path / "mat")
    )
    cka, ckb, ckc = (
        str(tmp_path / "cka"), str(tmp_path / "ckb"), str(tmp_path / "ckc")
    )
    qa, bus_sink = stage_a_neardup(spark, in_dir, bus, cka)
    qb, out_sink = stage_b_ordered(spark, bus, out, ckb)
    qc, mat_sink = stage_c_cep(spark, out, mat, ckc)

    if kill_c:
        import time as _t

        for _ in range(600):
            if len(os.listdir(mat_sink.meta_path)) >= 1:
                break
            _t.sleep(0.2)
        qc.stop()
        qc.awaitTermination(60)
        qc, mat_sink = stage_c_cep(spark, out, mat, ckc)

    drain_fused(qa, qb, qc)
    got = out_sink.read(spark).toPandas()
    matches = mat_sink.read(spark).toPandas()
    return got, matches


def test_fused_three_stage_cep(spark, corpus, tmp_path):
    """Stage C consumes stage B's contiguous-frontier output; its
    match set must equal the batch twin's over the final ordered
    turns — the full three-stateful-stage composition, exactly once."""
    from dbus_spark.operators.cep import match_sequence

    pdf, uniq = corpus
    got, matches = _run3(spark, pdf, tmp_path, n_files=6)
    _check(got, uniq)
    exp = {
        (r["conv_id"], r["start_turn_idx"], r["end_turn_idx"])
        for r in match_sequence(
            spark.createDataFrame(got[["conv_id", "turn_idx", "role", "ts"]]),
            ["user", "assistant", "tool"],
            key="conv_id",
            order="turn_idx",
            sym="role",
        ).collect()
    }
    assert len(exp) > 10  # fixture must actually contain the pattern
    assert {
        (r.key, r.start_order, r.end_order)
        for r in matches.itertuples(index=False)
    } == exp
    assert not matches.duplicated(["key", "start_order"]).any()


def test_fused_three_stage_kill_resume_c(spark, corpus, tmp_path):
    from dbus_spark.operators.cep import match_sequence

    pdf, uniq = corpus
    got, matches = _run3(spark, pdf, tmp_path, n_files=6, kill_c=True)
    _check(got, uniq)
    exp = {
        (r["conv_id"], r["start_turn_idx"], r["end_turn_idx"])
        for r in match_sequence(
            spark.createDataFrame(got[["conv_id", "turn_idx", "role", "ts"]]),
            ["user", "assistant", "tool"],
            key="conv_id",
            order="turn_idx",
            sym="role",
        ).collect()
    }
    assert {
        (r.key, r.start_order, r.end_order)
        for r in matches.itertuples(index=False)
    } == exp
