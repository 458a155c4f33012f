"""Streaming near-dup filter: stream == sequential replica for any
micro-batch split (the operator's contract: decisions depend on
arrival order and bucket state, not on batching or partitioning)."""

import os

import numpy as np
import pandas as pd
import pytest

from dbus_spark.datagen import generate_documents
from dbus_spark.operators.dedup_stream import (
    minhash_sigs_pandas,
    neardup_filter_foreach_batch,
    resolve_neardup_verdicts,
    streaming_neardup_verdicts,
)

N_HASHES, N_BANDS, MIN_EST = 16, 4, 0.5


def _replica_keep_set(pdf: pd.DataFrame, sigs: dict) -> set:
    """Sequential reference: docs in (ts, doc_id) order; per band
    bucket (band, band-values) independently — dup iff ANY bucket has
    a rep with signature agreement >= MIN_EST; a doc becomes a rep in
    every bucket where it did NOT hit (mirroring the operator's
    independent bucket cells: a doc dropped via one band still seeds
    the others — dup-of-dup chains collapse onto canonicals)."""
    r = N_HASHES // N_BANDS
    reps: dict = {}
    keep = set()
    for _, row in pdf.sort_values(["ts", "doc_id"]).iterrows():
        sig = np.asarray(sigs[row["doc_id"]])
        hit_any = False
        for b in range(N_BANDS):
            bkt = (b, tuple(sig[b * r:(b + 1) * r]))
            rs = reps.setdefault(bkt, [])
            hit = any(
                (np.asarray(s) == sig).mean() >= MIN_EST for s in rs
            )
            if hit:
                hit_any = True
            else:
                rs.append(sig)
        if not hit_any:
            keep.add(row["doc_id"])
    return keep


@pytest.fixture(scope="module")
def corpus():
    pdf = generate_documents(250, seed=9)[["doc_id", "text"]]
    base = pd.Timestamp("2026-01-01")
    pdf["ts"] = (
        base + pd.to_timedelta(pdf["doc_id"] * 7, unit="s")
    ).astype("datetime64[us]")
    return pdf


@pytest.fixture(scope="module")
def expected_keep(spark, corpus):
    # the SAME signature kernel the streaming operator's Arrow UDF
    # calls — one implementation, so the replica can't drift
    mat = minhash_sigs_pandas(
        corpus["text"], corpus["doc_id"], N_HASHES, 3
    )
    sigs = dict(zip(corpus["doc_id"], mat))
    keep = _replica_keep_set(corpus, sigs)
    # the fixture corpus must actually contain near-dups or the test
    # proves nothing
    assert 0 < len(keep) < len(corpus)
    return keep


def _run_stream(spark, corpus, tmp_path, n_files: int) -> set:
    in_dir = tmp_path / f"in_{n_files}"
    os.makedirs(in_dir)
    parts = np.array_split(np.arange(len(corpus)), n_files)
    for i, idx in enumerate(parts):
        corpus.iloc[idx].to_parquet(
            in_dir / f"b-{i:04d}.parquet", index=False
        )
    src = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    v = streaming_neardup_verdicts(
        src, min_est_jaccard=MIN_EST, n_hashes=N_HASHES, n_bands=N_BANDS
    )
    got: list = []

    def collect(batch_df, _epoch):
        got.append(
            resolve_neardup_verdicts(batch_df).select("doc_id").toPandas()
        )

    q = (
        v.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ck_{n_files}"))
        .foreachBatch(collect)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)
    out = pd.concat(got, ignore_index=True)
    assert out["doc_id"].is_unique  # each doc resolved exactly once
    return set(out["doc_id"])


def test_stream_matches_replica_single_batch(
    spark, corpus, expected_keep, tmp_path
):
    assert _run_stream(spark, corpus, tmp_path, 1) == expected_keep


def test_stream_matches_replica_multi_batch(
    spark, corpus, expected_keep, tmp_path
):
    # state carries reps across micro-batches; the split must not
    # change any decision
    assert _run_stream(spark, corpus, tmp_path, 5) == expected_keep


def test_foreach_batch_composition(spark, corpus, tmp_path):
    from dbus_spark.sinks import IdempotentKeyedSink

    in_dir = tmp_path / "in_fb"
    os.makedirs(in_dir)
    corpus.to_parquet(in_dir / "b-0000.parquet", index=False)
    src = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    v = streaming_neardup_verdicts(src, min_est_jaccard=MIN_EST)
    sink = IdempotentKeyedSink(
        str(tmp_path / "out_fb"), keys=["doc_id"],
        dedup_mode="epoch_overwrite", track_counts=False,
    )
    q = (
        v.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_fb"))
        .foreachBatch(neardup_filter_foreach_batch(sink.foreach_batch()))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)
    out = sink.read(spark).toPandas()
    assert out["doc_id"].is_unique and len(out) > 0
    assert {"doc_id", "text", "ts"} <= set(out.columns)


def test_stream_kill_resume_preserves_decisions(
    spark, corpus, expected_keep, tmp_path
):
    """Restart mid-stream from the checkpoint: rep state must carry
    over so post-resume decisions are identical to the uninterrupted
    run (and the sink stays exactly-once under epoch replay)."""
    from dbus_spark.sinks import IdempotentKeyedSink

    in_dir = tmp_path / "in_kr"
    os.makedirs(in_dir)
    parts = np.array_split(np.arange(len(corpus)), 4)
    for i, idx in enumerate(parts):
        corpus.iloc[idx].to_parquet(
            in_dir / f"b-{i:04d}.parquet", index=False
        )
    sink = IdempotentKeyedSink(
        str(tmp_path / "out_kr"), keys=["doc_id"],
        dedup_mode="epoch_overwrite", track_counts=False,
    )

    def start():
        src = (
            spark.readStream.schema(
                "doc_id long, text string, ts timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(in_dir))
        )
        v = streaming_neardup_verdicts(
            src, min_est_jaccard=MIN_EST, n_hashes=N_HASHES,
            n_bands=N_BANDS,
        )
        return (
            v.writeStream.outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ck_kr"))
            .foreachBatch(
                neardup_filter_foreach_batch(sink.foreach_batch())
            )
            .start()
        )

    import time as _time

    q = start()
    while len(os.listdir(sink.meta_path)) < 2:  # ≥2 committed epochs
        _time.sleep(0.2)
    q.stop()
    q.awaitTermination(60)

    q2 = start()
    q2.processAllAvailable()
    q2.stop()
    q2.awaitTermination(60)

    out = sink.read(spark).select("doc_id").toPandas()
    assert out["doc_id"].is_unique
    assert set(out["doc_id"]) == expected_keep
