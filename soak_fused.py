"""Fused-vertical soak (VERDICT r4 #6): 1M+ delivered turns through
enrich → streaming near-dup filter → per-conversation ordering →
exactly-once sink, as the two-query bus-hop pipeline
(``dbus_spark/pipeline/fused.py`` — Spark forbids chaining two
applyInPandasWithState operators in one query; stage B tails stage
A's atomic-epoch bus WHILE it runs, so the hop adds pipeline depth,
not a batch barrier).

Invariants checked on the FULL output (same bar as soak_ordered.py):

- rows out == unique (conv_id, turn_idx) delivered (0 lost, 0 extra)
- 0 duplicate keys
- every conversation contiguous 0..max (0 gaps)
- per-turn text equality vs the ORIGINAL copy (a mutated redelivery
  must never replace the original — the north-rule invariant)
- near-dup drop accounting: stage A must absorb most redeliveries
  before the bus (the ordering frontier backstops the short-text
  residue)

Env knobs: SOAK_CONVS (default 90000 ≈ 1.08M delivered turns at
mean_turns=12 incl. 10% redeliveries), SOAK_FILES (default 16).
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

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
from dbus_spark.session import get_spark

N_CONVS = int(os.environ.get("SOAK_CONVS", "90000"))
N_FILES = int(os.environ.get("SOAK_FILES", "16"))

work = tempfile.mkdtemp(prefix="dbus_soak_fused_")
try:
    t0 = time.time()
    pdf = generate_transcripts(
        n_convs=N_CONVS,
        seed=42,
        knobs=TranscriptKnobs(
            late_frac=0.0, dup_frac=0.05, mutated_dup_frac=0.05
        ),
    )
    uniq = pdf.drop_duplicates(["conv_id", "turn_idx"])
    print(
        f"generated {len(pdf)} delivered turns ({len(uniq)} unique, "
        f"{N_CONVS} convs) in {time.time()-t0:.1f}s",
        flush=True,
    )
    in_dir = os.path.join(work, "in")
    write_stream_batches(pdf, in_dir, n_files=N_FILES)

    spark = get_spark(
        "soak_fused",
        master="local[32]",
        shuffle_partitions=16,
        extra_confs={
            # bounded sketch/frontier state → in-memory provider
            # (BENCH.md §13's state-store finding)
            "spark.sql.streaming.stateStore.providerClass": (
                "org.apache.spark.sql.execution.streaming.state."
                "HDFSBackedStateStoreProvider"
            ),
        },
    )
    t0 = time.time()
    qa, bus_sink = stage_a_neardup(
        spark,
        in_dir,
        os.path.join(work, "bus"),
        os.path.join(work, "cka"),
        max_files_per_trigger=2,
    )
    qb, out_sink = stage_b_ordered(
        spark,
        os.path.join(work, "bus"),
        os.path.join(work, "out"),
        os.path.join(work, "ckb"),
        n_buckets=32,
    )
    drain_fused(qa, qb)
    wall = time.time() - t0

    got = out_sink.read(spark)
    n_out = got.count()
    n_dup = n_out - got.select("conv_id", "turn_idx").distinct().count()
    from pyspark.sql import functions as F

    bad_contig = (
        got.groupBy("conv_id")
        .agg(
            F.count("*").alias("n"),
            F.max("turn_idx").alias("mx"),
            F.min("turn_idx").alias("mn"),
        )
        .filter((F.col("mn") != 0) | (F.col("mx") != F.col("n") - 1))
        .count()
    )
    # per-turn text equality vs the unique originals
    exp = spark.createDataFrame(
        uniq[["conv_id", "turn_idx", "text"]]
    ).withColumnRenamed("text", "text_exp")
    bad_text = (
        got.join(exp, on=["conv_id", "turn_idx"])
        .filter(F.col("text") != F.col("text_exp"))
        .count()
    )
    n_bus = bus_sink.read(spark).count()
    n_redeliv = len(pdf) - len(uniq)
    print(
        json.dumps(
            {
                "delivered": len(pdf),
                "unique": len(uniq),
                "convs": N_CONVS,
                "sec": round(wall, 2),
                "turns_per_sec": round(len(pdf) / wall, 1),
                "rows_out": n_out,
                "dup_keys": n_dup,
                "non_contiguous_convs": bad_contig,
                "wrong_text_rows": bad_text,
                "bus_rows": n_bus,
                "redelivered": n_redeliv,
                "dropped_at_neardup": len(pdf) - n_bus,
                "neardup_absorption": round(
                    (len(pdf) - n_bus) / max(n_redeliv, 1), 3
                ),
            }
        ),
        flush=True,
    )
    spark.stop()
finally:
    shutil.rmtree(work, ignore_errors=True)
