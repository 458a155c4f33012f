"""10M-turn ordered-stream soak: one order of magnitude above the
1.1M fixture — sustained throughput, bounded state, exactly-once."""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from dbus_spark.datagen import generate_transcripts, write_stream_batches
from dbus_spark.operators import ordered_turns_stream
from dbus_spark.session import get_spark
from dbus_spark.sinks import IdempotentKeyedSink
from dbus_spark.sources import transcript_file_stream

N_CONVS = int(os.environ.get("SOAK_CONVS", "220000"))

work = tempfile.mkdtemp(prefix="dbus_soak_")
try:
    t0 = time.time()
    pdf = generate_transcripts(n_convs=N_CONVS, seed=42)
    print(f"generated {len(pdf)} turns / {N_CONVS} convs "
          f"in {time.time()-t0:.1f}s", flush=True)
    write_stream_batches(pdf, os.path.join(work, "in"), n_files=16)
    n_expected = len(pdf.drop_duplicates(["conv_id", "turn_idx"]))

    spark = get_spark("soak", master="local[32]", shuffle_partitions=32)
    sink = IdempotentKeyedSink(
        os.path.join(work, "out"),
        keys=["conv_id", "turn_idx"],
        dedup_mode="epoch_overwrite",
        track_counts=False,
        coalesce_output=8,
    )
    src = transcript_file_stream(
        spark, os.path.join(work, "in"), max_files_per_trigger=2
    )
    ordered = ordered_turns_stream(src, watermark="10 minutes")
    t0 = time.time()
    q = (
        ordered.writeStream.outputMode("append")
        .option("checkpointLocation", os.path.join(work, "ck"))
        .foreachBatch(sink.foreach_batch())
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(120)
    wall = time.time() - t0

    out = spark.read.parquet(os.path.join(work, "out", "data"))
    n_out = out.count()
    n_dupkeys = n_out - out.select("conv_id", "turn_idx").distinct().count()
    # contiguity: every conv's emitted turn_idx set is 0..max gap-free
    from pyspark.sql import functions as F

    bad = (
        out.groupBy("conv_id")
        .agg(F.count("*").alias("n"), F.max("turn_idx").alias("mx"),
             F.min("turn_idx").alias("mn"))
        .filter((F.col("mn") != 0) | (F.col("mx") != F.col("n") - 1))
        .count()
    )
    print(json.dumps({
        "turns_in": len(pdf),
        "convs": N_CONVS,
        "sec": round(wall, 2),
        "turns_per_sec": round(len(pdf) / wall, 1),
        "rows_out": n_out,
        "dup_keys": n_dupkeys,
        "non_contiguous_convs": bad,
        "expected_unique": n_expected,
    }))
    spark.stop()
finally:
    shutil.rmtree(work, ignore_errors=True)
