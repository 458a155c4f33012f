"""Scaling-efficiency evidence (north_rule two-cluster-size criterion).

No real cluster exists in this sandbox, so the criterion is evidenced
as specified in BASELINE.md: the identical flagship streaming job runs
on the identical input at two parallelism levels (N and 4N local
cores), each level in its own subprocess (fresh JVM — sharing one JVM
across levels invalidates the comparison), repeated R times with the
best run kept per level (the host shows 7-11 load average from other
tenants; best-of filters their noise, and both levels face the same
environment).

The job is the flagship pipeline: file stream → repartition(conv_id) →
Arrow pandas-UDF text enrichment → watermarked tumbling window agg →
idempotent keyed sink.

Usage:  python scaling_bench.py [--n 2] [--repeats 2] [--convs 80000]
Prints one JSON line; also appends a row to BENCH.md when --record.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

_BATCH_RUNNER = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
from dbus_spark.session import get_spark

cpus = {cpus}; work = {work!r}; mode = {mode!r}
spark = get_spark(f"scaleb{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=cpus)
df = spark.read.parquet(os.path.join(work, "in")).repartition(cpus)
if mode == "batch":
    from dbus_spark.functions.vectorized import enrich_turns
    out = enrich_turns(df).select(
        "conv_id", "n_tokens", "fp64", "lang", "stop_ratio", "quality")
else:  # batch_jvm: whole-stage-codegen expression path
    from dbus_spark.operators.text import token_count, lang_id, fingerprint
    out = (df.withColumn("n_tokens", token_count("text"))
             .withColumn("lang", lang_id("text"))
             .withColumn("fp", fingerprint("text"))
             .select("conv_id", "n_tokens", "lang", "fp"))
out.write.format("noop").mode("overwrite").save()  # warm
t0 = time.time()
for _ in range(3):
    out.write.format("noop").mode("overwrite").save()
print("WALL", time.time() - t0)
spark.stop()
"""

_RUNNER = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from dbus_spark.session import get_spark
from dbus_spark.sources import transcript_file_stream
from dbus_spark.operators import windowed_agg
from dbus_spark.functions.vectorized import enrich_turns
from dbus_spark.sinks import IdempotentKeyedSink

cpus = {cpus}; work = {work!r}; tag = {tag!r}
spark = get_spark(f"scale{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=cpus)
# prewarm: fork the python-worker pool + compile the enrichment UDF
# stage before the timed window — on a real cluster executors are
# long-lived, so fork/import cost is paid once per deployment, not
# per measured slice of stream
from dbus_spark.functions.vectorized import token_count_v
(spark.range(0, cpus, 1, cpus)
      .select(token_count_v(F.lit("warm")).alias("n"))
      .write.format("noop").mode("overwrite").save())
sink = IdempotentKeyedSink(os.path.join(work, f"out_{{tag}}"),
                           keys=["conv_id", "window_start"],
                           dedup_mode="epoch_overwrite",
                           track_counts=False, coalesce_output=4)
src = transcript_file_stream(spark, os.path.join(work, "in"),
                             max_files_per_trigger=16)
enriched = enrich_turns(src.repartition(cpus, "conv_id"))
agg = windowed_agg(
    enriched, "1 minute",
    aggs={{"n_turns": F.count("*"), "tok_sum": F.sum("n_tokens"),
           "n_langs": F.max("lang"), "fp_min": F.min("fp64"),
           "q_sum": F.sum("quality"), "stop_max": F.max("stop_ratio")}},
    keys=["conv_id"], watermark="10 minutes")
t0 = time.time()
q = (agg.writeStream.outputMode("append")
     .option("checkpointLocation", os.path.join(work, f"ck_{{tag}}"))
     .foreachBatch(sink.foreach_batch()).start())
q.processAllAvailable()
busy_ms = sum(p["durationMs"]["triggerExecution"]
              for p in q.recentProgress
              if p.get("numInputRows", 0) > 0)
q.stop(); q.awaitTermination(60)
print("WALL", time.time() - t0)
print("BUSY", busy_ms / 1000.0)
spark.stop()
"""


def run_level(
    repo: str, work: str, cpus: int, tag: str, mode: str = "streaming"
) -> tuple[float, float | None]:
    """Returns (wall_sec, busy_sec). Wall covers start→drain→stop of
    the whole query; busy is the sum of micro-batch trigger times —
    the long-lived-stream view, excluding per-deployment start/stop
    that a real cluster amortizes over days, not one fixture replay."""
    tmpl = _RUNNER if mode == "streaming" else _BATCH_RUNNER
    code = tmpl.format(repo=repo, cpus=cpus, work=work, tag=tag, mode=mode)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True
    )
    wall = busy = None
    for line in out.stdout.splitlines():
        if line.startswith("WALL"):
            wall = float(line.split()[1])
        elif line.startswith("BUSY"):
            busy = float(line.split()[1])
    if wall is None:
        raise RuntimeError(f"run failed: {out.stderr[-2000:]}")
    return wall, busy


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2, help="N cores (4N = 4*N)")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--convs", type=int, default=80000)
    ap.add_argument("--workdir", default=None)
    ap.add_argument(
        "--mode",
        choices=["streaming", "batch", "batch_jvm"],
        default="streaming",
        help="streaming = full pipeline incl. state + sink; batch = "
        "the map-stage (enrichment) alone, isolating operator scaling "
        "from micro-batch machinery",
    )
    args = ap.parse_args()

    repo = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, repo)
    from dbus_spark.datagen import generate_transcripts, write_stream_batches

    work = args.workdir or tempfile.mkdtemp(prefix="dbus_scaling_")
    in_dir = os.path.join(work, "in")
    if not os.path.exists(in_dir):
        pdf = generate_transcripts(n_convs=args.convs, seed=42)
        write_stream_batches(pdf, in_dir, n_files=32)
        n_rows = len(pdf)
    else:
        import pyarrow.parquet as pq

        n_rows = sum(
            pq.read_metadata(os.path.join(in_dir, f)).num_rows
            for f in os.listdir(in_dir)
        )

    levels = {"N": args.n, "4N": args.n * 4}
    results: dict[str, dict] = {}
    for name, cpus in levels.items():
        walls, busys = [], []
        for r in range(args.repeats):
            tag = f"{name}_{r}"
            for d in (f"out_{tag}", f"ck_{tag}"):
                shutil.rmtree(os.path.join(work, d), ignore_errors=True)
            wall, busy = run_level(repo, work, cpus, tag, args.mode)
            walls.append(wall)
            busys.append(busy)
        best = min(walls)
        results[name] = {
            "cores": cpus,
            "walls_sec": [round(w, 1) for w in walls],
            "best_sec": round(best, 1),
            "turns_per_sec": round(n_rows / best, 1),
        }
        ok = [b for b in busys if b]
        if ok:
            results[name]["busy_sec_best"] = round(min(ok), 1)
            results[name]["sustained_turns_per_sec"] = round(
                n_rows / min(ok), 1
            )

    eff = (
        results["4N"]["turns_per_sec"] / results["N"]["turns_per_sec"]
    ) / 4
    out = {
        "mode": args.mode,
        "rows": n_rows,
        "N": results["N"],
        "4N": results["4N"],
        "scaling_efficiency": round(eff, 3),
    }
    if "sustained_turns_per_sec" in results["N"]:
        out["scaling_efficiency_sustained"] = round(
            (
                results["4N"]["sustained_turns_per_sec"]
                / results["N"]["sustained_turns_per_sec"]
            )
            / 4,
            3,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
