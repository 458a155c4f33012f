"""Round-7 optimization harness (guide §1.4): per-query noop-sink
isolation with repeats + `.explain("formatted")` dumps.

`bench.py` is FROZEN for measurement; this file exists so individual
queries can be timed and their plans captured without touching it.

Usage:
    python bench_extra.py time  q1 [q2 ...]   # best-of-N noop timing
    python bench_extra.py plan  q1 [q2 ...]   # write plans/r07/<q>_<tag>.txt
    python bench_extra.py all                 # time every batch query

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0 — the driver's
round-6 measurement scale), SPARK_GRAFT_CPUS (default 32),
SPARK_GRAFT_EXTRA_REPS (default 2), SPARK_GRAFT_PLAN_TAG (default
"after").
"""

from __future__ import annotations

import json
import os
import sys
import time


def _session(cpus: int):
    from dbus_spark.session import get_spark

    return get_spark(
        app_name="dbus_spark_bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_EXTRA_REPS", "2"))
    tag = os.environ.get("SPARK_GRAFT_PLAN_TAG", "after")
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    names = sys.argv[2:]

    import __spark_entry__ as entrymod
    from bench import BATCH_QUERIES, _prewarm_python_workers

    spark = _session(cpus)
    qs = entrymod.queries()
    if mode == "all" or not names:
        names = [n for n in BATCH_QUERIES if n in qs]

    if mode == "plan":
        outdir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "plans", "r07"
        )
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            df = qs[name](spark, sf_dir)
            p = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(outdir, f"{name}_{tag}.txt")
            with open(path, "w") as f:
                f.write(p)
            print(f"wrote {path}")
    else:
        # warm exactly like bench.py does
        for t in ("events", "documents", "embeddings"):
            spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()
        _prewarm_python_workers(spark)
        out = {}
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            best, walls = None, []
            for _ in range(reps):
                t0 = time.time()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.time() - t0
                walls.append(round(dt, 3))
                best = dt if best is None else min(best, dt)
            out[name] = {"best": round(best, 3), "walls": walls}
            print(json.dumps({name: out[name]}), flush=True)
        print(json.dumps({"sf_dir": sf_dir, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
