"""Operator CLI — the `dbc` / `dbusd -validate` analogs.

The reference ships two operator-facing entry points: `dbusd -conf x
-validate` (parse + construct the DAG, exit — cmd/dbusd/main.go:79-83)
and the `dbc` toolbox (`dbc checkpoint` position deltas, `dbc peek`
tail — cmd/dbc/command/checkpoint.go:24-105, peek.go:21-72). This is
the same surface over the Spark engine:

    python -m dbus_spark.cli validate  <pipeline.json>
    python -m dbus_spark.cli dot       <pipeline.json>
    python -m dbus_spark.cli checkpoint <checkpoint_dir>
    python -m dbus_spark.cli peek      <stream_dir> [-n 10]

`validate` and `dot` are driver-only (no SparkSession); `checkpoint`
reads the offsets/commits WAL off-path, exactly like the reference's
read-only CLI; `peek` spins a local session for a one-shot bounded
read.
"""

from __future__ import annotations

import argparse
import json
import sys


def load_config(path: str) -> dict:
    """Config file → dict (the reference parses HOCON-ish files from
    disk or ZooKeeper — engine/engine.go:186-213; we use JSON)."""
    with open(path) as f:
        return json.load(f)


def cmd_validate(args) -> int:
    from dbus_spark.pipeline import Pipeline

    try:
        p = Pipeline(load_config(args.config))
    except (
        ValueError,  # includes json.JSONDecodeError
        KeyError,
        TypeError,  # wrong-typed config fields
        OSError,  # missing/unreadable config file
    ) as e:
        print(f"INVALID: {e}", file=sys.stderr)
        return 1
    kinds = {}
    for plug in p.plugins.values():
        kinds[plug.kind] = kinds.get(plug.kind, 0) + 1
    print(
        "OK: "
        + ", ".join(f"{n} {k}" for k, n in sorted(kinds.items()))
    )
    return 0


def cmd_dot(args) -> int:
    from dbus_spark.pipeline import Pipeline

    print(Pipeline(load_config(args.config)).to_dot())
    return 0


def cmd_checkpoint(args) -> int:
    from dbus_spark.streaming.checkpoint import position_summary

    print(json.dumps(position_summary(args.checkpoint_dir), default=str))
    return 0


def cmd_peek(args) -> int:
    from dbus_spark.pipeline.streaming import peek
    from dbus_spark.session import get_spark

    spark = get_spark("dbus_peek", master="local[2]", shuffle_partitions=2)
    for row in peek(spark, args.dir, n=args.n):
        print(json.dumps(row.asDict(), default=str))
    spark.stop()
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="dbus_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate", help="parse + construct the DAG, exit")
    v.add_argument("config")
    v.set_defaults(fn=cmd_validate)

    d = sub.add_parser("dot", help="print the plugin DAG as graphviz dot")
    d.add_argument("config")
    d.set_defaults(fn=cmd_dot)

    c = sub.add_parser(
        "checkpoint", help="summarize a checkpoint dir (dbc checkpoint)"
    )
    c.add_argument("checkpoint_dir")
    c.set_defaults(fn=cmd_checkpoint)

    p = sub.add_parser("peek", help="tail a stream directory (dbc peek)")
    p.add_argument("dir")
    p.add_argument("-n", type=int, default=10)
    p.set_defaults(fn=cmd_peek)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
