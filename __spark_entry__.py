"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator family from
SURVEY.md §2 (routing/matching, windows, sessions, interval join,
ordering, scalar surface) or the training-data extensions (dedup,
MinHash/LSH, SimHash, Jaccard, text analysis, ANN) on the driver's
parquet tables; ``oracle_sql()`` holds the DuckDB-equivalent SQL.
Streaming-only machinery (applyInPandasWithState ordering, the
idempotent sink, checkpoint resume) is exercised by tests/ — it has no
batch-SQL equivalent by nature.

All hash functions used by sketch operators are md5-derived so the
oracle can reproduce them bit-for-bit (see dbus_spark/operators/
dedup.py docstring).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbus_spark.operators import windows as W
from dbus_spark.operators import dedup as D
from dbus_spark.operators import similarity as S
from dbus_spark.operators import text as TX
from dbus_spark.pipeline import Pipeline
from dbus_spark.pipeline.matcher import wildcard_match
from dbus_spark.sources.batch import load_table


def nullable_long_object(s):
    """Nullable integer pandas column → object dtype with real None
    and real Python ints.

    Every ``spark.createDataFrame(pandas)`` in this file must survive a
    VANILLA session (Arrow off — the driver's config): the non-Arrow
    ``_createFromLocal`` path degrades pandas ``Int64``/``pd.NA`` to a
    float ``nan`` that LongType verification rejects (r6 verdict #1,
    the ``asof_stream_replica`` crash). Crucially the SOURCE column is
    itself float64 under that session (Arrow-off ``toPandas`` of a
    nullable long yields floats), so a bare ``astype(object)`` keeps
    float OBJECTS (213.0) that LongType verification rejects just the
    same — every non-null value must be coerced to ``int`` (r7 vanilla
    sweep found exactly this residue of the r6 crash). Object dtype
    with Python ``int``/``None`` round-trips under both configs."""
    import pandas as pd

    return pd.Series(
        [None if pd.isna(v) else int(v) for v in s],
        index=s.index,
        dtype=object,
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the databus vertical on sf0.001 — route events through
    the config→DAG layer (re-key on event_type), then per-ident
    tumbling 1-hour windows (SURVEY.md §7.1)."""
    events = load_table(spark, "/root/testdata/sf0.001", "events")
    cfg = {
        "plugins": [
            {"name": "src", "class": "MemoryInput"},
            {
                "name": "rekey",
                "class": "RekeyFilter",
                "match": ["src"],
                "options": {"ident_col": "event_type"},
            },
            {
                "name": "out",
                "class": "MemoryOutput",
                "match": ["click", "purchase", "view", "signup", "error"],
            },
        ]
    }
    routed = Pipeline(cfg).run(spark, sources={"src": events})["out"]
    return W.windowed_agg(
        routed,
        "1 hour",
        aggs={
            "n_events": F.count("*"),
            "sum_value": F.round(F.sum("value"), 4),
        },
        keys=["ident"],
    )


# ---------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------


def _route_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    cfg = {
        "plugins": [
            {"name": "src", "class": "MemoryInput"},
            {
                "name": "rekey",
                "class": "RekeyFilter",
                "match": ["src"],
                "options": {"ident_col": "event_type"},
            },
            {
                "name": "out",
                "class": "MemoryOutput",
                "match": ["click", "purchase"],
            },
        ]
    }
    out = Pipeline(cfg).run(spark, sources={"src": events})["out"]
    return out.select("event_id", "ident")


def _route_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").withColumn(
        "ident",
        F.concat(
            F.lit("evt."),
            F.col("event_type"),
            F.lit(".u"),
            (F.col("user_id") % 10).cast("string"),
        ),
    )
    return events.filter(wildcard_match(["evt.*.u3"])).select(
        "event_id", "ident"
    )


def _fanout_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn("ident", F.col("event_type"))
        .groupBy("ident")
        .agg(F.count("*").alias("n"))
    )


def _tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return W.windowed_agg(
        events,
        "1 hour",
        aggs={
            "n_events": F.count("*"),
            "sum_value": F.round(F.sum("value"), 4),
        },
        keys=["user_id"],
    )


def _tumbling_window_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return W.salted_windowed_agg(
        events,
        "1 hour",
        aggs={"n_events": ("count", "event_id"), "max_v": ("max", "value")},
        keys=["user_id"],
        n_salts=8,
        salt_source="event_id",
    )


def _sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return W.windowed_agg(
        events,
        "1 day",
        slide="12 hours",
        aggs={"n_events": F.count("*")},
        keys=["event_type"],
    ).drop("window_end")


def _session_window_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    agg = events.groupBy(
        F.session_window("ts", "30 minutes").alias("_sw"), "user_id"
    ).agg(F.count("*").alias("n_events"), F.max("ts").alias("last_ts"))
    return agg.select(
        "user_id",
        F.col("_sw.start").alias("session_start"),
        "last_ts",
        "n_events",
    )


def _session_roles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sessionize() with the deterministic in-session event-type
    sequence (the FIXTURES.md expected_sessions shape on events)."""
    from dbus_spark.operators import sessionize

    events = load_table(spark, sf_dir, "events")
    return sessionize(
        events,
        gap="30 minutes",
        key="user_id",
        ts="ts",
        order="event_id",
        role="event_type",
    ).withColumnRenamed("roles", "type_seq")


def _session_stream_replica(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows driver-checked on the STREAMING path:
    sessionize() (Spark session_window state) over the events fixture
    as a 4-file stream with a 10-minute watermark, append mode.
    End-of-stream: two cascading far-future sentinel rows under a
    dummy key — the first advances the watermark past every real
    session's close, the second's micro-batch emits under that
    watermark (emission uses the previous batch's advance; the
    two-watermark rule tests/oracle_pd.py encodes) — then the dummy
    key is filtered out.  Oracle = the batch gaps-and-islands SQL of
    session_roles: stream must land on batch verdicts exactly."""
    import numpy as np
    import pandas as pd

    from dbus_spark.operators import sessionize

    pdf = (
        load_table(spark, sf_dir, "events")
        .select(
            F.col("user_id").cast("string").alias("user_id"),
            F.col("event_id"),
            F.col("event_type"),
            "ts",
        )
        .toPandas()
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    base_ts = pdf["ts"].max() + pd.Timedelta(hours=1)

    def build(src):
        return sessionize(
            src,
            gap="30 minutes",
            key="user_id",
            ts="ts",
            order="event_id",
            role="event_type",
            watermark="10 minutes",
        ).withColumnRenamed("roles", "type_seq")

    def sentinel_rows(j):
        return pd.DataFrame(
            {
                "user_id": ["_flush"],
                "event_id": [10**15 + j],
                "event_type": ["_flush"],
                "ts": [base_ts + pd.Timedelta(hours=2 * j)],
            }
        )

    out = _run_sentinel_window_stream(
        spark,
        pdf,
        "user_id string, event_id long, event_type string, ts timestamp",
        build,
        sentinel_rows,
        "session",
    )
    out = out[out["user_id"] != "_flush"]
    if not len(out):
        return spark.createDataFrame(
            [],
            "user_id bigint, session_start timestamp, "
            "last_ts timestamp, n_turns bigint, type_seq string",
        )
    out = pd.DataFrame(
        {
            "user_id": out["user_id"].astype(np.int64),
            "session_start": out["session_start"],
            "last_ts": out["last_ts"],
            "n_turns": out["n_turns"].astype(np.int64),
            "type_seq": out["type_seq"],
        }
    )
    return spark.createDataFrame(
        out,
        "user_id bigint, session_start timestamp, last_ts timestamp, "
        "n_turns bigint, type_seq string",
    )


def _interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter("event_type = 'click'").select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    buys = events.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    cond = (
        (clicks.user_id == buys.p_user_id)
        & (buys.purchase_ts > clicks.click_ts)
        & (buys.purchase_ts <= F.expr("click_ts + INTERVAL 30 MINUTES"))
    )
    return clicks.join(buys, cond, "inner").select(
        "user_id", "click_id", "purchase_id"
    )


def _window_stream_replica(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FLAGSHIP metric's operator driver-checked on the streaming
    path: windowed_agg (tumbling 1-hour, count + rounded sum, keyed by
    user) in append mode over the events fixture as a 4-file stream
    with a 10-minute watermark.  End-of-stream tail closed by the same
    two cascading dummy-key sentinels as the session replica; the
    emitted windows must equal the batch tumbling_window oracle
    exactly (every real window closes once the watermark passes it)."""
    import numpy as np
    import pandas as pd

    pdf = (
        load_table(spark, sf_dir, "events")
        .select(
            F.col("user_id").cast("string").alias("user_id"),
            F.col("event_id"),
            F.col("value"),
            "ts",
        )
        .toPandas()
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    base_ts = pdf["ts"].max() + pd.Timedelta(hours=2)

    def build(src):
        return W.windowed_agg(
            src,
            "1 hour",
            aggs={
                "n_events": F.count("*"),
                "sum_value": F.round(F.sum("value"), 4),
            },
            keys=["user_id"],
            watermark="10 minutes",
        )

    def sentinel_rows(j):
        return pd.DataFrame(
            {
                "user_id": ["_flush"],
                "event_id": [10**15 + j],
                "value": [0.0],
                "ts": [base_ts + pd.Timedelta(hours=3 * j)],
            }
        )

    out = _run_sentinel_window_stream(
        spark,
        pdf,
        "user_id string, event_id long, value double, ts timestamp",
        build,
        sentinel_rows,
        "tumbling",
    )
    out = out[out["user_id"] != "_flush"]
    if not len(out):
        return spark.createDataFrame(
            [],
            "window_start timestamp, window_end timestamp, "
            "user_id bigint, n_events bigint, sum_value double",
        )
    out = pd.DataFrame(
        {
            "window_start": out["window_start"],
            "window_end": out["window_end"],
            "user_id": out["user_id"].astype(np.int64),
            "n_events": out["n_events"].astype(np.int64),
            "sum_value": out["sum_value"],
        }
    )
    return spark.createDataFrame(
        out,
        "window_start timestamp, window_end timestamp, "
        "user_id bigint, n_events bigint, sum_value double",
    )


def _run_sentinel_window_stream(
    spark: SparkSession,
    pdf,
    schema: str,
    build,
    sentinel_rows,
    tag: str,
):
    """Shared driver for the window-family replicas: write ``pdf`` as
    a 4-file stream, run ``build(src)`` in append mode, then feed two
    cascading far-future sentinel batches (``sentinel_rows(j)`` for
    j=0,1 — the first advances the watermark past every real window,
    the second's batch emits under it), and return the collected
    output as one pandas frame."""
    import shutil
    import tempfile

    import numpy as np
    import pandas as pd

    tmp = tempfile.mkdtemp(prefix=f"winrep_{tag}_")
    try:
        in_dir = os.path.join(tmp, "in")
        os.makedirs(in_dir)
        for i, idx in enumerate(np.array_split(np.arange(len(pdf)), 4)):
            pdf.iloc[idx].to_parquet(
                os.path.join(in_dir, f"b-{i:04d}.parquet"),
                index=False,
                row_group_size=2000,
            )
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q, got = _collect_stream(build(src), os.path.join(tmp, "ck"))
        for j in (0, 1):
            sent = sentinel_rows(j)
            sent["ts"] = sent["ts"].astype("datetime64[us]")
            sent.to_parquet(
                os.path.join(in_dir, f"b-999{8 + j}.parquet"), index=False
            )
            q.processAllAvailable()
        q.stop()
        q.awaitTermination(60)
        return pd.concat(got, ignore_index=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _salted_window_stream_replica(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The SKEW path driver-checked streaming: salted_windowed_agg —
    TWO chained stateful aggregations in one query (partial agg keyed
    (window, user, salt), merge keyed (window, user)) — over the
    events fixture as a stream, closed by the sentinel cascade.  Must
    equal the batch tumbling_window_salted oracle exactly; this is the
    north rule's 'salted two-phase aggregation' executing its
    streaming form under the driver's hash check."""
    import numpy as np
    import pandas as pd

    pdf = (
        load_table(spark, sf_dir, "events")
        .select(
            F.col("user_id").cast("string").alias("user_id"),
            F.col("event_id"),
            F.col("value"),
            "ts",
        )
        .toPandas()
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    base_ts = pdf["ts"].max() + pd.Timedelta(hours=2)

    def build(src):
        return W.salted_windowed_agg(
            src,
            "1 hour",
            aggs={
                "n_events": ("count", "event_id"),
                "max_v": ("max", "value"),
            },
            keys=["user_id"],
            n_salts=8,
            salt_source="event_id",
            watermark="10 minutes",
        )

    def sentinel_rows(j):
        return pd.DataFrame(
            {
                "user_id": ["_flush"],
                "event_id": [10**15 + j],
                "value": [0.0],
                "ts": [base_ts + pd.Timedelta(hours=3 * j)],
            }
        )

    out = _run_sentinel_window_stream(
        spark,
        pdf,
        "user_id string, event_id long, value double, ts timestamp",
        build,
        sentinel_rows,
        "salted",
    )
    out = out[out["user_id"] != "_flush"]
    if not len(out):
        return spark.createDataFrame(
            [],
            "window_start timestamp, window_end timestamp, "
            "user_id bigint, n_events bigint, max_v double",
        )
    out = pd.DataFrame(
        {
            "window_start": out["window_start"],
            "window_end": out["window_end"],
            "user_id": out["user_id"].astype(np.int64),
            "n_events": out["n_events"].astype(np.int64),
            "max_v": out["max_v"],
        }
    )
    return spark.createDataFrame(
        out,
        "window_start timestamp, window_end timestamp, user_id bigint, "
        "n_events bigint, max_v double",
    )


def _sliding_window_stream_replica(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sliding (overlapping) windows driver-checked streaming: the
    1-day/12-hour window over events keyed by event_type, sentinel
    cascade closing the tail.  Each event lands in 2 overlapping
    windows; all real windows must equal the batch sliding_window
    oracle exactly."""
    import pandas as pd

    pdf = (
        load_table(spark, sf_dir, "events")
        .select(F.col("event_type"), F.col("event_id"), "ts")
        .toPandas()
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    base_ts = pdf["ts"].max() + pd.Timedelta(days=3)

    def build(src):
        return W.windowed_agg(
            src,
            "1 day",
            slide="12 hours",
            aggs={"n_events": F.count("*")},
            keys=["event_type"],
            watermark="10 minutes",
        ).drop("window_end")

    def sentinel_rows(j):
        return pd.DataFrame(
            {
                "event_type": ["_flush"],
                "event_id": [10**15 + j],
                "ts": [base_ts + pd.Timedelta(days=2 * j)],
            }
        )

    out = _run_sentinel_window_stream(
        spark,
        pdf,
        "event_type string, event_id long, ts timestamp",
        build,
        sentinel_rows,
        "sliding",
    )
    out = out[out["event_type"] != "_flush"]
    if not len(out):
        return spark.createDataFrame(
            [],
            "window_start timestamp, event_type string, n_events bigint",
        )
    out = pd.DataFrame(
        {
            "window_start": out["window_start"],
            "event_type": out["event_type"],
            "n_events": out["n_events"].astype("int64"),
        }
    )
    return spark.createDataFrame(
        out,
        "window_start timestamp, event_type string, n_events bigint",
    )


def _interval_join_stream_replica(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The stateful stream-stream interval join driver-checked: the
    events fixture streams as TWO sources (click side, purchase side,
    same 4-file directory), watermarked on both event-time columns;
    Spark sizes the join state from the interval condition (clicks
    retained 30 min + watermark past their time).  Inner joins emit
    eagerly on match, so the in-order finite replay needs no
    end-of-stream flush; the matched set must equal the batch
    interval_join oracle exactly."""
    import shutil
    import tempfile

    import numpy as np
    import pandas as pd

    pdf = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", "event_type", "ts")
        .toPandas()
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    tmp = tempfile.mkdtemp(prefix="ijoin_replica_")
    try:
        in_dir = os.path.join(tmp, "in")
        os.makedirs(in_dir)
        for i, idx in enumerate(np.array_split(np.arange(len(pdf)), 4)):
            pdf.iloc[idx].to_parquet(
                os.path.join(in_dir, f"b-{i:04d}.parquet"),
                index=False,
                row_group_size=2000,
            )

        def _src():
            return (
                spark.readStream.schema(
                    "user_id long, event_id long, event_type string, "
                    "ts timestamp"
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(in_dir)
            )

        clicks = (
            _src()
            .filter("event_type = 'click'")
            .select(
                "user_id",
                F.col("event_id").alias("click_id"),
                F.col("ts").alias("click_ts"),
            )
            .withWatermark("click_ts", "10 minutes")
        )
        buys = (
            _src()
            .filter("event_type = 'purchase'")
            .select(
                F.col("user_id").alias("p_user_id"),
                F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("purchase_ts"),
            )
            .withWatermark("purchase_ts", "10 minutes")
        )
        cond = (
            (clicks.user_id == buys.p_user_id)
            & (buys.purchase_ts > clicks.click_ts)
            & (
                buys.purchase_ts
                <= F.expr("click_ts + INTERVAL 30 MINUTES")
            )
        )
        v = clicks.join(buys, cond, "inner").select(
            "user_id", "click_id", "purchase_id"
        )
        q, got = _collect_stream(v, os.path.join(tmp, "ck"))
        q.stop()
        q.awaitTermination(60)
        out = pd.concat(got, ignore_index=True)
        if not len(out):
            return spark.createDataFrame(
                [], "user_id bigint, click_id bigint, purchase_id bigint"
            )
        out = out.astype(
            {c: np.int64 for c in ("user_id", "click_id", "purchase_id")}
        )
        return spark.createDataFrame(
            out, "user_id bigint, click_id bigint, purchase_id bigint"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every purchase attributes to the user's most recent
    click at-or-before it (backward inexact match). Implemented as the
    union-and-carry window plan — ONE shuffle on user_id, no join node,
    no range-candidate blowup (operators/join.py::asof_join)."""
    from dbus_spark.operators.join import asof_join

    events = load_table(spark, sf_dir, "events")
    purchases = events.filter("event_type = 'purchase'").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id")
    )
    clicks = events.filter("event_type = 'click'").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    out = asof_join(
        purchases,
        clicks,
        by="user_id",
        ts="ts",
        right_cols=["click_id"],
        order_col="click_id",
    )
    return out.select("user_id", "purchase_id", "click_id")


def _asof_stream_replica(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The as-of join's STREAMING twin driver-checked: clicks update a
    per-user latest-click register (one row of state per live key),
    purchases probe it as they arrive
    (operators/join.py::streaming_asof_join).  Probes emit in their
    own micro-batch — no end-of-stream flush needed — and the matched
    set must equal the batch union-and-carry oracle exactly,
    including the tie rules (click visible at equal ts, max click_id
    among same-ts clicks)."""
    import shutil
    import tempfile

    import numpy as np
    import pandas as pd

    from dbus_spark.operators.join import streaming_asof_join

    pdf = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(
            F.col("user_id").cast("string").alias("user_id"),
            F.col("event_id"),
            F.col("event_type"),
            F.when(
                F.col("event_type") == "click", F.col("event_id")
            ).alias("click_id"),
            "ts",
        )
        .toPandas()
        .sort_values(["ts", "event_id"])
        .reset_index(drop=True)
    )
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    # nullable long: plain astype would make parquet DOUBLE
    pdf["click_id"] = pdf["click_id"].astype("Int64")
    tmp = tempfile.mkdtemp(prefix="asof_replica_")
    try:
        in_dir = os.path.join(tmp, "in")
        os.makedirs(in_dir)
        for i, idx in enumerate(np.array_split(np.arange(len(pdf)), 4)):
            pdf.iloc[idx].to_parquet(
                os.path.join(in_dir, f"b-{i:04d}.parquet"),
                index=False,
                row_group_size=2000,
            )
        src = (
            spark.readStream.schema(
                "user_id string, event_id long, event_type string, "
                "click_id long, ts timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        v = streaming_asof_join(
            src,
            is_right="event_type = 'click'",
            right_cols=["click_id"],
            key="user_id",
            order="event_id",
            ts="ts",
            watermark="10 minutes",
            ttl_ms=86_400_000,
            n_buckets=8,
        )
        q, got = _collect_stream(v, os.path.join(tmp, "ck"))
        q.stop()
        q.awaitTermination(60)
        out = pd.concat(got, ignore_index=True)
        if not len(out):
            return spark.createDataFrame(
                [], "user_id bigint, purchase_id bigint, click_id bigint"
            )
        out = pd.DataFrame(
            {
                "user_id": out["key"].astype(np.int64),
                "purchase_id": out["order"].astype(np.int64),
                "click_id": nullable_long_object(out["click_id"]),
            }
        )
        return spark.createDataFrame(
            out, "user_id bigint, purchase_id bigint, click_id bigint"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _cdc_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship DAG — multi-table binlog dispatch
    (etc/canal.cf: one CDC stream, per-table routing) — on the TPC-H-ish
    tables: two tables enter the bus as packets, idents default to
    their input names, one output subscribes to both, then a per-table
    per-day rollup. Exercises multi-input union routing end-to-end."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").alias("event_day"),
        F.col("o_totalprice").alias("val"),
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_shipdate").alias("event_day"),
        F.col("l_extendedprice").alias("val"),
    )
    cfg = {
        "plugins": [
            {"name": "orders_src", "class": "MemoryInput"},
            {"name": "lineitem_src", "class": "MemoryInput"},
            {
                "name": "bus_out",
                "class": "MemoryOutput",
                "match": ["orders_src", "lineitem_src"],
            },
        ]
    }
    routed = Pipeline(cfg).run(
        spark,
        sources={"orders_src": orders, "lineitem_src": lineitem},
    )["bus_out"]
    return routed.groupBy("ident", "event_day").agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("val"), 2).alias("sum_val"),
    )


def _dim_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-join enrichment: the fact stream joins a small dimension
    chain (customer → nation → region). The whole dim side is
    broadcast — the fact scan never shuffles for the join, only the
    final rollup aggregates (plan-asserted in tests/test_plans.py).
    At 100 TB this is the shape for any metadata/catalog lookup the
    reference does via its per-table column cache."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").select(
        "r_regionkey", "r_name"
    )
    dim = (
        customer.join(
            F.broadcast(nation),
            customer.c_nationkey == nation.n_nationkey,
        )
        .join(
            F.broadcast(region), nation.n_regionkey == region.r_regionkey
        )
        .select("c_custkey", "r_name")
    )
    return (
        orders.join(F.broadcast(dim), orders.o_custkey == dim.c_custkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


def _ordered_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id", "event_id", F.row_number().over(w).alias("seq")
    )


def _cep_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP contiguous pattern: view -> click -> purchase as three
    CONSECUTIVE events of one user (per-user order = event_id, which
    is globally ts-ordered in this corpus), completing within 24 hours
    (the bound excludes ~30% of raw triples at sf0.01 — it must bite,
    not be decorative).  lead()-based: one shuffle on user_id, no
    self-join (operators/cep.py::match_sequence)."""
    from dbus_spark.operators.cep import match_sequence

    events = load_table(spark, sf_dir, "events")
    return match_sequence(
        events,
        ["view", "click", "purchase"],
        key="user_id",
        order="event_id",
        sym="event_type",
        within="24 hours",
    )


def _cep_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP variable-length runs: >=3 consecutive same-type events per
    user (gaps-and-islands, operators/cep.py::match_runs)."""
    from dbus_spark.operators.cep import match_runs

    events = load_table(spark, sf_dir, "events")
    return match_runs(
        events, key="user_id", order="event_id", sym="event_type",
        min_len=3,
    )


def _cep_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered (non-contiguous) funnel: users reaching
    view -> click -> purchase where each stage's earliest qualifying
    event strictly follows the previous stage's time
    (operators/cep.py::funnel)."""
    from dbus_spark.operators.cep import funnel

    events = load_table(spark, sf_dir, "events")
    return funnel(
        events,
        [
            ("view", "event_type = 'view'"),
            ("click", "event_type = 'click'"),
            ("purchase", "event_type = 'purchase'"),
        ],
        key="user_id",
    )


def _cep_absence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP timeout pattern: 'view' events with NO 'click' by the same
    user within the next 24 hours (strictly later in event order).
    Running-min-over-reversed-order window — one shuffle, no
    NOT-EXISTS anti-join (operators/cep.py::match_absence)."""
    from dbus_spark.operators.cep import match_absence

    events = load_table(spark, sf_dir, "events")
    return match_absence(
        events,
        first="view",
        absent="click",
        within="24 hours",
        key="user_id",
        order="event_id",
        sym="event_type",
    )


def _stream_events_files(spark: SparkSession, sf_dir: str, tag: str):
    """Serve the events fixture as a file stream: globally event_id-
    ordered (= ts-ordered in this corpus, the per-key in-order input
    contract of the CEP twins), split into 4 sequential files so the
    run crosses micro-batch boundaries.  Returns (src_df, tmp_dir,
    in_dir, ordered_pandas)."""
    import tempfile

    tmp = tempfile.mkdtemp(prefix=f"cep_replica_{tag}_")
    in_dir = os.path.join(tmp, "in")
    os.makedirs(in_dir)
    pdf = (
        load_table(spark, sf_dir, "events")
        .select(
            F.col("user_id").cast("string").alias("key"),
            F.col("event_id").alias("order"),
            F.col("event_type").alias("sym"),
            "ts",
        )
        .toPandas()
        .sort_values("order")
        .reset_index(drop=True)
    )
    # microsecond unit: pandas' default ns-timestamps write a parquet
    # physical type Spark's streaming schema ("ts timestamp") rejects
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    import numpy as np

    parts = np.array_split(np.arange(len(pdf)), 4)
    for i, idx in enumerate(parts):
        pdf.iloc[idx].to_parquet(
            os.path.join(in_dir, f"b-{i:04d}.parquet"), index=False
        )
    src = (
        spark.readStream.schema(
            "key string, order long, sym string, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    return src, tmp, in_dir, pdf


def _collect_stream(out_df, ck_dir: str):
    """Run a streaming DataFrame to end-of-available-input, collecting
    every append batch; returns (query, list_of_pandas).  Caller stops
    the query (or drives more input first)."""
    import pandas as pd

    got: list = []

    def _sink(batch_df, _epoch):
        got.append(batch_df.toPandas())

    q = (
        out_df.writeStream.outputMode("append")
        .option("checkpointLocation", ck_dir)
        .foreachBatch(_sink)
        .start()
    )
    q.processAllAvailable()
    return q, got


def _cep_funnel_stream_replica(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The funnel's STREAMING twin, driver-checked: run
    streaming_funnel (operators/cep.py) to end-of-input over the
    events fixture served as a 4-file stream, then aggregate its
    per-key stage-advance events to the batch operator's output shape
    ``(stage_idx, stage, n_keys)``.  Oracle = the same SQL as
    cep_funnel — the stream must land on the batch verdicts exactly.
    Per-key state is two scalars (n_reached, last_reached_ts); stage
    predicates are a JVM-side bitmask, no text reaches Python."""
    import shutil

    from dbus_spark.operators.cep import streaming_funnel

    stages = [
        ("view", "sym = 'view'"),
        ("click", "sym = 'click'"),
        ("purchase", "sym = 'purchase'"),
    ]
    src, tmp, _in_dir, _pdf = _stream_events_files(spark, sf_dir, "funnel")
    try:
        v = streaming_funnel(
            src,
            stages,
            key="key",
            order="order",
            ts="ts",
            watermark="10 minutes",
            ttl_ms=86_400_000,
            n_buckets=8,
        )
        q, got = _collect_stream(v, os.path.join(tmp, "ck"))
        q.stop()
        q.awaitTermination(60)
        import pandas as pd

        adv = pd.concat(got, ignore_index=True)
        adv_df = (
            spark.createDataFrame(
                adv[["key", "stage_idx"]],
                "key string, stage_idx int",
            )
            if len(adv)
            else spark.createDataFrame([], "key string, stage_idx int")
        )
        stages_df = spark.createDataFrame(
            [(i, n) for i, (n, _) in enumerate(stages)],
            "stage_idx int, stage string",
        )
        counts = adv_df.groupBy("stage_idx").agg(
            F.count("*").alias("_n")
        )
        return (
            stages_df.join(counts, "stage_idx", "left")
            .select(
                "stage_idx",
                "stage",
                F.coalesce("_n", F.lit(0)).cast("bigint").alias("n_keys"),
            )
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _cep_absence_stream_replica(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The absence/timeout pattern's STREAMING twin, driver-checked:
    streaming_match_absence over the 4-file events stream, then one
    per-key flush-sentinel file (sym outside the alphabet, ts past
    every deadline) so end-of-stream pending entries resolve by the
    DATA path — the documented stream-end flush idiom, giving exact
    batch-verdict equality on finite input.  Oracle = the same SQL as
    cep_absence."""
    import shutil

    import numpy as np
    import pandas as pd

    from dbus_spark.operators.cep import streaming_match_absence

    src, tmp, in_dir, pdf = _stream_events_files(spark, sf_dir, "absence")
    try:
        v = streaming_match_absence(
            src,
            first="view",
            absent="click",
            within="24 hours",
            key="key",
            order="order",
            sym="sym",
            ts="ts",
            watermark="10 minutes",
            ttl_ms=86_400_000,
            n_buckets=8,
        )
        q, got = _collect_stream(v, os.path.join(tmp, "ck"))
        # flush sentinels: per key, order past its max, ts past every
        # possible deadline — closes all pending entries via the
        # same-key-row-past-deadline rule (never matches `first`)
        flush_ts = pdf["ts"].max() + pd.Timedelta(hours=24, minutes=1)
        sent = (
            pdf.groupby("key", sort=False)["order"]
            .max()
            .reset_index()
            .assign(
                order=lambda d: d["order"] + 1,
                sym="_flush",
                ts=flush_ts,
            )
        )
        sent["ts"] = sent["ts"].astype("datetime64[us]")
        sent.to_parquet(
            os.path.join(in_dir, "b-9999.parquet"), index=False
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(60)
        out = pd.concat(got, ignore_index=True)
        if not len(out):
            return spark.createDataFrame(
                [],
                "user_id bigint, start_event_id bigint, "
                "start_ts timestamp",
            )
        out = pd.DataFrame(
            {
                "user_id": out["key"].astype(np.int64),
                "start_event_id": out["start_order"].astype(np.int64),
                "start_ts": out["start_ts"],
            }
        )
        return spark.createDataFrame(
            out,
            "user_id bigint, start_event_id bigint, start_ts timestamp",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _ordered_stream_replica(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FLAGSHIP stateful operator driver-checked: feed
    ordered_turns_stream (bucket-coarsened AIPWS ordering/dedup,
    operators/ordering.py) a deterministically SHUFFLED and
    DUPLICATED transcript-shaped stream built from the events fixture,
    and the emitted rows must equal the in-order deduped truth — the
    north rule's "per-turn text equality under stable turn ordering"
    invariant as an oracle row, not just a pytest.

    Construction: turns = events with conv_id = user_id,
    turn_idx = per-user ROW_NUMBER by (ts, event_id), text = props;
    arrival order = md5(event_id) (a deterministic global shuffle), a
    redelivery tail re-sends every 7th row byte-identically.  The
    fixture has no gaps, so every conversation's received set becomes
    contiguous by end-of-input and the contiguity rule emits
    everything without waiting on the watermark."""
    import shutil
    import tempfile

    import numpy as np

    from dbus_spark.operators.ordering import ordered_turns_stream

    base = (
        load_table(spark, sf_dir, "events")
        .select(
            F.col("user_id").cast("string").alias("conv_id"),
            (
                F.row_number().over(
                    Window.partitionBy("user_id").orderBy("ts", "event_id")
                )
                - 1  # zero-based: the ordering frontier starts at 0
            ).alias("turn_idx"),
            F.col("event_type").alias("role"),
            F.col("props").alias("text"),
            F.col("event_type").alias("tool"),
            "ts",
            F.md5(F.col("event_id").cast("string")).alias("_arr"),
            F.col("event_id").alias("_eid"),
        )
    )
    pdf = base.toPandas().sort_values("_arr").reset_index(drop=True)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    dup = pdf[pdf["_eid"] % 7 == 0]
    feed = __import__("pandas").concat([pdf, dup], ignore_index=True)
    feed = feed.drop(columns=["_arr", "_eid"])
    tmp = tempfile.mkdtemp(prefix="ordered_replica_")
    try:
        in_dir = os.path.join(tmp, "in")
        os.makedirs(in_dir)
        parts = np.array_split(np.arange(len(feed)), 5)
        for i, idx in enumerate(parts):
            feed.iloc[idx].to_parquet(
                os.path.join(in_dir, f"b-{i:04d}.parquet"),
                index=False,
                row_group_size=2000,
            )
        src = (
            spark.readStream.schema(
                "conv_id string, turn_idx int, role string, "
                "text string, tool string, ts timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        # watermark wider than the fixture's event-time span: arrival
        # order is a full shuffle, so event-time regression between
        # micro-batches must never late-drop a real turn
        v = ordered_turns_stream(
            src, watermark="100 days", flush_after_ms=60_000, n_buckets=8
        )
        q, got = _collect_stream(v, os.path.join(tmp, "ck"))
        q.stop()
        q.awaitTermination(60)
        import pandas as pd

        out = pd.concat(got, ignore_index=True)
        return spark.createDataFrame(
            out,
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _cep_quantified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP Kleene-quantified pattern: ``view{1,3} click{1,}
    purchase{1,}`` within 24 hours under maximal-run semantics (each
    position consumes one maximal same-type run; runs must be
    consecutive).  Run contraction + run-level lead() — one
    hash-partition on the key end-to-end, no join
    (operators/cep.py::match_quantified)."""
    from dbus_spark.operators.cep import match_quantified

    events = load_table(spark, sf_dir, "events")
    return match_quantified(
        events,
        [("view", 1, 3), ("click", 1, None), ("purchase", 1, None)],
        key="user_id",
        order="event_id",
        sym="event_type",
        within="24 hours",
    )


def _cep_dsl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CEP pattern-string DSL front end: the SAME quantified
    pattern as cep_quantified, but carried as the config-file form
    `"view{1,3} click{1,} purchase{1,} within 24 hours"` and parsed
    by operators/cep.py::parse_pattern — one front end, one plan,
    pinned by sharing cep_quantified's oracle."""
    from dbus_spark.operators.cep import match_pattern

    events = load_table(spark, sf_dir, "events")
    return match_pattern(
        events,
        "view{1,3} click{1,} purchase{1,} within 24 hours",
        key="user_id",
        order="event_id",
        sym="event_type",
    )


def _doc_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per-doc 8-gram overlap against a
    deterministic benchmark set (the first 25 tokens of every 13th
    document — a stand-in eval set that yields both fully and
    partially contaminated docs).  Broadcast the benchmark's n-gram
    set, one Arrow shingle pass over the corpus, one doc-keyed rollup
    (operators/decontam.py::ngram_contamination)."""
    from dbus_spark.operators.decontam import ngram_contamination
    from dbus_spark.operators.text import tokens

    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 13 == 0).select(
        "doc_id",
        F.array_join(F.slice(tokens("text"), 1, 25), " ").alias("text"),
    )
    return ngram_contamination(docs, bench, n=8)


def _doc_decontam_excise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level decontamination (Dolma variant): re-chunk docs into
    12-token paragraphs, excise only the paragraphs containing an
    8-gram of the eval set (every 13th doc's first 25 tokens), keep
    the rest.  Map-side — the benchmark n-gram set rides the Arrow
    UDF closure (operators/decontam.py::excise_contaminated_spans)."""
    from dbus_spark.operators.decontam import (
        collect_bench_ngrams,
        excise_contaminated_spans,
    )
    from dbus_spark.operators.text import tokens

    docs = _docs(spark, sf_dir)
    toks = tokens("text")
    paras = F.transform(
        F.sequence(F.lit(0), F.floor((F.size(toks) - 1) / 12)),
        lambda i: F.array_join(F.slice(toks, i * 12 + 1, 12), " "),
    )
    chunked = docs.select(
        "doc_id", F.array_join(paras, "\n\n").alias("text")
    )
    bench = docs.filter(F.col("doc_id") % 13 == 0).select(
        F.array_join(F.slice(tokens("text"), 1, 25), " ").alias("text")
    )
    grams = collect_bench_ngrams(bench)
    return excise_contaminated_spans(
        chunked, grams, out_col="text_clean", n=8
    ).select("doc_id", "n_spans", "n_excised", "text_clean")


_MIX_RATES = {"en": 0.5, "de": 1.0, "es": 0.25, "zh": 0.75}  # fr → default 0


def _doc_sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified mixture sampling: down-sample the
    corpus to per-language target rates with an md5-derived per-doc
    draw (reproducible on any engine/cluster), then report achieved
    vs source mixture.  Map-side filter, stratum-sized shuffle only
    (operators/corpus.py::sample_mixture/mixture_report)."""
    from dbus_spark.operators.corpus import mixture_report, sample_mixture

    docs = _docs(spark, sf_dir)
    kept = sample_mixture(docs, _MIX_RATES, strata_col="lang", seed=7)
    return mixture_report(docs, kept, strata_col="lang")


def _doc_pack_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget sequence packing (budget=64 so the corpus,
    10-99 tokens/doc, exercises both multi-doc packs and the
    oversized-doc-packs-alone path), rolled up per pack.  Python sees
    only int64 token counts; the only shuffle is the shard groupBy
    (operators/corpus.py::pack_sequences/pack_report)."""
    from dbus_spark.operators.corpus import pack_report, pack_sequences

    docs = _docs(spark, sf_dir)
    packed = pack_sequences(docs, budget=64, n_shards=8)
    return pack_report(packed, budget=64)


def _doc_sample_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture sampling: per language, keep the longest
    md5-draw-ordered prefix of docs whose token total fits the budget
    (en 4000 / de 2000 / zh 1500 tokens; es+fr dropped) — mixtures are
    specified in tokens, not doc counts, in real training configs
    (operators/corpus.py::sample_token_budget)."""
    from dbus_spark.operators.corpus import sample_token_budget

    docs = _docs(spark, sf_dir)
    kept = sample_token_budget(
        docs, {"en": 4000, "de": 2000, "zh": 1500}, seed=7
    )
    return kept.select("doc_id", "lang")


def _doc_pack_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense concat-and-chunk packing (docs span packs, zero padding
    waste — the packed-pretraining-batch shape): one cumsum window per
    shard, no recursion, no Python; one row per (doc, pack) slice
    (operators/corpus.py::pack_sequences_dense)."""
    from dbus_spark.operators.corpus import pack_sequences_dense

    docs = _docs(spark, sf_dir)
    return pack_sequences_dense(docs, budget=64, n_shards=8)


def _doc_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: inject deterministic synthetic PII (the corpus has
    none) — an email, an IP, a phone per doc, a card every 5th doc —
    then count hits per type in redaction order and return the
    redacted text.  Pure Catalyst regexp chain, zero shuffle
    (operators/corpus.py::pii_counts/redact_pii)."""
    from dbus_spark.operators.corpus import pii_counts, redact_pii

    docs = _docs(spark, sf_dir)
    injected = docs.select(
        "doc_id",
        F.concat_ws(
            "",
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com ip 10.0."),
            F.pmod("doc_id", F.lit(256)).cast("string"),
            F.lit(".7 call 415-555-"),
            F.lpad(F.pmod("doc_id", F.lit(10000)).cast("string"), 4, "0"),
            F.when(
                F.col("doc_id") % 5 == 0, F.lit(" card 4111 1111 1111 1111")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    counted = pii_counts(injected)
    return redact_pii(counted, out_col="text_redacted").select(
        "doc_id", "n_email", "n_card", "n_phone", "n_ipv4", "text_redacted"
    )


def _doc_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide paragraph-level exact dedup (Dolma/RefinedWeb
    pass): re-chunk each doc into 12-token paragraphs (the corpus has
    no newlines), keep only each distinct paragraph's first
    occurrence by (doc_id, position), reassemble survivors in order.
    posexplode → one span-keyed window → one doc-keyed reassembly
    (operators/corpus.py::dedup_spans)."""
    from dbus_spark.operators.corpus import dedup_spans
    from dbus_spark.operators.text import tokens

    docs = _docs(spark, sf_dir)
    toks = tokens("text")
    paras = F.transform(
        F.sequence(F.lit(0), F.floor((F.size(toks) - 1) / 12)),
        lambda i: F.array_join(F.slice(toks, i * 12 + 1, 12), " "),
    )
    chunked = docs.select(
        "doc_id", F.array_join(paras, "\n\n").alias("text")
    )
    return dedup_spans(chunked, delim="\n\n", out_col="text_dedup")


def _doc_unigram_logppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM perplexity quality score (the CCNet/FineWeb filter
    family's oracle-replayable member): train add-one-smoothed unigram
    log-probs on the corpus itself and score each doc's mean negative
    log-prob per token.  Int64 micro-nat fixed point makes the sum
    exact and shuffle-order-independent; one scan of the text column
    feeds both the LM counts and the per-doc rollup
    (operators/text.py::doc_logppl)."""
    from dbus_spark.operators.text import doc_logppl

    return doc_logppl(_docs(spark, sf_dir))


def _emb_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (public, arXiv:2303.09540): cluster-scoped semantic
    dedup — IVF-assign to 16 seeded cells, pairs above cosine 0.4
    within a cell are semantic duplicates, keep the one FARTHER from
    the centroid (tie: lower id).  The only pair join is within
    cells, so candidates are sum(cell²), never corpus²
    (operators/similarity.py::semdedup)."""
    emb = load_table(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    return S.semdedup(emb, threshold=0.4, dim=64, n_centroids=16, seed=11)


def _doc_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic export-shard assignment (WebDataset/Dolma shard
    cut): per language, docs in id order; a doc's shard is the bucket
    its start offset falls into at an 8 KiB budget (docs never split;
    overflow bounded by one doc).  One stratum-partitioned window —
    no global ordering (operators/corpus.py::shard_plan)."""
    from dbus_spark.operators.corpus import shard_plan

    return shard_plan(load_table(spark, sf_dir, "documents"), 8192)


def _doc_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard manifest over the shard plan: doc count, byte total,
    id range — the seek sidecar an exporter writes next to each shard
    (operators/corpus.py::shard_manifest)."""
    from dbus_spark.operators.corpus import shard_manifest, shard_plan

    return shard_manifest(
        shard_plan(load_table(spark, sf_dir, "documents"), 8192)
    )


def _corpus_topk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters: global top-20 tokens by occurrence (tie:
    token ASC).  Exact arm planned as TakeOrderedAndProject —
    per-partition top-k merged at the driver, never a one-partition
    vocabulary sort; the exact=False arm is candidate+verify (local
    top-M per partition → exact re-count of candidates only), the
    shuffle-thrifty path for billion-entry n-gram vocabularies
    (operators/text.py::topk_tokens; arms pinned equal on fixtures)."""
    from dbus_spark.operators.text import topk_tokens

    return topk_tokens(_docs(spark, sf_dir), k=20, exact=True)


def _doc_dsir_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style domain-importance weight (arXiv:2302.03169): mean
    per-token log-likelihood ratio between a target-domain unigram LM
    (here: the corpus's English documents) and the raw-corpus LM —
    positive = looks like the target.  One persisted corpus scan for
    the raw side, one scan of the (smaller) target side, int64
    micro-nat exact sums (operators/text.py::dsir_logratio)."""
    from dbus_spark.operators.text import dsir_logratio

    docs = _docs(spark, sf_dir)
    target = docs.filter(F.col("lang") == "en")
    return dsir_logratio(docs, target)


def _doc_dsir_weight_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weight over HASHED unigram+bigram features —
    the form the paper ships (arXiv:2302.03169): features hashed into
    a fixed 65536-bucket space, add-one smoothing over the bucket
    space, mean per-feature log-likelihood ratio target-vs-raw.
    Feature hashing is JVM-side md5-h32 (oracle-reproducible, same
    parity contract as minhash shingles); LM state is bounded at
    n_buckets rows per side so both LMs broadcast at any corpus size
    (operators/text.py::dsir_logratio_hashed)."""
    from dbus_spark.operators.text import dsir_logratio_hashed

    docs = _docs(spark, sf_dir)
    target = docs.filter(F.col("lang") == "en")
    return dsir_logratio_hashed(docs, target, n_buckets=65536)


def _topk_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        events.withColumn("rnk", F.row_number().over(w))
        .filter("rnk <= 3")
        .select("user_id", "event_id", "rnk")
    )


def _event_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group quantiles (p50/p95/p99 of value per event type)
    - the OLAP latency-percentile staple. The oracle pins the EXACT
    arm (F.percentile == DuckDB quantile_cont to the bit); the same
    helper's exact=False arm is the mergeable percentile_approx
    sketch for 100 TB (see operators/quantiles.py; both arms are
    unit-tested against each other and benched side by side)."""
    from dbus_spark.operators.quantiles import grouped_quantiles

    events = load_table(spark, sf_dir, "events")
    return grouped_quantiles(events, "value", ["event_type"], exact=True)


def _event_user_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-user reach — the cardinality staple,
    same two-arm contract as event_quantiles: the oracle pins the
    EXACT arm (countDistinct == DuckDB COUNT(DISTINCT)); the
    exact=False arm is HyperLogLog++ (approx_count_distinct), the
    mergeable O(1)-per-group sketch that is also the only viable
    streaming-reach shape (operators/quantiles.py::grouped_distinct;
    arms unit-tested against each other)."""
    from dbus_spark.operators.quantiles import grouped_distinct

    events = load_table(spark, sf_dir, "events")
    return grouped_distinct(events, "user_id", ["event_type"], exact=True)


def _sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (subtotals + grand total in one pass over
    the fact table) with grouping_id disambiguating the null
    placeholder rows - the OLAP cube staple; Catalyst expands it to a
    single Expand + hash aggregate, one shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.grouping_id().alias("gid"),
    )


def _customer_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate window frame (cumulative spend per customer
    in order date order) - the frame-based window form the engine's
    ordering/top-k queries don't otherwise cover. Summation order is
    the (date, key) sort in BOTH engines, so doubles agree exactly."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.round(F.sum("o_totalprice").over(w), 2).alias("run_spend"),
    )


def _tpch_q3_lite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape on the available columns: 3-way fact join with
    selective predicates on every side (segment, order date, ship
    date) - Catalyst pushes each filter below its join to the parquet
    scan, and the revenue expression folds into the aggregate."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .filter(F.col("o_orderdate") < F.lit("1995-03-15"))
        .filter(F.col("l_shipdate") > F.lit("1995-03-15"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("revenue")
        )
    )


def _customers_no_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join surface (NOT EXISTS): customers with no order above
    the price threshold - plans as a broadcast/shuffled anti hash
    join, never a subquery-per-row."""
    cust = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 350000
    )
    return cust.join(
        big, cust.c_custkey == big.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


def _event_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.to_json(
            F.struct(F.col("event_id"), F.col("event_type"), F.col("user_id"))
        ).alias("js"),
    )


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents, spread across cores: the per-doc sketch/score ops are
    CPU-bound map work, and a small parquet arrives as one split —
    repartition so the stage parallelizes (at 100 TB the scan already
    has thousands of splits and this is a no-op policy knob)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.repartition(spark.sparkContext.defaultParallelism)


def _doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return D.exact_dedup_groups(docs)


def _doc_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select("doc_id", TX.token_count("text").alias("n_tokens"))


def _doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return TX.quality_features(docs)


def _doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select("doc_id", TX.lang_id("text").alias("lang_pred"))


def _doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select("doc_id", TX.fingerprint("text").alias("fp"))


def _doc_token_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id", TX.token_count_bpe("text").alias("n_bpe")
    )


def _doc_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    # explode_outer, not explode: same InferFiltersFromGenerate trap
    # as doc_minhash (a synthesized size()>0 filter would re-evaluate
    # the whole rolling-hash chain single-threaded at the scan)
    docs = _docs(spark, sf_dir)
    return D.winnow_fingerprints(docs)


def _doc_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the MOSS match step: near-verbatim overlap pairs via shared
    # winnowing fingerprints (df-cut on boilerplate fps before pairing)
    docs = _docs(spark, sf_dir)
    return D.winnow_match_pairs(docs, min_shared=2, max_df=50)


def _doc_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    sig = D.minhash_signature(docs, n_hashes=16)
    # posexplode_outer, NOT posexplode: the non-outer generator makes
    # InferFiltersFromGenerate synthesize `size(sig) > 0`, which gets
    # pushed below the repartition and evaluates the whole 16-hash
    # signature single-threaded at the scan (measured: 60s vs 4s)
    return sig.select(
        "doc_id", F.posexplode_outer("sig").alias("hash_idx", "minval")
    )


def _doc_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return D.lsh_candidate_pairs(docs, n_hashes=16, n_bands=4)


def _doc_lsh_est_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the MinHash payoff: per-candidate Jaccard ESTIMATE from signature
    # agreement - sketch-resident, documents never re-read
    docs = _docs(spark, sf_dir)
    return D.lsh_estimated_jaccard(docs, n_hashes=16, n_bands=4)


def _doc_neardup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the dedup DECISION step: LSH candidates -> sketch-resident
    # Jaccard estimate -> est>=0.5 edges -> connected components;
    # keep-one-per-group is then `doc_id == grp` (map-side)
    docs = _docs(spark, sf_dir)
    return D.doc_neardup_groups(docs, min_est_jaccard=0.5)


def _doc_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return D.simhash(docs)


def _doc_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return D.simhash_candidate_pairs(docs, prefix_bits=16)


def _doc_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return D.simhash_neardup_pairs(docs, prefix_bits=16, max_hamming=3)


def _doc_simhash_neardup_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pigeonhole-blocked tables: provably equal to the brute-force
    # hamming-ball answer, so the oracle IS the brute force - the
    # strongest check an approximate operator can get
    docs = _docs(spark, sf_dir)
    return D.simhash_neardup_pairs_blocked(docs, max_hamming=3)


def _doc_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    # max_df: document-frequency cut — the synthetic vocab is tiny, so
    # without it every shingle is hot and the pair join blows up
    return D.ngram_jaccard_pairs(docs, threshold=0.2, max_df=50)


def _corpus_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # vocabulary stats: per-token document frequency + smoothed idf —
    # the table vocab pruning / stopword cuts / TF-IDF weights read
    docs = _docs(spark, sf_dir)
    return TX.corpus_idf(docs)


def _doc_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # per-doc top-5 TF-IDF terms — keyword extraction over the corpus
    docs = _docs(spark, sf_dir)
    return TX.tfidf_topk(docs, k=5)


def _doc_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return TX.gopher_quality(docs)


def _doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return TX.repetition_metrics(docs)


def _doc_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return TX.char_entropy(docs)


def _corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-mixture report every LLM pipeline publishes: docs and
    chars per (lang, source) plus each cell's share of the corpus. The
    global share window runs over the AGGREGATED frame (langs x
    sources rows), not the corpus - the single-partition window is a
    few dozen rows regardless of corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    agg = docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("n_chars_total"),
    )
    return agg.select(
        "lang",
        "source",
        "n_docs",
        "n_chars_total",
        F.round(
            F.col("n_docs") / F.sum("n_docs").over(Window.partitionBy()), 4
        ).alias("corpus_share"),
    )


def _emb_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    return S.knn_bruteforce(emb, query_ids=[0, 1, 2, 3, 4], k=3)


def _emb_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    return S.neardup_pairs(emb, threshold=0.4)


def _emb_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # approximate ANN — deterministic given the seed; the seeded numpy
    # hyperplanes are shared into the oracle SQL as literals (the same
    # scheme as minhash_coeffs), so the check is value-exact
    emb = load_table(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    return S.knn_lsh(emb, query_ids=[0, 1, 2, 3, 4], dim=64, k=3)


def _emb_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the scale path for embedding near-dup: multi-table SRP bucket
    # join + exact-cosine verify — no CartesianProduct in the plan
    # (asserted in tests/test_plans.py)
    emb = load_table(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    return S.neardup_pairs_lsh(emb, threshold=0.4, dim=64)


def _emb_neardup_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the second scale path for embedding near-dup: multi-probe IVF
    # cells as candidate generator (cells track data with a trained
    # quantizer; SRP recall is fixed at index time) + exact verify
    emb = load_table(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    return S.neardup_pairs_ivf(emb, threshold=0.4, dim=64, n_probes=2)


def _emb_neardup_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    # IVF near-dup with the TRAINED coarse quantizer: cells track the
    # data distribution, so multi-probe candidates concentrate where
    # the near-dups actually are (same centroid protocol as
    # emb_knn_ivf_trained — 6-decimal rounding, numpy-replica oracle)
    emb = load_table(spark, sf_dir, "embeddings")
    cents = S.kmeans_centroids(
        emb, dim=64, n_centroids=16, seed=11, n_iter=5, init="kpp"
    )
    return S.neardup_pairs_ivf(
        emb.repartition(spark.sparkContext.defaultParallelism),
        threshold=0.4,
        dim=64,
        n_probes=2,
        centroids=cents,
    )


def _emb_neardup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    # connected components over the LSH near-dup graph (iterative
    # min-label propagation; driver loop schedules rounds only) —
    # oracle = recursive CTE over the identical edge set
    emb = load_table(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    return S.neardup_groups(emb, threshold=0.4, dim=64)


def _emb_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # IVF-style ANN: nearest-centroid inverted lists + multi-probe —
    # seeded centroids are shared into the oracle as literals
    emb = load_table(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    return S.knn_ivf(emb, query_ids=[0, 1, 2, 3, 4], dim=64, k=3)


def _emb_knn_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    # IVF with a TRAINED coarse quantizer: spherical k-means runs as a
    # Spark job on the same table (one scan per iteration, partial-sum
    # combine — scalars to the driver), then feeds knn_ivf. The
    # 6-decimal rounding protocol makes the trained centroids identical
    # to the numpy replica the oracle inlines (similarity.py docstring).
    emb = load_table(spark, sf_dir, "embeddings")
    cents = S.kmeans_centroids(
        emb, dim=64, n_centroids=16, seed=11, n_iter=5, init="kpp"
    )
    return S.knn_ivf(
        emb.repartition(spark.sparkContext.defaultParallelism),
        query_ids=[0, 1, 2, 3, 4],
        dim=64,
        k=3,
        centroids=cents,
    )


def _multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # mapInPandas decode plumbing with the deterministic fake decoder
    # (no codec libs in container); the md5-derived fixture is
    # value-checked by a DuckDB oracle
    from dbus_spark.operators import multimodal as MM

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # size the partitioning from the scan's split count, not a count()
    # job: each partition spins a python worker for the decode UDF, so
    # 32 workers for a one-split parquet is pure startup overhead. A
    # small static boost covers tiny fixtures; at real scale the scan
    # already has >= that many splits and this is a no-op.
    scan_parts = docs.rdd.getNumPartitions()
    parts = min(8, spark.sparkContext.defaultParallelism)
    if parts > scan_parts:
        docs = docs.repartition(parts)
    media = MM.attach_fake_media(docs)
    feats = MM.extract_media_features(media)
    return feats.select(
        "doc_id",
        "n_bytes",
        F.round(F.element_at("features", 1), 4).alias("f0"),
    )


def _multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    # video-style 1->N frame sampling under mapInPandas: every 4th
    # 16-byte window of the payload becomes a frame row. The fake
    # payload repeats the md5 digest, so each frame equals the digest
    # bytes - fingerprinted (md5 of lowercase hex) for the value check.
    from dbus_spark.operators import multimodal as MM

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    media = MM.attach_fake_media(docs)
    frames = MM.sample_frames(media, every_n=4)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.md5(F.lower(F.hex("frame"))).alias("frame_fp"),
    )


def _multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # resize plumbing (stub codec: deterministic byte-slice 'resize' to
    # width*height/64 bytes) - schema/batch path exercised end to end,
    # output fingerprinted for the value check
    from dbus_spark.operators import multimodal as MM

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    media = MM.attach_fake_media(docs)
    resized = MM.resize_images(media, width=16, height=16)
    return resized.select(
        "doc_id",
        "width",
        "height",
        F.md5(F.lower(F.hex("content"))).alias("content_fp"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Registry rotation (round 6): the driver's correctness harness records
    # at most 50 rows; this registry holds 76+ queries.  Head = (a) the one
    # red r5 row (doc_dsir_weight — IEEE -0.0 oracle artifact, fixed this
    # round), (b) every query new or code-changed in round 6, (c) the 26
    # queries that sat out the r5 window (longest unchecked — their last
    # driver rows are r1–r4).  Tail = the 49 queries green in
    # CORRECTNESS_r05 with code unchanged since (all entries still run
    # against DuckDB every pytest via tests/test_entry_oracle.py).  The
    # rotation is documented in COVERAGE.md § "Registry rotation".
    return {
        # (a) red r5 row, code changed this round (+0.0 canonicalization)
        "doc_dsir_weight": _doc_dsir_weight,
        # (b) new in round 6
        "doc_dsir_weight_hashed": _doc_dsir_weight_hashed,
        "cep_funnel_stream_replica": _cep_funnel_stream_replica,
        "cep_absence_stream_replica": _cep_absence_stream_replica,
        "ordered_stream_replica": _ordered_stream_replica,
        "session_stream_replica": _session_stream_replica,
        "window_stream_replica": _window_stream_replica,
        "interval_join_stream_replica": _interval_join_stream_replica,
        "asof_stream_replica": _asof_stream_replica,
        "salted_window_stream_replica": _salted_window_stream_replica,
        "sliding_window_stream_replica": _sliding_window_stream_replica,
        # (c) longest-unchecked tail from r5 (last green rows r1–r4)
        "doc_simhash": _doc_simhash,
        "doc_simhash_pairs": _doc_simhash_pairs,
        "doc_simhash_neardup": _doc_simhash_neardup,
        "doc_simhash_neardup_full": _doc_simhash_neardup_full,
        "doc_jaccard_pairs": _doc_jaccard_pairs,
        "doc_gopher_quality": _doc_gopher_quality,
        "doc_repetition": _doc_repetition,
        "corpus_mixture": _corpus_mixture,
        "doc_char_entropy": _doc_char_entropy,
        "emb_knn": _emb_knn,
        "emb_neardup": _emb_neardup,
        "emb_neardup_lsh": _emb_neardup_lsh,
        "emb_neardup_ivf": _emb_neardup_ivf,
        "emb_neardup_ivf_trained": _emb_neardup_ivf_trained,
        "emb_knn_lsh": _emb_knn_lsh,
        "sliding_window": _sliding_window,
        "session_window_user": _session_window_user,
        "tpch_q3_lite": _tpch_q3_lite,
        "topk_per_user": _topk_per_user,
        "event_json": _event_json,
        "sales_rollup": _sales_rollup,
        "customer_running_spend": _customer_running_spend,
        "customers_no_big_orders": _customers_no_big_orders,
        "doc_fingerprint": _doc_fingerprint,
        "doc_token_bpe": _doc_token_bpe,
        "doc_winnow": _doc_winnow,
        # --- rotation tail: green in CORRECTNESS_r05, code unchanged
        # --- since.  The first ~20 land inside the 50-row window as
        # --- round-current re-confirmations; the rest sit out (they are
        # --- the most recently checked, still oracle-checked every
        # --- pytest).
        "emb_knn_ivf": _emb_knn_ivf,
        "emb_knn_ivf_trained": _emb_knn_ivf_trained,
        "multimodal_features": _multimodal_features,
        "multimodal_frames": _multimodal_frames,
        "multimodal_resize": _multimodal_resize,
        "cep_sequence": _cep_sequence,
        "cep_runs": _cep_runs,
        "cep_funnel": _cep_funnel,
        "cep_absence": _cep_absence,
        "cep_quantified": _cep_quantified,
        "cep_dsl": _cep_dsl,
        "emb_neardup_groups": _emb_neardup_groups,
        "doc_decontam": _doc_decontam,
        "doc_decontam_excise": _doc_decontam_excise,
        "doc_sample_mixture": _doc_sample_mixture,
        "doc_pack_report": _doc_pack_report,
        "doc_pack_dense": _doc_pack_dense,
        "doc_sample_tokens": _doc_sample_tokens,
        "doc_pii_redact": _doc_pii_redact,
        "doc_paragraph_dedup": _doc_paragraph_dedup,
        "doc_unigram_logppl": _doc_unigram_logppl,
        "emb_semdedup": _emb_semdedup,
        "doc_shard_plan": _doc_shard_plan,
        "doc_shard_manifest": _doc_shard_manifest,
        "event_user_reach": _event_user_reach,
        "corpus_topk_tokens": _corpus_topk_tokens,
        "route_exact": _route_exact,
        "route_wildcard": _route_wildcard,
        "fanout_counts": _fanout_counts,
        "tumbling_window": _tumbling_window,
        "tumbling_window_salted": _tumbling_window_salted,
        "session_roles": _session_roles,
        "interval_join": _interval_join,
        "asof_attribution": _asof_attribution,
        "cdc_dispatch": _cdc_dispatch,
        "dim_enrich": _dim_enrich,
        "ordered_seq": _ordered_seq,
        "event_quantiles": _event_quantiles,
        "doc_exact_dedup": _doc_exact_dedup,
        "doc_token_count": _doc_token_count,
        "doc_quality": _doc_quality,
        "doc_lang_id": _doc_lang_id,
        "doc_winnow_pairs": _doc_winnow_pairs,
        "doc_minhash": _doc_minhash,
        "doc_lsh_pairs": _doc_lsh_pairs,
        "doc_lsh_est_jaccard": _doc_lsh_est_jaccard,
        "doc_neardup_groups": _doc_neardup_groups,
        "corpus_idf": _corpus_idf,
        "doc_tfidf_topk": _doc_tfidf_topk,
    }


# ---------------------------------------------------------------------
# oracle SQL (DuckDB dialect, same parquet tables as views)
# ---------------------------------------------------------------------

_H32 = "(('0x' || substr(md5({expr}), 1, 8))::BIGINT)"

_TOKS = "regexp_split_to_array(trim(text), '\\s+')"

def _shingles_cte() -> str:
    return f"""
    WITH tk AS (
        SELECT doc_id, {_TOKS} AS toks FROM documents
    ), sh AS (
        SELECT doc_id,
               list_distinct([array_to_string(toks[i:i+2], ' ')
                              for i in range(1, len(toks) - 1)]) AS shingles
        FROM tk
    )"""


def _minhash_sig_cte() -> str:
    # sig[i] = min over shingles of (a_i * (h32(s) % p) + b_i) % p —
    # same affine permutations as the Spark operator (shared coeffs)
    from dbus_spark.operators.dedup import MINHASH_P, minhash_coeffs

    mins = ", ".join(
        "list_min(list_transform(hs, h -> (h * {a}::BIGINT + {b}) % {p}))".format(
            a=a, b=b, p=MINHASH_P
        )
        for a, b in minhash_coeffs(16)
    )
    return (
        _shingles_cte()
        + f"""
    , hsh AS (
        SELECT doc_id,
               list_transform(shingles,
                 s -> (('0x' || substr(md5(s), 1, 8))::BIGINT) % {MINHASH_P}) AS hs
        FROM sh
    ), sig AS (
        SELECT doc_id, [{mins}] AS sg FROM hsh
    )"""
    )


def _srp_bucket_sql(
    plane_rows: list[list[float]], shift: int = 0, vec: str = "embedding"
) -> str:
    """SRP bucket expression over literal hyperplanes — bit i is the
    sign of <vec, plane_i>, exactly as similarity.lsh_bucket computes
    it (both engines evaluate the dot product as a sequential
    left-to-right double fold, so the signs agree bit-for-bit)."""
    return "(" + " + ".join(
        "(CASE WHEN list_dot_product({v}::DOUBLE[], [{p}]::DOUBLE[]) > 0 "
        "THEN {w} ELSE 0 END)".format(
            v=vec,
            p=", ".join(repr(float(x)) for x in plane),
            w=1 << (shift + i),
        )
        for i, plane in enumerate(plane_rows)
    ) + ")"


def _knn_lsh_oracle() -> str:
    from dbus_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(8, 64, seed=7)
    b = _srp_bucket_sql(planes)
    return (
        f"WITH bk AS (SELECT vec_id, embedding, {b} AS bucket FROM embeddings), "
        "q AS (SELECT vec_id AS q_id, embedding AS qv, bucket FROM bk "
        "  WHERE vec_id IN (0,1,2,3,4)), "
        "scored AS (SELECT q.q_id, e.vec_id AS n_id, "
        "  list_cosine_similarity(q.qv::DOUBLE[], e.embedding::DOUBLE[]) AS s "
        "  FROM q JOIN bk e USING (bucket) WHERE e.vec_id <> q.q_id), "
        "r AS (SELECT q_id, n_id, s, ROW_NUMBER() OVER "
        "  (PARTITION BY q_id ORDER BY s DESC, n_id ASC) AS rank FROM scored) "
        "SELECT q_id, n_id, rank, ROUND(s, 4) AS sim FROM r WHERE rank <= 3"
    )


def _neardup_lsh_oracle(
    threshold: float = 0.4, n_tables: int = 8, planes_per_table: int = 4
) -> str:
    from dbus_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(n_tables * planes_per_table, 64, seed=7)
    tables = " UNION ALL ".join(
        "SELECT vec_id, {t} AS tbl, {b} AS bucket FROM embeddings".format(
            t=t,
            b=_srp_bucket_sql(
                planes[t * planes_per_table : (t + 1) * planes_per_table]
            ),
        )
        for t in range(n_tables)
    )
    return (
        f"WITH tb AS ({tables}), "
        "cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b "
        "  FROM tb a JOIN tb b ON a.tbl = b.tbl AND a.bucket = b.bucket "
        "  AND a.vec_id < b.vec_id) "
        "SELECT c.id_a, c.id_b, "
        "ROUND(list_cosine_similarity(x.embedding::DOUBLE[], "
        "y.embedding::DOUBLE[]), 4) AS sim "
        "FROM cand c JOIN embeddings x ON x.vec_id = c.id_a "
        "JOIN embeddings y ON y.vec_id = c.id_b "
        "WHERE ROUND(list_cosine_similarity(x.embedding::DOUBLE[], "
        f"y.embedding::DOUBLE[]), 4) > {threshold}"
    )


def _neardup_groups_oracle(threshold: float = 0.4) -> str:
    """Connected components of the LSH pair graph as a recursive CTE:
    r enumerates every (node, reachable-node) pair through the
    symmetric edge set; min per node = the component label (the same
    min-label fixpoint the Spark loop converges to)."""
    pairs = _neardup_lsh_oracle(threshold)
    return (
        f"WITH RECURSIVE pairs AS ({pairs}), "
        "e AS (SELECT id_a, id_b FROM pairs "
        "      UNION ALL SELECT id_b, id_a FROM pairs), "
        "r AS ("
        "  SELECT vec_id AS id, vec_id AS label FROM embeddings "
        "  UNION "
        "  SELECT e.id_a AS id, r.label FROM e JOIN r ON r.id = e.id_b"
        ") "
        "SELECT id AS vec_id, MIN(label) AS grp FROM r GROUP BY id"
    )


def _neardup_ivf_oracle(
    threshold: float = 0.4,
    n_centroids: int = 16,
    n_probes: int = 2,
    cents: list[list[float]] | None = None,
) -> str:
    """Multi-probe IVF near-dup mirror: every vector indexes into its
    top-``n_probes`` cells (same dot/rank tie rule as the knn oracle),
    pairs sharing a cell are candidates, exact-cosine verified."""
    from dbus_spark.operators.similarity import ivf_centroids

    if cents is None:
        cents = ivf_centroids(n_centroids, 64, seed=11)
    dots = ", ".join(
        "list_dot_product(embedding::DOUBLE[], [{c}]::DOUBLE[])".format(
            c=", ".join(repr(float(x)) for x in cent)
        )
        for cent in cents
    )
    sim = (
        "list_cosine_similarity(x.embedding::DOUBLE[], "
        "y.embedding::DOUBLE[])"
    )
    return (
        f"WITH d AS (SELECT vec_id, [{dots}] AS dots FROM embeddings), "
        "p0 AS (SELECT vec_id, "
        "  unnest([{'cell': i, 'cdot': dots[i+1]} "
        f"          for i in range(0, {n_centroids})]) AS u FROM d), "
        "p1 AS (SELECT vec_id, u.cell AS cell, u.cdot AS cdot FROM p0), "
        "pr AS (SELECT vec_id, cell, ROW_NUMBER() OVER "
        "  (PARTITION BY vec_id ORDER BY cdot DESC, cell ASC) AS prank "
        "  FROM p1), "
        f"probed AS (SELECT vec_id, cell FROM pr WHERE prank <= {n_probes}), "
        "cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b "
        "  FROM probed a JOIN probed b ON a.cell = b.cell "
        "  AND a.vec_id < b.vec_id) "
        f"SELECT c.id_a, c.id_b, ROUND({sim}, 4) AS sim "
        "FROM cand c JOIN embeddings x ON x.vec_id = c.id_a "
        "JOIN embeddings y ON y.vec_id = c.id_b "
        f"WHERE ROUND({sim}, 4) > {threshold}"
    )


def _knn_ivf_oracle(
    n_centroids: int = 16,
    n_probes: int = 4,
    k: int = 3,
    cents: list[list[float]] | None = None,
) -> str:
    from dbus_spark.operators.similarity import ivf_centroids

    if cents is None:
        cents = ivf_centroids(n_centroids, 64, seed=11)
    dots = ", ".join(
        "list_dot_product(embedding::DOUBLE[], [{c}]::DOUBLE[])".format(
            c=", ".join(repr(float(x)) for x in cent)
        )
        for cent in cents
    )
    return (
        f"WITH d AS (SELECT vec_id, embedding, [{dots}] AS dots "
        "FROM embeddings), "
        "a AS (SELECT vec_id, embedding, "
        "  list_position(dots, list_max(dots)) - 1 AS cell FROM d), "
        "p0 AS (SELECT vec_id AS q_id, embedding AS qv, "
        "  unnest([{'cell': i, 'cdot': dots[i+1]} "
        f"          for i in range(0, {n_centroids})]) AS u "
        "  FROM d WHERE vec_id IN (0,1,2,3,4)), "
        "p1 AS (SELECT q_id, qv, u.cell AS cell, u.cdot AS cdot FROM p0), "
        "pr AS (SELECT q_id, qv, cell, ROW_NUMBER() OVER "
        "  (PARTITION BY q_id ORDER BY cdot DESC, cell ASC) AS prank "
        "  FROM p1), "
        f"probes AS (SELECT q_id, qv, cell FROM pr WHERE prank <= {n_probes}), "
        "scored AS (SELECT p.q_id, a.vec_id AS n_id, "
        "  list_cosine_similarity(p.qv::DOUBLE[], a.embedding::DOUBLE[]) AS s "
        "  FROM probes p JOIN a ON a.cell = p.cell "
        "  WHERE a.vec_id <> p.q_id), "
        "r AS (SELECT q_id, n_id, s, ROW_NUMBER() OVER "
        "  (PARTITION BY q_id ORDER BY s DESC, n_id ASC) AS rank FROM scored) "
        f"SELECT q_id, n_id, rank, ROUND(s, 4) AS sim FROM r WHERE rank <= {k}"
    )


def _knn_ivf_trained_oracle() -> str | None:
    """Oracle for the trained-IVF query: centroids come from the numpy
    replica of the Spark k-means (bit-identical by the 6-decimal
    rounding protocol), trained on the sf0.01 table — the ONLY scale
    the driver's correctness gate compares at (the Spark query trains
    on whatever sf_dir it gets; at any other scale this oracle would
    not correspond, which is why it is pinned to the gate's scale).
    Cached so repeated oracle_sql() calls train once; returns None
    (query falls back to the rows-only check) when the fixture is
    absent instead of failing every oracle lookup."""
    global _IVF_TRAINED_ORACLE_CACHE
    if _IVF_TRAINED_ORACLE_CACHE is not _UNSET:
        return _IVF_TRAINED_ORACLE_CACHE
    try:
        import numpy as np
        import pandas as pd

        from dbus_spark.operators.similarity import kmeans_centroids_local

        pdf = pd.read_parquet(
            "/root/testdata/sf0.01/embeddings.parquet"
        )
        cents = kmeans_centroids_local(
            np.stack(pdf["embedding"].to_numpy()),
            n_centroids=16,
            seed=11,
            n_iter=5,
            init="kpp",
            ids=pdf["vec_id"].to_numpy(),
        )
        _IVF_TRAINED_ORACLE_CACHE = _knn_ivf_oracle(cents=cents)
    except (FileNotFoundError, OSError):
        _IVF_TRAINED_ORACLE_CACHE = None
    return _IVF_TRAINED_ORACLE_CACHE


def _neardup_ivf_trained_oracle() -> str | None:
    """Trained-quantizer variant of the IVF near-dup oracle — same
    numpy-replica centroid protocol (and the same sf0.01 pinning
    rationale) as :func:`_knn_ivf_trained_oracle`."""
    global _ND_IVF_TRAINED_ORACLE_CACHE
    if _ND_IVF_TRAINED_ORACLE_CACHE is not _UNSET:
        return _ND_IVF_TRAINED_ORACLE_CACHE
    try:
        import numpy as np
        import pandas as pd

        from dbus_spark.operators.similarity import kmeans_centroids_local

        pdf = pd.read_parquet(
            "/root/testdata/sf0.01/embeddings.parquet"
        )
        cents = kmeans_centroids_local(
            np.stack(pdf["embedding"].to_numpy()),
            n_centroids=16,
            seed=11,
            n_iter=5,
            init="kpp",
            ids=pdf["vec_id"].to_numpy(),
        )
        _ND_IVF_TRAINED_ORACLE_CACHE = _neardup_ivf_oracle(cents=cents)
    except (FileNotFoundError, OSError):
        _ND_IVF_TRAINED_ORACLE_CACHE = None
    return _ND_IVF_TRAINED_ORACLE_CACHE


_UNSET = object()
_IVF_TRAINED_ORACLE_CACHE = _UNSET
_ND_IVF_TRAINED_ORACLE_CACHE = _UNSET


_LANG_SCORES = """
    len(list_filter(toks, x -> lower(x) IN ('the','a','and','of','is'))) AS sc_en,
    len(list_filter(toks, x -> lower(x) IN ('le','la','et','les','des'))) AS sc_fr,
    len(list_filter(toks, x -> lower(x) IN ('el','los','las','que','y'))) AS sc_es,
    len(list_filter(toks, x -> lower(x) IN ('der','die','und','das','ein'))) AS sc_de
"""


def _semdedup_oracle(
    threshold: float = 0.4, n_centroids: int = 16
) -> str:
    """SemDeDup mirror: assign = argmax dot (first index on ties, the
    ivf_assign rule); cent_sim = round(cdot / (|v| * |c|), 4) with the
    centroid norms injected as the SAME Python-computed literals the
    Spark plan consumes; drop x iff a same-cell y with
    round(cos(x,y),4) > threshold ranks below it on (cent_sim, id)."""
    import numpy as np

    from dbus_spark.operators.similarity import ivf_centroids

    cents = ivf_centroids(n_centroids, 64, seed=11)
    dots = ", ".join(
        "list_dot_product(embedding::DOUBLE[], [{c}]::DOUBLE[])".format(
            c=", ".join(repr(float(x)) for x in cent)
        )
        for cent in cents
    )
    cnorms = ", ".join(
        repr(float(np.sqrt(np.dot(np.asarray(c), np.asarray(c)))))
        for c in cents
    )
    return (
        f"WITH d AS (SELECT vec_id, embedding, [{dots}] AS dots "
        "  FROM embeddings), "
        "p0 AS (SELECT vec_id, "
        "  unnest([{'cell': i, 'cdot': dots[i+1]} "
        f"          for i in range(0, {n_centroids})]) AS u FROM d), "
        "pr AS (SELECT vec_id, u.cell AS cell, u.cdot AS cdot, "
        "  ROW_NUMBER() OVER (PARTITION BY vec_id "
        "    ORDER BY u.cdot DESC, u.cell ASC) AS rk FROM p0), "
        "a AS (SELECT vec_id, cell, cdot FROM pr WHERE rk = 1), "
        f"cn AS (SELECT i AS cell, ([{cnorms}])[i+1] AS cnorm "
        f"  FROM range({n_centroids}) t(i)), "
        "r AS (SELECT a.vec_id, a.cell, "
        "  ROUND(a.cdot / (sqrt(list_dot_product("
        "    e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * cn.cnorm), "
        "    4) AS cent_sim, e.embedding AS emb "
        "  FROM a JOIN embeddings e ON e.vec_id = a.vec_id "
        "  JOIN cn ON cn.cell = a.cell) "
        "SELECT x.vec_id, x.cell, x.cent_sim FROM r x "
        "WHERE NOT EXISTS (SELECT 1 FROM r y "
        "  WHERE y.cell = x.cell AND y.vec_id != x.vec_id "
        "  AND ROUND(list_cosine_similarity(x.emb::DOUBLE[], "
        f"    y.emb::DOUBLE[]), 4) > {threshold} "
        "  AND (y.cent_sim < x.cent_sim "
        "    OR (y.cent_sim = x.cent_sim AND y.vec_id < x.vec_id)))"
    )


def oracle_sql() -> dict[str, str]:
    # entries resolving to None (e.g. the trained-IVF oracle when its
    # fixture is absent) are omitted -> the driver records the weaker
    # rows-only check for that query instead of every oracle failing
    d = {k: v for k, v in _oracle_sql_all().items() if v is not None}
    # the streaming replicas must land on the BATCH verdicts exactly —
    # same oracle by construction (stream-end flush closes pending
    # absence entries by the data path; funnel advances aggregate to
    # the batch counts)
    d["cep_funnel_stream_replica"] = d["cep_funnel"]
    d["cep_absence_stream_replica"] = d["cep_absence"]
    # the ordering twin must reproduce the in-order deduped truth from
    # a shuffled + redelivered arrival — per-turn text equality
    d["ordered_stream_replica"] = (
        "SELECT CAST(user_id AS VARCHAR) AS conv_id, "
        "CAST(ROW_NUMBER() OVER (PARTITION BY user_id "
        "  ORDER BY ts, event_id) AS INT) - 1 AS turn_idx, "
        "event_type AS role, props AS text, event_type AS tool, ts "
        "FROM events"
    )
    # the streaming session windows must land on the batch
    # gaps-and-islands verdicts exactly (session_start column name
    # matches; user_id returns to BIGINT after the sentinel filter)
    d["session_stream_replica"] = d["session_roles"]
    # flagship tumbling window + stream-stream interval join, streamed
    # to end-of-input, must land on their batch oracles exactly
    d["window_stream_replica"] = d["tumbling_window"]
    d["interval_join_stream_replica"] = d["interval_join"]
    d["asof_stream_replica"] = d["asof_attribution"]
    d["salted_window_stream_replica"] = d["tumbling_window_salted"]
    d["sliding_window_stream_replica"] = d["sliding_window"]
    return d


def _oracle_sql_all() -> dict[str, str | None]:
    return {
        "route_exact": (
            "SELECT event_id, event_type AS ident FROM events "
            "WHERE event_type IN ('click','purchase')"
        ),
        "route_wildcard": (
            "SELECT event_id, 'evt.' || event_type || '.u' || "
            "CAST(user_id % 10 AS VARCHAR) AS ident "
            "FROM events WHERE user_id % 10 = 3"
        ),
        "fanout_counts": (
            "SELECT event_type AS ident, COUNT(*) AS n FROM events GROUP BY 1"
        ),
        "tumbling_window": (
            "SELECT date_trunc('hour', ts) AS window_start, "
            "date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end, "
            "user_id, COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value "
            "FROM events GROUP BY 1, 2, 3"
        ),
        "tumbling_window_salted": (
            "SELECT date_trunc('hour', ts) AS window_start, "
            "date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end, "
            "user_id, COUNT(*) AS n_events, MAX(value) AS max_v "
            "FROM events GROUP BY 1, 2, 3"
        ),
        "sliding_window": (
            "SELECT event_type, "
            "date_trunc('day', ts - to_hours(12 * k)) + to_hours(12 * k) "
            "AS window_start, COUNT(*) AS n_events "
            "FROM events CROSS JOIN (VALUES (0), (1)) t(k) "
            "GROUP BY 1, 2"
        ),
        "session_window_user": (
            "WITH l AS ("
            "  SELECT user_id, ts, event_id, lag(ts) OVER "
            "    (PARTITION BY user_id ORDER BY ts, event_id) AS prev"
            "  FROM events"
            "), s AS ("
            "  SELECT user_id, ts, SUM(CASE WHEN prev IS NULL OR "
            "    ts - prev >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END) OVER "
            "    (PARTITION BY user_id ORDER BY ts, event_id "
            "     ROWS UNBOUNDED PRECEDING) AS sid"
            "  FROM l"
            ") SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS last_ts, "
            "COUNT(*) AS n_events FROM s GROUP BY user_id, sid"
        ),
        "session_roles": (
            "WITH l AS ("
            "  SELECT user_id, ts, event_id, lag(ts) OVER "
            "    (PARTITION BY user_id ORDER BY ts, event_id) AS prev, "
            "    event_type"
            "  FROM events"
            "), s AS ("
            "  SELECT user_id, ts, event_id, event_type, "
            "  SUM(CASE WHEN prev IS NULL OR ts - prev >= INTERVAL 30 MINUTE "
            "  THEN 1 ELSE 0 END) OVER (PARTITION BY user_id "
            "  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid"
            "  FROM l"
            ") SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS last_ts, "
            "COUNT(*) AS n_turns, "
            "string_agg(event_type, ',' ORDER BY ts, event_id) AS type_seq "
            "FROM s GROUP BY user_id, sid"
        ),
        "cep_sequence": (
            "WITH o AS ("
            "  SELECT user_id, event_id, event_type, ts, "
            "    lead(event_type, 1) OVER w AS s1, "
            "    lead(event_type, 2) OVER w AS s2, "
            "    lead(event_id, 2) OVER w AS e_id, "
            "    lead(ts, 2) OVER w AS e_ts "
            "  FROM events "
            "  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)"
            ") SELECT user_id, event_id AS start_event_id, "
            "e_id AS end_event_id, ts AS start_ts, e_ts AS end_ts "
            "FROM o WHERE event_type = 'view' AND s1 = 'click' "
            "AND s2 = 'purchase' AND e_ts <= ts + INTERVAL 24 HOUR"
        ),
        "cep_runs": (
            "WITH r AS ("
            "  SELECT user_id, event_type, event_id, "
            "    row_number() OVER (PARTITION BY user_id "
            "      ORDER BY event_id) AS rn1, "
            "    row_number() OVER (PARTITION BY user_id, event_type "
            "      ORDER BY event_id) AS rn2 "
            "  FROM events"
            ") SELECT user_id, event_type, COUNT(*) AS run_len, "
            "arg_min(event_id, rn1) AS start_event_id, "
            "arg_max(event_id, rn1) AS end_event_id "
            "FROM r GROUP BY user_id, event_type, rn1 - rn2 "
            "HAVING COUNT(*) >= 3"
        ),
        "cep_funnel": (
            "WITH s0 AS ("
            "  SELECT user_id, MIN(ts) AS t FROM events "
            "  WHERE event_type = 'view' GROUP BY 1"
            "), s1 AS ("
            "  SELECT e.user_id, MIN(e.ts) AS t FROM events e "
            "  JOIN s0 USING (user_id) "
            "  WHERE e.event_type = 'click' AND e.ts > s0.t GROUP BY 1"
            "), s2 AS ("
            "  SELECT e.user_id, MIN(e.ts) AS t FROM events e "
            "  JOIN s1 USING (user_id) "
            "  WHERE e.event_type = 'purchase' AND e.ts > s1.t GROUP BY 1"
            ") SELECT * FROM (VALUES "
            "  (0, 'view', (SELECT COUNT(*) FROM s0)), "
            "  (1, 'click', (SELECT COUNT(*) FROM s1)), "
            "  (2, 'purchase', (SELECT COUNT(*) FROM s2))"
            ") t(stage_idx, stage, n_keys)"
        ),
        "cep_absence": (
            "WITH o AS ("
            "  SELECT user_id, event_id, event_type, ts, "
            "    min(CASE WHEN event_type = 'click' THEN ts END) OVER ("
            "      PARTITION BY user_id ORDER BY event_id "
            "      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING"
            "    ) AS nb "
            "  FROM events"
            ") SELECT user_id, event_id AS start_event_id, ts AS start_ts "
            "FROM o WHERE event_type = 'view' "
            "AND (nb IS NULL OR nb > ts + INTERVAL 24 HOUR)"
        ),
        "cep_quantified": (
            # maximal-run semantics: contract to runs (gaps-and-islands),
            # then a run-level lead() sequence with per-position length
            # bounds — the oracle mirror of match_quantified
            "WITH r AS ("
            "  SELECT user_id, event_type, event_id, ts, "
            "    row_number() OVER (PARTITION BY user_id "
            "      ORDER BY event_id) AS rn1, "
            "    row_number() OVER (PARTITION BY user_id, event_type "
            "      ORDER BY event_id) AS rn2 "
            "  FROM events"
            "), runs AS ("
            "  SELECT user_id, event_type, COUNT(*) AS len, "
            "    arg_min(event_id, rn1) AS so, arg_max(event_id, rn1) AS eo, "
            "    arg_min(ts, rn1) AS sts, arg_max(ts, rn1) AS ets, "
            "    MIN(rn1) AS pos "
            "  FROM r GROUP BY user_id, event_type, rn1 - rn2"
            "), o AS ("
            "  SELECT user_id, event_type, len, so, sts, "
            "    lead(event_type, 1) OVER w AS s1, lead(len, 1) OVER w AS l1, "
            "    lead(event_type, 2) OVER w AS s2, lead(len, 2) OVER w AS l2, "
            "    lead(eo, 2) OVER w AS e_eo, lead(ets, 2) OVER w AS e_ets "
            "  FROM runs WINDOW w AS (PARTITION BY user_id ORDER BY pos)"
            ") SELECT user_id, so AS start_event_id, e_eo AS end_event_id, "
            "sts AS start_ts, e_ets AS end_ts, "
            "len AS len_0, l1 AS len_1, l2 AS len_2 "
            "FROM o WHERE event_type = 'view' AND len BETWEEN 1 AND 3 "
            "AND s1 = 'click' AND l1 >= 1 "
            "AND s2 = 'purchase' AND l2 >= 1 "
            "AND e_ets <= sts + INTERVAL 24 HOUR"
        ),
        "cep_dsl": (
            # maximal-run semantics: contract to runs (gaps-and-islands),
            # then a run-level lead() sequence with per-position length
            # bounds — the oracle mirror of match_quantified
            "WITH r AS ("
            "  SELECT user_id, event_type, event_id, ts, "
            "    row_number() OVER (PARTITION BY user_id "
            "      ORDER BY event_id) AS rn1, "
            "    row_number() OVER (PARTITION BY user_id, event_type "
            "      ORDER BY event_id) AS rn2 "
            "  FROM events"
            "), runs AS ("
            "  SELECT user_id, event_type, COUNT(*) AS len, "
            "    arg_min(event_id, rn1) AS so, arg_max(event_id, rn1) AS eo, "
            "    arg_min(ts, rn1) AS sts, arg_max(ts, rn1) AS ets, "
            "    MIN(rn1) AS pos "
            "  FROM r GROUP BY user_id, event_type, rn1 - rn2"
            "), o AS ("
            "  SELECT user_id, event_type, len, so, sts, "
            "    lead(event_type, 1) OVER w AS s1, lead(len, 1) OVER w AS l1, "
            "    lead(event_type, 2) OVER w AS s2, lead(len, 2) OVER w AS l2, "
            "    lead(eo, 2) OVER w AS e_eo, lead(ets, 2) OVER w AS e_ets "
            "  FROM runs WINDOW w AS (PARTITION BY user_id ORDER BY pos)"
            ") SELECT user_id, so AS start_event_id, e_eo AS end_event_id, "
            "sts AS start_ts, e_ets AS end_ts, "
            "len AS len_0, l1 AS len_1, l2 AS len_2 "
            "FROM o WHERE event_type = 'view' AND len BETWEEN 1 AND 3 "
            "AND s1 = 'click' AND l1 >= 1 "
            "AND s2 = 'purchase' AND l2 >= 1 "
            "AND e_ets <= sts + INTERVAL 24 HOUR"
        ),
        "doc_decontam": (
            # benchmark = first 25 tokens of every 13th doc; a doc's
            # contamination = share of its distinct 8-grams found
            # anywhere in the benchmark's distinct 8-gram set
            f"WITH tk AS (SELECT doc_id, {_TOKS} AS toks FROM documents), "
            "sh AS (SELECT doc_id, "
            "  list_distinct([array_to_string(toks[i:i+7], ' ') "
            "    for i in range(1, len(toks) - 6)]) AS shingles FROM tk), "
            "ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh), "
            "bt AS (SELECT toks[1:25] AS toks FROM tk WHERE doc_id % 13 = 0), "
            "bs AS (SELECT DISTINCT unnest("
            "  [array_to_string(toks[i:i+7], ' ') "
            "    for i in range(1, len(toks) - 6)]) AS s FROM bt) "
            "SELECT ex.doc_id, COUNT(*) AS n_ngrams, COUNT(bs.s) AS n_hit, "
            "ROUND(COUNT(bs.s) * 1.0 / COUNT(*), 4) AS contam_frac "
            "FROM ex LEFT JOIN bs ON ex.s = bs.s GROUP BY ex.doc_id"
        ),
        "doc_decontam_excise": (
            # 12-token re-chunk; a span is excised iff it shares an
            # 8-gram with the eval set (every 13th doc's first 25
            # tokens); spans tested independently, survivors rejoined
            f"WITH tk AS (SELECT doc_id, {_TOKS} AS toks FROM documents), "
            "ch AS (SELECT doc_id, [{'pos': i, 'span': "
            "  array_to_string(toks[i*12+1:i*12+12], ' ')} "
            "  for i in range(0, CAST(ceil(len(toks)/12.0) AS BIGINT))] "
            "  AS paras FROM tk), "
            "ex AS (SELECT doc_id, unnest(paras, recursive := true) "
            "  FROM ch), "
            "sg AS (SELECT doc_id, pos, span, "
            "  regexp_split_to_array(trim(span), '\s+') AS stoks FROM ex), "
            "bt AS (SELECT toks[1:25] AS btoks FROM tk "
            "  WHERE doc_id % 13 = 0), "
            "bs AS (SELECT DISTINCT unnest([array_to_string("
            "  btoks[i:i+7], ' ') for i in range(1, len(btoks) - 6)]) "
            "  AS g FROM bt), "
            "sgr AS (SELECT doc_id, pos, span, "
            "  [array_to_string(stoks[i:i+7], ' ') "
            "    for i in range(1, len(stoks) - 6)] AS grams FROM sg), "
            "bl AS (SELECT list(g) AS gl FROM bs), "
            "dirty AS (SELECT doc_id, pos FROM sgr, bl WHERE len("
            "  list_intersect(grams, bl.gl)) > 0) "
            "SELECT g.doc_id, CAST(COUNT(*) AS INT) AS n_spans, "
            "CAST(SUM(CASE WHEN d.pos IS NOT NULL THEN 1 ELSE 0 END) "
            "  AS INT) AS n_excised, "
            "COALESCE(string_agg(CASE WHEN d.pos IS NULL THEN g.span END, "
            "  e'\n\n' ORDER BY g.pos), '') AS text_clean "
            "FROM sgr g LEFT JOIN dirty d ON g.doc_id = d.doc_id "
            "AND g.pos = d.pos GROUP BY g.doc_id"
        ),
        "doc_sample_mixture": (
            # md5-derived uniform draw vs per-lang hex thresholds —
            # byte-identical in Spark and DuckDB (corpus.py thresholds:
            # en .5, de 1.0, es .25, zh .75, default 0)
            "WITH k AS (SELECT lang FROM documents WHERE "
            "  substr(md5(CAST(doc_id AS VARCHAR) || ':7'), 1, 8) < "
            "  CASE lang WHEN 'en' THEN '80000000' WHEN 'de' THEN 'g' "
            "    WHEN 'es' THEN '40000000' WHEN 'zh' THEN 'c0000000' "
            "    ELSE '00000000' END), "
            "s AS (SELECT lang, COUNT(*) AS n_source FROM documents "
            "  GROUP BY lang), "
            "kk AS (SELECT lang, COUNT(*) AS n_kept FROM k GROUP BY lang) "
            "SELECT s.lang AS lang, s.n_source, "
            "COALESCE(kk.n_kept, 0) AS n_kept, "
            "ROUND(COALESCE(kk.n_kept, 0) * 1.0 / s.n_source, 4) "
            "  AS keep_rate "
            "FROM s LEFT JOIN kk ON s.lang = kk.lang"
        ),
        "doc_pack_report": (
            # greedy next-fit packing replayed as a recursive CTE:
            # shard = id % 8, id order, join pack iff acc + t <= 64
            f"WITH RECURSIVE tk AS (SELECT doc_id, "
            f"  CAST(doc_id % 8 AS INT) AS shard, len({_TOKS}) AS t "
            "  FROM documents), "
            "o AS (SELECT *, row_number() OVER (PARTITION BY shard "
            "  ORDER BY doc_id) AS rn FROM tk), "
            "p AS ("
            "  SELECT shard, rn, t, t AS acc, CAST(0 AS BIGINT) AS pack_id "
            "  FROM o WHERE rn = 1 "
            "  UNION ALL "
            "  SELECT o.shard, o.rn, o.t, "
            "  CASE WHEN p.acc + o.t <= 64 THEN p.acc + o.t ELSE o.t END, "
            "  CASE WHEN p.acc + o.t <= 64 THEN p.pack_id "
            "    ELSE p.pack_id + 1 END "
            "  FROM p JOIN o ON o.shard = p.shard AND o.rn = p.rn + 1) "
            "SELECT shard, pack_id, CAST(COUNT(*) AS BIGINT) AS n_docs, "
            "CAST(SUM(t) AS BIGINT) AS pack_tokens, "
            "ROUND(SUM(t) * 1.0 / 64, 4) AS fill_frac "
            "FROM p GROUP BY shard, pack_id"
        ),
        "doc_sample_tokens": (
            # longest draw-ordered prefix per lang whose cumsum fits
            "WITH tk AS (SELECT doc_id, lang, "
            "  len(regexp_split_to_array(trim(text), '\s+')) AS t, "
            "  substr(md5(CAST(doc_id AS VARCHAR) || ':7'), 1, 8) AS d "
            "  FROM documents), "
            "b AS (SELECT *, CASE lang WHEN 'en' THEN 4000 "
            "  WHEN 'de' THEN 2000 WHEN 'zh' THEN 1500 END AS bud FROM tk), "
            "c AS (SELECT *, CAST(SUM(t) OVER (PARTITION BY lang "
            "  ORDER BY d, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "  CURRENT ROW) AS BIGINT) AS cum FROM b) "
            "SELECT doc_id, lang FROM c "
            "WHERE bud IS NOT NULL AND cum <= bud"
        ),
        "doc_pack_dense": (
            # concat-and-chunk: pack of stream-token k = floor(k/64);
            # a doc spans floor(start/64)..floor((start+t-1)/64)
            f"WITH tk AS (SELECT doc_id, CAST(doc_id % 8 AS INT) AS shard, "
            f"  len({_TOKS}) AS t FROM documents), "
            "b AS (SELECT doc_id, shard, t, COALESCE(CAST(SUM(t) OVER "
            "  (PARTITION BY shard ORDER BY doc_id ROWS BETWEEN UNBOUNDED "
            "  PRECEDING AND CURRENT ROW) AS BIGINT) - t, 0) AS s FROM tk), "
            "e AS (SELECT doc_id, shard, t, s, unnest(range("
            "  CAST(floor(s/64.0) AS BIGINT), greatest("
            "  CAST(floor(s/64.0) AS BIGINT), "
            "  CAST(floor((s+t-1)/64.0) AS BIGINT)) + 1)) AS pack_id "
            "  FROM b) "
            "SELECT doc_id, shard, pack_id, "
            "greatest(0, pack_id*64 - s) AS slice_start, "
            "least(t, (pack_id+1)*64 - s) - greatest(0, pack_id*64 - s) "
            "  AS slice_len, t AS n_tokens FROM e"
        ),
        "doc_pii_redact": (
            # same injected PII, counted in redaction order (each count
            # on the text with earlier patterns already replaced)
            "WITH inj AS (SELECT doc_id, text || ' contact user' || "
            "  CAST(doc_id AS VARCHAR) || '@example.com ip 10.0.' || "
            "  CAST(doc_id % 256 AS VARCHAR) || '.7 call 415-555-' || "
            "  lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || "
            "  CASE WHEN doc_id % 5 = 0 "
            "    THEN ' card 4111 1111 1111 1111' ELSE '' END AS t "
            "  FROM documents), "
            "c1 AS (SELECT doc_id, len(regexp_extract_all(t, "
            "  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) "
            "  AS n_email, regexp_replace(t, "
            "  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', "
            "  '<EMAIL>', 'g') AS t FROM inj), "
            "c2 AS (SELECT doc_id, n_email, len(regexp_extract_all(t, "
            "  '[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}')) AS n_card, "
            "  regexp_replace(t, "
            "  '[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4}', "
            "  '<CARD>', 'g') AS t FROM c1), "
            "c3 AS (SELECT doc_id, n_email, n_card, "
            "  len(regexp_extract_all(t, "
            "  '[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}')) AS n_phone, "
            "  regexp_replace(t, '[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}', "
            "  '<PHONE>', 'g') AS t FROM c2) "
            "SELECT doc_id, n_email, n_card, n_phone, "
            "len(regexp_extract_all(t, "
            "  '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}')) "
            "  AS n_ipv4, "
            "regexp_replace(t, "
            "  '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}', "
            "  '<IP>', 'g') AS text_redacted FROM c3"
        ),
        "doc_paragraph_dedup": (
            # 12-token re-chunk, keep each distinct paragraph's first
            # (doc_id, pos) occurrence, reassemble survivors in order
            f"WITH tk AS (SELECT doc_id, {_TOKS} AS toks FROM documents), "
            "ch AS (SELECT doc_id, [{'pos': i, 'span': "
            "  array_to_string(toks[i*12+1:i*12+12], ' ')} "
            "  for i in range(0, CAST(ceil(len(toks)/12.0) AS BIGINT))] "
            "  AS paras FROM tk), "
            "ex AS (SELECT doc_id, unnest(paras, recursive := true) "
            "  FROM ch), "
            "rk AS (SELECT doc_id, pos, span, row_number() OVER "
            "  (PARTITION BY span ORDER BY doc_id, pos) AS r FROM ex) "
            "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans, "
            "CAST(SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT) "
            "  AS n_kept, "
            "COALESCE(string_agg(CASE WHEN r = 1 THEN span END, e'\\n\\n' "
            "  ORDER BY pos), '') AS text_dedup "
            "FROM rk GROUP BY doc_id"
        ),
        "doc_unigram_logppl": (
            # add-one-smoothed unigram LM trained on the corpus itself;
            # per-token log-prob as int64 micro-nats (exact, order-
            # independent sum), per-doc mean negative log-prob per token
            f"WITH tk AS (SELECT doc_id, {_TOKS} AS toks FROM documents), "
            "ex AS (SELECT doc_id, unnest(toks) AS token FROM tk), "
            "cnt AS (SELECT token, COUNT(*) AS c FROM ex GROUP BY token), "
            "tot AS (SELECT SUM(c) AS t, COUNT(*) AS v FROM cnt), "
            "lp AS (SELECT token, "
            "  CAST(round(ln((c + 1.0) / (t + v)) * 1000000) AS BIGINT) "
            "  AS lp6 FROM cnt CROSS JOIN tot), "
            "agg AS (SELECT e.doc_id, COUNT(*) AS n_tokens, "
            "  SUM(lp.lp6) AS s FROM ex e JOIN lp USING(token) "
            "  GROUP BY e.doc_id) "
            "SELECT doc_id, n_tokens, "
            "ROUND(-s / (n_tokens * 1000000.0), 4) AS logppl FROM agg"
        ),
        "emb_semdedup": _semdedup_oracle(),
        "doc_dsir_weight": (
            # two add-one-smoothed unigram LMs (raw corpus vs the
            # English-doc target); per-doc mean lp6 ratio; tokens
            # outside a vocab take that LM's smoothing floor
            f"WITH tk AS (SELECT doc_id, lang, {_TOKS} AS toks "
            "  FROM documents), "
            "ex AS (SELECT doc_id, unnest(toks) AS token FROM tk), "
            "rc AS (SELECT token, COUNT(*) AS c FROM ex GROUP BY token), "
            "rt AS (SELECT SUM(c) AS t, COUNT(*) AS v FROM rc), "
            "rl AS (SELECT token, "
            "  CAST(round(ln((c + 1.0) / (t + v)) * 1000000) AS BIGINT) "
            "  AS lp6 FROM rc CROSS JOIN rt), "
            "tex AS (SELECT unnest(toks) AS token FROM tk "
            "  WHERE lang = 'en'), "
            "tc AS (SELECT token, COUNT(*) AS c FROM tex GROUP BY token), "
            "tt AS (SELECT SUM(c) AS t, COUNT(*) AS v FROM tc), "
            "tl AS (SELECT token, "
            "  CAST(round(ln((c + 1.0) / (t + v)) * 1000000) AS BIGINT) "
            "  AS lp6 FROM tc CROSS JOIN tt), "
            "rf AS (SELECT CAST(round(ln(1.0 / (t + v)) * 1000000) "
            "  AS BIGINT) AS fl FROM rt), "
            "tf AS (SELECT CAST(round(ln(1.0 / (t + v)) * 1000000) "
            "  AS BIGINT) AS fl FROM tt), "
            "j AS (SELECT e.doc_id, "
            "  COALESCE(rl.lp6, (SELECT fl FROM rf)) AS lr, "
            "  COALESCE(tl.lp6, (SELECT fl FROM tf)) AS lt "
            "  FROM ex e LEFT JOIN rl USING(token) "
            "  LEFT JOIN tl USING(token)) "
            # + 0.0 maps IEEE -0.0 -> +0.0: DuckDB's ROUND yields -0.0
            # for ratios that round to zero from below while Spark's
            # F.round yields +0.0 — equal values, different bytes, and
            # the driver hashes bytes (VERDICT r5 "what's wrong #1")
            "SELECT doc_id, COUNT(*) AS n_tokens, "
            "ROUND((SUM(lt) - SUM(lr)) / (COUNT(*) * 1000000.0), 4) "
            "  + 0.0 AS dsir_logratio FROM j GROUP BY doc_id"
        ),
        "doc_dsir_weight_hashed": (
            # DSIR hashed unigram+bigram features (B = 65536 fixed
            # buckets, add-one smoothing over B); bucket = md5-h32 % B,
            # the same hash parity as the minhash shingle oracle
            f"WITH tk AS (SELECT doc_id, lang, {_TOKS} AS toks "
            "  FROM documents), "
            "uni AS (SELECT doc_id, lang, unnest(toks) AS f FROM tk), "
            "bi AS (SELECT doc_id, lang, "
            "  unnest([toks[i] || ' ' || toks[i+1] "
            "          for i in range(1, len(toks))]) AS f FROM tk), "
            "fe AS (SELECT doc_id, lang, "
            f"  {_H32.format(expr='f')} % 65536 AS b "
            "  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)), "
            "rc AS (SELECT b, COUNT(*) AS c FROM fe GROUP BY b), "
            "rt AS (SELECT SUM(c) AS t FROM rc), "
            "rl AS (SELECT b, "
            "  CAST(round(ln((c + 1.0) / (t + 65536)) * 1000000) "
            "  AS BIGINT) AS lp6 FROM rc CROSS JOIN rt), "
            "tc AS (SELECT b, COUNT(*) AS c FROM fe WHERE lang = 'en' "
            "  GROUP BY b), "
            "tt AS (SELECT SUM(c) AS t FROM tc), "
            "tl AS (SELECT b, "
            "  CAST(round(ln((c + 1.0) / (t + 65536)) * 1000000) "
            "  AS BIGINT) AS lp6 FROM tc CROSS JOIN tt), "
            "rf AS (SELECT CAST(round(ln(1.0 / (t + 65536)) * 1000000) "
            "  AS BIGINT) AS fl FROM rt), "
            "tf AS (SELECT CAST(round(ln(1.0 / (t + 65536)) * 1000000) "
            "  AS BIGINT) AS fl FROM tt), "
            "j AS (SELECT fe.doc_id, "
            "  COALESCE(rl.lp6, (SELECT fl FROM rf)) AS lr, "
            "  COALESCE(tl.lp6, (SELECT fl FROM tf)) AS lt "
            "  FROM fe LEFT JOIN rl USING(b) LEFT JOIN tl USING(b)) "
            "SELECT doc_id, COUNT(*) AS n_feats, "
            "ROUND((SUM(lt) - SUM(lr)) / (COUNT(*) * 1000000.0), 4) "
            "  + 0.0 AS dsir_logratio FROM j GROUP BY doc_id"
        ),
        "doc_shard_plan": (
            # offset-bucket shard rule: per lang in doc_id order, shard
            # = floor(start_byte_offset / 8192); docs never split
            "WITH b AS (SELECT doc_id, lang, "
            "  CAST(strlen(text) AS BIGINT) AS n_bytes FROM documents), "
            "w AS (SELECT doc_id, lang, n_bytes, "
            "  SUM(n_bytes) OVER (PARTITION BY lang ORDER BY doc_id "
            "    ROWS UNBOUNDED PRECEDING) - n_bytes AS start FROM b) "
            "SELECT doc_id, lang, n_bytes, "
            "CAST(floor(start / 8192.0) AS INT) AS shard_idx FROM w"
        ),
        "doc_shard_manifest": (
            "WITH b AS (SELECT doc_id, lang, "
            "  CAST(strlen(text) AS BIGINT) AS n_bytes FROM documents), "
            "w AS (SELECT doc_id, lang, n_bytes, "
            "  SUM(n_bytes) OVER (PARTITION BY lang ORDER BY doc_id "
            "    ROWS UNBOUNDED PRECEDING) - n_bytes AS start FROM b), "
            "p AS (SELECT doc_id, lang, n_bytes, "
            "  CAST(floor(start / 8192.0) AS INT) AS shard_idx FROM w) "
            "SELECT lang, shard_idx, COUNT(*) AS n_docs, "
            "CAST(SUM(n_bytes) AS BIGINT) AS shard_bytes, "
            "MIN(doc_id) AS first_id, MAX(doc_id) AS last_id "
            "FROM p GROUP BY lang, shard_idx"
        ),
        "interval_join": (
            "SELECT c.user_id AS user_id, c.event_id AS click_id, "
            "p.event_id AS purchase_id "
            "FROM events c JOIN events p ON c.user_id = p.user_id "
            "AND c.event_type = 'click' AND p.event_type = 'purchase' "
            "AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE"
        ),
        "asof_attribution": (
            # exact tie/ordering parity with asof_join's window plan:
            # right rows (clicks) sort before left at equal ts (<=
            # semantics); several same-ts clicks resolve to max click_id
            "WITH u AS ("
            "  SELECT user_id, ts, event_id AS click_id, "
            "    NULL::BIGINT AS purchase_id, 0 AS is_l "
            "  FROM events WHERE event_type = 'click' "
            "  UNION ALL "
            "  SELECT user_id, ts, NULL, event_id, 1 "
            "  FROM events WHERE event_type = 'purchase'"
            "), c AS ("
            "  SELECT *, last_value(click_id IGNORE NULLS) OVER ("
            "    PARTITION BY user_id ORDER BY ts, is_l, click_id"
            "    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
            "  ) AS attr FROM u"
            ") SELECT user_id, purchase_id, attr AS click_id "
            "FROM c WHERE is_l = 1"
        ),
        "cdc_dispatch": (
            "SELECT 'orders_src' AS ident, o_orderdate AS event_day, "
            "COUNT(*) AS n_rows, ROUND(SUM(o_totalprice), 2) AS sum_val "
            "FROM orders GROUP BY 2 "
            "UNION ALL "
            "SELECT 'lineitem_src' AS ident, l_shipdate AS event_day, "
            "COUNT(*) AS n_rows, ROUND(SUM(l_extendedprice), 2) AS sum_val "
            "FROM lineitem GROUP BY 2"
        ),
        "dim_enrich": (
            "SELECT r_name, COUNT(*) AS n_orders, "
            "ROUND(SUM(o_totalprice), 2) AS revenue "
            "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
            "JOIN nation n ON c.c_nationkey = n.n_nationkey "
            "JOIN region r ON n.n_regionkey = r.r_regionkey "
            "GROUP BY r_name"
        ),
        "ordered_seq": (
            "SELECT user_id, event_id, ROW_NUMBER() OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) AS seq FROM events"
        ),
        "topk_per_user": (
            "SELECT user_id, event_id, rnk FROM ("
            "  SELECT user_id, event_id, ROW_NUMBER() OVER "
            "  (PARTITION BY user_id ORDER BY value DESC, event_id ASC) AS rnk"
            "  FROM events) WHERE rnk <= 3"
        ),
        "event_json": (
            "SELECT event_id, to_json(struct_pack("
            "event_id := event_id, event_type := event_type, "
            "user_id := user_id)) AS js FROM events"
        ),
        "event_quantiles": (
            "SELECT event_type, "
            "ROUND(quantile_cont(value, 0.5), 4) AS p50, "
            "ROUND(quantile_cont(value, 0.95), 4) AS p95, "
            "ROUND(quantile_cont(value, 0.99), 4) AS p99, "
            "COUNT(*) AS n FROM events GROUP BY 1"
        ),
        "event_user_reach": (
            "SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct, "
            "COUNT(*) AS n FROM events GROUP BY 1"
        ),
        "corpus_topk_tokens": (
            f"WITH tk AS (SELECT {_TOKS} AS toks FROM documents), "
            "ex AS (SELECT unnest(toks) AS token FROM tk), "
            "cnt AS (SELECT token, COUNT(*) AS c FROM ex GROUP BY token) "
            "SELECT token, c, CAST(ROW_NUMBER() OVER "
            "  (ORDER BY c DESC, token ASC) AS INT) AS rank "
            "FROM cnt ORDER BY c DESC, token ASC LIMIT 20"
        ),
        "sales_rollup": (
            "SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders, "
            "ROUND(SUM(o_totalprice), 2) AS revenue, "
            "GROUPING(o_orderpriority, o_orderstatus) AS gid "
            "FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)"
        ),
        "customer_running_spend": (
            "SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice, "
            "ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey "
            "ORDER BY o_orderdate, o_orderkey "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) "
            "AS run_spend FROM orders"
        ),
        "tpch_q3_lite": (
            "SELECT o_orderkey, o_orderdate, "
            "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue "
            "FROM customer JOIN orders ON c_custkey = o_custkey "
            "JOIN lineitem ON o_orderkey = l_orderkey "
            "WHERE c_mktsegment = 'BUILDING' "
            "AND o_orderdate < DATE '1995-03-15' "
            "AND l_shipdate > DATE '1995-03-15' "
            "GROUP BY 1, 2"
        ),
        "customers_no_big_orders": (
            "SELECT c_custkey, c_name FROM customer c "
            "WHERE NOT EXISTS (SELECT 1 FROM orders o "
            "WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 350000)"
        ),
        "doc_exact_dedup": (
            "SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) "
            "AS fp, MIN(doc_id) AS keeper, COUNT(*) AS n_copies "
            "FROM documents GROUP BY 1"
        ),
        "doc_token_count": (
            f"SELECT doc_id, len({_TOKS}) AS n_tokens FROM documents"
        ),
        "doc_quality": (
            f"WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents) "
            "SELECT doc_id, length(text) AS n_chars, len(toks) AS n_tokens, "
            "ROUND(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) * 1.0 "
            "  / length(text), 4) AS alpha_ratio, "
            "ROUND(len(list_filter(toks, x -> lower(x) IN "
            "  ('the','a','and','of','is','to','in'))) * 1.0 / len(toks), 4) "
            "  AS stopword_ratio, "
            "ROUND((length(text) - len(toks) + 1) * 1.0 / len(toks), 4) "
            "  AS mean_token_len "
            "FROM t"
        ),
        "doc_lang_id": (
            f"WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents), "
            f"s AS (SELECT doc_id, {_LANG_SCORES} FROM t) "
            "SELECT doc_id, CASE "
            "WHEN GREATEST(sc_en, sc_fr, sc_es, sc_de) < 1 THEN 'und' "
            "WHEN sc_en = GREATEST(sc_en, sc_fr, sc_es, sc_de) THEN 'en' "
            "WHEN sc_fr = GREATEST(sc_en, sc_fr, sc_es, sc_de) THEN 'fr' "
            "WHEN sc_es = GREATEST(sc_en, sc_fr, sc_es, sc_de) THEN 'es' "
            "ELSE 'de' END AS lang_pred FROM s"
        ),
        "doc_fingerprint": (
            "SELECT doc_id, md5(regexp_replace(lower(trim(text)), "
            "'\\s+', ' ', 'g')) AS fp FROM documents"
        ),
        "doc_token_bpe": (
            r"SELECT doc_id, len(regexp_extract_all(text, "
            r"'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe FROM documents"
        ),
        "doc_winnow": (
            r"WITH nm AS (SELECT doc_id, regexp_replace(lower(trim(text)), "
            r"'\s+', ' ', 'g') AS t FROM documents), "
            "h AS (SELECT doc_id, CASE WHEN len(t) >= 8 THEN "
            "  [('0x' || substr(md5(substr(t, i, 8)), 1, 8))::BIGINT "
            "   for i in range(1, len(t) - 6)] "
            "  ELSE [] END AS hs FROM nm), "
            "m AS (SELECT doc_id, CASE WHEN len(hs) >= 4 THEN "
            "  list_distinct([list_min(hs[j:j+3]) "
            "                 for j in range(1, len(hs) - 2)]) "
            "  ELSE [] END AS fps FROM h) "
            "SELECT doc_id, unnest(CASE WHEN len(fps) = 0 "
            "THEN [NULL::BIGINT] ELSE fps END) AS fp FROM m"
        ),
        "doc_winnow_pairs": (
            r"WITH nm AS (SELECT doc_id, regexp_replace(lower(trim(text)), "
            r"'\s+', ' ', 'g') AS t FROM documents), "
            "h AS (SELECT doc_id, CASE WHEN len(t) >= 8 THEN "
            "  [('0x' || substr(md5(substr(t, i, 8)), 1, 8))::BIGINT "
            "   for i in range(1, len(t) - 6)] "
            "  ELSE [] END AS hs FROM nm), "
            "m AS (SELECT doc_id, CASE WHEN len(hs) >= 4 THEN "
            "  list_distinct([list_min(hs[j:j+3]) "
            "                 for j in range(1, len(hs) - 2)]) "
            "  ELSE [] END AS fps FROM h), "
            "ex AS (SELECT doc_id, unnest(fps) AS fp FROM m), "
            "rare AS (SELECT fp FROM ex GROUP BY fp HAVING COUNT(*) <= 50), "
            "exr AS (SELECT ex.doc_id, ex.fp FROM ex JOIN rare USING (fp)) "
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "COUNT(*) AS n_shared "
            "FROM exr a JOIN exr b ON a.fp = b.fp AND a.doc_id < b.doc_id "
            "GROUP BY 1, 2 HAVING COUNT(*) >= 2"
        ),
        "doc_minhash": (
            _minhash_sig_cte()
            + " SELECT doc_id, i AS hash_idx, sg[i + 1] AS minval "
            "FROM sig CROSS JOIN range(16) r(i)"
        ),
        "doc_lsh_pairs": (
            _minhash_sig_cte()
            + " SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b "
            "FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ("
            "  a.sg[1:4] = b.sg[1:4] OR a.sg[5:8] = b.sg[5:8] "
            "  OR a.sg[9:12] = b.sg[9:12] OR a.sg[13:16] = b.sg[13:16])"
        ),
        "doc_lsh_est_jaccard": (
            _minhash_sig_cte()
            + " , cand AS (SELECT DISTINCT a.doc_id AS id_a, "
            "b.doc_id AS id_b "
            "FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ("
            "  a.sg[1:4] = b.sg[1:4] OR a.sg[5:8] = b.sg[5:8] "
            "  OR a.sg[9:12] = b.sg[9:12] OR a.sg[13:16] = b.sg[13:16])) "
            "SELECT c.id_a, c.id_b, "
            "ROUND(len(list_filter(range(1, 17), "
            "  i -> x.sg[i] = y.sg[i])) / 16.0, 4) AS est_jaccard "
            "FROM cand c JOIN sig x ON x.doc_id = c.id_a "
            "JOIN sig y ON y.doc_id = c.id_b"
        ),
        "doc_neardup_groups": (
            _minhash_sig_cte().replace("WITH tk", "WITH RECURSIVE tk", 1)
            + " , cand AS (SELECT DISTINCT a.doc_id AS id_a, "
            "b.doc_id AS id_b "
            "FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ("
            "  a.sg[1:4] = b.sg[1:4] OR a.sg[5:8] = b.sg[5:8] "
            "  OR a.sg[9:12] = b.sg[9:12] OR a.sg[13:16] = b.sg[13:16])), "
            "e0 AS (SELECT c.id_a, c.id_b FROM cand c "
            "  JOIN sig x ON x.doc_id = c.id_a "
            "  JOIN sig y ON y.doc_id = c.id_b "
            "  WHERE len(list_filter(range(1, 17), "
            "    i -> x.sg[i] = y.sg[i])) / 16.0 >= 0.5), "
            "e AS (SELECT id_a, id_b FROM e0 "
            "      UNION ALL SELECT id_b, id_a FROM e0), "
            "r AS ("
            "  SELECT doc_id AS id, doc_id AS label FROM documents "
            "  UNION "
            "  SELECT e.id_a AS id, r.label FROM e JOIN r ON r.id = e.id_b"
            ") "
            "SELECT id AS doc_id, MIN(label) AS grp FROM r GROUP BY id"
        ),
        "corpus_idf": (
            f"WITH tk AS (SELECT doc_id, list_distinct({_TOKS}) AS toks "
            "FROM documents), "
            "ex AS (SELECT unnest(toks) AS token FROM tk), "
            "n AS (SELECT COUNT(*) AS nd FROM documents) "
            "SELECT token, COUNT(*) AS df, "
            "ROUND(ln((nd + 1.0) / (COUNT(*) + 1)) + 1, 4) AS idf "
            "FROM ex, n GROUP BY token, nd"
        ),
        "doc_tfidf_topk": (
            f"WITH tk AS (SELECT doc_id, unnest({_TOKS}) AS token "
            "FROM documents), "
            "tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tk "
            "GROUP BY 1, 2), "
            "n AS (SELECT COUNT(*) AS nd FROM documents), "
            "idf AS (SELECT token, "
            "  ROUND(ln((nd + 1.0) / (COUNT(DISTINCT doc_id) + 1)) + 1, 4) "
            "  AS idf FROM tk, n GROUP BY token, nd), "
            "s AS (SELECT tf.doc_id, tf.token, tf.tf, "
            "  ROUND(tf.tf * idf.idf, 4) AS score "
            "  FROM tf JOIN idf USING (token)), "
            "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id "
            "  ORDER BY score DESC, token ASC) AS rank FROM s) "
            "SELECT doc_id, token, tf, score, rank FROM r WHERE rank <= 5"
        ),
        "doc_simhash": (
            f"WITH t AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents), "
            "h AS (SELECT doc_id, "
            "  ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hv FROM t), "
            "bits AS (SELECT doc_id, j, SUM(CASE WHEN (hv >> j) & 1 = 1 "
            "  THEN 1 ELSE -1 END) AS vote "
            "  FROM h CROSS JOIN range(32) r(j) GROUP BY doc_id, j) "
            "SELECT doc_id, SUM(CASE WHEN vote > 0 THEN (1::BIGINT << j) "
            "ELSE 0 END)::BIGINT AS simhash FROM bits GROUP BY doc_id"
        ),
        "doc_simhash_pairs": (
            f"WITH t AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents), "
            "h AS (SELECT doc_id, "
            "  ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hv FROM t), "
            "bits AS (SELECT doc_id, j, SUM(CASE WHEN (hv >> j) & 1 = 1 "
            "  THEN 1 ELSE -1 END) AS vote "
            "  FROM h CROSS JOIN range(32) r(j) GROUP BY doc_id, j), "
            "sk AS (SELECT doc_id, SUM(CASE WHEN vote > 0 THEN (1::BIGINT << j) "
            "ELSE 0 END) >> 16 AS bucket FROM bits GROUP BY doc_id) "
            "SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b "
            "FROM sk a JOIN sk b ON a.bucket = b.bucket "
            "AND a.doc_id < b.doc_id"
        ),
        "doc_simhash_neardup": (
            f"WITH t AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents), "
            "h AS (SELECT doc_id, "
            "  ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hv FROM t), "
            "bits AS (SELECT doc_id, j, SUM(CASE WHEN (hv >> j) & 1 = 1 "
            "  THEN 1 ELSE -1 END) AS vote "
            "  FROM h CROSS JOIN range(32) r(j) GROUP BY doc_id, j), "
            "sk AS (SELECT doc_id, SUM(CASE WHEN vote > 0 THEN (1::BIGINT << j) "
            "ELSE 0 END)::BIGINT AS simhash FROM bits GROUP BY doc_id) "
            "SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, "
            "bit_count(xor(a.simhash, b.simhash)) AS hamming "
            "FROM sk a JOIN sk b ON (a.simhash >> 16) = (b.simhash >> 16) "
            "AND a.doc_id < b.doc_id "
            "WHERE bit_count(xor(a.simhash, b.simhash)) <= 3"
        ),
        "doc_simhash_neardup_full": (
            f"WITH t AS (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents), "
            "h AS (SELECT doc_id, "
            "  ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hv FROM t), "
            "bits AS (SELECT doc_id, j, SUM(CASE WHEN (hv >> j) & 1 = 1 "
            "  THEN 1 ELSE -1 END) AS vote "
            "  FROM h CROSS JOIN range(32) r(j) GROUP BY doc_id, j), "
            "sk AS (SELECT doc_id, SUM(CASE WHEN vote > 0 THEN (1::BIGINT << j) "
            "ELSE 0 END)::BIGINT AS simhash FROM bits GROUP BY doc_id) "
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "bit_count(xor(a.simhash, b.simhash)) AS hamming "
            "FROM sk a JOIN sk b ON a.doc_id < b.doc_id "
            "WHERE bit_count(xor(a.simhash, b.simhash)) <= 3"
        ),
        "doc_jaccard_pairs": (
            _shingles_cte()
            + ", ex0 AS (SELECT doc_id, unnest(shingles) AS s FROM sh)"
            ", rare AS (SELECT s FROM ex0 GROUP BY s HAVING COUNT(*) <= 50)"
            ", ex1 AS (SELECT ex0.doc_id, ex0.s FROM ex0 JOIN rare USING (s))"
            ", sz AS (SELECT doc_id, COUNT(*) AS n_sh FROM ex1 GROUP BY doc_id)"
            ", ex AS (SELECT ex1.doc_id, ex1.s, sz.n_sh FROM ex1 JOIN sz USING (doc_id)) "
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "ROUND(COUNT(*) * 1.0 / (a.n_sh + b.n_sh - COUNT(*)), 4) AS jaccard "
            "FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id "
            "GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh "
            "HAVING COUNT(*) * 1.0 / (a.n_sh + b.n_sh - COUNT(*)) > 0.2"
        ),
        "doc_gopher_quality": (
            f"WITH t AS (SELECT doc_id, text, {_TOKS} AS toks, "
            "  string_split(text, chr(10)) AS lines FROM documents) "
            "SELECT doc_id, "
            "ROUND(len(regexp_extract_all(text, '#|\\.\\.\\.|…')) * 1.0 "
            "  / len(toks), 4) AS symbol_word_ratio, "
            "ROUND(len(list_filter(toks, x -> NOT regexp_matches(x, "
            "  '[A-Za-z]'))) * 1.0 / len(toks), 4) AS frac_no_alpha_words, "
            "ROUND(list_sum(list_transform(toks, x -> length(x))) * 1.0 "
            "  / len(toks), 4) AS mean_word_len, "
            "ROUND(1 - len(list_distinct(lines)) * 1.0 / len(lines), 4) "
            "  AS frac_duplicate_lines "
            "FROM t"
        ),
        "doc_repetition": (
            f"WITH tk AS (SELECT doc_id, {_TOKS} AS toks FROM documents), "
            "uni AS (SELECT doc_id, unnest(toks) AS g FROM tk), "
            "up AS (SELECT doc_id, g, COUNT(*) AS n FROM uni GROUP BY 1, 2), "
            "us AS (SELECT doc_id, ROUND(MAX(n) * 1.0 / SUM(n), 4) "
            "  AS top_token_share FROM up GROUP BY 1), "
            "bg AS (SELECT doc_id, CASE WHEN len(toks) >= 2 THEN "
            "  [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))] "
            "  ELSE [] END AS bs FROM tk), "
            "bu AS (SELECT doc_id, unnest(bs) AS g FROM bg), "
            "bp AS (SELECT doc_id, g, COUNT(*) AS n FROM bu GROUP BY 1, 2), "
            "bs2 AS (SELECT doc_id, ROUND(MAX(n) * 1.0 / SUM(n), 4) "
            "  AS top_bigram_share FROM bp GROUP BY 1) "
            "SELECT us.doc_id, us.top_token_share, bs2.top_bigram_share "
            "FROM us LEFT JOIN bs2 USING (doc_id)"
        ),
        "doc_char_entropy": (
            "WITH c AS (SELECT doc_id, unnest(string_split(text, '')) AS ch "
            "FROM documents) "
            "SELECT doc_id, ROUND(entropy(ch), 4) AS char_entropy "
            "FROM c WHERE len(ch) > 0 GROUP BY 1"
        ),
        "corpus_mixture": (
            "WITH a AS (SELECT lang, source, COUNT(*) AS n_docs, "
            "  SUM(n_chars)::BIGINT AS n_chars_total FROM documents "
            "  GROUP BY 1, 2) "
            "SELECT lang, source, n_docs, n_chars_total, "
            "ROUND(n_docs * 1.0 / SUM(n_docs) OVER (), 4) AS corpus_share "
            "FROM a"
        ),
        "emb_knn": (
            "WITH q AS (SELECT vec_id AS q_id, embedding AS qv "
            "  FROM embeddings WHERE vec_id IN (0,1,2,3,4)), "
            "scored AS (SELECT q.q_id, e.vec_id AS n_id, "
            "  list_cosine_similarity(q.qv::DOUBLE[], e.embedding::DOUBLE[]) AS s "
            "  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.q_id), "
            "r AS (SELECT q_id, n_id, s, ROW_NUMBER() OVER "
            "  (PARTITION BY q_id ORDER BY s DESC, n_id ASC) AS rank FROM scored) "
            "SELECT q_id, n_id, rank, ROUND(s, 4) AS sim FROM r WHERE rank <= 3"
        ),
        "emb_neardup": (
            "SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
            "ROUND(list_cosine_similarity(a.embedding::DOUBLE[], "
            "b.embedding::DOUBLE[]), 4) AS sim "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[], "
            "b.embedding::DOUBLE[]), 4) > 0.4"
        ),
        "emb_knn_lsh": _knn_lsh_oracle(),
        "emb_neardup_lsh": _neardup_lsh_oracle(),
        "emb_neardup_ivf": _neardup_ivf_oracle(),
        "emb_neardup_ivf_trained": _neardup_ivf_trained_oracle(),
        "emb_neardup_groups": _neardup_groups_oracle(),
        "emb_knn_ivf": _knn_ivf_oracle(),
        "emb_knn_ivf_trained": _knn_ivf_trained_oracle(),
        "multimodal_frames": (
            # content repeats the 16-byte md5 digest 16x, so every
            # 16-byte-aligned frame IS the digest; frame_fp =
            # md5(lowercase hex of frame) = md5(md5(doc_id))
            "SELECT doc_id, CAST(4 * k AS INT) AS frame_idx, "
            "md5(md5(CAST(doc_id AS VARCHAR))) AS frame_fp "
            "FROM documents CROSS JOIN range(4) t(k)"
        ),
        "multimodal_resize": (
            # byte-slice 'resize' to 16*16/64 = 4 bytes = first 8 hex
            # chars of the doc's md5
            "SELECT doc_id, 16 AS width, 16 AS height, "
            "md5(substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS content_fp "
            "FROM documents"
        ),
        "multimodal_features": (
            # the fake-media fixture is md5-derived end to end
            # (multimodal.py attach_fake_media + fake_decoder):
            # content = unhex(repeat(md5(doc_id), 16)), and the decoder
            # hashes the content's HEX text — which is exactly that
            # repeated string — so f0 = byte0(md5(hex)) / 255. Rounding
            # parity (float32 .round(4) then F.round vs ROUND) was
            # verified exhaustively over all 256 byte values.
            "WITH f AS (SELECT doc_id, "
            "  repeat(md5(CAST(doc_id AS VARCHAR)), 16) AS hexc "
            "  FROM documents) "
            "SELECT doc_id, CAST(len(hexc) // 2 AS INT) AS n_bytes, "
            "ROUND(('0x' || substr(md5(hexc), 1, 2))::INT / 255.0, 4) AS f0 "
            "FROM f"
        ),
    }
