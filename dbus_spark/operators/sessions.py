"""Gap-based session windows per conversation.

Target-scope operator (SURVEY.md §2.5 "Windows"): the reference has no
sessionization; we use Spark's native ``session_window`` aggregation —
state-store-backed on streams, plain hash-agg on batch — instead of a
hand-rolled stateful operator, so watermark-driven state eviction is
built in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    gap: str = "30 minutes",
    key: str = "conv_id",
    ts: str = "ts",
    order: str = "turn_idx",
    role: str = "role",
    watermark: str | None = None,
) -> DataFrame:
    """Sessions = runs of turns with inter-turn gap < ``gap``.

    Output: ``key, session_start, last_ts, n_turns, roles`` where
    ``roles`` is the comma-joined role sequence in (ts, order) order —
    the FIXTURES.md F4 ``expected_sessions`` shape. The role sequence is
    rebuilt deterministically from data (array_sort on (ts, order)),
    never from partition iteration order (SURVEY.md §7.4 risk 1).
    """
    roles_col = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col(ts), F.col(order), F.col(role)))
            ),
            lambda x: x[role],
        ),
        ",",
    ).alias("roles")
    if not df.isStreaming:
        # Batch path (r7): gaps-and-islands — one shuffle + sort per
        # key, then a plain hash aggregation per (key, island). The
        # native session_window aggregation buffers/merges per-session
        # collect_list state through ObjectHashAggregate and showed
        # 3-16 s walls (GC-heavy) on the 1M-row bench table where this
        # form holds 1.6-2.1 s; outputs are identical (same boundary
        # rule: a new session starts iff ts - prev >= gap, exactly the
        # half-open [ts, ts+gap) overlap rule, and the same
        # (ts, order) role ordering — pinned equal by test and by the
        # oracle, whose SQL is this very gaps-and-islands form).
        from pyspark.sql.window import Window

        w = Window.partitionBy(key).orderBy(
            F.col(ts).asc(), F.col(order).asc()
        )
        prev = F.lag(F.col(ts)).over(w)
        news = F.when(
            prev.isNull() | (F.col(ts) - prev >= F.expr(f"INTERVAL {gap}")),
            1,
        ).otherwise(0)
        sid = F.sum(news).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
        agg = (
            df.withColumn("_sid", sid)
            .groupBy(F.col(key), F.col("_sid"))
            .agg(
                F.count("*").alias("n_turns"),
                F.max(ts).alias("last_ts"),
                F.min(ts).alias("session_start"),
                roles_col,
            )
        )
        return agg.select(
            F.col(key), "session_start", "last_ts", "n_turns", "roles"
        )
    # Streaming path: Spark's native session_window aggregation —
    # state-store-backed, watermark-driven eviction built in.
    src = df.withWatermark(ts, watermark) if watermark else df
    agg = src.groupBy(
        F.session_window(F.col(ts), gap).alias("_sw"), F.col(key)
    ).agg(
        F.count("*").alias("n_turns"),
        F.max(ts).alias("last_ts"),
        roles_col,
    )
    return agg.select(
        F.col(key),
        F.col("_sw.start").alias("session_start"),
        "last_ts",
        "n_turns",
        "roles",
    )
