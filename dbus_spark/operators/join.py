"""Stream-stream correlation: user turns ⋈ tool-call turns.

Target-scope operator (SURVEY.md §2.5 "Stream-stream correlation").
Each user turn pairs with the tool turns of the same conversation whose
timestamp falls in (user_ts, user_ts + horizon]. On streams both sides
carry watermarks and the join condition is a time-interval predicate,
so Spark bounds join state to the horizon (SURVEY.md §7.4 risk 4 —
without the interval the state grows without bound).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def correlate_user_tool(
    df: DataFrame,
    horizon: str = "2 minutes",
    watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Pair user turns with subsequent tool turns within ``horizon``.

    Output: ``conv_id, user_turn_idx, tool_turn_idx, tool, user_ts,
    tool_ts`` (FIXTURES.md F4 ``expected_joined`` shape).
    """
    user = df.filter(F.col("role") == "user").select(
        F.col("conv_id"),
        F.col("turn_idx").alias("user_turn_idx"),
        F.col("ts").alias("user_ts"),
    )
    tool = df.filter(F.col("tool").isNotNull()).select(
        F.col("conv_id").alias("t_conv_id"),
        F.col("turn_idx").alias("tool_turn_idx"),
        F.col("tool"),
        F.col("ts").alias("tool_ts"),
    )
    if watermark:
        user = user.withWatermark("user_ts", watermark)
        tool = tool.withWatermark("tool_ts", watermark)
    cond = (
        (user.conv_id == tool.t_conv_id)
        & (tool.tool_ts > user.user_ts)
        & (tool.tool_ts <= F.expr(f"user_ts + INTERVAL {horizon}"))
    )
    joined = user.join(tool, cond, how)
    return joined.select(
        "conv_id", "user_turn_idx", "tool_turn_idx", "tool",
        "user_ts", "tool_ts",
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts: str,
    right_cols: list[str],
    order_col: str | None = None,
) -> DataFrame:
    """As-of join: every left row picks the single most recent right
    row with ``right.ts <= left.ts`` within its ``by`` group (backward
    inexact match — the market-data / attribution join Spark has no
    built-in for).

    Spark-first formulation: NOT a range join (whose candidate set is
    every right row in the window, exploding with density) but the
    union-and-carry trick — tag the two sides, union them, and let one
    per-key window ``last(right_col, ignorenulls=True)`` carry the
    latest right values forward onto each left row. ONE shuffle on
    ``by`` total, state O(1) per row, no pair blowup at any density;
    exactly the plan a 100 TB attribution join wants.

    Ties: a right row at the identical timestamp IS visible to the left
    row (<= semantics; right sorts before left at equal ts), and
    several right rows at one timestamp resolve to the greatest
    ``order_col`` — deterministic, and mirrored by the SQL oracle.

    Output: every left row (count preserved) + the carried
    ``right_cols`` (null when no right row precedes)."""
    from pyspark.sql.window import Window

    l_cols = [c for c in left.columns if c != by and c != ts]
    clash = set(right_cols) & set(l_cols)
    if clash:
        raise ValueError(
            f"asof_join: right_cols {sorted(clash)} collide with left "
            "payload columns — rename one side (a silent duplicate "
            "column name would break every downstream reference)"
        )
    # the right payload rides as ONE struct so every carried column
    # comes atomically from the same right row (independent per-column
    # last() could mix rows when right columns contain nulls)
    rv_type = (
        "struct<"
        + ",".join(
            f"{c}:{right.schema[c].dataType.simpleString()}"
            for c in right_cols
        )
        + ">"
    )
    lt = left.select(
        by,
        ts,
        *l_cols,
        F.lit(None).cast(rv_type).alias("_rv"),
        F.lit(True).alias("_is_l"),
        (
            F.col(order_col) if order_col and order_col in left.columns
            else F.lit(0).cast("long")
        ).alias("_ord"),
    )
    rt = right.select(
        by,
        ts,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols],
        F.struct(*right_cols).alias("_rv"),
        F.lit(False).alias("_is_l"),
        (F.col(order_col) if order_col else F.lit(0).cast("long")).alias(
            "_ord"
        ),
    )
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(ts).asc(), F.col("_is_l").asc(), F.col("_ord").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lt.unionByName(rt).withColumn(
        "_rv", F.last("_rv", ignorenulls=True).over(w)
    )
    return carried.filter("_is_l").select(
        by,
        ts,
        *l_cols,
        *[F.col(f"_rv.{c}").alias(c) for c in right_cols],
    )
