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
