"""Operators: the engine's analytic surface (SURVEY.md §2.5 + scope).

The reference has routing + delivery machinery but no event-time
operators; the target scope (BASELINE.json north_rule) adds windows,
sessions, keyed ordering/dedup state, and the stream-stream join —
each implemented Spark-first here, with a salted two-phase variant
for hot-key skew.
"""

from dbus_spark.operators.windows import windowed_agg, salted_windowed_agg
from dbus_spark.operators.sessions import sessionize
from dbus_spark.operators.ordering import (
    restore_order_batch,
    ordered_turns_stream,
    dedup_within_watermark,
)
from dbus_spark.operators.join import correlate_user_tool

__all__ = [
    "windowed_agg",
    "salted_windowed_agg",
    "sessionize",
    "restore_order_batch",
    "ordered_turns_stream",
    "dedup_within_watermark",
    "correlate_user_tool",
]
