"""Sinks (SURVEY.md §2.4) — the exactly-once delivery layer."""

from dbus_spark.sinks.idempotent import IdempotentKeyedSink

__all__ = ["IdempotentKeyedSink"]
