"""Streaming runtime: metrics listener + checkpoint helpers."""

from dbus_spark.streaming.listener import MetricsListener

__all__ = ["MetricsListener"]
