"""Streaming sources.

``transcript_file_stream`` is the engine's primary test/bench source:
datagen writes arrival-ordered parquet micro-batch files and the file
source replays them with ``maxFilesPerTrigger`` — the analog of the
reference's bounded event buffer + backpressure knobs
(reference: pkg/myslave/replication.go:40, engine/global.go:72-87):
rate limiting happens at the source, not by blocking channels.

In production the same pipeline reads ``format('kafka')`` or Iceberg
incremental snapshots; only this module changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dbus_spark.schema import TRANSCRIPT_SCHEMA


def transcript_file_stream(
    spark: SparkSession,
    dir_path: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Replay a datagen-written directory as a stream, one (or N)
    arrival-ordered files per micro-batch."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(dir_path)
    )


def rate_stream(spark: SparkSession, rows_per_second: int = 10_000) -> DataFrame:
    """Synthetic unbounded source (MockInput dryrun analog)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
