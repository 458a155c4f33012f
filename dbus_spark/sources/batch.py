"""Batch table loaders over the driver-provided parquet test data."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem "
    "events documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table; predicate/column pruning reach the scan
    because this is a plain parquet relation (check PushedFilters in
    .explain)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_transcripts(spark: SparkSession, path: str) -> DataFrame:
    """Load a transcript table written by dbus_spark.datagen."""
    return spark.read.parquet(path)
