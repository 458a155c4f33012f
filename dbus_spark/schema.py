"""Canonical schemas for the engine's data plane.

The transcript shape comes from BASELINE.json ``input_hint``; the
rows-event shape mirrors the reference's structured binlog payload
(reference: pkg/model/rowsevent.go:26-49) lifted into a static Spark
StructType (SURVEY.md §1.2/§1.4).
"""

from __future__ import annotations

from pyspark.sql import types as T

# The engine's primary input: one row per conversation turn.
TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), nullable=False),
        T.StructField("turn_idx", T.IntegerType(), nullable=False),
        T.StructField("role", T.StringType(), nullable=False),
        T.StructField("text", T.StringType(), nullable=False),
        T.StructField("tool", T.StringType(), nullable=True),
        T.StructField("ts", T.TimestampType(), nullable=False),
    ]
)

# Reference-shaped CDC event (FIXTURES.md F2). The reference keeps cell
# values untyped (pkg/model/rowsevent.go:41 — [][]interface{}); we lift
# them to array<array<string>> and document the deviation in tests.
ROWS_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("log", T.StringType(), nullable=False),
        T.StructField("pos", T.LongType(), nullable=False),
        T.StructField("db", T.StringType(), nullable=False),
        T.StructField("tbl", T.StringType(), nullable=False),
        T.StructField("dml", T.StringType(), nullable=False),
        T.StructField("ts", T.TimestampType(), nullable=False),
        T.StructField("dt", T.TimestampType(), nullable=False),
        T.StructField("cols", T.ArrayType(T.StringType()), nullable=False),
        T.StructField(
            "rows", T.ArrayType(T.ArrayType(T.StringType())), nullable=False
        ),
    ]
)

# Packet envelope columns added by the pipeline layer (SURVEY.md §1.4):
# the routing key is an ordinary column, not an opaque struct field.
IDENT_COL = "ident"
