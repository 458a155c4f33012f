"""Sources — batch and streaming inputs (SURVEY.md §2.1).

The reference's Input plugins (MySQL binlog, Kafka, HTTP, Mock,
Stream) reduce here to Spark's built-in source connectors; what we own
is the *fixture-backed* transcript stream (MockInput analog) and thin
table loaders. Kafka ingestion at scale is one line —
``spark.readStream.format('kafka')`` — the offset/rebalance/resume
machinery the reference hand-builds is native to the source.
"""

from dbus_spark.sources.batch import load_table, load_transcripts
from dbus_spark.sources.dropzone import dropzone_stream, post_payload
from dbus_spark.sources.stream import transcript_file_stream, rate_stream

__all__ = [
    "load_table",
    "load_transcripts",
    "transcript_file_stream",
    "rate_stream",
    "dropzone_stream",
    "post_payload",
]
