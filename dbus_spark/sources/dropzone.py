"""Push/drop-zone source — the HTTPInput analog.

The reference's HTTPInput exposes ``POST /v1/payload`` and turns each
request body into a packet; its payload handler is an empty stub
(reference: plugins/input/http/HTTPInput.go:18-71, handler.go:7-8), so
the semantic surface to re-create is exactly "a producer pushes a
payload, the pipeline sees it as a packet".

The Spark-native form is a drop-zone directory consumed by a file
stream source: :func:`post_payload` is the POST (atomic tmp-write +
rename, so the source never sees a torn file — the same guarantee an
HTTP body gives), and :func:`dropzone_stream` is the listener.
Offsets/resume/backpressure come from the file source's metadata log
and ``maxFilesPerTrigger``, replacing the reference's in-process
channel.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def post_payload(dropzone: str, payload: str | bytes | dict) -> str:
    """Publish one payload into the drop zone (the ``POST /v1/payload``
    analog). Dict payloads are JSON-encoded; the write is atomic —
    dot-prefixed tmp files are hidden from the Spark file source, the
    rename makes the payload visible in one step."""
    os.makedirs(dropzone, exist_ok=True)
    if isinstance(payload, dict):
        payload = json.dumps(payload)
    if isinstance(payload, str):
        payload = payload.encode("utf-8")
    token = uuid.uuid4().hex
    tmp = os.path.join(dropzone, f".{token}.tmp")
    final = os.path.join(dropzone, f"payload-{token}.jsonl")
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, final)
    return final


def dropzone_stream(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    max_files_per_trigger: int = 10,
) -> DataFrame:
    """Streaming DataFrame over the drop zone. Without a schema each
    payload line arrives as an opaque ``payload`` string (the
    reference's ``model.Bytes``/``model.String`` shape); with one, the
    payload is parsed as JSON lines into typed columns."""
    os.makedirs(path, exist_ok=True)
    reader = spark.readStream.option(
        "maxFilesPerTrigger", max_files_per_trigger
    )
    if schema is not None:
        return reader.schema(schema).json(path)
    return reader.text(path).select(F.col("value").alias("payload"))
