"""Idempotent keyed sink: exactly-once over at-least-once delivery.

The reference is at-least-once: its disruptor batcher replays a whole
batch on any failure and documents the resulting duplicates
(reference: pkg/batcher/disruptor.go:110-142,
pkg/kafka/producer.go:219-224); its ack→checkpoint path commits source
positions only after the sink succeeded (engine/packet.go:80-84,
pkg/myslave/myslave.go:118-150). We keep the same "ack after durable
write" ordering — Structured Streaming commits source offsets after
the micro-batch sink commit — and *upgrade* delivery to exactly-once
by making the sink idempotent on the natural key ``(conv_id,
turn_idx)``:

1. **batch-id bookkeeping**: a replayed micro-batch (same epoch id
   after checkpoint resume) is skipped outright;
2. **key-level anti-join MERGE**: within a new batch, only keys not
   already in the target are appended — re-deliveries of the same turn
   (the datagen duplicate fixture) become no-ops.

On a production cluster the target is an Iceberg table and step 2 is a
single ``MERGE INTO t USING batch ON (conv_id, turn_idx) WHEN NOT
MATCHED THEN INSERT`` with metadata-pruned file scans
(``merge_sql()`` emits exactly that statement). In this sandbox (no
Iceberg runtime jar) the same semantics run over a parquet directory;
the anti-join reads only the target's key columns (column pruning) and
both sides hash-partition on the key, so the plan scales with the
*key* volume, not row width.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class IdempotentKeyedSink:
    """foreachBatch sink with MERGE-on-key semantics over parquet."""

    def __init__(self, path: str, keys: list[str] | None = None):
        self.path = path
        self.keys = keys or ["conv_id", "turn_idx"]
        self.data_path = os.path.join(path, "data")
        self.meta_path = os.path.join(path, "_batches")
        os.makedirs(self.data_path, exist_ok=True)
        os.makedirs(self.meta_path, exist_ok=True)

    # -- bookkeeping ---------------------------------------------------

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.meta_path, f"batch-{batch_id:020d}.json")

    def committed(self, batch_id: int) -> bool:
        return os.path.exists(self._marker(batch_id))

    def _commit_marker(self, batch_id: int, n_rows: int) -> None:
        tmp = self._marker(batch_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batch_id": batch_id, "rows_appended": n_rows}, f)
        os.replace(tmp, self._marker(batch_id))  # atomic visibility

    def _has_data(self) -> bool:
        return any(
            f.endswith(".parquet") for f in os.listdir(self.data_path)
        )

    # -- the MERGE -----------------------------------------------------

    def write_batch(self, batch_df: DataFrame, batch_id: int) -> int:
        """Apply one micro-batch; returns rows actually appended."""
        if self.committed(batch_id):
            # Replay of an already-committed epoch → logical no-op, but
            # the batch must still be *processed*: Spark 4.x validates
            # that foreachBatch consumes every partition (state-store
            # commit tracking), so drain it into the noop sink.
            batch_df.write.format("noop").mode("overwrite").save()
            return 0
        spark = batch_df.sparkSession
        fresh = batch_df.dropDuplicates(self.keys)
        if self._has_data():
            existing_keys = spark.read.parquet(self.data_path).select(
                *self.keys
            )
            fresh = fresh.join(existing_keys, on=self.keys, how="left_anti")
        fresh = fresh.persist()
        n = fresh.count()
        if n > 0:
            fresh.write.mode("append").parquet(self.data_path)
        fresh.unpersist()
        self._commit_marker(batch_id, n)
        return n

    def foreach_batch(self):
        return lambda df, bid: self.write_batch(df, bid)

    def read(self, spark: SparkSession) -> DataFrame:
        if not self._has_data():
            return spark.createDataFrame([], schema="conv_id string")
        return spark.read.parquet(self.data_path)

    # -- Iceberg form (production path) ---------------------------------

    def merge_sql(self, target_table: str, batch_view: str = "batch") -> str:
        """The equivalent Iceberg statement this sink performs."""
        on = " AND ".join(f"t.{k} = s.{k}" for k in self.keys)
        return (
            f"MERGE INTO {target_table} t USING {batch_view} s ON {on} "
            f"WHEN NOT MATCHED THEN INSERT *"
        )
