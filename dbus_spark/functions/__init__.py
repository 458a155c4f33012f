"""Scalar function surface (SURVEY.md §2.6) — all JVM-side expressions.

The reference's per-row function library is tiny: JSON event encode,
ALTER-TABLE regex classification, DSN parsing, a length guard, and
ident string ops. Each is re-expressed as a Catalyst expression (or a
driver-side config parser where it never touches the data plane), so
nothing here leaves whole-stage codegen.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- JSON event encode (reference: pkg/model/rowsevent.go:66-76) ------

# Field order matches the reference's golden wire JSON
# (pkg/model/rowsevent_test.go:38-47): log,pos,db,tbl,dml,ts,rows.
# The reference omits `cols` and `dt` from the wire form.


def encode_rows_event_json() -> Column:
    """``to_json`` of a rows-event row in the reference's wire shape.

    Deviation (documented in FIXTURES.md F2): our cells are strings, so
    numeric cells serialize quoted where the reference keeps them
    numeric; the golden test asserts equality modulo that lifting.
    """
    return F.to_json(
        F.struct(
            F.col("log"),
            F.col("pos"),
            F.col("db"),
            F.col("tbl"),
            F.col("dml"),
            F.unix_timestamp("ts").alias("ts"),
            F.col("rows"),
        )
    )


# --- ALTER TABLE classification (reference: pkg/myslave/alter.go:8-20) -

# Same semantics re-derived: case-insensitive 'ALTER TABLE', optional
# backticks, optional db qualifier; groups = (db, table).
_ALTER_RE = r"(?i)^ALTER\sTABLE\s.*?`{0,1}(.*?)`{0,1}\.{0,1}`{0,1}([^`\.]+?)`{0,1}\s.*"


def is_alter_table(col: str | Column = "query") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike(r"(?i)^ALTER\sTABLE\s")


def alter_table_target(col: str | Column = "query") -> Column:
    """Extract the altered table name (group 2 of the reference regex)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, _ALTER_RE, 2)


def encode_rows_event_avro() -> Column:
    """Avro encode of the wire struct (reference declares an Avro
    schema: pkg/model/rowsevent_avro.go:9-56, its test is skipped).
    Requires the spark-avro module jar; raises ImportError when the
    module is not on the classpath (gated, like the reference's
    skipped test)."""
    try:
        from pyspark.sql.avro.functions import to_avro
    except ImportError as e:  # pragma: no cover
        raise ImportError("pyspark avro module unavailable") from e
    return to_avro(
        F.struct(
            F.col("log"),
            F.col("pos"),
            F.col("db"),
            F.col("tbl"),
            F.col("dml"),
            F.unix_timestamp("ts").alias("ts"),
            F.col("rows"),
        )
    )


# --- length guard (reference: plugins/input/mysql/standalone.go:93-100)


def max_event_length_guard(
    df: DataFrame, max_len: int = 1 << 20, col: str = "text"
) -> DataFrame:
    """Drop oversized payloads — the reference's documented loss case
    (events ≥ max_event_length are discarded with a warning)."""
    return df.filter(F.length(F.col(col)) < F.lit(max_len))


# --- DSN parsing (config plane, never per-row) -------------------------
# reference: pkg/dsn/dsn.go:17-26 (scheme:uri), pkg/kafka/dsn.go:13-49
# (kafka:zone://cluster/topic#partition). Driver-side parsing only.


class IllegalDSN(ValueError):
    pass


def parse_dsn(dsn: str) -> tuple[str, str]:
    """`scheme:uri` split (reference: pkg/dsn/dsn.go:17-26)."""
    parts = dsn.split(":", 1)
    if len(parts) != 2:
        raise IllegalDSN(dsn)
    return parts[0].strip(), parts[1].strip()


@dataclass(frozen=True)
class KafkaDSN:
    zone: str
    cluster: str
    topic: str
    partition: int  # -1 = all partitions


INVALID_PARTITION = -1

_KAFKA_URI_RE = re.compile(
    r"^(?P<zone>[^:/]+)://(?P<cluster>[^/]+)/(?P<topic>[^#]*)(#(?P<part>\d+))?$"
)


def parse_kafka_dsn(dsn: str) -> KafkaDSN:
    """kafka:zone://cluster/topic#partition (pkg/kafka/dsn.go:13-49)."""
    scheme, uri = parse_dsn(dsn)
    if scheme != "kafka":
        raise IllegalDSN(dsn)
    m = _KAFKA_URI_RE.match(uri)
    if not m or not m.group("zone") or not m.group("cluster"):
        raise IllegalDSN(dsn)
    part = m.group("part")
    return KafkaDSN(
        zone=m.group("zone"),
        cluster=m.group("cluster"),
        topic=m.group("topic"),
        partition=int(part) if part is not None else INVALID_PARTITION,
    )
