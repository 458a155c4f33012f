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

import pandas as pd

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


def _avro_zigzag(n: int) -> bytes:
    """Avro zigzag varint (spec: binary encoding, int/long)."""
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _avro_bytes(b: bytes) -> bytes:
    return _avro_zigzag(len(b)) + b


def _avro_str(s: str) -> bytes:
    return _avro_bytes(s.encode("utf-8"))


def encode_rows_event_avro_binary() -> Column:
    """Avro BINARY encode of the rows-event wire record — the schema
    the reference declares (pkg/model/rowsevent_avro.go:9-56: record
    RowsEvent {log string, pos int, db string, tbl string, dml string,
    ts int, rows array<bytes>}), hand-rolled to the Avro spec because
    neither the spark-avro jar nor an avro python package exists in
    this sandbox (the reference's own Avro test is skipped for the
    same class of reason). Each row of ``rows`` (an array of cell
    strings here) rides as its compact-JSON bytes, matching the
    reference's rows-as-opaque-bytes contract.

    Arrow-batched pandas UDF; byte assembly is per-row by nature
    (variable-length varint splicing). On a cluster with the
    spark-avro jar prefer :func:`encode_rows_event_avro` (to_avro,
    JVM-side); this function is the jar-free form and the golden
    reference the tests pin."""
    import json

    @F.pandas_udf("binary")
    def enc(
        log: pd.Series,
        pos: pd.Series,
        db: pd.Series,
        tbl: pd.Series,
        dml: pd.Series,
        ts: pd.Series,
        rows: pd.Series,
    ) -> pd.Series:
        out = []
        for lg, p, d, t, m, s, rws in zip(
            log, pos, db, tbl, dml, ts, rows
        ):
            buf = bytearray()
            buf += _avro_str(lg)
            buf += _avro_zigzag(int(p))
            buf += _avro_str(d)
            buf += _avro_str(t)
            buf += _avro_str(m)
            buf += _avro_zigzag(int(s))
            items = [
                json.dumps(list(r), separators=(",", ":")).encode("utf-8")
                for r in rws
            ]
            if items:
                buf += _avro_zigzag(len(items))
                for it in items:
                    buf += _avro_bytes(it)
            buf += _avro_zigzag(0)  # array terminator block
            out.append(bytes(buf))
        return pd.Series(out, dtype=object)

    return enc(
        F.col("log"),
        F.col("pos"),
        F.col("db"),
        F.col("tbl"),
        F.col("dml"),
        F.unix_timestamp("ts"),
        F.col("rows"),
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
