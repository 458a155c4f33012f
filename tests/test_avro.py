"""Avro binary encoder (reference: pkg/model/rowsevent_avro.go) —
golden bytes computed by hand from the Avro spec, plus a spec decoder
round-trip over the whole rows_events fixture."""

import json

import pandas as pd
import pytest

from dbus_spark.functions import (
    _avro_zigzag,
    encode_rows_event_avro_binary,
)


def test_zigzag_varint_spec_values():
    # table straight from the Avro spec's binary-encoding section
    assert _avro_zigzag(0) == b"\x00"
    assert _avro_zigzag(-1) == b"\x01"
    assert _avro_zigzag(1) == b"\x02"
    assert _avro_zigzag(-2) == b"\x03"
    assert _avro_zigzag(2) == b"\x04"
    assert _avro_zigzag(-64) == b"\x7f"
    assert _avro_zigzag(64) == b"\x80\x01"


def _decode(buf: bytes):
    """Minimal Avro binary decoder for the RowsEvent schema."""
    pos = 0

    def varint():
        nonlocal pos
        shift = z = 0
        while True:
            b = buf[pos]
            pos += 1
            z |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (z >> 1) ^ -(z & 1)  # un-zigzag

    def raw(n):
        nonlocal pos
        out = buf[pos : pos + n]
        pos += n
        return out

    def string():
        return raw(varint()).decode("utf-8")

    rec = {
        "log": string(),
        "pos": varint(),
        "db": string(),
        "tbl": string(),
        "dml": string(),
        "ts": varint(),
    }
    rows = []
    while True:
        n = varint()
        if n == 0:
            break
        if n < 0:  # block with byte-size prefix (spec-legal form)
            varint()
            n = -n
        for _ in range(n):
            rows.append(raw(varint()))
    rec["rows"] = rows
    assert pos == len(buf)  # no trailing bytes
    return rec


def test_golden_bytes_single_record(spark):
    import datetime

    ts1 = datetime.datetime(1970, 1, 1, 0, 0, 1)
    df = spark.createDataFrame(
        [("a", 4, "d", "t", "I", ts1, [["x"]])],
        "log string, pos int, db string, tbl string, dml string, "
        "ts timestamp, rows array<array<string>>",
    )
    got = df.select(
        encode_rows_event_avro_binary().alias("avro")
    ).collect()[0]["avro"]
    # hand-assembled per the spec: strings are varint-len + utf8,
    # ints zigzag, array = count + items + 0 terminator;
    # rows payload is compact JSON of the cell list: ["x"]
    payload = b'["x"]'
    expected = (
        b"\x02a"  # log "a"
        b"\x08"  # pos 4 -> zigzag 8
        b"\x02d"  # db
        b"\x02t"  # tbl
        b"\x02I"  # dml
        b"\x02"  # ts 1 -> zigzag 2
        b"\x02"  # rows: 1 item
        + bytes([len(payload) * 2])  # bytes len varint (zigzag)
        + payload
        + b"\x00"  # array end
    )
    assert bytes(got) == expected


def test_avro_roundtrip_whole_fixture(spark):
    from dbus_spark.datagen import generate_rows_events

    pdf = generate_rows_events(n_events=200, seed=7)
    df = spark.createDataFrame(pdf)
    enc = df.select(
        "log", "pos", "db", "tbl", "dml", "ts", "rows",
        encode_rows_event_avro_binary().alias("avro"),
    ).collect()
    assert len(enc) == 200
    for r in enc:
        dec = _decode(bytes(r["avro"]))
        assert dec["log"] == r["log"]
        assert dec["pos"] == r["pos"]
        assert (dec["db"], dec["tbl"], dec["dml"]) == (r["db"], r["tbl"], r["dml"])
        assert dec["ts"] == int(r["ts"].timestamp())
        assert [json.loads(b) for b in dec["rows"]] == [
            list(x) for x in r["rows"]
        ]
