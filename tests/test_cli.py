"""Operator CLI (`dbc` / `dbusd -validate` analogs)."""

import json

from dbus_spark.cli import main


def _write_cfg(tmp_path, cfg):
    p = tmp_path / "pipe.json"
    p.write_text(json.dumps(cfg))
    return str(p)


def test_validate_ok(tmp_path, capsys):
    cfg = {
        "plugins": [
            {"name": "in1", "class": "MockInput"},
            {"name": "out1", "class": "MemoryOutput", "match": ["in1"]},
        ]
    }
    assert main(["validate", _write_cfg(tmp_path, cfg)]) == 0
    out = capsys.readouterr().out
    assert out.startswith("OK:") and "1 Input" in out


def test_validate_rejects_bad_config(tmp_path, capsys):
    cfg = {
        "plugins": [
            {"name": "x", "class": "MockInput"},
            {"name": "x", "class": "MemoryOutput", "match": ["x"]},
        ]
    }
    assert main(["validate", _write_cfg(tmp_path, cfg)]) == 1
    assert "INVALID" in capsys.readouterr().err


def test_dot_prints_graph(tmp_path, capsys):
    cfg = {
        "plugins": [
            {"name": "in1", "class": "MockInput"},
            {"name": "out1", "class": "MemoryOutput", "match": ["in1"]},
        ]
    }
    assert main(["dot", _write_cfg(tmp_path, cfg)]) == 0
    out = capsys.readouterr().out
    assert "digraph pipeline" in out and '"in1" -> "out1"' in out


def test_checkpoint_summary(spark, tmp_path, capsys):
    from dbus_spark.datagen import generate_transcripts, write_stream_batches
    from dbus_spark.sources import transcript_file_stream

    pdf = generate_transcripts(n_convs=5, seed=3)
    write_stream_batches(pdf, str(tmp_path / "in"), n_files=2)
    src = transcript_file_stream(spark, str(tmp_path / "in"), 1)
    q = (
        src.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .format("noop")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(60)
    assert main(["checkpoint", str(tmp_path / "ck")]) == 0
    summary = json.loads(capsys.readouterr().out)
    assert summary["batches"] >= 2
    assert summary["latest_committed"] == summary["latest_batch"]
    assert summary["uncommitted"] == []


def test_validate_missing_file_reports_invalid(capsys):
    from dbus_spark.cli import main

    rc = main(["validate", "/nonexistent/pipeline.json"])
    assert rc == 1
    assert "INVALID" in capsys.readouterr().err


def test_validate_wrong_typed_config_reports_invalid(tmp_path, capsys):
    from dbus_spark.cli import main

    p = tmp_path / "bad.json"
    p.write_text('{"plugins": 42}')
    rc = main(["validate", str(p)])
    assert rc == 1
    assert "INVALID" in capsys.readouterr().err
