"""The sink's Iceberg production form (SURVEY.md §2.4 ack path —
reference: pkg/myslave/myslave.go:118-150, the binlog ack → commit
gate): ``IdempotentKeyedSink.merge_sql()`` emits the ``MERGE INTO``
statement whose semantics the executed parquet epoch-partition +
marker + anti-join path reproduces.

The sandbox has no Iceberg runtime jar and no network (gate audit,
round 6: maven central unreachable — ``repo1.maven.org`` does not
resolve — so neither
``org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0`` nor the
Delta stand-in ``io.delta:delta-spark_2.13`` could be fetched; DuckDB
here is 1.0.0, which predates its MERGE support).  What CAN run
anywhere: Spark's own SQL parser accepts the emitted statement and
produces a MergeIntoTable plan with exactly the sink's key equalities
— the strongest catalog-less check of the statement itself.  The
integration test below executes the real MERGE when a runtime jar is
present (visible skip otherwise, same protocol as the Kafka gate).
"""

import pytest

from dbus_spark.sinks import IdempotentKeyedSink


def _parse_plan(spark, sql: str):
    """Parse (not resolve) a statement with Spark's own SQL parser —
    grammar-level validation that needs no catalog or table."""
    return spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)


def test_merge_sql_parses_to_merge_into_table(spark, tmp_path):
    sink = IdempotentKeyedSink(
        str(tmp_path / "out"), keys=["conv_id", "turn_idx"]
    )
    sql = sink.merge_sql("warehouse.transcripts_agg")
    plan = _parse_plan(spark, sql)
    assert plan.getClass().getSimpleName() == "MergeIntoTable"
    s = plan.toString()
    # the ON condition carries every sink key as a t-vs-s equality
    for k in ("conv_id", "turn_idx"):
        assert f"'t.{k} = 's.{k}" in s.replace("`", ""), (k, s)
    # insert-only merge: exactly the anti-join semantics the executed
    # parquet path implements (no UPDATE/DELETE clauses)
    low = s.lower()
    assert "insertstaraction" in low
    assert "updateaction" not in low and "deleteaction" not in low


def test_merge_sql_custom_keys_and_view(spark, tmp_path):
    sink = IdempotentKeyedSink(
        str(tmp_path / "out2"), keys=["fp"], key_types={"fp": "string"}
    )
    sql = sink.merge_sql("cat.db.t", batch_view="mb")
    assert sql == (
        "MERGE INTO cat.db.t t USING mb s ON t.fp = s.fp "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    plan = _parse_plan(spark, sql)
    assert plan.getClass().getSimpleName() == "MergeIntoTable"


def _iceberg_on_classpath(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def test_iceberg_merge_executes(spark, tmp_path):
    """Execute the emitted MERGE against a real Iceberg hadoop catalog
    and pin its idempotence to the parquet path's: replaying an
    overlapping batch must insert nothing.

    Gate audit (r6): requires
    ``org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0`` (or
    the matching runtime for this Spark) on the classpath plus
    ``spark.sql.catalog.ib=org.apache.iceberg.spark.SparkCatalog`` —
    unobtainable in this sandbox (no network, no local jar; see module
    docstring), so this skips visibly where that holds.
    """
    if not _iceberg_on_classpath(spark):
        pytest.skip(
            "iceberg-spark-runtime jar not on the classpath "
            "(org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0)"
        )
    wh = str(tmp_path / "wh")
    spark.conf.set(
        "spark.sql.catalog.ib", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.ib.type", "hadoop")
    spark.conf.set("spark.sql.catalog.ib.warehouse", wh)
    sink = IdempotentKeyedSink(
        str(tmp_path / "out3"), keys=["conv_id", "turn_idx"]
    )
    spark.sql(
        "CREATE TABLE ib.db.t (conv_id string, turn_idx int, n long) "
        "USING iceberg"
    )
    b1 = spark.createDataFrame(
        [("c1", 0, 5), ("c1", 1, 7)], "conv_id string, turn_idx int, n long"
    )
    b2 = spark.createDataFrame(  # overlaps b1 on (c1, 1)
        [("c1", 1, 99), ("c2", 0, 3)],
        "conv_id string, turn_idx int, n long",
    )
    sql = sink.merge_sql("ib.db.t")
    b1.createOrReplaceTempView("batch")
    spark.sql(sql)
    b2.createOrReplaceTempView("batch")
    spark.sql(sql)
    got = {
        (r["conv_id"], r["turn_idx"], r["n"])
        for r in spark.table("ib.db.t").collect()
    }
    # first write wins on the overlapping key — the sink's replay rule
    assert got == {("c1", 0, 5), ("c1", 1, 7), ("c2", 0, 3)}
