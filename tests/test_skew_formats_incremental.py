"""Tests: skew-safe operators, CSV/JSON formats, incremental dim load."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_his_spark.operators.skew import salted_agg, salted_broadcast_left
from etl_his_spark.plans.his_extract import extract_wide
from etl_his_spark.plans.his_pipeline import build_paciente, incremental_paciente
from etl_his_spark.sources.formats import read_csv, read_jsonl, write_csv, write_jsonl
from etl_his_spark.sources.readers import read_table

from his_fixtures import his_tables


def test_salted_agg_equals_direct(spark, sf_dir):
    l = read_table(spark, sf_dir, "lineitem")
    direct = {
        (r["l_returnflag"],): (r["n"], r["q"])
        for r in l.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("q"),
        )
        .collect()
    }
    salted = {
        (r["l_returnflag"],): (r["n"], r["q"])
        for r in salted_agg(
            l.withColumn("__cents", F.round(F.col("l_quantity") * 100).cast("long")),
            ["l_returnflag"],
            F.col("l_orderkey"),
            {"n": ("count", "l_orderkey"), "q": ("sum", "__cents")},
            n_salts=16,
        ).collect()
    }
    assert salted == direct


def test_salted_broadcast_left_equals_plain(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    plain = o.join(c, "o_custkey", "left")
    salted = salted_broadcast_left(o, c, "o_custkey", n_salts=4)
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.select(*plain.columns).collect())
    )


def test_csv_roundtrip_with_schema(spark, sf_dir, tmp_path):
    nation = read_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_csv")
    write_csv(nation, path)
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    )
    back = read_csv(spark, path, schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_jsonl_roundtrip_with_schema(spark, sf_dir, tmp_path):
    region = read_table(spark, sf_dir, "region")
    path = str(tmp_path / "region_json")
    write_jsonl(region, path)
    schema = T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    )
    back = read_jsonl(spark, path, schema)
    assert sorted(map(tuple, back.select("r_regionkey", "r_name").collect())) == sorted(
        map(tuple, region.collect())
    )


def test_incremental_paciente_only_new_docs(spark):
    tables = his_tables(spark)
    wide = extract_wide(tables)
    existing = build_paciente(wide)
    n0 = existing.count()
    max0 = existing.agg(F.max("id")).first()[0]

    # second batch: one known patient (doc 111) + one brand-new doc 999
    new_personas = spark.createDataFrame(
        [
            (50, "carlos", "nuevo", "999"),
            (51, "maria", "vieja", " 111 "),
            # user-persons must stay present or the inner J7/J8 joins
            # drop every row
            (100, "Admin", "Uno", "900"),
        ],
        tables["Personas"].schema,
    )
    import datetime as dt

    t = tables["turnos"].limit(0)  # reuse schema
    new_turnos = spark.createDataFrame(
        [
            tuple(
                [100, 1, 1, 1, 50, 1, 10, 1, dt.date(2024, 3, 1), "09:00:00",
                 30, False, dt.datetime(2024, 3, 1, 9)] + [None] * 11
            ),
            tuple(
                [101, 1, 1, 1, 51, 1, 10, 1, dt.date(2024, 3, 2), "10:00:00",
                 30, False, dt.datetime(2024, 3, 2, 9)] + [None] * 11
            ),
        ],
        t.schema,
    )
    batch2 = dict(tables)
    batch2["turnos"] = new_turnos
    batch2["Personas"] = new_personas
    wide2 = extract_wide(batch2)

    delta = incremental_paciente(existing, wide2)
    rows = delta.collect()
    # only doc 999 is new; 111 (after trim) already exists
    assert [r["documento_identidad"] for r in rows] == ["999"]
    assert rows[0]["id"] == max0 + 1
    assert rows[0]["nombre"] == "CARLOS"
    # idempotence: running again with no new docs yields nothing
    merged = existing.unionByName(delta)
    again = incremental_paciente(merged, wide2)
    assert again.count() == 0
    assert merged.count() == n0 + 1


def test_orc_roundtrip_with_pushdown(spark, sf_dir):
    import tempfile

    from pyspark.sql import functions as F

    from etl_his_spark.sources.formats import read_orc, write_orc
    from etl_his_spark.sources.readers import read_table

    nation = read_table(spark, sf_dir, "nation")
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/nation_orc"
        write_orc(nation, path)
        back = read_orc(spark, path)
        assert back.schema == nation.schema
        assert sorted(r.n_nationkey for r in back.collect()) == sorted(
            r.n_nationkey for r in nation.collect()
        )
        # filters reach the ORC scan (same pushdown machinery as parquet)
        plan = (
            back.filter(F.col("n_nationkey") == 3)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "PushedFilters: [IsNotNull(n_nationkey), EqualTo(n_nationkey,3)]" in plan


def test_events_native_ntz_reads_naive_as_utc_any_timezone(spark, tmp_path):
    """A native TIMESTAMP(MICROS) (NTZ) events file must read as
    naive-as-UTC — DuckDB's semantics — regardless of the session
    timezone (read_table's contract covers bare sessions in any zone;
    an NTZ→LTZ cast would shift ts by the session offset)."""
    import datetime

    from etl_his_spark.sources.readers import read_events_raw, read_table

    naive = datetime.datetime(2024, 3, 1, 12, 0, 0)
    df = spark.createDataFrame(
        [(1, 100, "click", naive, 1.0)],
        "event_id long, user_id long, event_type string, "
        "ts timestamp_ntz, value double",
    )
    root = str(tmp_path / "sfntz")
    df.write.parquet(f"{root}/events.parquet")
    expected_us = int(
        naive.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000
    )
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        raw_ns = read_events_raw(spark, root).select("ts").first()["ts"]
        assert raw_ns == expected_us * 1000
        got_us = (
            read_table(spark, root, "events")
            .select(F.unix_micros("ts").alias("us"))
            .first()["us"]
        )
        assert got_us == expected_us
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
