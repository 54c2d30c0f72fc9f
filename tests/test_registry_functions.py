"""Named SQL-function registry tests (F1/F3/F6/F4 from SQL text)."""

from __future__ import annotations

from etl_his_spark.api import sql


def test_named_functions_from_sql_text(spark, sf_dir):
    out = sql(
        spark,
        sf_dir,
        """
        SELECT p_partkey,
               limpiar_nombres(p_name) AS limpio,
               primer_nombre(limpiar_nombres(p_name)) AS primero
        FROM part
        WHERE es_no_vacio(p_name)
        LIMIT 5
        """,
    ).collect()
    assert len(out) == 5
    for r in out:
        assert r["limpio"] == r["limpio"].strip()
        assert r["limpio"].startswith(r["primero"])


def test_gender_lookup_view_from_sql(spark, sf_dir):
    out = sql(
        spark,
        sf_dir,
        "SELECT gender FROM gender_lookup WHERE first_name = 'JUAN'",
    ).first()
    assert out["gender"] == "Male"
