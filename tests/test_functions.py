"""Unit tests for scalar functions (SURVEY.md §2.7)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_his_spark.functions.text import (
    limpiar_nombres,
    nonempty,
    primer_nombre,
    token_count,
    usuario_nombre_concat,
)
from etl_his_spark.functions.gender import inferir_sexo


def _one_col(spark, values):
    return spark.createDataFrame([(v,) for v in values], "v string")


def test_limpiar_nombres_semantics(spark):
    df = _one_col(
        spark,
        ["  maría  josé  ", "juan", None, "", "  A   B\tC  ", "ñandú güemes"],
    )
    got = [r[0] for r in df.select(limpiar_nombres("v")).collect()]
    assert got == ["MARÍA JOSÉ", "JUAN", None, "", "A B C", "ÑANDÚ GÜEMES"]


def test_limpiar_nombres_idempotent(spark):
    df = _one_col(spark, ["  x  Y  z ", "ÁÉ  í", None])
    once = df.select(limpiar_nombres("v").alias("v"))
    twice = once.select(limpiar_nombres("v").alias("v"))
    assert once.collect() == twice.collect()


def test_primer_nombre(spark):
    df = _one_col(spark, ["MARIA JOSE LOPEZ", "JUAN", None, ""])
    got = [r[0] for r in df.select(primer_nombre("v")).collect()]
    assert got == ["MARIA", "JUAN", None, ""]


def test_nonempty_filter(spark):
    df = _one_col(spark, ["x", "", "   ", None, "0", " y "])
    got = [r[0] for r in df.filter(nonempty("v")).collect()]
    # NB: '0' is kept — the PHP !empty() falsy-'0' edge is deliberately
    # not reproduced (SURVEY.md §7.3).
    assert got == ["x", "0", " y "]


def test_concat_null_propagates(spark):
    df = spark.createDataFrame(
        [("Ana", "Diaz"), ("Luis", None), (None, "Perez")], "a string, b string"
    )
    got = [r[0] for r in df.select(usuario_nombre_concat("a", "b")).collect()]
    assert got == ["Ana Diaz", None, None]


def test_token_count(spark):
    df = _one_col(spark, ["one two  three", "", None, " x "])
    got = [r[0] for r in df.select(token_count("v")).collect()]
    assert got == [3, 0, 0, 1]


def test_inferir_sexo_lookup(spark):
    df = spark.createDataFrame(
        [("MARIA",), ("JUAN",), ("ZZZNOPE",), (None,)], "primer string"
    )
    out = inferir_sexo(df, "primer")
    got = {r["primer"]: r["sexo_inferido"] for r in out.collect()}
    assert got["MARIA"] == "Female"
    assert got["JUAN"] == "Male"
    assert got["ZZZNOPE"] is None
    assert got[None] is None
