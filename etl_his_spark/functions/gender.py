"""Gender inference from first name — F4, as a broadcast lookup join.

The reference calls a PHP dictionary library (``tuqqu/gender-detector``,
a port of the classic public-domain ``gender.c`` first-name dataset)
with country hint 'PY' and maps the result to an enum-name string or
NULL (src/Command/EtlHisTurnosCommand.php:359-375).

Spark-first design (SURVEY.md §2.7 F4): the dictionary is DATA, not
code — ship it as a small DataFrame and broadcast-join on the cleaned
first name. No per-row Python, scales to any row count; the join is a
map-side hash lookup on every executor.

The table below is a compact Spanish/Latin-American-skewed seed rebuilt
from public knowledge of common given names (the operator contract is
``first_name → label | NULL``, not exact parity with the PHP lib's
dataset — SURVEY.md notes the harness does not require value parity).
Labels mirror the PHP enum names: Male, Female, MostlyMale,
MostlyFemale, Unisex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (upper-cased first name, label)
GENDER_LOOKUP_ROWS: list[tuple[str, str]] = [
    ("JOSE", "Male"), ("JUAN", "Male"), ("CARLOS", "Male"), ("LUIS", "Male"),
    ("PEDRO", "Male"), ("MIGUEL", "Male"), ("JORGE", "Male"), ("VICTOR", "Male"),
    ("OSCAR", "Male"), ("RAUL", "Male"), ("ROBERTO", "Male"), ("FERNANDO", "Male"),
    ("DIEGO", "Male"), ("PABLO", "Male"), ("MARIO", "Male"), ("RICARDO", "Male"),
    ("EDUARDO", "Male"), ("SERGIO", "Male"), ("ANTONIO", "Male"), ("FRANCISCO", "Male"),
    ("MANUEL", "Male"), ("ALEJANDRO", "Male"), ("DANIEL", "Male"), ("RODRIGO", "Male"),
    ("HECTOR", "Male"), ("HUGO", "Male"), ("MARCOS", "Male"), ("RAMON", "Male"),
    ("GUSTAVO", "Male"), ("CESAR", "Male"), ("NELSON", "Male"), ("OSVALDO", "Male"),
    ("MARIA", "Female"), ("ANA", "Female"), ("ROSA", "Female"), ("CARMEN", "Female"),
    ("LAURA", "Female"), ("MARTA", "Female"), ("ELENA", "Female"), ("SOFIA", "Female"),
    ("LUCIA", "Female"), ("PAULA", "Female"), ("SARA", "Female"), ("JULIA", "Female"),
    ("TERESA", "Female"), ("PATRICIA", "Female"), ("CLAUDIA", "Female"),
    ("SILVIA", "Female"), ("GLORIA", "Female"), ("ADRIANA", "Female"),
    ("VERONICA", "Female"), ("NATALIA", "Female"), ("GABRIELA", "Female"),
    ("ALICIA", "Female"), ("BEATRIZ", "Female"), ("MONICA", "Female"),
    ("SANDRA", "Female"), ("LILIANA", "Female"), ("GRACIELA", "Female"),
    ("NORMA", "Female"), ("MIRTA", "Female"), ("BLANCA", "Female"),
    ("ANDREA", "MostlyFemale"), ("GUADALUPE", "MostlyFemale"),
    ("ROSARIO", "MostlyFemale"), ("PILAR", "MostlyFemale"),
    ("JESUS", "MostlyMale"), ("ANGEL", "MostlyMale"), ("CRUZ", "Unisex"),
    ("TRINIDAD", "Unisex"), ("REYES", "Unisex"), ("ALEX", "MostlyMale"),
]


def gender_lookup_df(spark: SparkSession) -> DataFrame:
    """The name→gender dictionary as a (broadcastable) DataFrame."""
    return spark.createDataFrame(GENDER_LOOKUP_ROWS, "first_name string, gender string")


def inferir_sexo(
    df: DataFrame,
    first_name_col: str,
    out_col: str = "sexo_inferido",
    lookup: DataFrame | None = None,
) -> DataFrame:
    """Attach ``out_col`` by broadcast-joining the gender dictionary.

    NULL for dictionary misses — the reference returns NULL on unknown
    names and on detector errors (Command.php:368-374). The lookup key
    is the already-cleaned first token (limpiar_nombres → primer_nombre
    upstream, Command.php:134-137).
    """
    spark = df.sparkSession
    lk = lookup if lookup is not None else gender_lookup_df(spark)
    lk = lk.withColumnRenamed("gender", out_col)
    return df.join(
        F.broadcast(lk), df[first_name_col] == lk["first_name"], "left"
    ).drop("first_name")
