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

# (upper-cased, accent-stripped first name, label). Rebuilt from public
# knowledge of common Spanish / Latin-American given names (the same
# population the classic public-domain gender.c dataset covers for the
# 'PY' country hint); ~390 entries. Names must be unique across ALL
# label groups — the broadcast join and the oracle's VALUES inline both
# assume one row per name (asserted below at import).

_MALE = """
    JOSE JUAN CARLOS LUIS PEDRO MIGUEL JORGE VICTOR OSCAR RAUL ROBERTO
    FERNANDO DIEGO PABLO MARIO RICARDO EDUARDO SERGIO ANTONIO FRANCISCO
    MANUEL ALEJANDRO DANIEL RODRIGO HECTOR HUGO MARCOS RAMON GUSTAVO
    CESAR NELSON OSVALDO
    ABEL ABELARDO ABRAHAM ADALBERTO ADOLFO ADRIAN AGUSTIN ALBERTO
    ALCIDES ALDO ALFONSO ALFREDO ALVARO AMADO AMADOR ANDRES ANIBAL
    ANSELMO ARIEL ARISTIDES ARMANDO ARNALDO ARSENIO ARTURO ATILIO
    AUGUSTO AURELIO BALTASAR BARTOLOME BASILIO BENITO BENJAMIN BERNABE
    BERNARDO BLAS BRAULIO BRUNO CAMILO CANDIDO CAYETANO CECILIO
    CELESTINO CIRIACO CIRILO CLAUDIO CLEMENTE CRISTIAN CRISTOBAL DAMIAN
    DARIO DAVID DELFIN DEMETRIO DESIDERIO DOMINGO EDGAR EDGARDO EDMUNDO
    EDWIN EFRAIN ELADIO ELIAS ELISEO ELOY EMILIANO EMILIO ENRIQUE
    ERNESTO ESTANISLAO ESTEBAN EUGENIO EULOGIO EUSEBIO EVARISTO
    EZEQUIEL FABIAN FABIO FABRICIO FAUSTINO FEDERICO FELICIANO FELIPE
    FELIX FERMIN FIDEL FLORENCIO FLORENTIN FORTUNATO FULGENCIO GABRIEL
    GASPAR GASTON GERARDO GERMAN GERVASIO GILBERTO GONZALO GREGORIO
    GUILLERMO HERIBERTO HERMINIO HILARION HIPOLITO HORACIO HUMBERTO
    IGNACIO ISAAC ISIDORO ISIDRO ISMAEL IVAN JACINTO JAIME JAVIER
    JEREMIAS JERONIMO JOAQUIN JONAS JULIAN JULIO JUSTO LAUREANO LAUTARO
    LAZARO LEANDRO LEON LEONARDO LEONCIO LEOPOLDO LISANDRO LORENZO
    LUCAS LUCIANO MARCELINO MARCELO MARCIAL MARIANO MARTIN MATEO MATIAS
    MAURICIO MAXIMILIANO MAXIMO MILCIADES MILTON MODESTO MOISES NARCISO
    NESTOR NICANOR NICOLAS NORBERTO OCTAVIO OMAR ORLANDO PASCUAL
    PATRICIO PAULINO PLACIDO PONCIANO PORFIRIO PRIMITIVO PRUDENCIO
    RAFAEL RAMIRO REINALDO RENATO ROBUSTIANO RODOLFO ROGELIO ROLANDO
    ROMAN ROMEO ROQUE ROSENDO RUBEN RUFINO RUPERTO SALOMON SALVADOR
    SAMUEL SANTIAGO SATURNINO SEBASTIAN SEGUNDO SEVERO SILVANO SILVIO
    SIMEON SIMON TADEO TEODORO TIBURCIO TIMOTEO TOMAS TORIBIO ULISES
    VALENTIN VALERIANO VENANCIO VICENTE VIRGILIO WALTER WILFRIDO WILSON
    ZACARIAS
"""

_FEMALE = """
    MARIA ANA ROSA CARMEN LAURA MARTA ELENA SOFIA LUCIA PAULA SARA
    JULIA TERESA PATRICIA CLAUDIA SILVIA GLORIA ADRIANA VERONICA
    NATALIA GABRIELA ALICIA BEATRIZ MONICA SANDRA LILIANA GRACIELA
    NORMA MIRTA BLANCA
    ABIGAIL AGUSTINA AIDA ALBA ALEJANDRA AMALIA AMANDA AMELIA ANGELA
    ANGELICA ANTONIA ARACELI AURORA AZUCENA BARBARA BASILIA BELEN BERTA
    BIANCA BRIGIDA CAMILA CANDELARIA CAROLINA CATALINA CECILIA CELESTE
    CELIA CINTIA CLARA CONSTANZA CONSUELO CORINA CRISTINA DAIANA DALILA
    DANIELA DEBORA DELIA DIANA DIGNA DOLORES DOMINGA DORA EDITH ELBA
    ELIANA ELISA ELOISA ELSA ELVIRA EMILIA ERICA ESMERALDA ESPERANZA
    ESTELA ESTER EUGENIA EVA EVANGELINA FABIANA FATIMA FELICIA FELIPA
    FERNANDA FLAVIA FLOR FLORENCIA FRANCISCA GEORGINA GIMENA GISELA
    GRISELDA HAYDEE HERMINIA HILDA HORTENSIA INES IRENE IRIS ISABEL
    ISIDORA IVANA JACINTA JAZMIN JESICA JIMENA JOHANA JOSEFA JOSEFINA
    JUANA JULIANA JULIETA KARINA LARA LETICIA LIDIA LILA LILIA LORENA
    LOURDES LUISA LUJAN LUZ MABEL MAGDALENA MAITE MANUELA MARCELA
    MARGARITA MARIANA MARIBEL MARINA MARISA MARISOL MARLENE MATILDE
    MAYRA MELISA MERCEDES MICAELA MILAGROS MIRIAM MIRNA NANCY NELIDA
    NIDIA NILDA NOELIA NOEMI NORA OFELIA OLGA OLIVIA PABLA PAMELA PAOLA
    PERLA PETRONA PRISCILA RAMONA RAQUEL REBECA REGINA RITA ROCIO
    ROMINA ROSALBA ROSALIA ROSANA ROSAURA ROXANA RUTH SABRINA SALOME
    SERAFINA SILVANA SOLEDAD SONIA SUSANA TAMARA TATIANA TOMASA URSULA
    VALERIA VANESA VICTORIA VILMA VIOLETA VIRGINIA VIVIANA XIMENA
    YOLANDA ZULMA ZUNILDA
"""

_MOSTLY_FEMALE = "ANDREA GUADALUPE ROSARIO PILAR AMPARO CONCEPCION NIEVES SOCORRO"
_MOSTLY_MALE = "JESUS ANGEL ALEX RENE NOEL DENIS JUNIOR"
_UNISEX = "CRUZ TRINIDAD REYES SANTOS ASCENSION"

GENDER_LOOKUP_ROWS: list[tuple[str, str]] = (
    [(n, "Male") for n in _MALE.split()]
    + [(n, "Female") for n in _FEMALE.split()]
    + [(n, "MostlyFemale") for n in _MOSTLY_FEMALE.split()]
    + [(n, "MostlyMale") for n in _MOSTLY_MALE.split()]
    + [(n, "Unisex") for n in _UNISEX.split()]
)

# One row per name or the lookup join fans out (and the oracle's
# correlated VALUES lookup would raise): fail loudly at import.
assert len({n for n, _ in GENDER_LOOKUP_ROWS}) == len(GENDER_LOOKUP_ROWS), (
    "duplicate first name in GENDER_LOOKUP_ROWS"
)


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
