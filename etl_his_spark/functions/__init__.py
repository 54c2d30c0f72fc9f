from .text import (
    doc_fingerprint,
    langid_heuristic,
    limpiar_nombres,
    nonempty,
    primer_nombre,
    quality_score,
    token_count,
    usuario_nombre_concat,
)
from .gender import GENDER_LOOKUP_ROWS, gender_lookup_df, inferir_sexo

__all__ = [
    "limpiar_nombres",
    "primer_nombre",
    "nonempty",
    "usuario_nombre_concat",
    "token_count",
    "quality_score",
    "langid_heuristic",
    "doc_fingerprint",
    "inferir_sexo",
    "gender_lookup_df",
    "GENDER_LOOKUP_ROWS",
]
