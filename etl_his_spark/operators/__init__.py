from .dedup import dedup_distinct_key, dedup_first_per_key
from .surrogate import dense_ids, resolve_fk
from .unpivot import unpivot_slots

__all__ = [
    "dedup_first_per_key",
    "dedup_distinct_key",
    "dense_ids",
    "resolve_fk",
    "unpivot_slots",
]
