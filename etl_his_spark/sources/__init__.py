from .readers import read_table, read_tables
from .writers import publish_atomic, write_table

__all__ = ["read_table", "read_tables", "write_table", "publish_atomic"]
