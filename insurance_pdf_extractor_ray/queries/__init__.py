"""Query registry: entry(), queries(), oracle_sql() for the driver contract."""

from .registry import entry, oracle_sql, queries

__all__ = ["entry", "queries", "oracle_sql"]
