from .bars import BARS_DUCKDB_CTE, bars_from_events
from .tables import TABLES, load_table, register_views

__all__ = ["BARS_DUCKDB_CTE", "bars_from_events", "TABLES", "load_table", "register_views"]
