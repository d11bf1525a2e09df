from .parquet import read_events, read_table, register_views

__all__ = ["read_table", "read_events", "register_views"]
