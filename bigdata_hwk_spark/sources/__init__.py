from .tables import TABLE_SCHEMAS, load_table, points_from_lineitem, stream_from_events

__all__ = ["TABLE_SCHEMAS", "load_table", "points_from_lineitem", "stream_from_events"]
