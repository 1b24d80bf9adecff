from .catalog import TABLES, expected_schema, load_table, load_tables, register_views

__all__ = ["TABLES", "expected_schema", "load_table", "load_tables", "register_views"]
