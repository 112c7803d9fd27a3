from .registry import TABLES, Catalog, load_table, load_tables

__all__ = ["TABLES", "Catalog", "load_table", "load_tables"]
