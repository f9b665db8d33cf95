from .readers import TABLES, table, tables

__all__ = ["TABLES", "table", "tables"]
