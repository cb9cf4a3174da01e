from .tables import TABLES, load_tables, table_path

__all__ = ["TABLES", "load_tables", "table_path"]
