from .registry import TABLES, Catalog, load_table

__all__ = ["TABLES", "Catalog", "load_table"]
