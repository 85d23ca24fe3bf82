from .normalize import normalize_colname, normalize_columns

__all__ = ["normalize_colname", "normalize_columns"]
