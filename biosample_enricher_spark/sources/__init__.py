from .tableio import TableIO, resolve_table_io

__all__ = ["TableIO", "resolve_table_io"]
