from .catalog import TABLES, load_tables, register_tables

__all__ = ["TABLES", "load_tables", "register_tables"]
