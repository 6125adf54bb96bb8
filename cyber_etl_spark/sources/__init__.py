from .catalog import TABLES, load_all, read_table  # noqa: F401
