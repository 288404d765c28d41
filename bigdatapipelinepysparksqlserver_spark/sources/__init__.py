from .catalog import Catalog, load_table, load_tables  # noqa: F401
