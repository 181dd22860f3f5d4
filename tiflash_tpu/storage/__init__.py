from .catalog import Catalog, TableDef  # noqa: F401
