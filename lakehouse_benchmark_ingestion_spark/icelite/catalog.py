"""Catalog: warehouse-level table registry.

The reference models source and sink as Flink catalogs registered via
CreateCatalogOperation (MainRunner.java:120-143) with JDBC-introspected
schemas (MysqlCDCCatalog.java:109-223: listDatabases/listTables/getTable).
Our catalog is a warehouse directory: each child dir with a
metadata/version-hint.text is a table; schemas live in the table metadata
JSON (static StructType — SURVEY.md §1.3).
"""

from __future__ import annotations

import os

from pyspark.sql.types import StructType

from .table import IceliteTable


class Catalog:
    def __init__(self, warehouse: str):
        self.warehouse = os.path.abspath(warehouse)
        os.makedirs(self.warehouse, exist_ok=True)

    def _loc(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    def list_tables(self) -> list[str]:
        """Analogue of MysqlCDCCatalog.listTables (MysqlCDCCatalog.java:145-168)."""
        out = []
        for name in sorted(os.listdir(self.warehouse)):
            hint = os.path.join(self._loc(name), "metadata", "version-hint.text")
            if os.path.exists(hint):
                out.append(name)
        return out

    def table_exists(self, name: str) -> bool:
        return name in self.list_tables()

    def create_table(
        self, name: str, schema: StructType, properties: dict | None = None, if_not_exists: bool = False
    ) -> IceliteTable:
        if self.table_exists(name):
            if if_not_exists:
                return self.load_table(name)
            raise FileExistsError(f"table {name} exists")
        return IceliteTable.create(self._loc(name), schema, properties)

    def load_table(self, name: str) -> IceliteTable:
        return IceliteTable.load(self._loc(name))

    def drop_table(self, name: str) -> None:
        """Idempotent drop — mirrors the drop+recreate DDL path
        (IcebergCatalogSync.java:79-109)."""
        IceliteTable.drop(self._loc(name))
