"""S6 as a first-class connector: ``spark.read.format("xlsx")``.

Spark 4's Python DataSource API wraps the stdlib zip+XML codec
(sources.xlsx) into a real scan node: schema is inferred once on the
driver from the first file, then each file becomes one input partition
whose rows are parsed ON THE EXECUTOR — unlike the driver-side
``readers.read_excel`` helper, a directory of workbooks scans in
parallel. Excel stays a small-table format (config/dimension sheets);
this exists so those sheets join into plans like any other source.

Usage::

    from vector_search_optimization_spark.sources.xlsx_datasource import (
        register_xlsx_source,
    )
    register_xlsx_source(spark)
    df = spark.read.format("xlsx").option("sheet", "0").load("/dir/or/file.xlsx")
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql import types as T


def _paths(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "*.xlsx")))
    return sorted(glob.glob(path)) or [path]


def _sheet_opt(options) -> int | str:
    sheet = options.get("sheet", "0")
    return int(sheet) if isinstance(sheet, str) and sheet.isdigit() else sheet


class XlsxDataSource(DataSource):
    """format("xlsx") — options: ``sheet`` (index or name, default 0)."""

    @classmethod
    def name(cls) -> str:
        return "xlsx"

    def schema(self):
        from .readers import infer_excel_schema
        from .xlsx import read_xlsx

        first = _paths(self.options["path"])[0]
        header, rows = read_xlsx(first, _sheet_opt(self.options))
        schema, _ = infer_excel_schema(header, rows)
        return schema

    def reader(self, schema: T.StructType) -> "XlsxReader":
        return XlsxReader(self.options, schema)


class XlsxReader(DataSourceReader):
    def __init__(self, options, schema: T.StructType):
        self.options = options
        self.schema = schema
        self.sheet = _sheet_opt(options)

    def partitions(self):
        return [InputPartition(p) for p in _paths(self.options["path"])]

    def read(self, partition: InputPartition):
        from .readers import coerce_cell_to_type
        from .xlsx import read_xlsx

        header, rows = read_xlsx(partition.value, self.sheet)
        # align to the PLANNED schema: match columns by name and coerce
        # each cell to the planned field type — never re-infer per file,
        # or a directory whose files infer different types would leak
        # mismatched Python values past the plan
        idx = {name: i for i, name in enumerate(header)}
        fields = self.schema.fields
        for r in rows:
            yield tuple(
                coerce_cell_to_type(r[idx[f.name]], f.dataType)
                if f.name in idx
                else None
                for f in fields
            )


def register_xlsx_source(spark) -> None:
    """Idempotent registration of the xlsx DataSource on a session."""
    spark.dataSource.register(XlsxDataSource)
