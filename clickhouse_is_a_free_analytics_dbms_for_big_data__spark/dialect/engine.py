"""ChEngine — session-bound entry point for the CH SQL dialect.

Analog of the reference's shared query pipeline
(Interpreters/executeQuery.cpp:122 executeQueryImpl): parse + analyze
collapse into ``translate_sql``; plan + execute are Catalyst/Tungsten
via ``spark.sql``.  Tables come from the parquet catalog
(sources.catalog); FINAL/SAMPLE need per-table ``TableMeta``;
dictionaries (Dictionaries/ in the reference) are DataFrames registered
as key-renamed temp views probed via correlated scalar subqueries,
which Catalyst turns into (broadcast) left joins — the distributed
equivalent of the reference's in-RAM dictGet lookup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .sql_udfs import register_sql_udfs
from .translate import DictSpec, TableMeta, translate_sql

__all__ = ["ChEngine", "TableMeta"]


class ChEngine:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.table_meta: dict[str, TableMeta] = {}
        self.dictionaries: dict[str, DictSpec] = {}
        # tables created through CREATE TABLE (dialect/statements.py):
        # dotted CH name → TableDef, and its dot-free temp-view twin
        self.tables: dict[str, object] = {}
        self.table_views: dict[str, str] = {}
        # SQL-UDF-backed dialect functions (IPv6 codecs) — the
        # translator passes their calls through by name
        register_sql_udfs(spark)

    # -------------------------------------------------------- catalog

    def register_table(
        self, name: str, df: DataFrame, meta: TableMeta | None = None
    ) -> None:
        df.createOrReplaceTempView(name)
        if meta is not None:
            self.table_meta[name] = meta

    def set_meta(self, name: str, meta: TableMeta) -> None:
        self.table_meta[name] = meta

    def register_dictionary(
        self, name: str, df: DataFrame, key: str
    ) -> None:
        """Register a dictionary (reference: external dictionaries,
        Dictionaries/ dir; flat/hashed layouts).  ``key`` is the lookup
        column; remaining columns are the gettable attributes."""
        view = f"__dict_{name}"
        attrs = tuple(c for c in df.columns if c != key)
        df.withColumnRenamed(key, "__k").createOrReplaceTempView(view)
        self.dictionaries[name] = DictSpec(view=view, attrs=attrs)

    # -------------------------------------------------------- querying

    def translate(self, ch_sql: str) -> str:
        return translate_sql(
            ch_sql,
            table_meta=self.table_meta,
            columns_of=self._columns_of,
            dictionaries=self.dictionaries,
            table_views=self.table_views,
        )

    def sql(self, ch_sql: str) -> DataFrame:
        return self.spark.sql(self.translate(ch_sql))

    def execute(self, ch_sql: str) -> DataFrame | None:
        """Full statement surface: SELECT returns a DataFrame;
        CREATE TABLE / INSERT / DROP / SET return None
        (Interpreters/InterpreterFactory.cpp dispatch)."""
        from .statements import execute_statement

        return execute_statement(self, ch_sql)

    def _columns_of(self, table: str) -> list[str] | None:
        try:
            return self.spark.table(table).columns
        except Exception:
            return None
