"""Table catalog abstraction: Iceberg when the runtime has the jar,
partition-overwrite parquet otherwise.

The engine's write semantics are "overwrite these partitions atomically,
leave the rest" (resume idempotency, plans/resume.py).  Iceberg gives that
via ``overwritePartitions``; plain parquet gives it via dynamic partition
overwrite.  This module keeps the choice in ONE place so a cluster with
``iceberg-spark-runtime`` on the classpath flips a config, not code.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is configured and the runtime jar loads."""
    if not spark.conf.get("spark.sql.catalog.engine", None):
        return False
    try:
        spark._jvm.org.apache.iceberg.spark.SparkCatalog  # noqa: B018
        return True
    except Exception:
        return False


class TableCatalog:
    """``write(df, name, partition_col)`` / ``read(name)`` with Iceberg or
    local-parquet backends; identical overwrite-by-partition semantics."""

    def __init__(self, spark: SparkSession, warehouse: str, catalog: str = "engine"):
        self.spark = spark
        self.warehouse = warehouse
        self.catalog = catalog
        self.use_iceberg = iceberg_available(spark)

    def _path(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    def write(self, df: DataFrame, name: str, partition_col: str = "bucket") -> None:
        if self.use_iceberg:  # pragma: no cover - needs the Iceberg jar
            (
                df.writeTo(f"{self.catalog}.{name}")
                .partitionedBy(partition_col)
                .createOrReplace()
            )
        else:
            (
                df.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(partition_col)
                .parquet(self._path(name))
            )

    def overwrite_partitions(self, df: DataFrame, name: str, partition_col: str = "bucket") -> None:
        if self.use_iceberg:  # pragma: no cover - needs the Iceberg jar
            df.writeTo(f"{self.catalog}.{name}").overwritePartitions()
        else:
            (
                df.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(partition_col)
                .parquet(self._path(name))
            )

    def read(self, name: str) -> DataFrame:
        if self.use_iceberg:  # pragma: no cover - needs the Iceberg jar
            return self.spark.table(f"{self.catalog}.{name}")
        return self.spark.read.parquet(self._path(name))

    def exists(self, name: str) -> bool:
        if self.use_iceberg:  # pragma: no cover - needs the Iceberg jar
            return self.spark.catalog.tableExists(f"{self.catalog}.{name}")
        try:
            self.spark.read.parquet(self._path(name)).schema
            return True
        except Exception:
            return False
