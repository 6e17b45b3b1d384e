"""Parquet table catalog over a scale-factor directory.

The driver's testdata layout is `<sf_dir>/<table>.parquet`
(TESTDATA.md). At 100 TB each "file" becomes a partitioned dataset
directory; `spark.read.parquet` handles both transparently, and the
explicit column projection in callers keeps scans pruned
(ReadSchema shows only touched columns; filters push into parquet).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() can be used."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
