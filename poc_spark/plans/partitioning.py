"""Partitioned-dataset writes and partition pruning (100 TB storage
layout): facts written `partitionBy(date)` let every date-ranged query
skip whole directories before reading a byte — the difference between
scanning a day and scanning a decade.

Guidelines encoded here:
  - partition by LOW-cardinality, query-aligned columns (a date, a
    tenant) — never a high-cardinality key (small-files explosion);
  - combine with in-file ordering (repartition + sortWithinPartitions on
    the secondary key) so min/max row-group stats prune further;
  - verify pruning with .explain: the scan must show PartitionFilters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_date_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    sort_col: str | None = None,
) -> None:
    """Write with a derived `p_date` partition column; optionally sort
    rows within files by `sort_col` for row-group-stat pruning."""
    out = df.withColumn("p_date", F.to_date(F.col(ts_col)))
    if sort_col:
        out = out.repartition("p_date").sortWithinPartitions(sort_col)
    out.write.mode("overwrite").partitionBy("p_date").parquet(path)


def read_pruned(
    spark: SparkSession, path: str, start_date: str, end_date: str
) -> DataFrame:
    """Date-ranged read: the p_date predicate prunes partitions at
    planning time (PartitionFilters in the scan node)."""
    return spark.read.parquet(path).filter(
        F.col("p_date").between(F.lit(start_date), F.lit(end_date))
    )
