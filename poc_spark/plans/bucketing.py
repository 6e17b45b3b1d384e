"""Bucketed-table co-located joins (the 100 TB shuffle-elimination
story): write both sides of a recurring join bucketed by the join key,
and every subsequent join skips BOTH shuffle exchanges — the classic
amortization for fact-to-fact joins repeated across a pipeline.

Spark only honors bucketing through the session catalog
(`saveAsTable`), not bare parquet paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and optionally sorted) catalog table.
    Sorted buckets additionally enable merge-join without a sort step."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two identically-bucketed tables on the bucket key. With
    matching bucket counts Spark plans ZERO shuffle exchanges for the
    join (verified by tests/test_bucketing.py)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, key)
