"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship interaction-graph query (EP-1 of the
reference, /root/reference/backend/main.py:255-342) over the `events`
table at sf0.001. ``queries()``/``oracle_sql()`` expose the operator
inventory from SURVEY.md §2 — definitions live in poc_spark/contract.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from poc_spark import contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return contract.REGISTRY["op_graph_flagship"].spark(
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return contract.queries()


def oracle_sql() -> dict[str, str]:
    return contract.oracle_sql()
