"""Partitioned writes must produce date directories, pruned scans, and
identical query results to the unpartitioned source."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from poc_spark.plans.partitioning import read_pruned, write_date_partitioned
from poc_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def part_path(spark, sf_dir, tmp_path_factory):
    import pathlib
    import shutil

    base = pathlib.Path(__file__).resolve().parent.parent / ".tmp" / "part_events"
    shutil.rmtree(base, ignore_errors=True)
    events = load_table(spark, sf_dir, "events")
    write_date_partitioned(events, str(base), "ts", sort_col="ts")
    yield str(base)
    shutil.rmtree(base, ignore_errors=True)


def test_layout_is_hive_partitioned(part_path):
    dirs = [d for d in os.listdir(part_path) if d.startswith("p_date=")]
    assert len(dirs) >= 25  # one dir per day of the month of data


def test_scan_shows_partition_filters(spark, part_path):
    df = read_pruned(spark, part_path, "2024-01-05", "2024-01-07")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan
    assert "p_date" in plan.split("PartitionFilters")[1].splitlines()[0]


def test_pruned_read_equals_source_filter(spark, sf_dir, part_path):
    events = load_table(spark, sf_dir, "events")
    expected = events.filter(
        F.to_date("ts").between(F.lit("2024-01-05"), F.lit("2024-01-07"))
    ).count()
    got = read_pruned(spark, part_path, "2024-01-05", "2024-01-07").count()
    assert got == expected > 0
