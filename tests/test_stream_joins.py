"""streaming/joins.py: stream-stream interval join vs its batch twin.

The differential is the point: the watermarked streaming join
(availableNow over file sources) and the bucketized batch backfill must
produce the identical attribution set.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from poc_spark.streaming.joins import attribute_clicks, attribute_clicks_batch

IMPRESSIONS = [
    (1, "2024-01-01 10:00:00"),
    (1, "2024-01-01 10:20:00"),
    (2, "2024-01-01 10:00:00"),
    (3, "2024-01-01 12:00:00"),
]
CLICKS = [
    (1, "2024-01-01 10:25:00"),  # matches both ad-1 impressions
    (2, "2024-01-01 10:31:00"),  # outside the 30-min window → no match
    (2, "2024-01-01 10:29:00"),  # inside
    (3, "2024-01-01 11:59:00"),  # click BEFORE impression → no match
    (4, "2024-01-01 10:05:00"),  # no impression for ad 4
]


def _write(spark, rows, path):
    spark.createDataFrame(rows, "ad_id int, ts_s string").select(
        "ad_id", F.col("ts_s").cast("timestamp").alias("ts")
    ).write.mode("overwrite").parquet(path)


@pytest.fixture()
def landing(spark, tmp_path_repo):
    imp, clk = str(tmp_path_repo / "imp"), str(tmp_path_repo / "clk")
    _write(spark, IMPRESSIONS, imp)
    _write(spark, CLICKS, clk)
    return imp, clk


EXPECTED = {
    (1, "2024-01-01 10:00:00", "2024-01-01 10:25:00"),
    (1, "2024-01-01 10:20:00", "2024-01-01 10:25:00"),
    (2, "2024-01-01 10:00:00", "2024-01-01 10:29:00"),
}


def _as_set(rows):
    return {
        (r["ad_id"], str(r["imp_ts"]), str(r["click_ts"])) for r in rows
    }


def test_streaming_interval_join(spark, landing, tmp_path_repo):
    imp_dir, clk_dir = landing
    schema = "ad_id int, ts timestamp"
    imp = spark.readStream.schema(schema).parquet(imp_dir)
    clk = spark.readStream.schema(schema).parquet(clk_dir)
    out = attribute_clicks(imp, clk)
    assert out.isStreaming
    q = (
        out.writeStream.format("parquet")
        .option("path", str(tmp_path_repo / "attr"))
        .option("checkpointLocation", str(tmp_path_repo / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _as_set(spark.read.parquet(str(tmp_path_repo / "attr")).collect())
    assert got == EXPECTED


def test_batch_twin_matches(spark, landing):
    imp_dir, clk_dir = landing
    imp, clk = spark.read.parquet(imp_dir), spark.read.parquet(clk_dir)
    got = _as_set(attribute_clicks_batch(imp, clk).collect())
    assert got == EXPECTED


def test_batch_twin_plan_is_equi(spark, landing):
    imp_dir, clk_dir = landing
    imp, clk = spark.read.parquet(imp_dir), spark.read.parquet(clk_dir)
    plan = (
        attribute_clicks_batch(imp, clk)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
